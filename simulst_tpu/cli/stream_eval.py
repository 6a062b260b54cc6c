"""Streaming evaluation CLI — the simuleval-invocation replacement
(/root/reference/eval/1-simuleval.sh).

Reads a wav_list + reference file, drives the chosen agent utterance by
utterance through the built-in READ/WRITE evaluator, and writes
`scores` (json) + `instances.log` like SimulEval does.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from simulst_tpu import config as cfglib
from simulst_tpu.data.mustc import read_wav
from simulst_tpu.stream.evaluator import evaluate, evaluate_batched


def main(argv=None):
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True, help="wav_list file")
    p.add_argument("--target", required=True, help="reference text file")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--vocab", required=True)
    p.add_argument("--agent", default="mma",
                   choices=["mma", "waitk", "cif", "transducer"])
    p.add_argument("--model", default=None)
    p.add_argument("--output", default="simul_out")
    p.add_argument("--waitk", type=int, default=None,
                   help="test-time wait-k override (--waitk-testtime)")
    p.add_argument("--cif-beta", type=float, default=None,
                   help="test-time beta recalibration (cif_agent.py:207-209)")
    p.add_argument("--overshoot-weight", type=float, default=1.0)
    p.add_argument("--max-utterances", type=int, default=None)
    p.add_argument("--max-src-frames", type=int, default=None,
                   help="encoder buffer capacity in post-subsample frames; "
                        "default auto-sizes to the longest utterance in the "
                        "wav_list (overflow is flagged as 'truncated' in "
                        "instances.log, never silent)")
    p.add_argument("--max-tgt-len", type=int, default=None,
                   help="output token / CIF-fire buffer capacity; default "
                        "auto-sizes with --max-src-frames")
    p.add_argument("--global-cmvn", default=None,
                   help="npz with mean/std arrays for online feature "
                        "normalization (the reference agents' gcmvn)")
    p.add_argument("--fused", action="store_true",
                   help="fused device-side chunk steps (one XLA call per "
                        "chunk incl. all WRITEs)")
    p.add_argument("--scan-sessions", action="store_true",
                   help="run each utterance bucket's whole chunk schedule in "
                        "one lax.scan program (3 dispatches/bucket; requires "
                        "--fused); *_CA metrics are recomputed by a per-chunk "
                        "stepping pass unless --no-ca-pass")
    p.add_argument("--no-ca-pass", action="store_true",
                   help="with --scan-sessions: skip the extra per-chunk "
                        "stepping pass; *_CA then inflates to a whole-"
                        "session upper bound (stamped mode='scan')")
    p.add_argument("--batch-size", type=int, default=1,
                   help=">1 streams B utterances per device call (requires "
                        "--fused; chunk-count-bucketed lock-step batching)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax profiler trace of one streaming chunk")
    p.add_argument("--override", action="append", default=[])
    args = p.parse_args(argv)

    with open(args.source) as f:
        wav_paths = [l.strip() for l in f if l.strip()]
    with open(args.target) as f:
        refs = [l.strip() for l in f]
    if args.max_utterances:
        wav_paths = wav_paths[: args.max_utterances]
        refs = refs[: args.max_utterances]

    utts = []
    for wp in wav_paths:
        # 16-bit PCM stays int16: 1/4 the upload bytes, exact conversion
        # everywhere downstream (OnlineFbank / stage_session_wavs)
        wav, sr = read_wav(wp, keep_int16=True)
        utts.append(wav)

    from simulst_tpu.stream.build import (auto_buffer_sizes, build_agent,
                                          load_vocab)
    vocab = load_vocab(args.vocab)
    overrides = dict(cfglib.parse_override(s) for s in args.override)
    agent = build_agent(args.checkpoint, vocab, agent_type=args.agent,
                        model_name=args.model, overrides=overrides,
                        waitk=args.waitk, cif_beta=args.cif_beta,
                        overshoot_weight=args.overshoot_weight,
                        global_cmvn_path=args.global_cmvn, fused=args.fused,
                        max_src_frames=args.max_src_frames,
                        max_tgt_len=args.max_tgt_len)
    if args.max_src_frames is None or args.max_tgt_len is None:
        # auto-size the fixed streaming buffers to the longest utterance so
        # the 20/40/60s robustness splits (seg_mustc_data.py:26-104) never
        # silently overflow the default 1024-frame capacity
        src_cap, tgt_cap = auto_buffer_sizes(agent.cfg,
                                             max(len(w) for w in utts))
        agent.acfg.max_src_frames = args.max_src_frames or src_cap
        agent.acfg.max_tgt_len = args.max_tgt_len or tgt_cap
        print(f"auto-sized streaming buffers: max_src_frames="
              f"{agent.acfg.max_src_frames} max_tgt_len="
              f"{agent.acfg.max_tgt_len}")

    if args.profile:
        # trace one full session (compile-warm: run one utterance first)
        from simulst_tpu.stream.evaluator import run_session
        run_session(agent, utts[0])
        with jax.profiler.trace(args.profile):
            run_session(agent, utts[0])
        print(f"profiler trace written to {args.profile}")

    os.makedirs(args.output, exist_ok=True)
    log = os.path.join(args.output, "instances.log")
    if args.scan_sessions or args.batch_size > 1:
        # --scan-sessions with the default --batch-size 1 routes through the
        # batched evaluator at B=1 rather than being silently ignored
        assert args.fused, \
            "--scan-sessions / --batch-size > 1 require --fused"
        scores = evaluate_batched(agent, utts, refs,
                                  batch_size=args.batch_size, log_path=log,
                                  scan=args.scan_sessions)
        if args.scan_sessions and not args.no_ca_pass:
            # scanned sessions can't time individual chunks, so *_CA from
            # the scan is a whole-session upper bound; re-run per-chunk
            # stepping (still batched/fused) for honest _CA numbers
            from simulst_tpu.stream.evaluator import merge_honest_ca
            ca = evaluate_batched(
                agent, utts, refs, batch_size=args.batch_size,
                log_path=os.path.join(args.output, "instances_ca.log"),
                scan=False)
            scores = merge_honest_ca(scores, ca)
    else:
        scores = evaluate(agent, utts, refs, log_path=log)
    with open(os.path.join(args.output, "scores"), "w") as f:
        json.dump(scores, f, indent=2)
    print(json.dumps(scores, indent=2))
    return scores


if __name__ == "__main__":
    main()
