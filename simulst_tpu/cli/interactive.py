"""Interactive decode CLI — the eval/interactive.py replacement.

Reads wav paths (speech task) or raw text (MT task) from stdin, decodes
each with beam search, prints H- lines (reference eval/interactive.py:42-105,
used by eval_st.sh:33-47 with wav-path lines).
"""
from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from simulst_tpu import config as cfglib
from simulst_tpu.cli.generate import decode_batch
from simulst_tpu.data.features import utterance_cmvn
from simulst_tpu.data.mustc import read_wav
from simulst_tpu.data.vocab import EOS, Vocabulary
from simulst_tpu.decode.beam import BeamConfig
from simulst_tpu.models import get_model
from simulst_tpu.ops.fbank import fbank_np
from simulst_tpu.train.checkpoint import load_checkpoint


def main(argv=None):
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--vocab", required=True)
    p.add_argument("--model", default=None)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max-len", type=int, default=200)
    p.add_argument("--cmvn", default="utterance", choices=["utterance", "none"])
    p.add_argument("--task", default="speech", choices=["speech", "mt"],
                   help="speech: stdin lines are wav paths; mt: raw text")
    p.add_argument("--override", action="append", default=[])
    args = p.parse_args(argv)

    vocab = (Vocabulary.from_spm(args.vocab) if args.vocab.endswith(".model")
             else Vocabulary.from_txt(args.vocab))
    restored, meta = load_checkpoint(args.checkpoint)
    model_name = args.model or (meta or {}).get("model", "s2t_emformer")
    model_cls = get_model(model_name)
    overrides = dict(cfglib.parse_override(s) for s in args.override)
    mcfg = cfglib.from_dict(model_cls.Config,
                            {**((meta or {}).get("config") or {}),
                             **overrides, "vocab_size": len(vocab)})
    model = model_cls(mcfg)
    beam_cfg = BeamConfig(beam_size=args.beam, max_len=args.max_len)

    for i, line in enumerate(sys.stdin):
        line = line.strip()
        if not line:
            continue
        if args.task == "mt":
            from simulst_tpu.cli.generate import decode_batch_mt
            src = np.asarray([vocab.encode(line)], np.int32)
            tokens, lengths = decode_batch_mt(model, restored,
                                              {"src_tokens": src}, beam_cfg)
        else:
            wav, sr = read_wav(line)
            feats = fbank_np(wav * 2 ** 15)
            if args.cmvn == "utterance":
                feats = utterance_cmvn(feats)
            batch = {"feats": feats[None], "feat_lengths":
                     np.array([feats.shape[0]], np.int32)}
            tokens, lengths = decode_batch(model, restored, batch, beam_cfg)
        ids = [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]
               if t != EOS]
        print(f"H-{i}\t{vocab.decode_ids(ids)}", flush=True)


if __name__ == "__main__":
    main()
