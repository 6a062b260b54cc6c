"""Round-5 scanned-eval breakdown for the staged int16 pipeline.

Splits one staged batch into: stage (host fill + upload) | featurize |
runner dispatches (first/scan/finish + drain checks) | token unpack, at
B in {8, 32}.  Run on the real chip: python -u exp/profile_eval2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(n_chunks=16, n_iter=8):
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    from simulst_tpu.data.vocab import SPECIALS, Vocabulary
    from simulst_tpu.models.cif import CIFConfig, CIFModel
    from simulst_tpu.stream.agents import (AgentConfig, CIFAgent,
                                           chunk_geometry_ms,
                                           stage_session_wavs)

    dtype = jnp.bfloat16
    syms = list(SPECIALS) + [f"w{i}" for i in range(4100 - len(SPECIALS))]
    vocab = Vocabulary(syms)
    cfg = CIFConfig(vocab_size=4100)
    model = CIFModel(cfg)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        model.init(jax.random.PRNGKey(0)))
    acfg = AgentConfig(max_tgt_len=256, max_src_frames=1024)
    agent = CIFAgent(model, params, vocab, acfg, fused=True)

    first_ms, steady_ms = chunk_geometry_ms(cfg)
    n_first = int(first_ms / 1000.0 * 16000)
    n_steady = int(steady_ms / 1000.0 * 16000)
    n_samp = n_first + (n_chunks - 1) * n_steady
    audio_s = (first_ms + (n_chunks - 1) * steady_ms) / 1000.0

    for B in (8, 32):
        rng = np.random.RandomState(B)
        wavs = [(rng.randn(n_samp) * (1500 + 30 * i)).astype(np.int16)
                for i in range(B)]
        # compile
        agent.new_batched_session(B).process_session_wavs(wavs)

        # (round 5: featurize + runner + drain are ONE dispatch now — the
        # session executor; the split is stage | execute | unpack)
        from simulst_tpu.ops.fbank import num_frames
        c0 = num_frames(n_first)
        cs = num_frames(n_first + n_steady) - c0
        mx = num_frames(n_samp) - num_frames(
            n_first + (n_chunks - 2) * n_steady)
        t = {k: 0.0 for k in ("stage", "execute", "tokens")}
        for it in range(n_iter + 1):
            m = it > 0
            sess = agent.new_batched_session(B)
            t0 = time.perf_counter()
            st = stage_session_wavs(agent, wavs)
            jax.block_until_ready(st.wav_mat)
            t1 = time.perf_counter()
            n_before = np.asarray(sess.state.n_tokens)
            sess.state, counts = agent._session_exec(
                sess.state, st.wav_mat, st.n_valid, c0=c0, cs=cs,
                n_mid=n_chunks - 2, mx=mx)
            counts_h = np.asarray(counts)
            toks = np.asarray(sess.state.tokens)
            t2 = time.perf_counter()
            ends = n_before[None, :] + np.cumsum(counts_h, axis=0)
            starts = ends - counts_h
            out = [[toks[i, starts[k, i]:ends[k, i]].tolist()
                    for k in range(n_chunks)] for i in range(B)]
            t3 = time.perf_counter()
            if m:
                t["stage"] += t1 - t0
                t["execute"] += t2 - t1
                t["tokens"] += t3 - t2
        total = sum(t.values())
        ups = B / (total / n_iter)
        print(f"B={B}: {ups:6.1f} utt/s ({ups * audio_s:7.0f}x realtime)")
        for k, v in t.items():
            print(f"  {k:10s} {v / n_iter * 1000:8.2f} ms/batch "
                  f"({100 * v / total:5.1f}%)", flush=True)


if __name__ == "__main__":
    main()
