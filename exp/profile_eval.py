"""Profile the scanned-session eval path (VERDICT r4 item #2).

Compares the host-DSP path (per-chunk OnlineFbank + host stacking,
process_session) against the device path (batched on-device fbank + device
chunk assembly, process_session_wavs) and breaks the device path's wall time
into stack | featurize | runner | tokens.  Run on the real chip:
`python exp/profile_eval.py`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(batch=8, n_chunks=16, n_iter=10):
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    from simulst_tpu.data.vocab import SPECIALS, Vocabulary
    from simulst_tpu.models.cif import CIFConfig, CIFModel
    from simulst_tpu.stream.agents import (AgentConfig, CIFAgent,
                                           chunk_geometry_ms)

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
    rng = np.random.RandomState(0)
    audio_s = (first_ms + (n_chunks - 1) * steady_ms) / 1000.0
    print(f"B={batch} chunks={n_chunks} audio={audio_s:.1f}s/utt")

    wavs = [(rng.randn(n_first + (n_chunks - 1) * n_steady)
             * (0.04 + 0.01 * i)).astype(np.float32) for i in range(batch)]
    chunk_lists = []
    for w in wavs:
        chunks, pos = [], 0
        for c in range(n_chunks):
            n = n_first if c == 0 else n_steady
            chunks.append(w[pos: pos + n])
            pos += n
        chunk_lists.append(chunks)

    def timeit(label, fn):
        fn()                                  # compile
        t0 = time.perf_counter()
        for _ in range(n_iter):
            fn()
        dt = (time.perf_counter() - t0) / n_iter
        ups = batch / dt
        print(f"{label:12s} {dt * 1000:8.1f} ms/batch -> {ups:6.1f} utt/s "
              f"({ups * audio_s:7.0f}x realtime)")
        return dt

    timeit("host path", lambda: agent.new_batched_session(batch)
           .process_session(chunk_lists))
    timeit("device path", lambda: agent.new_batched_session(batch)
           .process_session_wavs(wavs))

    # breakdown of the device path
    t = {k: 0.0 for k in ("stack", "featurize", "runner", "tokens")}
    from simulst_tpu.ops.fbank import num_frames
    for it in range(n_iter + 1):
        measure = it > 0
        session = agent.new_batched_session(batch)
        self = session
        t0 = time.perf_counter()
        totals = [len(w) for w in wavs]
        sched = n_first + (n_chunks - 1) * n_steady
        wav_mat = np.zeros((batch, sched), np.float32)
        for i, w in enumerate(wavs):
            wav_mat[i, :len(w)] = w
        wm = jnp.asarray(wav_mat)
        jax.block_until_ready(wm)
        t1 = time.perf_counter()
        cum = [[min(n_first + k * n_steady, tt) for k in range(n_chunks)]
               for tt in totals]
        fcum = [[num_frames(c) for c in row] for row in cum]
        c0 = fcum[0][0]
        cs = fcum[0][1] - fcum[0][0]
        last_counts = np.array([row[-1] - row[-2] for row in fcum], np.int32)
        mx_last = num_frames(sched) - fcum[0][n_chunks - 2]
        first, mid, last = agent._batch_featurize(
            wm, c0=c0, cs=cs, n_mid=n_chunks - 2, mx=mx_last)
        jax.block_until_ready(last)
        t2 = time.perf_counter()
        n_valid = (jnp.asarray(last_counts)
                   if (last_counts != mx_last).any() else None)
        state, counts = agent._scan_runner(self.state, first, mid, last,
                                           n_valid)
        jax.block_until_ready(state.tokens)
        t3 = time.perf_counter()
        counts = np.asarray(counts)
        toks = np.asarray(state.tokens)
        out = []
        for i in range(batch):
            pos = 0
            for k in range(n_chunks):
                out.append(toks[i, pos:pos + int(counts[k, i])].tolist())
                pos += int(counts[k, i])
        t4 = time.perf_counter()
        if measure:
            t["stack"] += t1 - t0
            t["featurize"] += t2 - t1
            t["runner"] += t3 - t2
            t["tokens"] += t4 - t3
    total = sum(t.values())
    for k, v in t.items():
        print(f"  {k:10s} {v / n_iter * 1000:8.2f} ms/batch "
              f"({100 * v / total:5.1f}%)")


if __name__ == "__main__":
    main()
