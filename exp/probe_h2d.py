"""Probe host->device transfer behavior on the tunneled backend (round 5).

The round-4 eval profile showed a ~266 ms cost to stack + upload a ~5.4 MB
(8, 675200) f32 wav matrix in the scanned-eval path — suspiciously close to
the degraded-transfer pathology documented at stream/fused.py:94-99.  This
probe answers, in one process:

  1. clean-process h2d bandwidth at several sizes (f32 and int16);
  2. whether h2d degrades after compiling/running each stage of the eval
     pipeline (featurize jit, fused CIF step, scanned runner);
  3. the cost split of "stack": np.zeros+copies vs jnp.asarray vs sync.

Run on the real chip: python exp/probe_h2d.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def t_h2d(arr, n=5):
    # one warm transfer first (allocator warmup)
    jax.block_until_ready(jnp.asarray(arr))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(jnp.asarray(arr))
    dt = (time.perf_counter() - t0) / n
    mb = arr.nbytes / 1e6
    return dt * 1000, mb / dt / 1e3  # ms, GB/s


def report(label):
    for shape, dt in [((8, 675200), np.float32), ((8, 675200), np.int16),
                      ((32, 675200), np.float32), ((1024,), np.float32)]:
        arr = np.zeros(shape, dt)
        ms, gbs = t_h2d(arr)
        print(f"[{label}] h2d {arr.nbytes/1e6:7.2f}MB {np.dtype(dt).name:8s}"
              f" {ms:8.2f} ms  {gbs:6.3f} GB/s")


def main():
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    print("device:", jax.devices()[0])
    report("clean")

    # stage 1: compile + run the batched featurize jit
    from simulst_tpu.ops.fbank import fbank_batch_jax
    wav = jnp.zeros((8, 675200), jnp.float32)
    f = jax.jit(lambda w: fbank_batch_jax(w * (2 ** 15)))
    jax.block_until_ready(f(wav))
    report("after featurize jit")

    # stage 2: build CIF agent + fused step, run one chunk
    from simulst_tpu.data.vocab import SPECIALS, Vocabulary
    from simulst_tpu.models.cif import CIFConfig, CIFModel
    from simulst_tpu.stream.agents import AgentConfig, CIFAgent
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
    st = agent._fused_init(8)
    feats = jnp.zeros((8, cfg.segment_length + cfg.right_context, 80), dtype)
    st, _ = agent._fused_step(st, feats)
    jax.block_until_ready(st.tokens)
    report("after fused step")

    # stage 3: full scanned session once
    rng = np.random.RandomState(0)
    wavs = [(rng.randn(675200) * 0.05).astype(np.float32) for _ in range(8)]
    sess = agent.new_batched_session(8)
    sess.process_session_wavs(wavs)
    report("after scanned session")

    # stack cost split
    B, sched = 8, 675200
    t0 = time.perf_counter()
    wav_mat = np.zeros((B, sched), np.float32)
    for i, w in enumerate(wavs):
        wav_mat[i, :len(w)] = w
    t1 = time.perf_counter()
    wm = jnp.asarray(wav_mat)
    t2 = time.perf_counter()
    jax.block_until_ready(wm)
    t3 = time.perf_counter()
    print(f"stack split: host-copy {1000*(t1-t0):.2f} ms, "
          f"asarray-dispatch {1000*(t2-t1):.2f} ms, sync {1000*(t3-t2):.2f} ms")

    # int16 device-side cast path: upload int16, cast+scale on device
    i16 = (np.clip(wav_mat, -1, 1) * 32767).astype(np.int16)
    ms, gbs = t_h2d(i16)
    print(f"int16 upload of same audio: {ms:.2f} ms ({gbs:.3f} GB/s)")


if __name__ == "__main__":
    main()
