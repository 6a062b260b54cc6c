"""Characterize the scan-executable transfer degradation (round 5).

probe_h2d2 showed the scanned runner's scan_mid executable permanently
degrades h2d (0.2 ms -> ~24 ms fixed latency, ~9 ms/MB).  Questions:

  1. is d2h degraded the same way?
  2. does a SHORT scan (length 2) also poison? (structural vs size)
  3. does deleting the jitted fn + clearing jax caches recover?
  4. do transfers overlap with device compute after poisoning
     (double-buffering viability)?
  5. are int16 uploads proportionally cheaper (bytes-driven)?

Run on the real chip: python -u exp/probe_h2d3.py
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def t_h2d(label, n=3):
    big = np.zeros((8, 675200), np.float32)
    i16 = np.zeros((8, 675200), np.int16)
    tiny = np.zeros((1,), np.float32)
    out = {}
    for name, arr in (("big_f32", big), ("big_i16", i16), ("tiny", tiny)):
        jax.block_until_ready(jnp.asarray(arr))
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(jnp.asarray(arr))
        out[name] = (time.perf_counter() - t0) / n * 1000
    # d2h: fetch a big and a tiny device array
    dbig = jnp.zeros((8, 675200), jnp.float32) + 1.0
    dtiny = jnp.zeros((256,), jnp.int32)
    jax.block_until_ready(dbig)
    np.asarray(dtiny)
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(dbig)
    out["d2h_big"] = (time.perf_counter() - t0) / n * 1000
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(dtiny)
    out["d2h_tiny"] = (time.perf_counter() - t0) / n * 1000
    print(f"[{label:24s}] " + "  ".join(f"{k} {v:7.2f}ms"
                                        for k, v in out.items()), flush=True)
    return out


def main():
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    from simulst_tpu.data.vocab import SPECIALS, Vocabulary
    from simulst_tpu.models.cif import CIFConfig, CIFModel
    from simulst_tpu.stream.agents import AgentConfig, CIFAgent
    from simulst_tpu.stream.fused import make_scanned_runner

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
    step_fn = agent._fused_step
    t_h2d("baseline")

    B = 8
    first = jnp.zeros((B, cfg.segment_length + cfg.right_context, 80), dtype)
    feats = jnp.zeros((B, cfg.segment_length, 80), dtype)

    # Q2: short scan first
    runner = make_scanned_runner(step_fn)
    mid2 = jnp.zeros((2, B, cfg.segment_length, 80), dtype)
    st, counts = runner(agent._fused_init(B), first, mid2, feats,
                        jnp.full((B,), 10, jnp.int32))
    jax.block_until_ready(st.tokens)
    t_h2d("after scan len=2")

    mid14 = jnp.zeros((14, B, cfg.segment_length, 80), dtype)
    st, counts = runner(agent._fused_init(B), first, mid14, feats,
                        jnp.full((B,), 10, jnp.int32))
    jax.block_until_ready(st.tokens)
    t_h2d("after scan len=14")

    # Q4: overlap — dispatch the scan on resident data, then time an upload
    # WHILE it runs (async dispatch returns immediately)
    state0 = agent._fused_init(B)
    up = np.zeros((8, 675200), np.float32)
    # warm: make sure nothing recompiles
    st, counts = runner(state0, first, mid14, feats,
                        jnp.full((B,), 10, jnp.int32))
    jax.block_until_ready(st.tokens)
    t0 = time.perf_counter()
    st, counts = runner(state0, first, mid14, feats,
                        jnp.full((B,), 10, jnp.int32))
    t_disp = time.perf_counter()
    dev = jnp.asarray(up)
    jax.block_until_ready(dev)
    t_up = time.perf_counter()
    jax.block_until_ready(st.tokens)
    np.asarray(st.tokens)
    t_done = time.perf_counter()
    print(f"overlap: dispatch {1000*(t_disp-t0):.1f} ms, upload-during-run "
          f"{1000*(t_up-t_disp):.1f} ms, rest-of-compute "
          f"{1000*(t_done-t_up):.1f} ms, total {1000*(t_done-t0):.1f} ms",
          flush=True)
    # sequential reference: compute alone then upload alone
    t0 = time.perf_counter()
    st, counts = runner(state0, first, mid14, feats,
                        jnp.full((B,), 10, jnp.int32))
    jax.block_until_ready(st.tokens)
    t_c = time.perf_counter()
    jax.block_until_ready(jnp.asarray(up))
    t_u = time.perf_counter()
    print(f"sequential: compute {1000*(t_c-t0):.1f} ms + upload "
          f"{1000*(t_u-t_c):.1f} ms", flush=True)

    # Q3: recovery attempts
    del runner, st, counts, mid2, mid14
    gc.collect()
    t_h2d("after del runner+gc")
    jax.clear_caches()
    gc.collect()
    t_h2d("after clear_caches")


if __name__ == "__main__":
    main()
