"""Bisect WHICH executable in the scanned-eval path degrades h2d transfers
(round 5; see exp/probe_h2d.py — the full session drops h2d from 1.5 GB/s to
0.09 GB/s with a ~24 ms fixed per-transfer latency).

Stages: first fused chunk step -> finish step (no feats) -> finish step with
feats+n_valid -> scan_mid over steady chunks -> token readback.  After each,
re-time a 21.6 MB h2d and a 4-byte h2d.

Run on the real chip: python -u exp/probe_h2d2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def t_h2d(label):
    big = np.zeros((8, 675200), np.float32)
    tiny = np.zeros((1,), np.float32)
    jax.block_until_ready(jnp.asarray(big))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(jnp.asarray(big))
    dt_big = (time.perf_counter() - t0) / 3 * 1000
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(jnp.asarray(tiny))
    dt_tiny = (time.perf_counter() - t0) / 3 * 1000
    print(f"[{label:28s}] big {dt_big:8.2f} ms  tiny {dt_tiny:7.2f} ms",
          flush=True)


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
    state0 = agent._fused_init(B)
    first = jnp.zeros((B, cfg.segment_length + cfg.right_context, 80), dtype)
    feats = jnp.zeros((B, cfg.segment_length, 80), dtype)

    state, _ = step_fn(state0, first)
    jax.block_until_ready(state.tokens)
    t_h2d("after first step")

    st2, _ = step_fn(state, feats, finish=True,
                     n_valid=jnp.full((B,), 10, jnp.int32))
    jax.block_until_ready(st2.tokens)
    t_h2d("after finish step (n_valid)")

    st3, _ = step_fn(st2, None, finish=True)
    jax.block_until_ready(st3.tokens)
    t_h2d("after flush step (no feats)")

    runner = make_scanned_runner(step_fn)
    # drive only the scan over 14 steady chunks via the runner internals
    mid = jnp.zeros((14, B, cfg.segment_length, 80), dtype)
    state_s, ns = runner.__closure__ and None, None  # placeholder
    # call run() but with mid only: replicate its internals
    from simulst_tpu.stream import fused as fmod
    # use the private _scan_mid through run(): first + mid + last
    state_r = agent._fused_init(B)
    state_r, n0 = step_fn(state_r, first)
    # reach the scan through the runner's run(): the runner caches scan_mid
    t_h2d("before scan_mid")
    state_r, counts = runner(agent._fused_init(B), first, mid, feats,
                             jnp.full((B,), 10, jnp.int32))
    jax.block_until_ready(state_r.tokens)
    t_h2d("after scanned run")

    toks = np.asarray(state_r.tokens)
    cnts = np.asarray(counts)
    t_h2d("after token readback")
    del toks, cnts

    # does it recover after deleting the big arrays / states?
    del state_r, state, st2, st3, mid
    t_h2d("after del")


if __name__ == "__main__":
    main()
