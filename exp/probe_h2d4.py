"""Localize the transfer-degradation trigger (round 5, after probe_h2d3).

Which program structure poisons h2d on the tunneled backend?
  a. plain jit matmul
  b. jit(lax.scan(matmul))
  c. jit(while_loop(matmul))
  d. jit(lax.scan(body with while_loop))
  e. jit wrapper that INLINES another jitted fn (no scan)
  f. the fused CIF step alone (known: does NOT poison)
  g. jit(lax.scan(fused step))  (known: poisons)

Run on the real chip: python -u exp/probe_h2d4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def t_h2d(label, n=3):
    big = np.zeros((8, 675200), np.float32)
    jax.block_until_ready(jnp.asarray(big))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(jnp.asarray(big))
    dt = (time.perf_counter() - t0) / n * 1000
    tiny = np.zeros((4,), np.float32)
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(jnp.asarray(tiny))
    dt2 = (time.perf_counter() - t0) / n * 1000
    print(f"[{label:34s}] big {dt:8.2f} ms  tiny {dt2:7.2f} ms", flush=True)
    return dt2


def main():
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    x = jnp.zeros((256, 256), jnp.bfloat16)
    t_h2d("baseline")

    f_a = jax.jit(lambda x: x @ x)
    jax.block_until_ready(f_a(x))
    t_h2d("a: jit matmul")

    @jax.jit
    def f_b(x):
        def body(c, _):
            return c @ c * 0.5 + c, None
        y, _ = jax.lax.scan(body, x, None, length=8)
        return y
    jax.block_until_ready(f_b(x))
    t_h2d("b: jit scan(matmul)")

    @jax.jit
    def f_c(x):
        def cond(c):
            return c[1] < 8
        def body(c):
            y, i = c
            return (y @ y * 0.5 + y, i + 1)
        y, _ = jax.lax.while_loop(cond, body, (x, 0))
        return y
    jax.block_until_ready(f_c(x))
    t_h2d("c: jit while(matmul)")

    @jax.jit
    def f_d(x):
        def sbody(c, _):
            def cond(cc):
                return cc[1] < 4
            def wbody(cc):
                y, i = cc
                return (y @ y * 0.5 + y, i + 1)
            y, _ = jax.lax.while_loop(cond, wbody, (c, 0))
            return y, None
        y, _ = jax.lax.scan(sbody, x, None, length=8)
        return y
    jax.block_until_ready(f_d(x))
    t_h2d("d: jit scan(while(matmul))")

    inner = jax.jit(lambda x: jnp.tanh(x @ x))
    outer = jax.jit(lambda x: inner(x) + inner(x * 0.5))
    jax.block_until_ready(outer(x))
    t_h2d("e: jit inlining jitted fn")

    # f/g: the real fused step and its scan
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
        lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v,
        model.init(jax.random.PRNGKey(0)))
    agent = CIFAgent(model, params, vocab,
                     AgentConfig(max_tgt_len=256, max_src_frames=1024),
                     fused=True)
    B = 8
    first = jnp.zeros((B, cfg.segment_length + cfg.right_context, 80), dtype)
    st, _ = agent._fused_step(agent._fused_init(B), first)
    jax.block_until_ready(st.tokens)
    t_h2d("f: fused step")

    runner = make_scanned_runner(agent._fused_step)
    mid2 = jnp.zeros((2, B, cfg.segment_length, 80), dtype)
    feats = jnp.zeros((B, cfg.segment_length, 80), dtype)
    st, _ = runner(agent._fused_init(B), first, mid2, feats,
                   jnp.full((B,), 10, jnp.int32))
    jax.block_until_ready(st.tokens)
    t_h2d("g: scan(fused step)")


if __name__ == "__main__":
    main()
