"""MMA full-loss train-step benchmark: Pallas monotonic-alignment kernel
ON vs OFF (VERDICT r4 item #3; round-3 baseline 26.5 ms vs joint-CTC 21.7).

Run on hardware: `python exp/bench_mma_train.py`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def bench(B=32, T=1024, U=64, n_iter=10, chain=8):
    jax.config.update("jax_default_prng_impl", "rbg")
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    from simulst_tpu.losses.mma_loss import MMALossConfig, mma_loss
    from simulst_tpu.models.mma import MMAConfig, MMAModel

    cfg = MMAConfig(vocab_size=4100, ctc_layer=False,
                    compute_dtype="bfloat16",
                    simul_attn_type="hard_aligned_fixed_pre_decision",
                    fixed_pre_decision_ratio=8)
    model = MMAModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    lcfg = MMALossConfig(latency_avg_weight=0.1, latency_var_weight=0.1)

    feats = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, T, 80)), (B, T, 80))
    lengths = jnp.full((B,), T, jnp.int32)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, U), 4, 4100)

    @jax.jit
    def train_step(tc, p):
        f = feats + tc * 1e-30

        def loss_fn(p):
            logits, extra = model.forward(p, f, lengths, tokens,
                                          rng=jax.random.PRNGKey(3),
                                          deterministic=False)
            loss, _ = mma_loss(logits, extra, tokens, lengths, lcfg)
            return loss / (B * U)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        from simulst_tpu.train.optim import global_sumsq
        return tc + loss.astype(jnp.float32) + global_sumsq(grads) * 1e-12

    @jax.jit
    def chained(tc, p):
        cc, _ = jax.lax.scan(lambda a, _: (train_step(a, p), None), tc,
                             None, length=chain)
        return cc

    c = jnp.zeros((), jnp.float32)
    for _ in range(2):
        c = chained(c, params)
    float(c)
    c = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        c = chained(c, params)
    float(c)
    return (time.perf_counter() - t0) / n_iter / chain * 1000.0


if __name__ == "__main__":
    kill = os.environ.get("SIMULST_NO_FUSED_MONO", "")
    label = "scan fallback" if kill else "pallas kernel"
    print(f"MMA full-loss train step ({label}): {bench():.2f} ms")
