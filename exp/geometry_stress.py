"""Adversarial train-step geometries on the real TPU.

Run: PYTHONPATH=.:/root/.axon_site python exp/geometry_stress.py

The Pallas kernels gate themselves by shape (VMEM budgets, Mosaic block
legality); the standard 32x1024 bench geometry exercises exactly one
configuration of every gate.  This probe compiles + runs two train steps at
corner geometries — long utterances, long targets, tiny/odd batches — and
asserts finite losses/grads.  Round-3 runs caught two real bugs the suite
could not see (kernels gate OFF on CPU): the CTC DP kernel choosing a
Mosaic-illegal batch block, and the decoder MHA kernel requesting ~50 MB of
scoped VMEM for cross-attention over a long encoder buffer.
Last run (v5e, 2026-08-18): all five geometries OK.
"""
import math
import sys

sys.path.insert(0, ".")
from simulst_tpu.config import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")
from simulst_tpu.losses.joint_ctc import JointCTCConfig, joint_ctc_loss
from simulst_tpu.models import s2t_emformer as s2t

GEOMS = [
    (12, 1024, 64),   # batch not a multiple of 8
    (2, 512, 16),     # tiny batch
    (32, 1024, 192),  # long targets (CTC S = 385)
    (16, 2048, 96),   # long utterances, mid targets
    (8, 4096, 192),   # very long utterances (the round-3 bug finder)
    (6, 384, 40),     # odd batch / short everything
]


def main():
    lcfg = JointCTCConfig()
    failed = []
    for B, T, U in GEOMS:
        cfg = s2t.S2TEmformerConfig(vocab_size=4100, ctc_layer=True,
                                    compute_dtype="bfloat16")
        model = s2t.S2TEmformerModel(cfg)
        params = model.init(jax.random.PRNGKey(0))
        feats = jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(1), (1, T, 80)), (B, T, 80))
        lengths = jnp.full((B,), T, jnp.int32).at[-1].set(max(T // 2, 64))
        tokens = jax.random.randint(jax.random.PRNGKey(2), (B, U), 4, 4100)

        @jax.jit
        def step(tc, p):
            def loss_fn(p):
                logits, extra = model.forward(
                    p, feats + tc * 1e-30, lengths, tokens,
                    rng=jax.random.PRNGKey(3), deterministic=False)
                return joint_ctc_loss(logits, extra, tokens, lcfg)[0] / (B * U)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            gsq = sum((g.astype(jnp.float32) ** 2).sum()
                      for g in jax.tree_util.tree_leaves(grads))
            return tc + loss.astype(jnp.float32) + gsq * 1e-12

        try:
            tc = step(step(jnp.zeros((), jnp.float32), params), params)
            v = float(tc)
            ok = math.isfinite(v)
            print(f"B={B} T={T} U={U}: {'OK' if ok else f'NON-FINITE {v}'}")
            if not ok:
                failed.append((B, T, U))
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"B={B} T={T} U={U}: FAILED {str(e)[:200]}")
            failed.append((B, T, U))
    if failed:
        sys.exit(f"geometry stress FAILED: {failed}")
    print("GEOMETRY STRESS OK")


if __name__ == "__main__":
    main()
