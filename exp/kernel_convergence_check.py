"""Kernels-on vs kernels-off training trajectory on the real TPU.

Run: PYTHONPATH=.:/root/.axon_site python exp/kernel_convergence_check.py
Last result (v5e, 2026-08-16): max rel loss deviation 0.0092 over 30 steps,
both trajectories converging 49.06 -> 9.92 — CONVERGENCE PARITY OK.

Runs N Adam steps of the s2t model (joint CTC+CE) from the same init on the
same synthetic batch, once with the fused Pallas kernels and once with the
XLA paths, both bf16.  The dropout mask STREAMS differ by design (TPU PRNG
vs jax.random), so we run DETERMINISTIC (no dropout) — any divergence beyond
bf16 noise then indicates a kernel gradient bug.
"""
import os
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
import jax.numpy as jnp
import optax

from simulst_tpu.losses.joint_ctc import JointCTCConfig, joint_ctc_loss
from simulst_tpu.models import s2t_emformer as s2t

B, T, U = 8, 1024, 24
cfg = s2t.S2TEmformerConfig(vocab_size=128, ctc_layer=True,
                            compute_dtype="bfloat16")
model = s2t.S2TEmformerModel(cfg)
feats = jax.random.normal(jax.random.PRNGKey(1), (B, T, 80))
lengths = jnp.full((B,), T, jnp.int32)
tokens = jax.random.randint(jax.random.PRNGKey(2), (B, U), 4, 128)
lcfg = JointCTCConfig()
opt = optax.adam(1e-3)

def run(n_steps=30):
    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, extra = model.forward(p, feats, lengths, tokens)
            return joint_ctc_loss(logits, extra, tokens, lcfg)[0] / (B * U)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return losses

os.environ["SIMULST_NO_FUSED_FFN"] = "1"
os.environ["SIMULST_NO_FUSED_ATTN"] = "1"
# softmax-clamp detection rail (ADVICE r3): record max pre-clamp attention
# scores during the XLA run; the fused kernels use the identical clamp form
# and the trajectory-parity assert below certifies them against this run
from simulst_tpu.nn import emformer as emf_mod
score_log = emf_mod.enable_score_monitor()
base = run()
emf_mod.disable_score_monitor()
del os.environ["SIMULST_NO_FUSED_FFN"]
del os.environ["SIMULST_NO_FUSED_ATTN"]
fused = run()

max_score = max(score_log) if score_log else float("nan")
print(f"max pre-clamp attention score over training: {max_score:.2f} "
      f"(static clamp {emf_mod.SCORE_CLAMP})")
assert score_log and max_score < emf_mod.SCORE_CLAMP / 2.0, (
    f"attention scores ({max_score}) approaching the softmax clamp "
    f"({emf_mod.SCORE_CLAMP}) — softmax would flatten silently; mitigate "
    "with qk-layernorm or a tanh logit soft-cap (see nn/emformer.py)")

print("step  xla-loss   fused-loss  |d|")
for i in (0, 4, 9, 19, 29):
    print(f"{i:4d}  {base[i]:9.5f}  {fused[i]:9.5f}  {abs(base[i]-fused[i]):.5f}")
rel = [abs(a - b) / max(abs(a), 1e-6) for a, b in zip(base, fused)]
print("max rel loss deviation over 30 steps:", max(rel))
assert base[-1] < base[0] * 0.8, "training not converging (xla)"
assert fused[-1] < fused[0] * 0.8, "training not converging (fused)"
assert max(rel) < 0.03, "fused-kernel trajectory diverged from XLA"
print("CONVERGENCE PARITY OK")
