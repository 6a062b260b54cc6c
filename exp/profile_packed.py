"""Packed-vs-padded train step device budget (round 5).

Same opcode bucketing as profile_train; prints the two budgets side by
side to localize where sequence packing's 7% slot saving goes.
Run on the chip: python -u exp/profile_packed.py
"""
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from exp.profile_train import classify, is_parent
from simulst_tpu.config import enable_compile_cache

N_STEPS = 10


def build(packed):
    jax.config.update("jax_default_prng_impl", "rbg")
    import bench

    @jax.jit
    def chain(tc, p):
        return tc

    # reuse bench's builder by timing path: rebuild the step here
    from simulst_tpu.losses.joint_ctc import JointCTCConfig, joint_ctc_loss
    from simulst_tpu.models import s2t_emformer as s2t
    from simulst_tpu.train.optim import global_sumsq
    from simulst_tpu.nn import conv as cnv
    from simulst_tpu.train import packing

    B, T, U = 32, 1024, 64
    cfg = s2t.S2TEmformerConfig(vocab_size=4100, ctc_layer=True,
                                compute_dtype="bfloat16")
    model = s2t.S2TEmformerModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    feats = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, T, 80)), (B, T, 80))
    lens_np = np.linspace(0.7 * T, T, B).astype(np.int32)
    lengths = jnp.asarray(lens_np)
    feats = jnp.where(jnp.arange(T)[None, :, None] < lengths[:, None, None],
                      feats, 0.0)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, U), 4, 4100)
    lcfg = JointCTCConfig()
    plan = None
    if packed:
        l4 = np.asarray(cnv.subsampler_apply(
            params["encoder"]["subsample"], feats, lengths)[1])
        ecfg = cfg.emformer
        n0 = (T // cfg.stride) // ecfg.segment
        n_p = packing.choose_row_segments(
            l4, ecfg.segment, packing.usable_row_segments(ecfg, n0, 4 * n0))
        plan = packing.pack_plan(l4, T // cfg.stride, ecfg.segment,
                                 ecfg.right_context, row_segs=n_p)
        plan = packing.PackPlan(*[jnp.asarray(a) for a in plan])
        print("packed rows:", plan.frame_gather.shape, "n_p:", n_p)

    @jax.jit
    def train_step(tc, p):
        f = feats + tc * 1e-30

        def loss_fn(p):
            logits, extra = model.forward(p, f, lengths, tokens,
                                          rng=jax.random.PRNGKey(3),
                                          deterministic=False,
                                          pack_plan=plan)
            loss, _ = joint_ctc_loss(logits, extra, tokens, lcfg)
            return loss / (B * U)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        return tc + loss.astype(jnp.float32) + global_sumsq(grads) * 1e-12

    @jax.jit
    def chain(tc, p):
        cc, _ = jax.lax.scan(lambda a, _: (train_step(a, p), None), tc,
                             None, length=N_STEPS)
        return cc
    return chain, params


def budget(packed):
    chain, params = build(packed)
    tc = jnp.zeros(())
    tc = chain(tc, params)
    jax.block_until_ready(tc)
    trace_dir = f"/tmp/pk_trace_{int(packed)}"
    with jax.profiler.trace(trace_dir):
        tc = chain(tc, params)
        jax.block_until_ready(tc)
    paths = []
    for root, _, files in os.walk(trace_dir):
        paths += [os.path.join(root, f) for f in files
                  if f.endswith(".xplane.pb")]
    data = jax.profiler.ProfileData.from_file(max(paths, key=os.path.getmtime))
    per = defaultdict(float)
    wall = 0.0
    for plane in data.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                wall += sum(ev.duration_ns for ev in line.events) / 1e6
            elif line.name == "XLA Ops":
                for ev in line.events:
                    if not is_parent(ev.name):
                        per[classify(ev.name)] += ev.duration_ns / 1e6
    return wall / N_STEPS, {k: v / N_STEPS for k, v in per.items()}


def main():
    enable_compile_cache()
    w0, b0 = budget(False)
    w1, b1 = budget(True)
    print(f"\n{'category':34s} {'padded':>9s} {'packed':>9s} {'delta':>8s}")
    keys = sorted(set(b0) | set(b1),
                  key=lambda k: -(b1.get(k, 0) - b0.get(k, 0)))
    for k in keys:
        print(f"{k:34s} {b0.get(k, 0.0):9.3f} {b1.get(k, 0.0):9.3f} "
              f"{b1.get(k, 0.0) - b0.get(k, 0.0):+8.3f}")
    print(f"{'TOTAL (module wall)':34s} {w0:9.3f} {w1:9.3f} {w1 - w0:+8.3f}")


if __name__ == "__main__":
    main()
