"""Refresh the device-time budget of the Bx1024 train step.

Runs the SAME train step bench.py times (joint CTC loss, rbg dropout keys,
Pallas kernels on) under the JAX profiler, then aggregates the device plane's
op events into a per-step budget by kernel family: Pallas custom-calls,
plain matmul/conv fusions, elementwise fusions, copies/transposes, reduces,
and the rest.  The round-3 budget in docs/perf.md described the 27.3 ms
step; this keeps the table honest for whatever the step costs now.

Usage (TPU):  python exp/profile_train.py [B] [model]   # default B=32,
model in {joint_ctc, mma} — mma profiles the full-latency-loss MMA step
(VERDICT r5: find what the 6 monotonic cross-attentions still cost).
"""
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from simulst_tpu.config import enable_compile_cache

N_STEPS = 10


def build_step(B, kind="joint_ctc"):
    jax.config.update("jax_default_prng_impl", "rbg")
    from simulst_tpu.losses.joint_ctc import JointCTCConfig, joint_ctc_loss
    from simulst_tpu.models import s2t_emformer as s2t
    from simulst_tpu.train.optim import global_sumsq

    T, U = 1024, 64
    if kind == "mma":
        from simulst_tpu.losses.mma_loss import MMALossConfig, mma_loss
        from simulst_tpu.models.mma import MMAConfig, MMAModel
        cfg = MMAConfig(vocab_size=4100, ctc_layer=False,
                        compute_dtype="bfloat16",
                        simul_attn_type="hard_aligned_fixed_pre_decision",
                        fixed_pre_decision_ratio=8)
        model = MMAModel(cfg)
        mcfg_loss = MMALossConfig(latency_avg_weight=0.1,
                                  latency_var_weight=0.1)

        def compute(p, f, lengths, tokens):
            logits, extra = model.forward(p, f, lengths, tokens,
                                          rng=jax.random.PRNGKey(3),
                                          deterministic=False)
            loss, _ = mma_loss(logits, extra, tokens, lengths, mcfg_loss)
            return loss / (B * U)
    else:
        cfg = s2t.S2TEmformerConfig(vocab_size=4100, ctc_layer=True,
                                    compute_dtype="bfloat16")
        model = s2t.S2TEmformerModel(cfg)
        lcfg = JointCTCConfig()

        def compute(p, f, lengths, tokens):
            logits, extra = model.forward(p, f, lengths, tokens,
                                          rng=jax.random.PRNGKey(3),
                                          deterministic=False)
            loss, _ = joint_ctc_loss(logits, extra, tokens, lcfg)
            return loss / (B * U)

    params = model.init(jax.random.PRNGKey(0))
    feats = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, T, 80)), (B, T, 80))
    lengths = jnp.full((B,), T, jnp.int32)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, U), 4, 4100)

    @jax.jit
    def train_step(tc, p):
        f = feats + tc * 1e-30
        loss, grads = jax.value_and_grad(
            lambda p_: compute(p_, f, lengths, tokens))(p)
        return tc + loss.astype(jnp.float32) + global_sumsq(grads) * 1e-12

    @jax.jit
    def chain(tc, p):
        cc, _ = jax.lax.scan(lambda a, _: (train_step(a, p), None), tc,
                             None, length=N_STEPS)
        return cc

    return chain, params


import re

# HLO text looks like "%fusion.3540 = bf16[...]{...:T(8,128)(2,1)} fusion(...)";
# the opcode is the token between the result shape and the operand list.
# Variable names lie (Pallas backward calls are named %transpose_jvp___ but
# ARE custom-calls), so classification must key on the opcode, never the
# value name.  The shape's layout annotation contains parens (T(8,128)), so
# anchor on the shape's closing '}' (or ')' for tuple shapes) instead of
# scanning forward from '='.


_OPCODE_RE = re.compile(r"[})\]]\s+([a-z][a-z0-9-]+)\(")


def opcode(name):
    m = _OPCODE_RE.search(name)
    return m.group(1) if m else name.split(".")[0].lstrip("%")


def classify(name):
    op = opcode(name)
    if op in ("custom-call",):
        var = name.split(" ", 1)[0].lstrip("%")
        if var.startswith("transpose_jvp"):
            return "pallas kernels (bwd)"
        if var.startswith("jvp"):
            return "pallas kernels (fwd)"
        return "pallas kernels (other)"
    if op in ("all-reduce", "reduce-scatter", "all-gather", "collective-permute"):
        return "cross-replica collectives"
    if op in ("copy", "copy-start", "copy-done", "bitcast", "transpose"):
        return "copies/transposes"
    if op in ("convolution",):
        return "convolutions"
    if op in ("dot",):
        return "bare matmuls"
    if op in ("dynamic-update-slice", "dynamic-slice", "scatter", "gather"):
        return "slice/update/gather"
    if op in ("reduce", "reduce-window"):
        return "bare reduces"
    if op == "fusion":
        return "fusions (matmul+elementwise)"
    return f"other ({op})"


def is_parent(name):
    """Control-flow / module events whose duration includes their children
    (the XLA Ops line flattens the nesting onto one line)."""
    v = name.split(" ", 1)[0].lstrip("%")
    return (v.startswith("while") or v.startswith("jit_")
            or v.startswith("body") or v.startswith("condition")
            or opcode(name) in ("while", "conditional", "call"))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    kind = sys.argv[2] if len(sys.argv) > 2 else "joint_ctc"
    enable_compile_cache()
    chain, params = build_step(B, kind)
    tc = jnp.zeros(())
    tc = chain(tc, params)  # compile + warm
    jax.block_until_ready(tc)

    trace_dir = "/tmp/train_trace"
    with jax.profiler.trace(trace_dir):
        tc = chain(tc, params)
        jax.block_until_ready(tc)

    # newest xplane file under the trace dir
    paths = []
    for root, _, files in os.walk(trace_dir):
        paths += [os.path.join(root, f) for f in files
                  if f.endswith(".xplane.pb")]
    path = max(paths, key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_file(path)
    device_planes = [p for p in data.planes
                     if p.name.startswith("/device:")]
    assert device_planes, [p.name for p in data.planes]

    # Leaf ops only, from the synchronous 'XLA Ops' line.  The 'Async XLA
    # Ops' line holds copy-start in-flight windows that OVERLAP compute —
    # summing them would charge prefetches as if they were serial time, so
    # they are reported separately as overlap, not added to the budget.
    per_op = defaultdict(float)
    wall_ms = 0.0
    async_ms = 0.0
    for plane in device_planes:
        for line in plane.lines:
            if line.name == "XLA Modules":
                wall_ms += sum(ev.duration_ns for ev in line.events) / 1e6
            elif line.name == "XLA Ops":
                for ev in line.events:
                    if not is_parent(ev.name):
                        per_op[ev.name] += ev.duration_ns / 1e6
            elif line.name == "Async XLA Ops":
                async_ms += sum(ev.duration_ns for ev in line.events) / 1e6

    total = sum(per_op.values()) / N_STEPS
    cats = defaultdict(float)
    for name, ms in per_op.items():
        cats[classify(name)] += ms / N_STEPS

    print(f"== B={B} train step: {wall_ms / N_STEPS:.3f} ms module wall, "
          f"{total:.3f} ms summed leaf ops, "
          f"{async_ms / N_STEPS:.3f} ms async-copy in-flight (overlapped) ==")
    print("-- category budget (ms/step, leaf ops) --")
    for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:7.3f}  {100 * ms / total:5.1f}%  {c}")
    print("-- top 30 ops (ms/step) --")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms / N_STEPS:7.3f}  {name[:130]}")


if __name__ == "__main__":
    main()
