"""Fused position-wise FFN Pallas kernel: fc1 -> act -> dropout -> fc2 -> dropout.

Profiling the 32x1024 train step showed the FFN block costing ~39% of the
step, nearly all HBM-bound: XLA must materialize the (B, T, ffn_dim) hidden
twice (forward + recompute/backward), plus u32 rng bits and bool dropout
masks of the same width.  This kernel keeps the hidden, the activation and
both dropout masks entirely in VMEM:

  * forward: one row-tile of x in, one row-tile of y out — the ONLY HBM
    traffic besides the (small) weights.
  * dropout uses the on-core PRNG (pltpu.prng_random_bits) seeded by
    (seed, tile): zero HBM traffic for masks, and the backward pass
    regenerates bit-identical masks from the same seeds.
  * backward (custom_vjp) recomputes the hidden from x (flash-attention-style
    rematerialization) and accumulates dw/db in fp32 VMEM across the grid.

Semantics matched to the plain-JAX path (nn/core.linear + dropout):
matmuls accumulate fp32 and round to the activation dtype, bias adds and the
activation run in activation dtype, dropout scales kept values by 1/keep.
The Bernoulli draw uses the TPU PRNG (threshold on u32 bits) instead of
jax.random, so a *different* (but equally valid) mask sequence is drawn than
the XLA path — gradients stay exactly consistent with the kernel's own
forward because both passes regenerate the same bits.

The reference has no equivalent (fairseq FFNs are plain nn.Linear chains,
e.g. /root/reference/codebase/models/torchaudio_models/emformer.py:344-355);
this is TPU-first engineering, not a port.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



# Tanh-form GELU (Pallas TPU lowers no erf).  gelu(u) ~ u * sigmoid(2g),
# g = sqrt(2/pi) * (u + 0.044715 u^3) — the standard "approximate" GELU
# (torch GELU(approximate='tanh'); 0.5(1+tanh g) == sigmoid(2g)).  Round-3
# history: round 2 fit Pade-style rationals u*P(u^2)/Q(u^2) for gelu and
# dgelu on the assumption that transcendentals dominate the VPU; bisecting
# the attention kernel then showed exp PIPELINES FOR FREE on this chip while
# Horner madd chains are the real wall.  Measured at the 12288x2048 LN-FFN
# kernel (one layer, fwd/bwd): rational 0.409/0.695 ms, tanh-gelu
# 0.341/0.602 ms (as fast as relu), ~1.9 ms/step across 12 layers.  Max
# error vs the exact erf form: 4.7e-4 in value / ~1.1e-3 in derivative —
# both well under bf16's 2^-8 ulp (the round-2 rationals were 1.4e-4/1.1e-4;
# the extra error is invisible at bf16 activation precision).  The backward
# shares g and sigma between f and df (df = s + 2 u s (1-s) g').
_GELU_C = np.float32(0.7978845608028654)   # sqrt(2/pi)
_GELU_A = np.float32(0.044715)


def _gelu_sigmoid(uf, exact_div: bool):
    """(g', sigmoid(2g)) for the tanh-form GELU, fp32.  Compiled kernels
    use the VPU's approximate reciprocal (~2^-14 rel err, far below bf16
    resolution); interpret mode (exact_div) divides normally — its
    reciprocal emulation is unreliable.  The exponent argument is clamped
    at 80: for u <= ~-10.9, exp(-2g) would overflow fp32 to +inf and
    correctness would hinge on reciprocal(inf); clamped, s underflows to a
    clean ~2e-35 (so gelu(u) -> -0 exactly as it should) with no effect
    anywhere |u| < 10 (the old rational clamped at |u| = 6)."""
    u2 = uf * uf
    g = _GELU_C * uf * (1.0 + _GELU_A * u2)
    gp = _GELU_C * (1.0 + 3.0 * _GELU_A * u2)
    den = 1.0 + jnp.exp(jnp.minimum(-2.0 * g, np.float32(80.0)))
    s = 1.0 / den if exact_div else pl.reciprocal(den, approx=True)
    return gp, s


def _act_pair(name: str, exact_div: bool = False):
    """(f, df) for the supported activations; f/df take and return fp32
    (the kernels keep the hidden pre-activation in fp32 to avoid cast
    passes).  gelu is the tanh form (see above, ~5e-4 of exact erf)."""
    if name == "gelu":
        def f(uf):
            _, s = _gelu_sigmoid(uf, exact_div)
            return uf * s

        def df(uf):
            gp, s = _gelu_sigmoid(uf, exact_div)
            return s + 2.0 * uf * s * (1.0 - s) * gp

        return f, df
    if name == "relu":
        return (lambda uf: jnp.maximum(uf, 0.0),
                lambda uf: (uf > 0.0).astype(jnp.float32))
    raise ValueError(f"fused_ffn: unsupported activation {name!r}")


def _keep_threshold(rate: float) -> np.uint32:
    """P(u32 < thresh) == 1 - rate (up to 2^-32)."""
    return np.uint32(min(int(round((1.0 - rate) * 2.0 ** 32)), 2 ** 32 - 1))


def _mask(shape, rate: float):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits < _keep_threshold(rate)


def _fwd_kernel(activation, act_rate, out_rate, exact_div,
                seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    f, _ = _act_pair(activation, exact_div)
    dtype = x_ref.dtype
    u = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[:].astype(jnp.float32)          # fp32 end-to-end
    h = f(u)
    if act_rate > 0.0 or out_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    if act_rate > 0.0:
        inv = np.float32(1.0 / (1.0 - act_rate))
        h = jnp.where(_mask(h.shape, act_rate), h * inv, 0.0)
    y = jnp.dot(h.astype(dtype), w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    if out_rate > 0.0:
        inv = np.float32(1.0 / (1.0 - out_rate))
        y = jnp.where(_mask(y.shape, out_rate), y * inv, 0.0)
    y_ref[:] = y.astype(dtype)


def _bwd_kernel(activation, act_rate, out_rate, exact_div,
                seed_ref, x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    f, df = _act_pair(activation, exact_div)
    i = pl.program_id(0)
    dtype = x_ref.dtype

    # recompute the forward hidden (+ bit-identical masks)
    u = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[:].astype(jnp.float32)          # fp32 end-to-end
    h = f(u)
    if act_rate > 0.0 or out_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i)
    if act_rate > 0.0:
        inv_a = np.float32(1.0 / (1.0 - act_rate))
        mask_a = _mask(h.shape, act_rate)
        h_d = jnp.where(mask_a, h * inv_a, 0.0).astype(dtype)
    else:
        mask_a = None
        h_d = h.astype(dtype)

    g = dy_ref[:]
    if out_rate > 0.0:
        inv_o = np.float32(1.0 / (1.0 - out_rate))
        # mask bits are drawn in the same order as forward: act bits first
        g = jnp.where(_mask(g.shape, out_rate),
                      g.astype(jnp.float32) * inv_o, 0.0).astype(dtype)

    # dh -> du  (contract on dim 1 == right-multiply by w^T, no transpose op)
    dh = jax.lax.dot_general(
        g, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    du = dh * df(u)
    if act_rate > 0.0:
        du = jnp.where(mask_a, du * inv_a, 0.0)
    du = du.astype(dtype)

    dx_ref[:] = jax.lax.dot_general(
        du, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)

    # fp32 weight/bias grad accumulation across the row-tile grid; the out
    # blocks have constant index maps so they live in VMEM for the whole grid
    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dw1_ref[:] += jax.lax.dot_general(
        x_ref[:], du, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[:] += du.astype(jnp.float32).sum(axis=0, keepdims=True)
    dw2_ref[:] += jax.lax.dot_general(
        h_d, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[:] += g.astype(jnp.float32).sum(axis=0, keepdims=True)


def _pad_rows(a, n_pad):
    return a if n_pad == 0 else jnp.pad(a, ((0, n_pad), (0, 0)))


def _interpret_mode(flag):
    """TPU-semantics interpreter: plain interpret=True cannot lower the
    pltpu PRNG primitives on CPU (note: its prng_random_bits are all-zero,
    so interpreted dropout keeps everything — fine for math/VJP tests)."""
    return pltpu.InterpretParams() if flag else False


def _row_tile(dtype) -> int:
    """bf16 halves every VMEM intermediate, affording a bigger row tile."""
    return 256 if dtype == jnp.bfloat16 else 128


def _fwd_call(x2, w1, b1, w2, b2, seed, activation, act_rate, out_rate,
              interpret):
    n, d = x2.shape
    hdim = w1.shape[1]
    ROW_TILE = _row_tile(x2.dtype)
    n_pad = -n % ROW_TILE
    xp = _pad_rows(x2, n_pad)
    grid = ((n + n_pad) // ROW_TILE,)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, activation, act_rate, out_rate,
                          bool(interpret)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, d), x2.dtype),
        interpret=_interpret_mode(interpret),
    )(seed, xp, w1, b1[None, :], w2, b2[None, :])
    return y[:n]


def _bwd_call(x2, w1, b1, w2, dy2, seed, activation, act_rate, out_rate,
              interpret):
    n, d = x2.shape
    hdim = w1.shape[1]
    ROW_TILE = _row_tile(x2.dtype)
    n_pad = -n % ROW_TILE
    xp = _pad_rows(x2, n_pad)
    dyp = _pad_rows(dy2, n_pad)         # zero rows -> zero grad contributions
    grid = ((n + n_pad) // ROW_TILE,)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, activation, act_rate, out_rate,
                          bool(interpret)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n + n_pad, d), x2.dtype),
            jax.ShapeDtypeStruct((d, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((hdim, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        interpret=_interpret_mode(interpret),
    )(seed, xp, w1, b1[None, :], w2, dyp)
    return dx[:n], dw1, db1[0], dw2, db2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_ffn(x, w1, b1, w2, b2, seed, activation="gelu",
              act_rate=0.0, out_rate=0.0, interpret=False):
    """y = drop(fc2(drop(act(fc1(x))))), fully fused in VMEM.

    x: (..., D); w1: (D, H); w2: (H, D); biases 1-D.  seed: (1,) int32 —
    vary per call for fresh dropout masks (ignored when both rates are 0).
    Grads flow to x/w1/b1/w2/b2; weight grads accumulate fp32.
    """
    shape = x.shape
    y = _fwd_call(x.reshape(-1, shape[-1]), w1, b1, w2, b2, seed,
                  activation, act_rate, out_rate, interpret)
    return y.reshape(shape)


def _ffn_fwd(x, w1, b1, w2, b2, seed, activation, act_rate, out_rate,
             interpret):
    y = fused_ffn(x, w1, b1, w2, b2, seed, activation, act_rate, out_rate,
                  interpret)
    # 0-sized carrier keeps b2's dtype for the cotangent cast (residuals
    # must be jax types, not dtypes)
    return y, (x, w1, b1, w2, jnp.zeros((0,), b2.dtype), seed)


def _ffn_bwd(activation, act_rate, out_rate, interpret, res, gy):
    x, w1, b1, w2, b2_proto, seed = res
    shape = x.shape
    dx, dw1, db1, dw2, db2 = _bwd_call(
        x.reshape(-1, shape[-1]), w1, b1, w2, gy.reshape(-1, shape[-1]),
        seed, activation, act_rate, out_rate, interpret)
    return (dx.reshape(shape), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2_proto.dtype),
            np.zeros(seed.shape, jax.dtypes.float0))


fused_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def ffn_reference(x, w1, b1, w2, b2, rng_a, rng_b, activation="gelu",
                  act_rate=0.0, out_rate=0.0):
    """Plain-XLA twin (jax.random dropout) — the pre-kernel formulation."""
    from simulst_tpu.nn.core import ACTIVATIONS, dropout
    h = ACTIVATIONS[activation](x @ w1 + b1)
    h = dropout(rng_a, h, act_rate, act_rate == 0.0)
    y = h @ w2 + b2
    return dropout(rng_b, y, out_rate, out_rate == 0.0)


# ---------------------------------------------------------------------------
# LN -> FFN -> (+x) fully fused (the Emformer pos_ff block,
# emformer.py::_pos_ff + its residual): folds the pre-LayerNorm and the
# residual add into the same VMEM tile, removing two (B, T, D) HBM round
# trips and their separate fusion launches per layer, fwd AND bwd.
# ---------------------------------------------------------------------------

_LN_EPS = np.float32(1e-5)


def _ln_rows(xf, g_f, b_f):
    """Row-wise LayerNorm in fp32 (matches nn/core.layer_norm: stats in
    fp32, eps inside rsqrt).  Returns (normed, xhat, inv_sigma)."""
    mu = xf.mean(axis=1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = xc * inv
    return xhat * g_f + b_f, xhat, inv


def _ln_ffn_fwd_kernel(activation, act_rate, out_rate, exact_div,
                       seed_ref, x_ref, g_ref, be_ref, w1_ref, b1_ref,
                       w2_ref, b2_ref, y_ref):
    f, _ = _act_pair(activation, exact_div)
    dtype = x_ref.dtype
    xf = x_ref[:].astype(jnp.float32)
    normed, _, _ = _ln_rows(xf, g_ref[:].astype(jnp.float32),
                            be_ref[:].astype(jnp.float32))
    xin = normed.astype(dtype)
    u = jnp.dot(xin, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[:].astype(jnp.float32)
    h = f(u)
    if act_rate > 0.0 or out_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    if act_rate > 0.0:
        inv = np.float32(1.0 / (1.0 - act_rate))
        h = jnp.where(_mask(h.shape, act_rate), h * inv, 0.0)
    y = jnp.dot(h.astype(dtype), w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    if out_rate > 0.0:
        inv = np.float32(1.0 / (1.0 - out_rate))
        y = jnp.where(_mask(y.shape, out_rate), y * inv, 0.0)
    y_ref[:] = (y + xf).astype(dtype)          # residual in fp32


def _ln_ffn_bwd_kernel(activation, act_rate, out_rate, exact_div,
                       seed_ref, x_ref, g_ref, be_ref, w1_ref, b1_ref,
                       w2_ref, dy_ref,
                       dx_ref, dg_ref, dbe_ref, dw1_ref, db1_ref, dw2_ref,
                       db2_ref):
    f, df = _act_pair(activation, exact_div)
    i = pl.program_id(0)
    dtype = x_ref.dtype

    g_f = g_ref[:].astype(jnp.float32)
    xf = x_ref[:].astype(jnp.float32)
    normed, xhat, inv = _ln_rows(xf, g_f, be_ref[:].astype(jnp.float32))
    xin = normed.astype(dtype)
    u = jnp.dot(xin, w1_ref[:], preferred_element_type=jnp.float32)
    u = u + b1_ref[:].astype(jnp.float32)
    h = f(u)
    if act_rate > 0.0 or out_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i)
    if act_rate > 0.0:
        inv_a = np.float32(1.0 / (1.0 - act_rate))
        mask_a = _mask(h.shape, act_rate)
        h_d = jnp.where(mask_a, h * inv_a, 0.0).astype(dtype)
    else:
        mask_a = None
        h_d = h.astype(dtype)

    gy = dy_ref[:]
    g = gy
    if out_rate > 0.0:
        inv_o = np.float32(1.0 / (1.0 - out_rate))
        g = jnp.where(_mask(g.shape, out_rate),
                      g.astype(jnp.float32) * inv_o, 0.0).astype(dtype)

    dh = jax.lax.dot_general(
        g, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    du = dh * df(u)
    if act_rate > 0.0:
        du = jnp.where(mask_a, du * inv_a, 0.0)
    du = du.astype(dtype)

    # grad wrt the LN output, then through LN to x; + residual passthrough
    dnormed = jax.lax.dot_general(
        du, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    gg = dnormed * g_f
    m1 = gg.mean(axis=1, keepdims=True)
    m2 = (gg * xhat).mean(axis=1, keepdims=True)
    dx = inv * (gg - m1 - xhat * m2)
    dx_ref[:] = (dx + gy.astype(jnp.float32)).astype(dtype)

    @pl.when(i == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dg_ref[:] += (dnormed * xhat).sum(axis=0, keepdims=True)
    dbe_ref[:] += dnormed.sum(axis=0, keepdims=True)
    dw1_ref[:] += jax.lax.dot_general(
        xin, du, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[:] += du.astype(jnp.float32).sum(axis=0, keepdims=True)
    dw2_ref[:] += jax.lax.dot_general(
        h_d, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[:] += g.astype(jnp.float32).sum(axis=0, keepdims=True)


def _ln_ffn_fwd_call(x2, g, be, w1, b1, w2, b2, seed, activation, act_rate,
                     out_rate, interpret):
    n, d = x2.shape
    hdim = w1.shape[1]
    ROW_TILE = _row_tile(x2.dtype)
    n_pad = -n % ROW_TILE
    xp = _pad_rows(x2, n_pad)
    grid = ((n + n_pad) // ROW_TILE,)
    y = pl.pallas_call(
        functools.partial(_ln_ffn_fwd_kernel, activation, act_rate, out_rate,
                          bool(interpret)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, d), x2.dtype),
        interpret=_interpret_mode(interpret),
    )(seed, xp, g[None, :], be[None, :], w1, b1[None, :], w2, b2[None, :])
    return y[:n]


def _ln_ffn_bwd_call(x2, g, be, w1, b1, w2, dy2, seed, activation, act_rate,
                     out_rate, interpret):
    n, d = x2.shape
    hdim = w1.shape[1]
    ROW_TILE = _row_tile(x2.dtype)
    n_pad = -n % ROW_TILE
    xp = _pad_rows(x2, n_pad)
    dyp = _pad_rows(dy2, n_pad)
    grid = ((n + n_pad) // ROW_TILE,)
    dx, dg, dbe, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_ln_ffn_bwd_kernel, activation, act_rate, out_rate,
                          bool(interpret)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n + n_pad, d), x2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((hdim, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        interpret=_interpret_mode(interpret),
    )(seed, xp, g[None, :], be[None, :], w1, b1[None, :], w2, dyp)
    return dx[:n], dg[0], dbe[0], dw1, db1[0], dw2, db2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_ln_ffn_res(x, ln_g, ln_b, w1, b1, w2, b2, seed, activation="gelu",
                     act_rate=0.0, out_rate=0.0, interpret=False):
    """y = x + drop(fc2(drop(act(fc1(LN(x)))))) in one kernel per pass.

    The Emformer pos_ff block with its pre-LN and residual.  Grads flow to
    x / ln scale+bias / w1 / b1 / w2 / b2; weight & LN grads accumulate fp32.
    """
    shape = x.shape
    y = _ln_ffn_fwd_call(x.reshape(-1, shape[-1]), ln_g, ln_b, w1, b1, w2,
                         b2, seed, activation, act_rate, out_rate, interpret)
    return y.reshape(shape)


def _ln_ffn_vjp_fwd(x, ln_g, ln_b, w1, b1, w2, b2, seed, activation,
                    act_rate, out_rate, interpret):
    y = fused_ln_ffn_res(x, ln_g, ln_b, w1, b1, w2, b2, seed, activation,
                         act_rate, out_rate, interpret)
    return y, (x, ln_g, ln_b, w1, b1, w2, jnp.zeros((0,), b2.dtype), seed)


def _ln_ffn_vjp_bwd(activation, act_rate, out_rate, interpret, res, gy):
    x, ln_g, ln_b, w1, b1, w2, b2_proto, seed = res
    shape = x.shape
    dx, dg, dbe, dw1, db1, dw2, db2 = _ln_ffn_bwd_call(
        x.reshape(-1, shape[-1]), ln_g, ln_b, w1, b1, w2,
        gy.reshape(-1, shape[-1]), seed, activation, act_rate, out_rate,
        interpret)
    return (dx.reshape(shape), dg.astype(ln_g.dtype), dbe.astype(ln_b.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2_proto.dtype),
            np.zeros(seed.shape, jax.dtypes.float0))


fused_ln_ffn_res.defvjp(_ln_ffn_vjp_fwd, _ln_ffn_vjp_bwd)


def ln_ffn_res_reference(x, ln_g, ln_b, w1, b1, w2, b2, rng_a, rng_b,
                         activation="gelu", act_rate=0.0, out_rate=0.0):
    """Plain-XLA twin of fused_ln_ffn_res."""
    from simulst_tpu.nn.core import layer_norm
    y = layer_norm({"scale": ln_g, "bias": ln_b}, x)
    return x + ffn_reference(y, w1, b1, w2, b2, rng_a, rng_b, activation,
                             act_rate, out_rate)


def ffn_pallas_supported(x, d: int, hdim: int) -> bool:
    """Use the kernel when on an accelerator with MXU-friendly dims and
    enough rows to amortize the weight residency."""
    if os.environ.get("SIMULST_NO_FUSED_FFN"):
        return False
    if jax.default_backend() == "cpu":
        return False
    n = 1
    for s in x.shape[:-1]:
        n *= s
    return d % 128 == 0 and hdim % 128 == 0 and n >= 1024


def seed_from_rng(rng) -> jnp.ndarray:
    """(1,) int32 dropout seed derived from a JAX PRNG key (any impl)."""
    return jax.random.bits(rng, (1,), jnp.uint32).astype(jnp.int32)
