"""Pallas DP kernels for the monotonic expected-alignment recursion.

The recursion (reference utils/monotonic_attention.py:12-76)

    alpha_u = clip(prefix_u * cumsum(alpha_{u-1} / denom_u, axis=-1), 0, 1)

is the MMA training hot loop.  As a `lax.scan` over the target axis it pays
time-major layout transposes of the (BH, U, S) panels plus per-step scan
housekeeping (~0.8 ms/decoder-layer at the 32x1024 geometry, VERDICT r3
weak #3) — the same cost family the CTC alpha/beta Pallas kernels removed
(ops/ctc.py).  Here the panels stay in their natural (N, U, S) layout:

  * the arrays are viewed as (N, U*S) so every block is a Mosaic-legal
    (blk, S) tile (S multiple of 128 enforced by the gate; leading dim
    unconstrained) — no transposes anywhere;
  * grid = (N/blk, U) iterates U sequentially with the running alpha (and,
    in the backward, the carried cotangent) in a VMEM scratch accumulator;
  * the inner cumsum / reverse-cumsum run on the MXU as dot products with
    triangular one matrices (loaded once per grid visit), which also makes
    the op order IDENTICAL between the kernel and the lax.scan fallback —
    the two paths are bit-exact (tested in interpret mode and on hardware).

The backward is a hand-derived reverse recursion (custom VJP in
ops/monotonic.py): with c_u = cumsum(alpha_{u-1}/denom_u) and the clip gate
g_u = d_alpha_u * 1[0 < prefix_u * c_u < 1],

    d_prefix_u     = g_u * c_u
    r_u            = reverse_cumsum(g_u * prefix_u)
    d_denom_u      = -r_u * alpha_{u-1} / denom_u^2
    d_alpha_{u-1} += r_u / denom_u

(boundary choice: the gate is hard zero AT saturation; jax's clip autodiff
assigns 0.5 exactly at the boundary, a measure-zero event for learnable
p_choose and irrelevant for the non-learnable waitk one-hot).

Gated to TPU + (S % 128 == 0) + VMEM fit; SIMULST_NO_FUSED_MONO kills it.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def monotonic_block(n: int, u: int, s: int, n_io: int) -> int:
    """Largest Mosaic-legal leading-dim block for the (N, U, S) recursion
    kernels, or 0 to run the lax.scan fallback.

    n_io: number of (blk, S) panels streamed per grid step (3 fwd, 6 bwd);
    each is double-buffered.  The triangular matmul constants add S*S
    floats each (2 in the backward), the carry scratch blk*S."""
    if os.environ.get("SIMULST_NO_FUSED_MONO"):
        return 0
    if jax.default_backend() != "tpu":
        return 0
    if s % 128 != 0 or n <= 0 or u <= 0:
        return 0
    cands = [blk for blk in (512, 256, 128, 64, 32, 16, 8) if n % blk == 0]
    if n not in cands:
        cands.append(n)                   # full leading dim is always legal
    n_tri = 1 if n_io == 3 else 2
    for blk in cands:
        vmem = (n_io * blk * s * 4) * 2 + n_tri * s * s * 4 + blk * s * 4
        if vmem <= 10 * 2 ** 20:
            return blk
    return 0


def _tri_cumsum(s: int) -> jnp.ndarray:
    """(S, S) fp32 T with T[k, j] = 1[k <= j]: x @ T = cumsum(x, axis=-1)."""
    k = jnp.arange(s)
    return (k[:, None] <= k[None, :]).astype(jnp.float32)


def _tri_revsum(s: int) -> jnp.ndarray:
    """(S, S) fp32 M with M[j, k] = 1[j >= k]: x @ M = reverse cumsum."""
    k = jnp.arange(s)
    return (k[:, None] >= k[None, :]).astype(jnp.float32)


def _dot(a, t):
    return jax.lax.dot_general(a, t, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _alpha0(blk: int, s: int) -> jnp.ndarray:
    iota = jax.lax.broadcasted_iota(jnp.int32, (blk, s), 1)
    return jnp.where(iota == 0, 1.0, 0.0).astype(jnp.float32)


def _step_fwd(aprev, prefix, denom, tri):
    c = _dot(aprev / denom, tri)
    return jnp.minimum(jnp.maximum(prefix * c, 0.0), 1.0)


def _step_bwd(g_in, carry, alpha_prev, prefix, denom, tri, trir):
    g = g_in + carry
    c = _dot(alpha_prev / denom, tri)
    pre = prefix * c
    g = jnp.where((pre > 0.0) & (pre < 1.0), g, 0.0)
    d_prefix = g * c
    r = _dot(g * prefix, trir)
    d_denom = -(r * alpha_prev) / (denom * denom)
    return d_prefix, d_denom, r / denom


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(s, blk, prefix_ref, denom_ref, tri_ref, out_ref, aprev_ref):
    from jax.experimental import pallas as pl
    u = pl.program_id(1)

    @pl.when(u == 0)
    def _():
        aprev_ref[:] = _alpha0(blk, s)

    alpha = _step_fwd(aprev_ref[:], prefix_ref[:], denom_ref[:], tri_ref[:])
    out_ref[:] = alpha
    aprev_ref[:] = alpha


def _bwd_kernel(s, blk, n_u, g_ref, prefix_ref, denom_ref, aprev_in_ref,
                tri_ref, trir_ref, dprefix_ref, ddenom_ref, carry_ref):
    from jax.experimental import pallas as pl
    k = pl.program_id(1)                      # processes u = n_u - 1 - k

    @pl.when(k == 0)
    def _():
        carry_ref[:] = jnp.zeros((blk, s), jnp.float32)

    u = n_u - 1 - k
    alpha_prev = jnp.where(u == 0, _alpha0(blk, s), aprev_in_ref[:])
    d_prefix, d_denom, carry = _step_bwd(
        g_ref[:], carry_ref[:], alpha_prev, prefix_ref[:], denom_ref[:],
        tri_ref[:], trir_ref[:])
    dprefix_ref[:] = d_prefix
    ddenom_ref[:] = d_denom
    carry_ref[:] = carry


def alignment_fwd_pallas(prefix, denom, interpret: bool = False):
    """(N, U, S) fp32 prefix/denom -> (N, U, S) alphas."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n, u, s = prefix.shape
    blk = n if interpret else monotonic_block(n, u, s, 3)
    assert blk > 0
    row = pl.BlockSpec((blk, s), lambda i, k: (i, k))
    tri_spec = pl.BlockSpec((s, s), lambda i, k: (0, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, s, blk),
        grid=(n // blk, u),
        in_specs=[row, row, tri_spec],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((n, u * s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((blk, s), jnp.float32)],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(prefix.reshape(n, u * s), denom.reshape(n, u * s), _tri_cumsum(s))
    return out.reshape(n, u, s)


def alignment_bwd_pallas(prefix, denom, alphas, g, interpret: bool = False):
    """Reverse recursion: returns (d_prefix, d_denom), each (N, U, S)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n, u, s = prefix.shape
    blk = n if interpret else monotonic_block(n, u, s, 6)
    assert blk > 0
    rev = pl.BlockSpec((blk, s), lambda i, k: (i, u - 1 - k))
    prev = pl.BlockSpec((blk, s), lambda i, k: (i, jnp.maximum(u - 2 - k, 0)))
    tri_spec = pl.BlockSpec((s, s), lambda i, k: (0, 0))
    d_prefix, d_denom = pl.pallas_call(
        functools.partial(_bwd_kernel, s, blk, u),
        grid=(n // blk, u),
        in_specs=[rev, rev, rev, prev, tri_spec, tri_spec],
        out_specs=[rev, rev],
        out_shape=[jax.ShapeDtypeStruct((n, u * s), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((blk, s), jnp.float32)],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(g.reshape(n, u * s), prefix.reshape(n, u * s), denom.reshape(n, u * s),
      alphas.reshape(n, u * s), _tri_cumsum(s), _tri_revsum(s))
    return d_prefix.reshape(n, u, s), d_denom.reshape(n, u, s)


# ---------------------------------------------------------------------------
# lax.scan fallbacks — identical op order (same _step_fwd/_step_bwd bodies,
# same MXU cumsum form), so kernel == fallback holds bitwise
# ---------------------------------------------------------------------------

def alignment_fwd_scan(prefix, denom):
    n, u, s = prefix.shape
    tri = _tri_cumsum(s)

    def step(aprev, inp):
        pref_u, den_u = inp
        alpha = _step_fwd(aprev, pref_u, den_u, tri)
        return alpha, alpha

    a0 = _alpha0(n, s)
    xs = (jnp.moveaxis(prefix, 1, 0), jnp.moveaxis(denom, 1, 0))
    _, alphas = jax.lax.scan(step, a0, xs)
    return jnp.moveaxis(alphas, 0, 1)


def alignment_bwd_scan(prefix, denom, alphas, g):
    n, u, s = prefix.shape
    tri = _tri_cumsum(s)
    trir = _tri_revsum(s)
    alpha_prev = jnp.concatenate(
        [_alpha0(n, s)[:, None], alphas[:, :-1]], axis=1)

    def step(carry, inp):
        g_u, pref_u, den_u, aprev_u = inp
        d_prefix, d_denom, carry = _step_bwd(g_u, carry, aprev_u, pref_u,
                                             den_u, tri, trir)
        return carry, (d_prefix, d_denom)

    xs = (jnp.moveaxis(g, 1, 0), jnp.moveaxis(prefix, 1, 0),
          jnp.moveaxis(denom, 1, 0), jnp.moveaxis(alpha_prev, 1, 0))
    _, (d_prefix, d_denom) = jax.lax.scan(
        step, jnp.zeros((n, s), jnp.float32), xs, reverse=True)
    return jnp.moveaxis(d_prefix, 0, 1), jnp.moveaxis(d_denom, 0, 1)
