"""Pallas TPU kernel for the CIF integrate-and-fire matmul.

The jnp formulation (ops/cif.py) materializes the (B, S, T) portion tensor in
HBM before the einsum; this kernel computes each portion TILE on the fly in
VMEM (VPU: two clips per element) and feeds it straight to the MXU, so the
only HBM traffic is x in / out+delays out.  Backward falls back to the XLA
einsum formulation via custom_vjp (training precision path).

Grid: (B, ceil(T / T_TILE)); each program integrates all S source frames
into one T_TILE-wide slab of output buckets.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 128


def _kernel(beta: float, csum_ref, cprev_ref, x_ref, out_ref, delay_ref):
    t0 = pl.program_id(1) * T_TILE
    s = x_ref.shape[1]
    k = (jax.lax.broadcasted_iota(jnp.int32, (1, T_TILE), 1) + t0
         ).astype(jnp.float32)
    lo = k * beta                                     # (1, T_TILE)
    hi = lo + beta
    cs = csum_ref[0, 0][:, None]                      # (S, 1)
    cp = cprev_ref[0, 0][:, None]
    portion = jnp.clip(jnp.minimum(cs, hi) - jnp.maximum(cp, lo), 0.0, None)
    out_ref[0] = jax.lax.dot_general(
        portion, x_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)           # (T_TILE, C)
    pos = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0).astype(jnp.float32) + 1.0
    delay_ref[0, 0] = (portion * pos).sum(axis=0) / beta


def _cif_matmul_jnp(x, alpha, beta: float, t: int):
    """Reference jnp formulation (identical math; used for backward)."""
    csum = jnp.cumsum(alpha, axis=1)
    cprev = csum - alpha
    k = jnp.arange(t, dtype=jnp.float32)
    lo = k[None, None, :] * beta
    hi = lo + beta
    portion = jnp.clip(jnp.minimum(csum[:, :, None], hi)
                       - jnp.maximum(cprev[:, :, None], lo), 0.0, None)
    out = jnp.einsum("bst,bsc->btc", portion, x.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    pos = jnp.arange(x.shape[1], dtype=jnp.float32) + 1.0
    delays = jnp.einsum("bst,s->bt", portion, pos,
                        precision=jax.lax.Precision.HIGHEST) / beta
    return out, delays


def _forward_pallas(x, alpha, beta: float, t: int):
    b, s, c = x.shape
    t_pad = -(-t // T_TILE) * T_TILE
    csum = jnp.cumsum(alpha.astype(jnp.float32), axis=1)
    cprev = (csum - alpha)[:, None, :]                # (B, 1, S)
    csum = csum[:, None, :]
    grid = (b, t_pad // T_TILE)
    out, delays = pl.pallas_call(
        functools.partial(_kernel, float(beta)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T_TILE, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T_TILE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, t_pad), jnp.float32),
        ),
    )(csum, cprev, x.astype(jnp.float32))
    return out[:, :t], delays[:, 0, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cif_integrate(x, alpha, beta: float, t: int):
    """Fused CIF integration: returns (out (B,t,C) fp32, delays (B,t))."""
    return _forward_pallas(x, alpha, beta, t)


def _fwd(x, alpha, beta, t):
    return _forward_pallas(x, alpha, beta, t), (x, alpha)


def _bwd(beta, t, res, g):
    x, alpha = res
    _, vjp = jax.vjp(lambda xx, aa: _cif_matmul_jnp(xx, aa, beta, t), x, alpha)
    dx, dalpha = vjp(g)
    return dx.astype(x.dtype), dalpha.astype(alpha.dtype)


cif_integrate.defvjp(_fwd, _bwd)


def cif_integrate_reference(x, alpha, beta: float, t: int):
    """XLA-only twin (used on CPU and in parity tests)."""
    return _cif_matmul_jnp(x, alpha, beta, t)
