"""Fused linear -> dropout -> +residual Pallas kernel (attention epilogue).

Profiling the 32x1024 train step showed the attention out-projection
epilogues running as separate tiny XLA passes per layer: the out_proj
matmul, a u32 rng-bit tensor + select for the residual dropout, the
residual add, and the (B, T, D) HBM round-trips between them
(nn/emformer.py:559 measured ~0.5 ms/step across the 12 encoder layers,
plus the same pattern twice per decoder layer at transformer.py:148,160).

This kernel computes, per row tile, entirely in VMEM:

    y = res + drop(h @ w + b)            (dropout mask from the on-core
                                          PRNG, regenerated bit-identically
                                          in the backward)

with an optional PERIODIC row gate for the Emformer grouped-attention
layout: each group contributes nq = G*(rc+seg+1) rows of which only the
first G*(rc+seg) (rc blocks + utterance) take dropout + residual — the
trailing G summary rows get the plain projection (they feed the memory
transform, reference semantics torchaudio emformer.py:299-302).  Rows are
gated by `row % period < res_rows`; period=0 means every row is a
residual row.

The backward (custom_vjp) regenerates the dropout mask from the same
(seed, tile) PRNG stream and accumulates dw/db in fp32 VMEM across the
grid; d(res) is exactly the upstream cotangent and never touches the
kernel.

The reference has no equivalent (fairseq applies F.dropout + residual as
separate module calls); this is TPU-first engineering, not a port.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simulst_tpu.ops.ffn_pallas import (_interpret_mode, _keep_threshold,
                                        _mask, _pad_rows, _row_tile)


def _scale_tile(i, rows, cols, rate, period, res_rows):
    """fp32 multiplier for this tile: elementwise inv/0 on residual rows
    (dropout), 1 on plain rows; plus the (rows, 1) residual-row flag.
    Assumes the PRNG was seeded already."""
    row0 = i * rows
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + row0
    is_res = jnp.ones((rows, 1), bool) if period == 0 \
        else (ridx % period) < res_rows
    if rate > 0.0:
        inv = np.float32(1.0 / (1.0 - rate))
        keep = _mask((rows, cols), rate)
        drop_scale = jnp.where(keep, inv, 0.0)
    else:
        drop_scale = jnp.ones((rows, 1), jnp.float32)
    return jnp.where(is_res, drop_scale, 1.0), is_res


def _fwd_kernel(rate, period, res_rows, seed_ref, h_ref, w_ref, b_ref,
                res_ref, y_ref):
    i = pl.program_id(0)
    dtype = h_ref.dtype
    u = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    u = u + b_ref[:].astype(jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i)
    scale, is_res = _scale_tile(i, *u.shape, rate, period, res_rows)
    y = u * scale + jnp.where(is_res, res_ref[:].astype(jnp.float32), 0.0)
    y_ref[:] = y.astype(dtype)


def _bwd_kernel(rate, period, res_rows, seed_ref, h_ref, w_ref, dy_ref,
                dh_ref, dw_ref, db_ref):
    i = pl.program_id(0)
    dtype = h_ref.dtype
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i)
    scale, _ = _scale_tile(i, dy_ref.shape[0], dy_ref.shape[1], rate,
                           period, res_rows)
    dyf = dy_ref[:].astype(jnp.float32)
    du = (dyf * scale).astype(dtype)
    dh_ref[:] = jax.lax.dot_general(
        du, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[:] += jax.lax.dot_general(
        h_ref[:], du, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += du.astype(jnp.float32).sum(axis=0, keepdims=True)


def _fwd_call(h2, w, b, res2, seed, rate, period, res_rows, interpret):
    n, din = h2.shape
    dout = w.shape[1]
    ROW_TILE = _row_tile(h2.dtype)
    n_pad = -n % ROW_TILE
    hp = _pad_rows(h2, n_pad)
    rp = _pad_rows(res2, n_pad)
    grid = ((n + n_pad) // ROW_TILE,)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, rate, period, res_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, dout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, dout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, dout), h2.dtype),
        interpret=_interpret_mode(interpret),
    )(seed, hp, w, b[None, :], rp)
    return y[:n]


def _bwd_call(h2, w, dy2, seed, rate, period, res_rows, interpret):
    n, din = h2.shape
    dout = w.shape[1]
    ROW_TILE = _row_tile(h2.dtype)
    n_pad = -n % ROW_TILE
    hp = _pad_rows(h2, n_pad)
    dyp = _pad_rows(dy2, n_pad)       # zero rows -> zero grad contributions
    grid = ((n + n_pad) // ROW_TILE,)
    dh, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, rate, period, res_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, dout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROW_TILE, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n + n_pad, din), h2.dtype),
            jax.ShapeDtypeStruct((din, dout), jnp.float32),
            jax.ShapeDtypeStruct((1, dout), jnp.float32),
        ),
        interpret=_interpret_mode(interpret),
    )(seed, hp, w, dyp)
    return dh[:n], dw, db[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_linear_drop_res(h, w, b, res, seed, rate=0.0, period=0,
                          res_rows=0, interpret=False):
    """y = res + drop(h @ w + b) on residual rows, h @ w + b on plain rows.

    h: (..., D_in); w: (D_in, D_out); b: (D_out,); res: h.shape[:-1] +
    (D_out,).  Rows (in flattened row-major order) with
    `row % period >= res_rows` are plain rows (period=0: none).  Plain
    rows IGNORE `res` (pass zeros there).  seed: (1,) int32, vary per call.
    """
    shape = h.shape[:-1] + (w.shape[1],)
    y = _fwd_call(h.reshape(-1, h.shape[-1]), w, b,
                  res.reshape(-1, w.shape[1]), seed, rate, period, res_rows,
                  interpret)
    return y.reshape(shape)


def _flr_fwd(h, w, b, res, seed, rate, period, res_rows, interpret):
    y = fused_linear_drop_res(h, w, b, res, seed, rate, period, res_rows,
                              interpret)
    return y, (h, w, jnp.zeros((0,), b.dtype), jnp.zeros((0,), res.dtype),
               seed)


def _flr_bwd(rate, period, res_rows, interpret, resids, gy):
    h, w, b_proto, res_proto, seed = resids
    dh, dw, db = _bwd_call(h.reshape(-1, h.shape[-1]), w,
                           gy.reshape(-1, w.shape[1]), seed, rate, period,
                           res_rows, interpret)
    # d(res) = gy on residual rows, 0 on plain rows (res is ignored there).
    dres = gy
    if period != 0:
        gy2 = gy.reshape(-1, w.shape[1])
        is_res = (jnp.arange(gy2.shape[0]) % period < res_rows)[:, None]
        dres = jnp.where(is_res, gy2, 0.0).reshape(gy.shape)
    return (dh.reshape(h.shape), dw.astype(w.dtype), db.astype(b_proto.dtype),
            dres.astype(res_proto.dtype),
            np.zeros(seed.shape, jax.dtypes.float0))


fused_linear_drop_res.defvjp(_flr_fwd, _flr_bwd)


def linear_res_supported(h, din: int, dout: int) -> bool:
    """Kernel gate: accelerator, MXU-aligned dims, enough rows to amortize
    the resident weight."""
    if os.environ.get("SIMULST_NO_FUSED_LINRES"):
        return False
    if jax.default_backend() == "cpu":
        return False
    n = 1
    for s in h.shape[:-1]:
        n *= s
    return din % 128 == 0 and dout % 128 == 0 and n >= 1024
