"""Pallas weight-gradient kernel for the grouped causal conv-pos.

Profiling the 32x1024 train step showed the conv-pos backward's weight-grad
convolution (f32[64,16,16,16] from bf16[32,319,16,16] operands) costing
~0.7 ms — XLA lowers the grouped wgrad with (16,16) channel tiles and a
pathological batch-minor layout.  (The round-2 idea of expanding the conv to
a dense block-diagonal one measured NO win — see docs/round3_status.md.)

This kernel instead grids over the K taps with the whole (padded) input and
output-grad resident in VMEM (~10 MB at the production geometry, under the
~16 MB budget):

    per tap k:  dense_k (D, D)  = x[:, k:k+T, :]^T . dy       -- one MXU
                matmul with M = N = D(256), K = B*T(8192)
                dw_k (Cg, D)    = block-diagonal extract of dense_k

so the arithmetic runs as full 256-wide MXU matmuls (6.9e10 FLOPs ~ 0.35 ms
at peak) and each grid step writes its own tap's rows — no accumulation.

The extra off-diagonal FLOPs are discarded by the masked extract; the
extracted values are EXACTLY the grouped wgrad (the mask only zeroes terms
the grouped conv never sums).

The forward and the data gradient stay in XLA (measured fine: ~0.2 /
~0.4 ms); only the wgrad is replaced, through `causal_grouped_conv`'s
custom VJP in nn/conv.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wgrad_kernel(t_out: int, groups: int, x_ref, dy_ref, out_ref):
    # inputs are TIME-MAJOR (T, B, D): Mosaic allows arbitrary dynamic-slice
    # offsets only on the major dim (sublane offsets must be multiples of 8)
    k = pl.program_id(0)
    t63, b, d = x_ref.shape
    cg = d // groups
    xs = x_ref[pl.ds(k, t_out)]                # (T, B, D)
    xs2 = xs.reshape(t_out * b, d)
    dy2 = dy_ref[:].reshape(t_out * b, d)
    dense = jax.lax.dot_general(
        xs2, dy2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (D_in, D_out)
    gi = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // cg
    go = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // cg
    masked = jnp.where(gi == go, dense, 0.0)
    out_ref[:] = masked.reshape(groups, cg, d).sum(axis=0)   # (Cg, D_out)


def convpos_wgrad_pallas(xp, dy, kernel_size: int, groups: int,
                         interpret: bool = False):
    """xp: (B, T + K - 1, D) left-padded input; dy: (B, T, D) output grad.
    Returns dw (K, D/groups, D) float32 — the grouped-conv weight grad."""
    b, t63, d = xp.shape
    t_out = dy.shape[1]
    assert t63 == t_out + kernel_size - 1
    cg = d // groups
    dw = pl.pallas_call(
        functools.partial(_wgrad_kernel, t_out, groups),
        grid=(kernel_size,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cg, d), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kernel_size * cg, d), jnp.float32),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(xp.transpose(1, 0, 2), dy.transpose(1, 0, 2))
    return dw.reshape(kernel_size, cg, d)


def convpos_wgrad_supported(xp, d: int, groups: int) -> bool:
    """Use the kernel on an accelerator when the arrays fit VMEM and the
    lane dim is MXU-aligned."""
    if os.environ.get("SIMULST_NO_FUSED_CONVPOS"):
        return False
    if jax.default_backend() == "cpu":
        return False
    if d % 128 != 0 or d % groups != 0:
        return False
    n = int(np.prod(xp.shape[:-1]))            # B * (T + K - 1) rows
    vmem_bytes = 2 * n * d * xp.dtype.itemsize  # xp + dy resident
    return n >= 2048 and vmem_bytes < 12 * 2 ** 20
