"""Continuous Integrate-and-Fire (CIF), TPU-native.

Replaces the reference's `torch_cif.cif_function` submodule (contract defined
by its call sites: /root/reference/codebase/models/cif_transformer.py:171-186,
:228-261 and /root/reference/codebase/criterion/cif_criterion.py:96-140).

TPU-first design: instead of torch_cif's scatter_add over fire indices, the
weight distribution is a CLOSED-FORM portion matrix

    portion[b, j, k] = overlap([csum_{j-1}, csum_j], [k*beta, (k+1)*beta])
                     = clip(min(csum_j, (k+1)b) - max(csum_{j-1}, k*b), 0)

and the integration is one einsum ``btc = bsk,bsc`` — an MXU matmul, fully
differentiable through the cumulative sums, with no data-dependent shapes
(callers pass a static ``max_out_len``).

Semantics:
  * outputs are weight-beta integrals; the trailing incomplete accumulation
    ("tail") is scaled UP to beta (torch_cif behavior), which makes the
    streaming carry exact: carry_feature = tail_output / beta is the running
    weighted average (cif_transformer.py:240-243).
  * tail_thres: the tail counts as an extra output iff tail_weight is above
    the threshold (reference uses beta/2 offline/finish, 0 mid-stream).
  * target_lengths (teacher forcing): alpha is rescaled so that
    sum(alpha) == target_len * beta + eps, and lengths == target_lengths.
  * delays[b, k] = sum_j portion[j, k] * (j+1) / beta — the expected (1-based)
    source frame of each output, consumed by the DAL latency loss.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CifOut(NamedTuple):
    cif_out: jnp.ndarray       # (B, T, C)
    cif_lengths: jnp.ndarray   # (B,) int32
    alpha_sum: jnp.ndarray     # (B,) float
    delays: jnp.ndarray        # (B, T) float
    tail_weights: jnp.ndarray  # (B,) float


def cif_function(x, alpha, beta: float = 1.0, tail_thres: float = 0.5,
                 target_lengths: Optional[jnp.ndarray] = None,
                 max_out_len: Optional[int] = None, eps: float = 1e-4,
                 use_pallas: Optional[bool] = None) -> CifOut:
    """x: (B, S, C); alpha: (B, S) non-negative integration weights
    (already zeroed at padding)."""
    b, s, c = x.shape
    alpha = alpha.astype(jnp.float32)
    alpha_sum = alpha.sum(axis=1)

    if target_lengths is not None:
        desired = target_lengths.astype(jnp.float32) * beta + eps
        alpha = alpha * (desired / jnp.maximum(alpha_sum, eps))[:, None]
        feat_lengths = target_lengths.astype(jnp.int32)
        if max_out_len is None:
            raise ValueError("max_out_len required (static output size)")
        t = max_out_len
    else:
        fires = jnp.floor(alpha_sum / beta).astype(jnp.int32)
        if max_out_len is None:
            raise ValueError("max_out_len required (static output size)")
        t = max_out_len
        feat_lengths = fires  # tail added below

    # full-precision integration: the portion weights are exact bucket
    # overlaps (clip(min(csum, hi) - max(csum_prev, lo), 0)); bf16
    # accumulation here would corrupt the fire boundaries.  A fused Pallas
    # kernel (ops/cif_pallas.py) computes the portions on the fly in VMEM;
    # measured on v5e at (B16, S768, T128, C256) it ties the XLA einsum at
    # bf16 matmul precision and loses at fp32-HIGHEST (2.0ms vs 1.44ms), so
    # the XLA path is the default; flip use_pallas=True for larger T where
    # the (B,S,T) HBM intermediate dominates.
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        from simulst_tpu.ops.cif_pallas import cif_integrate
        out, delays = cif_integrate(x, alpha, float(beta), t)
        out = out.astype(x.dtype)
    else:
        from simulst_tpu.ops.cif_pallas import cif_integrate_reference
        out, delays = cif_integrate_reference(x, alpha, float(beta), t)
        out = out.astype(x.dtype)

    if target_lengths is not None:
        lengths = feat_lengths
        tail_w = jnp.zeros((b,), jnp.float32)
    else:
        fires = feat_lengths
        tail_w = alpha_sum - fires.astype(jnp.float32) * beta
        # upscale the tail bucket (index == fires) to weight beta
        scale = beta / jnp.maximum(tail_w, eps)                  # (B,)
        is_tail = jnp.arange(t)[None, :] == fires[:, None]       # (B, T)
        out = jnp.where(is_tail[:, :, None],
                        out * scale[:, None, None].astype(out.dtype), out)
        has_tail = tail_w > (tail_thres if tail_thres > 0 else 0.0)
        lengths = fires + has_tail.astype(jnp.int32)
        # expected delay of the (rescaled) tail: keep the unscaled expectation
        tail_delay = jnp.take_along_axis(delays, fires[:, None], axis=1)[:, 0]
        tail_delay = tail_delay * beta / jnp.maximum(tail_w, eps)
        delays = jnp.where(is_tail, tail_delay[:, None], delays)

    valid = jnp.arange(t)[None, :] < lengths[:, None]
    out = jnp.where(valid[:, :, None], out, 0.0)
    delays = jnp.where(valid, delays, 0.0)
    return CifOut(cif_out=out, cif_lengths=lengths, alpha_sum=alpha_sum,
                  delays=delays, tail_weights=tail_w)
