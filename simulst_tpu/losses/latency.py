"""Latency metrics: AL / AP / DAL (and differentiable DAL for training).

Native replacements for simuleval.metrics.latency, which the reference
imports as a library inside its criteria
(/root/reference/codebase/criterion/mma_criterion.py:15-28,
 cif_criterion.py:18).  Definitions follow the SimulEval implementations:

  gamma   = tgt_len / src_len
  AL      = (1/tau) * sum_{i<=tau} (d_i - i/gamma),    tau = first i with
            d_i >= src_len (else tgt_len-1), i 0-based
  AP      = sum_i d_i / (src_len * tgt_len)
  DAL     = (1/T) * sum_i (g_i - i/gamma), with
            g_i = max(d_i, g_{i-1} + 1/gamma)

TPU-native trick: the DAL recurrence g_i = max(d_i, g_{i-1} + 1/gamma)
admits the closed form  g_i - i/gamma = cummax_k<=i (d_k - k/gamma),
so the whole metric is one associative_scan(max) — no sequential loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _prep(delays, src_lens, tgt_lens, target_padding_mask):
    delays = delays.astype(jnp.float32)
    if target_padding_mask is not None:
        delays = jnp.where(target_padding_mask, 0.0, delays)
    gamma = tgt_lens.astype(jnp.float32) / src_lens.astype(jnp.float32)
    return delays, gamma


def differentiable_average_lagging(delays, src_lens, tgt_lens,
                                   target_padding_mask=None):
    """(B, T) delays -> (B,) DAL in source-step units."""
    delays, gamma = _prep(delays, src_lens, tgt_lens, target_padding_mask)
    b, t = delays.shape
    idx = jnp.arange(t, dtype=jnp.float32)[None, :]
    shifted = delays - idx / gamma[:, None]
    if target_padding_mask is not None:
        # padded positions must not win the cummax
        shifted = jnp.where(target_padding_mask, -jnp.inf, shifted)
    g = jax.lax.associative_scan(jnp.maximum, shifted, axis=1)
    lag = g  # == g_i - i/gamma
    if target_padding_mask is not None:
        lag = jnp.where(target_padding_mask, 0.0, lag)
    denom = tgt_lens.astype(jnp.float32)
    return lag.sum(axis=1) / jnp.maximum(denom, 1.0)


def average_lagging(delays, src_lens, tgt_lens, target_padding_mask=None):
    delays, gamma = _prep(delays, src_lens, tgt_lens, target_padding_mask)
    b, t = delays.shape
    idx = jnp.arange(t, dtype=jnp.float32)[None, :]
    valid = (idx < tgt_lens[:, None]) if target_padding_mask is None \
        else ~target_padding_mask
    reached = (delays >= src_lens[:, None].astype(jnp.float32)) & valid
    any_reached = reached.any(axis=1)
    first = jnp.argmax(reached, axis=1)
    tau = jnp.where(any_reached, first, tgt_lens - 1)           # 0-based
    lag = delays - idx / gamma[:, None]
    in_range = (idx <= tau[:, None]) & valid
    return (jnp.where(in_range, lag, 0.0).sum(axis=1)
            / jnp.maximum(tau + 1, 1).astype(jnp.float32))


def average_proportion(delays, src_lens, tgt_lens, target_padding_mask=None):
    delays, _ = _prep(delays, src_lens, tgt_lens, target_padding_mask)
    return delays.sum(axis=1) / (src_lens * tgt_lens).astype(jnp.float32)


LATENCY_METRICS = {
    "average_lagging": average_lagging,
    "average_proportion": average_proportion,
    "differentiable_average_lagging": differentiable_average_lagging,
}
