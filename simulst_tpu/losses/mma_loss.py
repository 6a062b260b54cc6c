"""MMA criterion: label-smoothed CE + latency-augmented loss.

Parity with the reference's `mma_criterion`
(/root/reference/codebase/criterion/mma_criterion.py:97-207): expected delays
= sum_j (j+1) * alpha_ij per layer/head, latency metric (default DAL)
gathered across heads by weighted_average/average/max, plus a
variance-across-heads term; warm-up gating via latency_update_after.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from simulst_tpu.losses.label_smoothed_ce import ce_loss
from simulst_tpu.losses.latency import LATENCY_METRICS


@dataclasses.dataclass(frozen=True)
class MMALossConfig:
    label_smoothing: float = 0.1
    latency_avg_weight: float = 0.0
    latency_var_weight: float = 0.0
    latency_avg_type: str = "differentiable_average_lagging"
    latency_gather_method: str = "weighted_average"
    latency_update_after: int = 0
    ms_per_frame_shift: float = 10.0
    padding_idx: int = 1
    sentence_avg: bool = False


def mma_latency_loss(attn_list, target, src_lengths, encoder_lengths,
                     cfg: MMALossConfig):
    """attn_list: list (layers) of dicts with alpha (B, H, T, S).
    Returns (latency_loss, expected_latency_ms_sum, delays_var_sum)."""
    alpha_all = jnp.concatenate([a["alpha"] for a in attn_list], axis=1)
    b, lh, t, s = alpha_all.shape
    alpha_flat = alpha_all.reshape(b * lh, t, s).astype(jnp.float32)

    steps = jnp.arange(1, s + 1, dtype=jnp.float32)
    expected_delays = jnp.einsum("nts,s->nt", alpha_flat, steps)   # (B*LH, T)

    tpm = target == cfg.padding_idx                                # (B, T)
    tgt_lens = (~tpm).sum(axis=1)
    ex = lambda v: jnp.repeat(v, lh, axis=0)
    latency = LATENCY_METRICS[cfg.latency_avg_type](
        expected_delays, ex(encoder_lengths), ex(tgt_lens),
        target_padding_mask=ex(tpm))                               # (B*LH,)
    latency = latency.reshape(b, lh)

    if cfg.latency_gather_method == "average":
        gathered = latency.mean(axis=1)
    elif cfg.latency_gather_method == "weighted_average":
        w = jax.nn.softmax(latency, axis=1)
        gathered = (latency * w).sum(axis=1)
    elif cfg.latency_gather_method == "max":
        gathered = latency.max(axis=1)
    else:
        raise NotImplementedError(cfg.latency_gather_method)

    avg_loss = cfg.latency_avg_weight * jnp.clip(gathered, 0.0, None).sum()
    delays_var = expected_delays.reshape(b, lh, t).var(axis=1).mean(axis=1).sum()
    var_loss = cfg.latency_var_weight * delays_var
    latency_ms = (gathered * (src_lengths / encoder_lengths
                              * cfg.ms_per_frame_shift)).sum()
    return avg_loss + var_loss, latency_ms, delays_var


def mma_loss(logits, extra, target, src_lengths, cfg: MMALossConfig,
             num_updates: int = 0):
    loss, nll = ce_loss(logits, target, cfg.label_smoothing, cfg.padding_idx)
    lat_loss, latency_ms, delays_var = mma_latency_loss(
        extra["attn_list"], target, src_lengths, extra["encoder_lengths"], cfg)
    if cfg.latency_update_after > 0 and num_updates <= cfg.latency_update_after:
        lat_loss = 0.0
    loss = loss + lat_loss
    ntokens = (target != cfg.padding_idx).sum()
    metrics = {"loss": loss, "nll_loss": nll, "latency": latency_ms,
               "delays_var": delays_var, "latency_loss": lat_loss,
               "ntokens": ntokens, "nsentences": target.shape[0],
               "sample_size": target.shape[0] if cfg.sentence_avg else ntokens}
    return loss, metrics
