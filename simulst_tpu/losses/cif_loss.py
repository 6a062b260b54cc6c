"""CIF criterion: CE + CTC + quantity + DAL latency.

Parity with the reference's `cif_loss`
(/root/reference/codebase/criterion/cif_criterion.py:71-320):
  * quantity loss "sum":   MSE(sum(alpha)/beta, tgt_len)
  * quantity loss "align": CTC Viterbi best-alignment -> per-token segment
    boundaries -> clipped MSE of cumsum(alpha)/beta at boundary positions,
    normalized per boundary count (:222-287); the alignment runs as a
    device-side scan (ops/ctc.best_alignment) instead of CUDA+host backtrace.
  * latency: DifferentiableAverageLagging over the CIF delays (:204-220).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from simulst_tpu.losses.joint_ctc import JointCTCConfig, smoothed_ctc_loss
from simulst_tpu.losses.label_smoothed_ce import ce_loss
from simulst_tpu.losses.latency import differentiable_average_lagging
from simulst_tpu.ops.ctc import best_alignment, ctc_loss_raw


@dataclasses.dataclass(frozen=True)
class CIFLossConfig:
    label_smoothing: float = 0.1
    ctc_factor: float = 0.3
    quant_factor: float = 1.0
    quant_type: str = "align"          # "sum" | "align"
    quant_clip: float = 10.0
    latency_factor: float = 0.0
    ms_per_frame_shift: float = 10.0
    cif_beta: float = 1.0
    zero_infinity: bool = True
    padding_idx: int = 1
    eos_idx: int = 2
    blank_idx: int = 0
    sentence_avg: bool = False


def _clipped_l2(x, y, clip):
    """reference :59-68: clip the target into [x-sqrt(clip), x+sqrt(clip)]."""
    c = clip ** 0.5
    yc = jax.lax.stop_gradient(jnp.clip(y, x - c, x + c))
    return (x - yc) ** 2


def quantity_loss(alpha, ctc_lprobs, encoder_lengths, target, target_lengths,
                  cfg: CIFLossConfig):
    """Returns (l_quant, quant_acc)."""
    beta = cfg.cif_beta
    b, s = alpha.shape
    if cfg.quant_type == "sum":
        q_out = alpha.sum(axis=1) / beta                        # (B,)
        tgt = target_lengths.astype(jnp.float32)
        l = _clipped_l2(q_out, tgt, cfg.quant_clip).sum()
    elif cfg.quant_type == "align":
        states = jax.lax.stop_gradient(best_alignment(
            ctc_lprobs, encoder_lengths, target, target_lengths,
            blank=cfg.blank_idx))                               # (B, S)
        seg_ids = states // 2
        # shifted pad (NOT roll): the frame after each example's last valid
        # frame doesn't exist, so the last valid emit frame is always a
        # segment boundary (roll would compare against frame 0 and miss it
        # in single-segment corner cases)
        seg_next = jnp.concatenate(
            [seg_ids[:, 1:], jnp.full((b, 1), -1, seg_ids.dtype)], axis=1)
        next_invalid = jnp.arange(s)[None, :] + 1 >= encoder_lengths[:, None]
        enc_valid = jnp.arange(s)[None, :] < encoder_lengths[:, None]
        boundary = ((seg_ids != seg_next) | next_invalid) \
            & (states % 2 != 0) & enc_valid
        q_targets = jnp.cumsum(boundary, axis=1).astype(jnp.float32)
        q_out = jnp.cumsum(alpha, axis=1) / beta
        l2 = _clipped_l2(q_out, q_targets, cfg.quant_clip)
        bf = boundary.astype(jnp.float32)
        norm = bf / jnp.maximum(bf.sum(axis=1, keepdims=True), 1.0)
        l = (l2 * bf * norm).sum()
    else:
        raise NotImplementedError(cfg.quant_type)
    q_acc = ((jnp.abs(alpha.sum(1) / beta - target_lengths)
              / jnp.maximum(target_lengths, 1)) <= 0.1).sum()
    return l, q_acc


def cif_loss(logits, extra, target, src_lengths, cfg: CIFLossConfig):
    """logits (B,T,V); extra from CIFModel.forward; target (B,T) w/ EOS."""
    loss, nll = ce_loss(logits, target, cfg.label_smoothing, cfg.padding_idx)

    # NOTE: unlike joint_ctc_criterion, the cif criterion keeps EOS in the
    # CTC/alignment targets (reference :128-131, :186-189 mask only pad)
    keep = target != cfg.padding_idx
    ctc_tgt = jnp.where(keep, target, cfg.padding_idx)
    ctc_lens = keep.sum(axis=-1)
    enc_lens = extra["encoder_lengths"]
    alpha = extra["alpha"].astype(jnp.float32)

    # CTC (unsmoothed in the reference's cif path, :191-200)
    c_loss = 0.0
    ctc_lp = None
    if extra.get("ctc_logits") is not None:
        # raw logits throughout: the CTC DP normalizes internally, and the
        # Viterbi best-alignment path is invariant to the per-frame
        # logsumexp shift (a constant added to every state at frame t does
        # not change the argmax backpointers)
        ctc_lp = extra["ctc_logits"]
        if cfg.ctc_factor != 0.0:
            c_loss = ctc_loss_raw(ctc_lp, enc_lens, ctc_tgt, ctc_lens,
                                  blank=cfg.blank_idx,
                                  zero_infinity=cfg.zero_infinity)

    tpm = target == cfg.padding_idx
    tgt_lens = (~tpm).sum(axis=1)
    l_quant, q_acc = quantity_loss(alpha, ctc_lp, enc_lens, ctc_tgt,
                                   ctc_lens, cfg)

    # latency (DAL over CIF delays)
    delays = extra["delays"].astype(jnp.float32)[:, :target.shape[1]]
    el = differentiable_average_lagging(delays, enc_lens, tgt_lens,
                                        target_padding_mask=tpm)
    l_latency = jnp.clip(el, 0.0, None).sum()
    latency_ms = (el * (src_lengths / enc_lens * cfg.ms_per_frame_shift)).sum()

    total = (loss + l_quant * cfg.quant_factor
             + l_latency * cfg.latency_factor + cfg.ctc_factor * c_loss)
    ntokens = (target != cfg.padding_idx).sum()
    metrics = {"loss": total, "nll_loss": nll, "ctc_loss": c_loss,
               "quantity": l_quant, "q_acc": q_acc, "latency": latency_ms,
               "ntokens": ntokens, "nsentences": target.shape[0],
               "sample_size": target.shape[0] if cfg.sentence_avg else ntokens}
    return total, metrics
