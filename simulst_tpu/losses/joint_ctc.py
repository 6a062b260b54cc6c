"""Joint label-smoothed CE + CTC criterion.

Parity with the reference's `joint_ctc_criterion`
(/root/reference/codebase/criterion/joint_ctc_criterion.py:63-214):
  loss = LS-CE(decoder logits) + ctc_factor * LS-CTC(encoder ctc logits)
where the CTC term is itself label-smoothed as
  (1 - eps) * ctc_nll + (eps / V) * sum_t -sum_v lprobs[t, v]
over valid encoder frames (note: eps/V, not eps/(V-1), matching :167-169).

CTC targets drop both PAD and EOS (:146-150).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from simulst_tpu.losses.label_smoothed_ce import ce_loss
from simulst_tpu.ops.ctc import ctc_raw_smoothed


@dataclasses.dataclass(frozen=True)
class JointCTCConfig:
    label_smoothing: float = 0.1
    ctc_factor: float = 1.0
    zero_infinity: bool = True
    padding_idx: int = 1
    eos_idx: int = 2
    blank_idx: int = 0
    sentence_avg: bool = False


def ctc_targets(target, cfg: JointCTCConfig):
    """Replace EOS with PAD and compact is unnecessary: CTC ignores content
    past target_length; we compute lengths excluding pad+eos and shift-remove
    eos by masking it to pad (eos is always last, so lengths suffice)."""
    keep = (target != cfg.padding_idx) & (target != cfg.eos_idx)
    lengths = keep.sum(axis=-1)
    # eos might sit mid-sequence never in practice (it is final); masking it to
    # pad keeps the packed prefix property.
    tgt = jnp.where(keep, target, cfg.padding_idx)
    return tgt, lengths


def smoothed_ctc_loss(ctc_logits, encoder_lengths, target, cfg: JointCTCConfig):
    # works on RAW logits: the CTC DP selects label columns and subtracts
    # logsumexp inside ops/ctc (the full (B, T, V) log-prob tensor never
    # materializes), and the smoothing term -sum_v lprobs[t, v] equals
    # V * LSE(logits[t]) - sum_v logits[t, v]
    tgt, tgt_lens = ctc_targets(target, cfg)
    # single alpha-beta custom-VJP op: its backward assembles the CTC AND
    # smoothing gradients in one fused (B, T, V) pass (ops/ctc.py)
    nll, smooth = ctc_raw_smoothed(ctc_logits, encoder_lengths, tgt, tgt_lens,
                                   cfg.blank_idx, cfg.zero_infinity, True)
    v = ctc_logits.shape[-1]
    eps_i = cfg.label_smoothing / v
    return (1.0 - cfg.label_smoothing) * nll + eps_i * smooth, nll


def ctc_greedy_recall_precision(pred, target, vocab_size, cfg: JointCTCConfig,
                                eps: float = 1e-8):
    """Bag-of-tokens recall/precision of the per-frame greedy CTC path.

    Formula-matched to the reference's `calc_recall_precision`
    (/root/reference/codebase/criterion/joint_ctc_criterion.py:24-48):
    match = sum_v min(count_v(target), count_v(pred)) over the full vocab
    (pred keeps repeats and blanks — no collapse; blank/pad cancel in the
    min because target has no blanks and pred-pad vs target-pad both count),
    recall = match / #non-pad target tokens,
    precision = match / #non-blank predicted frames.
    Returns (sum-over-batch recall, sum-over-batch precision).
    """
    count = lambda toks: jax.vmap(
        lambda t: jnp.bincount(t, length=vocab_size))(toks)
    match = jnp.minimum(count(pred), count(target)).sum(-1)
    recall = match / ((target != cfg.padding_idx).sum(-1) + eps)
    precision = match / ((pred != cfg.blank_idx).sum(-1) + eps)
    return recall.sum(), precision.sum()


def joint_ctc_loss(logits, extra, target, cfg: JointCTCConfig,
                   ctc_target=None):
    """logits: (B, T, V) decoder output; extra: dict with ctc_logits (or None)
    and encoder_lengths; target: (B, T) with EOS, right-padded.
    ctc_target: optional separate CTC targets (e.g. transcripts for the MTL
    setting — CE on translations, CTC on transcripts).

    Returns (loss, metrics dict). Sum reduction; caller divides by ntokens.
    """
    loss, nll = ce_loss(logits, target, cfg.label_smoothing, cfg.padding_idx)
    metrics = {"nll_loss": nll}
    if extra.get("ctc_logits") is not None and cfg.ctc_factor != 0.0:
        closs, cnll = smoothed_ctc_loss(
            extra["ctc_logits"], extra["encoder_lengths"],
            target if ctc_target is None else ctc_target, cfg)
        loss = loss + cfg.ctc_factor * closs
        metrics["ctc_loss"] = closs
        # greedy-CTC-path health metrics (reference :92-105)
        pred = extra["ctc_logits"].argmax(-1)
        metrics["blank_rate"] = (pred == cfg.blank_idx).mean(axis=-1).sum()
        rec, prec = ctc_greedy_recall_precision(
            pred, target if ctc_target is None else ctc_target,
            extra["ctc_logits"].shape[-1], cfg)
        metrics["ctc_recall"] = rec
        metrics["ctc_precision"] = prec
    ntokens = (target != cfg.padding_idx).sum()
    nsentences = target.shape[0]
    sample_size = nsentences if cfg.sentence_avg else ntokens
    metrics.update(loss=loss, ntokens=ntokens, nsentences=nsentences,
                   sample_size=sample_size)
    return loss, metrics
