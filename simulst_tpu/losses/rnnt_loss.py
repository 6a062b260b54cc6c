"""Transducer criterion: RNN-T loss + fastemit + offline CE path.

Parity with the reference's `rnnt_criterion`
(/root/reference/codebase/criterion/rnnt_criterion.py:44-147): warp_rnnt-style
loss over the (B,S,U,V) joiner lattice with fastemit scaling, plus an
"offline path" label-smoothed CE at the LAST source frame (:124-145) that
trains the lattice column used by offline decoding.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from simulst_tpu.losses.label_smoothed_ce import label_smoothed_nll_loss
from simulst_tpu.ops.rnnt import rnnt_loss as rnnt_nll


@dataclasses.dataclass(frozen=True)
class RNNTLossConfig:
    label_smoothing: float = 0.1
    fastemit_lambda: float = 0.0
    offline_factor: float = 1.0
    padding_idx: int = 1
    blank_idx: int = 0
    sentence_avg: bool = False


def rnnt_criterion(lattice_logits, extra, cfg: RNNTLossConfig):
    """lattice_logits: (B, S, U+1, V); extra: from TransducerModel.forward
    (label_tokens (B, U+1) = [bos, y.., eos, pad..], label_lengths,
    encoder_lengths)."""
    b, s, u1, v = lattice_logits.shape
    lp = jax.nn.log_softmax(lattice_logits.astype(jnp.float32), axis=-1)
    labels = extra["label_tokens"]
    # RNN-T targets: the tokens to emit = labels WITHOUT the leading bos
    targets = labels[:, 1:]
    tgt_lens = extra["label_lengths"] - 1     # excludes bos, includes eos
    enc_lens = extra["encoder_lengths"]
    loss_rnnt = rnnt_nll(lp, targets, enc_lens, tgt_lens,
                         blank=cfg.blank_idx,
                         fastemit_lambda=cfg.fastemit_lambda)

    # offline path: CE on the lattice column at the last source frame
    # (teaches the model to decode offline from the full context, :124-145)
    last = jnp.clip(enc_lens - 1, 0, s - 1)
    col = jnp.take_along_axis(lp, last[:, None, None, None], axis=1)[:, 0]
    # predict token u at state u: lprobs (B, U+1, V) vs target (B, U+1)
    ce_target = jnp.concatenate(
        [targets, jnp.full((b, 1), cfg.padding_idx, targets.dtype)], axis=1)[:, :u1]
    off_loss, off_nll = label_smoothed_nll_loss(
        col, ce_target, cfg.label_smoothing, cfg.padding_idx)

    loss = loss_rnnt + cfg.offline_factor * off_loss
    ntokens = (ce_target != cfg.padding_idx).sum()
    return loss, {"loss": loss, "rnnt_loss": loss_rnnt, "nll_loss": off_nll,
                  "ntokens": ntokens, "nsentences": b,
                  "sample_size": b if cfg.sentence_avg else ntokens}
