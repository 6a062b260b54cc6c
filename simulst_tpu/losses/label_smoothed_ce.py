"""Label-smoothed cross entropy (fairseq semantics).

Matches fairseq's label_smoothed_nll_loss: smoothing mass spread over ALL
vocab entries (eps_i = eps / (V - 1) on the sum of -lprobs), padding targets
excluded, sum reduction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothed_nll_loss(lprobs, target, epsilon: float, ignore_index: int):
    """lprobs: (..., V) log-probs; target: (...) int.
    Returns (loss_sum, nll_loss_sum) as scalars (fp32)."""
    lprobs = lprobs.astype(jnp.float32)
    nll = -jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]
    smooth = -lprobs.sum(axis=-1)
    mask = target != ignore_index
    nll = jnp.where(mask, nll, 0.0)
    smooth = jnp.where(mask, smooth, 0.0)
    # fairseq: eps_i = epsilon / (vocab - 1); loss = (1-eps)*nll + eps_i*smooth
    # (it also subtracts the nll term once from smooth via (lprobs.sum - nll),
    #  matching: loss = (1 - eps - eps_i) * nll + eps_i * smooth)
    v = lprobs.shape[-1]
    eps_i = epsilon / (v - 1)
    loss = (1.0 - epsilon - eps_i) * nll + eps_i * smooth
    return loss.sum(), nll.sum()


def log_softmax(logits):
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def ce_loss(logits, target, label_smoothing: float, padding_idx: int):
    """Convenience wrapper: (B,T,V) logits, (B,T) target."""
    return label_smoothed_nll_loss(log_softmax(logits), target,
                                   label_smoothing, padding_idx)
