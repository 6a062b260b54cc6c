"""SSNT criterion (parity with the reference's `ssnt_criterion`,
/root/reference/codebase/criterion/ssnt_criterion.py:45-198 — leftover
research code there: no in-repo model produces `emit_logits`; we keep the
criterion for inventory completeness and wire it to any model whose extra
dict provides (lattice log-probs, emit_logits))."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from simulst_tpu.ops.ssnt import ssnt_loss as ssnt_nll


@dataclasses.dataclass(frozen=True)
class SSNTLossConfig:
    padding_idx: int = 1
    sentence_avg: bool = False


def ssnt_criterion(lattice_logits, emit_logits, targets, input_lengths,
                   cfg: SSNTLossConfig):
    """lattice_logits: (B, T, U, V); emit_logits: (B, T, U); targets (B, U)."""
    lp = jax.nn.log_softmax(lattice_logits.astype(jnp.float32), axis=-1)
    tgt_lens = (targets != cfg.padding_idx).sum(axis=1)
    loss = ssnt_nll(lp, emit_logits, targets, input_lengths, tgt_lens)
    ntokens = tgt_lens.sum()
    return loss, {"loss": loss, "ntokens": ntokens,
                  "nsentences": targets.shape[0],
                  "sample_size": targets.shape[0] if cfg.sentence_avg
                  else ntokens}
