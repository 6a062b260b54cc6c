"""Optimizer + LR schedule (fairseq parity: Adam + inverse_sqrt warmup).

The reference delegates to fairseq's trainer (`--optimizer adam --lr-scheduler
inverse_sqrt --warmup-updates N`, e.g. /root/reference/exp/1a-pretrain_asr.sh);
here the same schedule is an optax chain.
"""
from __future__ import annotations

import dataclasses

import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-3
    warmup_updates: int = 4000
    warmup_init_lr: float = 1e-7
    adam_beta1: float = 0.9
    adam_beta2: float = 0.98
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    clip_norm: float = 10.0


def inverse_sqrt_schedule(cfg: OptimConfig):
    """fairseq inverse_sqrt: linear warmup from warmup_init_lr to lr, then
    lr * sqrt(warmup_updates / step)."""
    def schedule(step):
        step = step + 1  # fairseq counts updates from 1
        warm = cfg.warmup_init_lr + (cfg.lr - cfg.warmup_init_lr) * (
            step / cfg.warmup_updates)
        decay = cfg.lr * (cfg.warmup_updates ** 0.5) * (step ** -0.5)
        import jax.numpy as jnp
        return jnp.where(step < cfg.warmup_updates, warm, decay)
    return schedule


def make_optimizer(cfg: OptimConfig):
    tx = [optax.clip_by_global_norm(cfg.clip_norm)] if cfg.clip_norm > 0 else []
    tx.append(optax.scale_by_adam(b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                                  eps=cfg.adam_eps))
    if cfg.weight_decay > 0:
        tx.append(optax.add_decayed_weights(cfg.weight_decay))
    tx.append(optax.scale_by_learning_rate(inverse_sqrt_schedule(cfg)))
    return optax.chain(*tx)
