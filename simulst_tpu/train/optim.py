"""Optimizer + LR schedule (fairseq parity: Adam + inverse_sqrt warmup).

The reference delegates to fairseq's trainer (`--optimizer adam --lr-scheduler
inverse_sqrt --warmup-updates N`, e.g. /root/reference/exp/1a-pretrain_asr.sh);
here the same schedule is an optax chain.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
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


def global_sumsq(tree) -> jnp.ndarray:
    """Sum of squares over every array leaf, fp32.

    Equal to optax.global_norm(tree)**2, but built to compile into FEW
    kernels: profiling the 32x1024 train step showed the per-leaf scalar
    reduces of the naive form costing ~0.7 ms/step (264 reduce fusions —
    one per parameter leaf, each launch-overhead bound).  Small leaves
    (biases, LayerNorms) are raveled into ONE concatenated buffer with a
    single reduce; only the ~40 big weight matrices keep per-leaf reduces
    (their reduce is bandwidth-bound, not overhead-bound)."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    small = [l.ravel().astype(jnp.float32) for l in leaves if l.size < 65536]
    big = [l for l in leaves if l.size >= 65536]
    tot = jnp.zeros((), jnp.float32)
    if small:
        flat = small[0] if len(small) == 1 else jnp.concatenate(small)
        tot = tot + (flat * flat).sum()
    if big:
        tot = tot + jnp.stack(
            [(l.astype(jnp.float32) ** 2).sum() for l in big]).sum()
    return tot


def global_norm(tree) -> jnp.ndarray:
    """Flat-reduce twin of optax.global_norm (see global_sumsq)."""
    return jnp.sqrt(global_sumsq(tree))


def clip_by_global_norm_flat(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm semantics (g * max_norm/max(norm, max_norm))
    with the norm computed via global_sumsq.  Same EmptyState, so checkpoint
    opt_state trees are unchanged."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = global_norm(updates)
        scale = max_norm / jnp.maximum(norm, max_norm)
        return jax.tree_util.tree_map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimConfig):
    tx = [clip_by_global_norm_flat(cfg.clip_norm)] if cfg.clip_norm > 0 else []
    tx.append(optax.scale_by_adam(b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                                  eps=cfg.adam_eps))
    if cfg.weight_decay > 0:
        tx.append(optax.add_decayed_weights(cfg.weight_decay))
    tx.append(optax.scale_by_learning_rate(inverse_sqrt_schedule(cfg)))
    return optax.chain(*tx)
