"""TrainState + jitted train/eval steps with micro-batch accumulation.

The reference gets its loop/optimizer/DDP from fairseq (SURVEY.md §1,
"control inversion"); this module is the native replacement: one jitted
`train_step` containing forward, backward, `--update-freq`-style
accumulation (a lax.scan over microbatches, mirroring exp/2-mma.sh:52), and
the optimizer update.  Under a data mesh the gradient psum is inserted by
XLA from the shardings.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from simulst_tpu.train.optim import OptimConfig, global_norm, make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, optim_cfg: OptimConfig) -> TrainState:
    tx = make_optimizer(optim_cfg)
    # copy the caller's param arrays: the jitted train step DONATES the
    # TrainState (params + adam moments update in place), which deletes the
    # previous buffers — the caller's originals must stay valid
    params = jax.tree.map(jnp.array, params)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(loss_fn: Callable, optim_cfg: OptimConfig,
                    update_freq: int = 1,
                    freeze_until: Optional[Dict[str, int]] = None):
    """loss_fn(params, batch, rng) -> (loss, metrics).

    Returns train_step(state, batch, rng) -> (state, metrics).  When
    update_freq > 1, every array in `batch` must have a leading microbatch
    axis of size update_freq; gradients are averaged across microbatches
    weighted by sample_size (fairseq semantics: grads summed, then divided
    by total sample_size — loss_fn must return SUM losses and a
    'sample_size' metric).

    freeze_until: {component: n_updates} zeroes that top-level component's
    gradients while step < n (the reference's --encoder-freezing-updates,
    s2t_emformer.py:117-123).
    """
    tx = make_optimizer(optim_cfg)

    def single_grads(params, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng)
        return grads, metrics

    def train_step(state: TrainState, batch, rng):
        if update_freq == 1:
            grads, metrics = single_grads(state.params, batch, rng)
        else:
            def body(carry, mb):
                g_acc, m_acc, r = carry
                r, sub = jax.random.split(r)
                g, m = single_grads(state.params, mb, sub)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                m_acc = jax.tree.map(jnp.add, m_acc, m)
                return (g_acc, m_acc, r), None

            zeros_like = lambda t: jax.tree.map(jnp.zeros_like, t)
            mb0 = jax.tree.map(lambda x: x[0], batch)
            g0, m0 = single_grads(state.params, mb0, rng)
            rest = jax.tree.map(lambda x: x[1:], batch)
            (grads, metrics, _), _ = jax.lax.scan(
                body, (g0, m0, rng), rest)

        # normalize by total sample_size (fairseq divides grads by the
        # aggregated sample size before the optimizer step)
        denom = jnp.maximum(metrics["sample_size"].astype(jnp.float32), 1.0)
        grads = jax.tree.map(lambda g: g / denom, grads)
        if freeze_until:
            grads = dict(grads)
            for comp, n in freeze_until.items():
                frozen = state.step < n
                grads[comp] = jax.tree.map(
                    lambda g: jnp.where(frozen, 0.0, g), grads[comp])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = global_norm(grads)
        # non-finite gradients (bf16 overflow, bad batch) skip the update
        # entirely — params, optimizer moments and step stay put (the
        # fairseq trainer's overflow behavior, minus loss scaling which
        # bf16 doesn't need)
        ok = jnp.isfinite(gnorm)
        params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), params, state.params)
        opt_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o) if hasattr(n, "ndim") else n,
            opt_state, state.opt_state)
        metrics = dict(metrics, gnorm=gnorm,
                       skipped=(~ok).astype(jnp.float32))
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + jnp.where(ok, 1, 0)), metrics

    return train_step


def make_accum_train_step(loss_fn: Callable, optim_cfg: OptimConfig,
                          freeze_until: Optional[Dict[str, int]] = None):
    """Host-orchestrated gradient accumulation for bucketed batches whose
    shapes differ across microbatches (fairseq --update-freq semantics:
    grads summed over microbatches, normalized by total sample_size).

    Returns (grad_step, apply_step):
      grad_step(params, batch, rng) -> (grads, metrics)        [jit per shape]
      apply_step(state, grads, metrics) -> (state, metrics)    [jit once]
    """
    tx = make_optimizer(optim_cfg)

    @jax.jit
    def grad_step(params, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng)
        return grads, metrics

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def apply_step(state: TrainState, grads, metrics):
        denom = jnp.maximum(metrics["sample_size"].astype(jnp.float32), 1.0)
        grads = jax.tree.map(lambda g: g / denom, grads)
        if freeze_until:
            grads = dict(grads)
            for comp, n in freeze_until.items():
                frozen = state.step < n
                grads[comp] = jax.tree.map(
                    lambda g: jnp.where(frozen, 0.0, g), grads[comp])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = global_norm(grads)
        ok = jnp.isfinite(gnorm)                    # see make_train_step
        params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), params, state.params)
        opt_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o) if hasattr(n, "ndim") else n,
            opt_state, state.opt_state)
        metrics = dict(metrics, gnorm=gnorm,
                       skipped=(~ok).astype(jnp.float32))
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + jnp.where(ok, 1, 0)), metrics

    return grad_step, apply_step
