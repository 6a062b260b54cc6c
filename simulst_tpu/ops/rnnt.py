"""RNN-T (transducer) loss, device-native.

Replaces the external `warp_rnnt` CUDA package the reference depends on
(/root/reference/codebase/criterion/rnnt_criterion.py:83-122).

TPU-first design: the alpha lattice recursion
    alpha(t,u) = logadd(alpha(t-1,u) + blank(t-1,u),
                        alpha(t,u-1) + emit(t,u-1))
is computed as a `lax.scan` over ANTI-DIAGONALS d = t+u: both dependencies of
diagonal d live on diagonal d-1, so each scan step is a fully-parallel (B,U+1)
vector update — O(T+U) sequential steps instead of O(T*U).

FastEmit regularization: emission log-probs get their GRADIENT scaled by
(1 + lambda) via the value-preserving trick x*(1+l) - stop_grad(x)*l,
matching warp_rnnt's fastemit gradient scaling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e30


def rnnt_loss(log_probs, targets, input_lengths, target_lengths,
              blank: int = 0, fastemit_lambda: float = 0.0):
    """log_probs: (B, T, U+1, V) log-softmaxed joiner lattice;
    targets: (B, U) right-padded. Returns batch-summed NLL.
    """
    b, t, u1, v = log_probs.shape
    u = u1 - 1
    lp = log_probs.astype(jnp.float32)

    lp_blank = lp[..., blank]                                   # (B, T, U+1)
    tgt_idx = jnp.broadcast_to(targets[:, None, :], (b, t, u))
    lp_emit = jnp.take_along_axis(lp[:, :, :u, :], tgt_idx[..., None],
                                  axis=-1)[..., 0]              # (B, T, U)
    if fastemit_lambda > 0.0:
        lp_emit = (lp_emit * (1.0 + fastemit_lambda)
                   - jax.lax.stop_gradient(lp_emit) * fastemit_lambda)
    lp_emit = jnp.pad(lp_emit, ((0, 0), (0, 0), (0, 1)),
                      constant_values=NEG)                       # (B, T, U+1)

    # lay out both grids as (B, U+1, T) so a diagonal is one gather over T
    gb = jnp.moveaxis(lp_blank, 1, 2)
    ge = jnp.moveaxis(lp_emit, 1, 2)
    us = jnp.arange(u1)

    def diag_of(grid, d):
        """grid: (B, U+1, T) -> values grid[:, u, d-u], NEG where invalid."""
        tt = d - us
        vals = jnp.take_along_axis(
            grid, jnp.broadcast_to(jnp.clip(tt, 0, t - 1)[None, :, None],
                                   (b, u1, 1)), axis=2)[..., 0]
        return jnp.where(((tt >= 0) & (tt < t))[None, :], vals, NEG)

    def step(alpha, d):
        # alpha[u] = alpha(d-1-u, u) — the previous diagonal
        from_blank = alpha + diag_of(gb, d - 1)                  # (t-1, u) -> (t, u)
        # emit into (t, u) comes from (t, u-1) on diag d-1 with lp_emit(t, u-1)
        # = diag_of(ge, d-1)[u-1] since t = (d-1) - (u-1)
        from_emit = jnp.roll(alpha, 1, axis=1) + jnp.roll(diag_of(ge, d - 1), 1, axis=1)
        from_emit = from_emit.at[:, 0].set(NEG)
        new = jnp.logaddexp(from_blank, from_emit)
        tt = d - us
        ok = ((tt >= 0) & (tt < t))[None, :] & (us[None, :] <= target_lengths[:, None])
        return jnp.where(ok, new, NEG), None

    def step_capture(alpha, d):
        new, _ = step(alpha, d)
        return new, new

    alpha0 = jnp.full((b, u1), NEG).at[:, 0].set(0.0)
    _, diags = jax.lax.scan(step_capture, alpha0, jnp.arange(1, t + u))
    diags = jnp.concatenate([alpha0[None], diags], axis=0)       # (T+U, B, U+1)

    # final alpha(t_b-1, u_b) sits on diagonal t_b-1+u_b at index u_b
    d_final = input_lengths - 1 + target_lengths
    diag_final = diags[d_final, jnp.arange(b)]                   # (B, U+1)
    a_final = jnp.take_along_axis(diag_final, target_lengths[:, None], axis=1)[:, 0]
    lb_final = lp_blank[jnp.arange(b), input_lengths - 1, target_lengths]
    return -(a_final + lb_final).sum()
