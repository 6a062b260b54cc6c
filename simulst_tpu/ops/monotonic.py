"""Monotonic attention math: expected alignment, soft attention, p_choose.

Device-native re-design of the reference's
/root/reference/codebase/utils/{monotonic_attention,functions,p_choose_strategy}.py.
The training hot loop — the python loop over tgt_len in
expected_alignment_from_p_choose (:54-66) — becomes a `lax.scan`, so the whole
expected-alignment computation is one compiled XLA while-program instead of
tgt_len dispatched kernels.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def exclusive_cumprod(x, axis: int, eps: float = 1e-10):
    """[1, x1, x1x2, ...] via exp(cumsum(log)) (reference functions.py:20-66)."""
    ones_shape = list(x.shape)
    ones_shape[axis] = 1
    padded = jnp.concatenate([jnp.ones(ones_shape, x.dtype), x], axis=axis)
    log_x = jnp.log(padded + eps)
    cp = jnp.exp(jnp.cumsum(log_x, axis=axis))
    return jax.lax.slice_in_dim(cp, 0, x.shape[axis], axis=axis)


def moving_sum(x, start: int, end: int):
    """Reference functions.py:69-125: windowed sum over the last axis.
    x: (B, Tq, S); window [n-(start-1), n+end-1]."""
    b, tq, s = x.shape
    ksz = start + end - 1
    xp = jnp.pad(x.reshape(-1, s), ((0, 0), (start - 1, end - 1)))
    # cumulative-sum trick: windowed sum = cs[i+ksz] - cs[i]
    cs = jnp.cumsum(jnp.pad(xp, ((0, 0), (1, 0))), axis=1)
    out = cs[:, ksz:] - cs[:, :-ksz]
    return out.reshape(b, tq, s)


@jax.custom_vjp
def _alignment_recursion(prefix, denom):
    """alphas (N, U, S) from alpha_u = clip(prefix_u * cumsum(alpha_{u-1} /
    denom_u), 0, 1) — Pallas DP kernel on TPU (panels stay VMEM-resident
    across the U loop, no time-major transposes), bit-exact lax.scan
    fallback elsewhere, hand-derived reverse recursion as the VJP
    (ops/monotonic_pallas.py)."""
    return _align_fwd_impl(prefix, denom)


def _align_fwd_impl(prefix, denom):
    from simulst_tpu.ops import monotonic_pallas as mp
    n, u, s = prefix.shape
    if mp.monotonic_block(n, u, s, 3) > 0:
        return mp.alignment_fwd_pallas(prefix, denom)
    return mp.alignment_fwd_scan(prefix, denom)


def _align_fwd_rule(prefix, denom):
    alphas = _align_fwd_impl(prefix, denom)
    return alphas, (prefix, denom, alphas)


def _align_bwd_rule(res, g):
    from simulst_tpu.ops import monotonic_pallas as mp
    prefix, denom, alphas = res
    n, u, s = prefix.shape
    g = g.astype(jnp.float32)
    if mp.monotonic_block(n, u, s, 6) > 0:
        return mp.alignment_bwd_pallas(prefix, denom, alphas, g)
    return mp.alignment_bwd_scan(prefix, denom, alphas, g)


_alignment_recursion.defvjp(_align_fwd_rule, _align_bwd_rule)


def expected_alignment_from_p_choose(p_choose, key_padding_mask=None,
                                     eps: float = 1e-6):
    """alpha_i = p_i * cumprod(1-p_i) * cumsum(alpha_{i-1} / cumprod(1-p_i)).

    p_choose: (B, T_tgt, S_src) in [0,1]. Returns alpha, same shape, fp32.
    The target-axis recursion (reference monotonic_attention.py:12-76) runs
    as a Pallas DP kernel on TPU / a bit-exact lax.scan fallback elsewhere
    (see _alignment_recursion); the cumprod prep stays plain (differentiable)
    JAX.
    """
    p = p_choose.astype(jnp.float32)
    if key_padding_mask is not None:
        p = jnp.where(key_padding_mask[:, None, :], 0.0, p)
    cumprod_1mp = exclusive_cumprod(1 - p, axis=2, eps=eps)
    cumprod_clamp = jnp.clip(cumprod_1mp, eps, 1.0)
    prefix = p * cumprod_1mp
    return _alignment_recursion(prefix, cumprod_clamp)


def mass_preservation(alpha, key_padding_mask=None):
    """Move residual probability mass onto the last VALID source position
    (reference monotonic_attention.py:155-197, right-padding branch)."""
    if key_padding_mask is not None:
        alpha = jnp.where(key_padding_mask[:, None, :], 0.0, alpha)
        src_lens = (~key_padding_mask).sum(axis=1)            # (B,)
    else:
        src_lens = jnp.full((alpha.shape[0],), alpha.shape[-1])
    residual = 1.0 - jnp.clip(alpha.sum(axis=-1, keepdims=True), 0.0, 1.0)
    last = (src_lens - 1)[:, None, None]                      # (B,1,1)
    onehot = jnp.arange(alpha.shape[-1])[None, None, :] == last
    return alpha + residual * onehot


def expected_soft_attention(alpha, soft_energy, key_padding_mask=None,
                            chunk_size: Optional[int] = None, eps: float = 1e-10,
                            neg_inf: float = -1e8):
    """MoChA/MILk beta from alpha and soft energy
    (reference monotonic_attention.py:79-152)."""
    if key_padding_mask is not None:
        alpha = jnp.where(key_padding_mask[:, None, :], 0.0, alpha)
        soft_energy = jnp.where(key_padding_mask[:, None, :], neg_inf, soft_energy)
    alpha = alpha.astype(jnp.float32)
    soft_energy = soft_energy.astype(jnp.float32)
    soft_energy = soft_energy - soft_energy.max(axis=2, keepdims=True)
    exp_e = jnp.exp(soft_energy) + eps
    if chunk_size is not None:
        beta = exp_e * moving_sum(alpha / (eps + moving_sum(exp_e, chunk_size, 1)),
                                  1, chunk_size)
    else:
        inner = alpha / (eps + jnp.cumsum(exp_e, axis=2))
        beta = exp_e * jnp.flip(jnp.cumsum(jnp.flip(inner, 2), axis=2), 2)
    if key_padding_mask is not None:
        beta = jnp.where(key_padding_mask[:, None, :], 0.0, beta)
    return jnp.clip(beta, 0.0, 1.0)


# ---------------------------------------------------------------------------
# p_choose strategies (reference p_choose_strategy.py)
# ---------------------------------------------------------------------------

def waitk_p_choose(tgt_len: int, src_len: int, bsz: int, waitk_lagging: int,
                   key_padding_mask=None, online: bool = False):
    """Deterministic one-hot diagonal p_choose (reference :6-53).
    Returns (B, tgt_len, src_len) float 0/1."""
    if key_padding_mask is not None:
        key_eos = (~key_padding_mask).sum(-1) - 1            # (B,)
    else:
        key_eos = jnp.full((bsz,), src_len - 1)
    steps = jnp.arange(tgt_len) + (waitk_lagging - 1)        # (T,)
    steps = jnp.broadcast_to(steps[None, :], (bsz, tgt_len))
    if not online:
        steps = jnp.minimum(steps, key_eos[:, None])
    return (jnp.arange(src_len)[None, None, :] == steps[:, :, None]).astype(jnp.float32)


def learnable_p_choose(energy, noise_mean: float = 0.0, noise_std: float = 1.0,
                       rng=None):
    """sigmoid(energy + N(mean, std) noise when training) (reference :56-76)."""
    noise = 0.0
    if rng is not None:
        noise = jax.random.normal(rng, energy.shape) * noise_std + noise_mean
    return jax.nn.sigmoid(energy + noise)
