"""Multi-head attention with static-shape incremental KV caches.

Functional re-design of fairseq's MultiheadAttention for the decoder stack.
The incremental state is a fixed-capacity (B, H, Tmax, hd) buffer plus a
scalar fill counter; appending writes at index `length`, and the reference's
"prune last KV on READ" rollback (/root/reference/codebase/models/mma_model.py:34-54)
becomes a counter decrement — no re-allocation, fully jittable.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from simulst_tpu.nn.core import dropout, linear, linear_init, neg_inf
from simulst_tpu.ops.ffn_pallas import seed_from_rng
from simulst_tpu.ops.linear_res_pallas import (fused_linear_drop_res,
                                               linear_res_supported)
from simulst_tpu.ops.mha_pallas import fused_mha, mha_pallas_supported


def mha_init(key, embed_dim: int, num_heads: int, kdim: Optional[int] = None,
             vdim: Optional[int] = None, dtype=jnp.float32):
    """fairseq MultiheadAttention init: xavier_uniform with gain 1/sqrt(2) on
    q/k/v when q,k,v dims match, plain xavier otherwise; out_proj xavier with
    zero bias."""
    kdim = kdim or embed_dim
    vdim = vdim or embed_dim
    qkv_same = kdim == embed_dim and vdim == embed_dim
    gain = 1 / math.sqrt(2) if qkv_same else 1.0
    kq, kk, kv, ko = jax.random.split(key, 4)
    p = {
        "q_proj": linear_init(kq, embed_dim, embed_dim, init="xavier", gain=gain, dtype=dtype),
        "k_proj": linear_init(kk, kdim, embed_dim, init="xavier", gain=gain, dtype=dtype),
        "v_proj": linear_init(kv, vdim, embed_dim, init="xavier", gain=gain, dtype=dtype),
        "out_proj": linear_init(ko, embed_dim, embed_dim, init="xavier", gain=1.0, dtype=dtype),
    }
    p["out_proj"]["bias"] = jnp.zeros_like(p["out_proj"]["bias"])
    return p


def _split_heads(x, num_heads: int):
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def attend(q, k, v, *, bias=None, key_valid=None, dropout_rate: float = 0.0,
           rng=None, deterministic: bool = True):
    """Core scaled-dot-product attention.

    q: (B, H, Tq, hd); k, v: (B, H, Tk, hd)
    bias: optional additive mask broadcastable to (B, H, Tq, Tk) — use
          neg_inf for blocked positions.
    key_valid: optional (B, Tk) bool, True for attendable keys.
    Softmax in fp32 (parity with the reference's fp32 softmax).
    """
    hd = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * (hd ** -0.5), k)
    scores = scores.astype(jnp.float32)
    ni = neg_inf(q.dtype)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if key_valid is not None:
        scores = jnp.where(key_valid[:, None, None, :], scores, ni)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    probs = dropout(rng, probs, dropout_rate, deterministic)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out, probs


def _merged_linear(parts, x):
    """One wide matmul for several same-input projections: x @ [W1|W2|...]
    + [b1|b2|...], split back afterwards.  Many small (rows, D, D) dots each
    pay MXU ramp + layout overhead; the concatenated weights are
    loop-invariant so XLA hoists the concat out of the training scan."""
    d_outs = [q["weight"].shape[1] for q in parts]
    w = jnp.concatenate([q["weight"] for q in parts], axis=1).astype(x.dtype)
    b = jnp.concatenate([q["bias"] for q in parts]).astype(x.dtype)
    y = x @ w + b
    offs = [sum(d_outs[:i]) for i in range(len(d_outs) + 1)]
    return [y[..., offs[i]:offs[i + 1]] for i in range(len(parts))]


def mha_forward(p, query, key, value, num_heads: int, *, key_valid=None,
                causal: bool = False, attn_bias=None,
                dropout_rate: float = 0.0, rng=None, deterministic: bool = True,
                epilogue=None, need_probs: bool = False):
    """Full-sequence attention. query: (B, Tq, D); key/value: (B, Tk, D').

    epilogue: optional (res, rate, rng) — fold the transformer-layer
    epilogue `res + dropout(out_proj(attn))` into the projection (one fused
    Pallas pass on TPU, plain ops elsewhere) instead of returning the bare
    projection for the caller to post-process.

    need_probs: the fused Pallas core never materializes attention weights
    (every current caller discards them) and returns probs=None; pass
    need_probs=True to force the XLA path when weights are actually needed
    (e.g. fairseq-style alignment extraction) — ADVICE r3."""
    if query is key and key is value:
        qp, kp, vp = _merged_linear(
            [p["q_proj"], p["k_proj"], p["v_proj"]], query)
    elif key is value:
        qp = linear(p["q_proj"], query)
        kp, vp = _merged_linear([p["k_proj"], p["v_proj"]], key)
    else:
        qp = linear(p["q_proj"], query)
        kp = linear(p["k_proj"], key)
        vp = linear(p["v_proj"], value)
    if attn_bias is None and not need_probs and \
            mha_pallas_supported(qp, kp, num_heads):
        # fused attention core: heads, masks, fp32 softmax and dropout all
        # stay in VMEM (ops/mha_pallas.py); probs are not materialized —
        # every full-sequence caller discards them
        rate = 0.0 if deterministic or rng is None else dropout_rate
        seed = (seed_from_rng(rng) if rate > 0.0
                else jnp.zeros((1,), jnp.int32))
        kmask = (jnp.ones(kp.shape[:2], jnp.int32) if key_valid is None
                 else key_valid.astype(jnp.int32))
        merged = fused_mha(qp, kp, vp, kmask, seed, num_heads, causal, rate)
        probs = None
    else:
        q = _split_heads(qp, num_heads)
        k = _split_heads(kp, num_heads)
        v = _split_heads(vp, num_heads)
        bias = attn_bias
        if causal:
            tq, tk = q.shape[2], k.shape[2]
            cb = jnp.where(jnp.arange(tk)[None, :] > jnp.arange(tq)[:, None],
                           neg_inf(q.dtype), 0.0)
            bias = cb if bias is None else bias + cb
        out, probs = attend(q, k, v, bias=bias, key_valid=key_valid,
                            dropout_rate=dropout_rate, rng=rng,
                            deterministic=deterministic)
        merged = _merge_heads(out)
    if epilogue is not None:
        res, ep_rate, ep_rng = epilogue
        w = p["out_proj"]["weight"]
        rate = 0.0 if deterministic or ep_rng is None else ep_rate
        if linear_res_supported(merged, w.shape[0], w.shape[1]):
            seed = (seed_from_rng(ep_rng) if rate > 0.0
                    else jnp.zeros((1,), jnp.int32))
            y = fused_linear_drop_res(
                merged, w.astype(merged.dtype),
                p["out_proj"]["bias"].astype(merged.dtype),
                res.astype(merged.dtype), seed, rate)
            return y, probs
        y = dropout(ep_rng, linear(p["out_proj"], merged), ep_rate,
                    deterministic)
        return y + res, probs
    return linear(p["out_proj"], merged), probs


class KVCache(NamedTuple):
    """Fixed-capacity incremental KV cache.  `length` is PER-EXAMPLE so a
    batch of streaming sessions can diverge (batched READ/WRITE policies)."""
    k: jnp.ndarray        # (B, H, Tmax, hd)
    v: jnp.ndarray        # (B, H, Tmax, hd)
    length: jnp.ndarray   # (B,) int32 — number of valid entries per example


def kv_cache_init(batch: int, num_heads: int, max_len: int, head_dim: int,
                  dtype=jnp.float32) -> KVCache:
    shape = (batch, num_heads, max_len, head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=jnp.zeros((batch,), jnp.int32))


def kv_cache_append(cache: KVCache, k_new, v_new) -> KVCache:
    """Append one step at each example's own fill position.
    k_new/v_new: (B, H, 1, hd)."""
    tmax = cache.k.shape[2]
    at = (jnp.arange(tmax)[None, :] == cache.length[:, None])   # (B, Tmax)
    sel = at[:, None, :, None]
    k = jnp.where(sel, k_new.astype(cache.k.dtype), cache.k)
    v = jnp.where(sel, v_new.astype(cache.v.dtype), cache.v)
    return KVCache(k=k, v=v, length=cache.length + 1)


def kv_cache_rollback(cache: KVCache, n: int = 1) -> KVCache:
    """Discard the last n appended entries (the reference pops the KV tensor;
    here validity is the counter, so this is O(1))."""
    return cache._replace(length=jnp.maximum(cache.length - n, 0))


def mha_step(p, cache: KVCache, query_step, num_heads: int,
             *, rng=None, dropout_rate: float = 0.0, deterministic: bool = True
             ) -> Tuple[jnp.ndarray, KVCache]:
    """Incremental self-attention for ONE new step. query_step: (B, 1, D)."""
    qp, kp, vp = _merged_linear(
        [p["q_proj"], p["k_proj"], p["v_proj"]], query_step)
    q = _split_heads(qp, num_heads)
    k_new = _split_heads(kp, num_heads)
    v_new = _split_heads(vp, num_heads)
    cache = kv_cache_append(cache, k_new, v_new)
    tmax = cache.k.shape[2]
    valid = jnp.arange(tmax)[None, :] < cache.length[:, None]   # (B, Tmax)
    out, _ = attend(q, cache.k.astype(q.dtype), cache.v.astype(q.dtype),
                    key_valid=valid, dropout_rate=dropout_rate, rng=rng,
                    deterministic=deterministic)
    return linear(p["out_proj"], _merge_heads(out)), cache
