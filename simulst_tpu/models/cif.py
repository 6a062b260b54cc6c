"""CIF (Continuous Integrate-and-Fire) adaptive simultaneous translation model.

Parity with the reference's `cif_transformer`
(/root/reference/codebase/models/cif_transformer.py): Emformer encoder +
CIFLayer (causal-conv alpha predictor + cif_function) + a decoder whose
cross-attention is position-aligned over the fired CIF features
(FakeCrossAttn :340-362) or causally-masked soft attention
(cif_infinite_lookback :365-537), with the highway connection and the EOS
overshoot bias (:692-724).
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from simulst_tpu.models import register_model
from simulst_tpu.models import s2t_emformer as s2t
from simulst_tpu.nn import attention as attn
from simulst_tpu.nn import conv as cnv
from simulst_tpu.nn import transformer as tfm
from simulst_tpu.nn.core import (dropout, gelu, layer_norm, layer_norm_init,
                                 linear, linear_init, neg_inf)
from simulst_tpu.ops.cif import CifOut, cif_function


@dataclasses.dataclass(frozen=True)
class CIFConfig(s2t.S2TEmformerConfig):
    cif_beta: float = 1.0
    cif_sg_alpha: bool = False
    cif_conv_kernel: int = 3
    cif_highway: bool = False
    cif_infinite_lookback: bool = False
    ctc_layer: bool = True  # arch cif_transformer_s forces this (:734)


# ---------------------------------------------------------------------------
# CIF layer (alpha predictor + integrate-and-fire)
# ---------------------------------------------------------------------------

def cif_layer_init(key, cfg: CIFConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    d = cfg.embed_dim
    return {
        "conv": cnv.conv1d_init(k1, d, d, cfg.cif_conv_kernel, dtype=dtype),
        "ln": layer_norm_init(d, dtype),
        "proj": linear_init(k2, d, 1, dtype=dtype),
    }


def _alpha_from_x(p, cfg: CIFConfig, x, rng=None, deterministic=True,
                  conv_cache: Optional[cnv.ConvCache] = None):
    """alpha predictor: CausalConv -> LN -> GELU -> Dropout -> Linear -> sigmoid
    (reference :124-130). x: (B, S, D) -> (B, S)."""
    h = jax.lax.stop_gradient(x) if cfg.cif_sg_alpha else x
    if conv_cache is None:
        h = cnv.causal_conv1d(p["conv"], h)
        new_cache = None
    else:
        h, new_cache = cnv.causal_conv1d_step(p["conv"], conv_cache, h)
    h = gelu(layer_norm(p["ln"], h))
    h = dropout(rng, h, cfg.activation_dropout, deterministic)
    a = jax.nn.sigmoid(linear(p["proj"], h)[..., 0])
    return a, new_cache


def cif_layer_forward(p, cfg: CIFConfig, x, encoder_valid, target_lengths=None,
                      max_out_len: Optional[int] = None, rng=None,
                      deterministic=True) -> Tuple[CifOut, jnp.ndarray]:
    """Offline/training CIF. x: (B, S, D); encoder_valid: (B, S) bool.
    Returns (CifOut, alpha (B,S))."""
    alpha, _ = _alpha_from_x(p, cfg, x, rng, deterministic)
    alpha = jnp.where(encoder_valid, alpha, 0.0)
    xm = jnp.where(encoder_valid[:, :, None], x, 0.0)
    if max_out_len is None:
        max_out_len = int(math.ceil(x.shape[1] / cfg.cif_beta)) + 2
    out = cif_function(xm, alpha, beta=cfg.cif_beta,
                       tail_thres=cfg.cif_beta / 2,
                       target_lengths=target_lengths, max_out_len=max_out_len)
    return out, alpha


class CIFStreamState(NamedTuple):
    conv: cnv.ConvCache
    prev_weight: jnp.ndarray  # (B, 1)
    prev_feat: jnp.ndarray    # (B, 1, D)


def cif_layer_init_state(p, cfg: CIFConfig, batch: int, dtype=jnp.float32):
    return CIFStreamState(
        conv=cnv.causal_conv1d_init_cache(p["conv"], batch, cfg.embed_dim, dtype),
        prev_weight=jnp.zeros((batch, 1), jnp.float32),
        prev_feat=jnp.zeros((batch, 1, cfg.embed_dim), dtype))


def cif_layer_step(p, cfg: CIFConfig, state: CIFStreamState, x, finish: bool,
                   x_valid=None) -> Tuple[jnp.ndarray, jnp.ndarray, CIFStreamState]:
    """Streaming CIF on a new chunk (reference :189-261).

    x: (B, c, D) new encoder frames. Returns (cif_feats (B, Tmax, D),
    n_emitted (B,), new_state); emitted = cif_len - 1 mid-stream (the last,
    incomplete accumulation is carried), everything on finish.

    x_valid: optional (B,) per-example count of valid frames in x (batched
    final chunks where examples end at different offsets); frames beyond it
    contribute zero alpha, exactly as if absent.
    """
    b, c, d = x.shape
    alpha, conv_cache = _alpha_from_x(p, cfg, x, conv_cache=state.conv)
    if x_valid is not None:
        alpha = jnp.where(jnp.arange(c)[None, :] < x_valid[:, None], alpha, 0.0)
    a = jnp.concatenate([state.prev_weight, alpha], axis=1)     # (B, 1+c)
    xx = jnp.concatenate([state.prev_feat, x], axis=1)
    mol = xx.shape[1] + 2
    res = cif_function(xx, a, beta=cfg.cif_beta,
                       tail_thres=(cfg.cif_beta / 2) if finish else 0.0,
                       max_out_len=mol)
    if finish:
        n_emit = res.cif_lengths
        new_state = CIFStreamState(conv=conv_cache,
                                   prev_weight=jnp.zeros_like(state.prev_weight),
                                   prev_feat=jnp.zeros_like(state.prev_feat))
    else:
        n_emit = res.cif_lengths - 1
        tail_idx = jnp.maximum(res.cif_lengths - 1, 0).astype(jnp.int32)
        tail_feat = jnp.take_along_axis(
            res.cif_out, jnp.broadcast_to(tail_idx[:, None, None], (b, 1, d)),
            axis=1)
        new_state = CIFStreamState(
            conv=conv_cache,
            prev_weight=res.tail_weights[:, None],
            prev_feat=tail_feat / cfg.cif_beta)
    return res.cif_out, n_emit, new_state


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def fake_cross_attn_init(key, cfg: CIFConfig, dtype=jnp.float32):
    """Position-aligned 'attention': out_proj(GELU(q_proj(x) + k_proj(cif)))
    (reference :340-362)."""
    kq, kk, ko = jax.random.split(key, 3)
    d, kd = cfg.embed_dim, cfg.embed_dim
    gain = 1 / math.sqrt(2)
    p = {
        "q_proj": linear_init(kq, d, d, bias=False, init="xavier", gain=gain, dtype=dtype),
        "k_proj": linear_init(kk, kd, d, init="xavier", gain=gain, dtype=dtype),
        "out_proj": linear_init(ko, d, d, init="xavier", dtype=dtype),
    }
    p["out_proj"]["bias"] = jnp.zeros_like(p["out_proj"]["bias"])
    return p


def fake_cross_attn(p, query, key):
    return linear(p["out_proj"], gelu(linear(p["q_proj"], query)
                                      + linear(p["k_proj"], key)))


def cif_decoder_layer_init(key, cfg: CIFConfig, dtype=jnp.float32):
    dcfg = cfg.decoder
    ks = jax.random.split(key, 4)
    p = {
        "self_attn": attn.mha_init(ks[0], dcfg.embed_dim, dcfg.num_heads, dtype=dtype),
        "self_attn_ln": layer_norm_init(dcfg.embed_dim, dtype),
        "encoder_attn_ln": layer_norm_init(dcfg.embed_dim, dtype),
        "fc1": linear_init(ks[2], dcfg.embed_dim, dcfg.ffn_dim, dtype=dtype),
        "fc2": linear_init(ks[3], dcfg.ffn_dim, dcfg.embed_dim, dtype=dtype),
        "final_ln": layer_norm_init(dcfg.embed_dim, dtype),
    }
    if cfg.cif_infinite_lookback:
        p["encoder_attn"] = attn.mha_init(ks[1], dcfg.embed_dim, dcfg.num_heads,
                                          kdim=cfg.embed_dim, vdim=cfg.embed_dim,
                                          dtype=dtype)
    else:
        p["encoder_attn"] = fake_cross_attn_init(ks[1], cfg, dtype)
    return p


def cif_decoder_init(key, cfg: CIFConfig, dtype=jnp.float32):
    dcfg = cfg.decoder
    ke, kl = jax.random.split(key)
    return {
        "embed_tokens": tfm.embedding_init(ke, dcfg.vocab_size, dcfg.embed_dim,
                                           dcfg.padding_idx, dtype),
        "layers": [cif_decoder_layer_init(k, cfg, dtype)
                   for k in jax.random.split(kl, dcfg.num_layers)],
        "layer_norm": layer_norm_init(dcfg.embed_dim, dtype),
    }


def cif_decoder_forward(p, cfg: CIFConfig, prev_tokens, cif_feats, cif_lengths,
                        *, rng=None, deterministic=True):
    """Teacher-forced forward: cif_feats (B, T, D) position-aligned with
    prev_tokens (teacher-forced lengths). Returns logits (B, T, V)."""
    dcfg = cfg.decoder
    rngs = tfm._RngStream(rng) if rng is not None else None
    positions = tfm.positions_from_tokens(prev_tokens, dcfg.padding_idx)
    x = tfm.decoder_embed(p, dcfg, prev_tokens, positions, rngs, deterministic)
    self_valid = prev_tokens != dcfg.padding_idx
    t = prev_tokens.shape[1]
    cif = cif_feats[:, :t].astype(x.dtype)
    for layer in p["layers"]:
        residual = x
        xh = layer_norm(layer["self_attn_ln"], x)
        xh, _ = attn.mha_forward(layer["self_attn"], xh, xh, xh, dcfg.num_heads,
                                 key_valid=self_valid, causal=True,
                                 dropout_rate=dcfg.attention_dropout,
                                 rng=tfm._next(rngs), deterministic=deterministic)
        x = residual + dropout(tfm._next(rngs), xh, dcfg.dropout, deterministic)

        residual = x
        xh = layer_norm(layer["encoder_attn_ln"], x)
        if cfg.cif_infinite_lookback:
            # causal (future-masked) soft attention over fired CIF features
            xh, _ = attn.mha_forward(layer["encoder_attn"], xh, cif, cif,
                                     dcfg.num_heads, causal=True,
                                     key_valid=(jnp.arange(t)[None, :]
                                                < cif_lengths[:, None]),
                                     dropout_rate=dcfg.attention_dropout,
                                     rng=tfm._next(rngs),
                                     deterministic=deterministic)
        else:
            xh = fake_cross_attn(layer["encoder_attn"], xh, cif)
        x = residual + dropout(tfm._next(rngs), xh, dcfg.dropout, deterministic)
        x = tfm._ffn(layer, dcfg, x, rngs, deterministic)
    x = layer_norm(p["layer_norm"], x)
    if cfg.cif_highway:
        x = x + cif
    return tfm.output_layer(p, dcfg, x)


class CIFDecoderState(NamedTuple):
    caches: Tuple[attn.KVCache, ...]
    cross_caches: Tuple[attn.KVCache, ...]  # used only for infinite_lookback
    step: jnp.ndarray                       # (B,) per-example decoded count


def cif_decoder_init_state(cfg: CIFConfig, batch: int, max_len: int,
                           dtype=jnp.float32) -> CIFDecoderState:
    dcfg = cfg.decoder
    hd = dcfg.embed_dim // dcfg.num_heads
    mk = lambda: tuple(attn.kv_cache_init(batch, dcfg.num_heads, max_len, hd, dtype)
                       for _ in range(dcfg.num_layers))
    return CIFDecoderState(caches=mk(), cross_caches=mk(),
                           step=jnp.zeros((batch,), jnp.int32))


def cif_decoder_step(p, cfg: CIFConfig, state: CIFDecoderState, token,
                     cif_buf, cif_len, overshoot_weight: float = 1.0):
    """One decode step. cif_buf: (B, Tmax, D) fired features (cif_len valid).

    Gathers the CIF feature at min(cif_len, step+1)-1 (reference :622-633)
    and applies the EOS overshoot bias (:716-723).
    """
    dcfg = cfg.decoder
    b = token.shape[0]
    pos = dcfg.padding_idx + 1 + state.step                 # (B,)
    x = dcfg.embed_scale * tfm.embedding(p["embed_tokens"], token[:, None])
    x = x + tfm._pos_table(dcfg)[pos][:, None, :].astype(x.dtype)

    t1 = state.step + 1                                     # (B,) tokens incl. this
    cif_idx = jnp.clip(jnp.minimum(cif_len, t1) - 1, 0, cif_buf.shape[1] - 1)
    cif_t = jnp.take_along_axis(cif_buf, cif_idx[:, None, None], axis=1)  # (B,1,D)

    new_caches, new_cross = [], []
    for layer, cache, xcache in zip(p["layers"], state.caches, state.cross_caches):
        residual = x
        xh = layer_norm(layer["self_attn_ln"], x)
        xh, cache = attn.mha_step(layer["self_attn"], cache, xh, dcfg.num_heads)
        x = residual + xh

        residual = x
        xh = layer_norm(layer["encoder_attn_ln"], x)
        if cfg.cif_infinite_lookback:
            # static_kv=False semantics: append this step's cif feature to the
            # cross KV cache and attend the prefix (reference :494-504)
            h = dcfg.num_heads
            k_new = attn._split_heads(linear(layer["encoder_attn"]["k_proj"], cif_t), h)
            v_new = attn._split_heads(linear(layer["encoder_attn"]["v_proj"], cif_t), h)
            xcache = attn.kv_cache_append(xcache, k_new, v_new)
            q = attn._split_heads(linear(layer["encoder_attn"]["q_proj"], xh), h)
            tmax = xcache.k.shape[2]
            valid = jnp.arange(tmax)[None, :] < xcache.length[:, None]
            out, _ = attn.attend(q, xcache.k.astype(q.dtype),
                                 xcache.v.astype(q.dtype), key_valid=valid)
            xh = linear(layer["encoder_attn"]["out_proj"], attn._merge_heads(out))
        else:
            xh = fake_cross_attn(layer["encoder_attn"], xh, cif_t.astype(xh.dtype))
        x = residual + xh
        x = tfm._ffn(layer, dcfg, x, None, True)
        new_caches.append(cache)
        new_cross.append(xcache)

    x = layer_norm(p["layer_norm"], x)
    if cfg.cif_highway:
        x = x + cif_t.astype(x.dtype)
    logits = tfm.output_layer(p, dcfg, x)[:, 0]
    overshoot = jnp.maximum(t1 - cif_len, 0).astype(logits.dtype)
    logits = logits.at[:, dcfg.eos_idx].add(overshoot * overshoot_weight)
    new_state = CIFDecoderState(caches=tuple(new_caches),
                                cross_caches=tuple(new_cross), step=t1)
    return logits, new_state


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

@register_model("cif")
class CIFModel:
    Config = CIFConfig

    def __init__(self, cfg: CIFConfig):
        self.cfg = cfg

    def init(self, key, dtype=jnp.float32):
        ke, kc, kd = jax.random.split(key, 3)
        return {"encoder": s2t.encoder_init(ke, self.cfg, dtype),
                "cif": cif_layer_init(kc, self.cfg, dtype),
                "decoder": cif_decoder_init(kd, self.cfg, dtype)}

    def forward(self, params, feats, feat_lengths, prev_tokens, *, rng=None,
                deterministic=True):
        """Training forward with teacher-forced CIF lengths
        (reference :88-98: target_lengths = non-pad count of prev_tokens)."""
        r1 = r2 = r3 = None
        if rng is not None:
            r1, r2, r3 = jax.random.split(rng, 3)
        cfg = self.cfg
        enc = s2t.encoder_forward(params["encoder"], cfg, feats, feat_lengths,
                                  rng=r1, deterministic=deterministic)
        valid = (jnp.arange(enc.encoder_out.shape[1])[None, :]
                 < enc.lengths[:, None])
        target_lengths = (prev_tokens != cfg.padding_idx).sum(axis=1)
        cif_out, alpha = cif_layer_forward(
            params["cif"], cfg, enc.encoder_out, valid,
            target_lengths=target_lengths, max_out_len=prev_tokens.shape[1],
            rng=r2, deterministic=deterministic)
        logits = cif_decoder_forward(params["decoder"], cfg, prev_tokens,
                                     cif_out.cif_out, cif_out.cif_lengths,
                                     rng=r3, deterministic=deterministic)
        return logits, {"ctc_logits": enc.ctc_logits,
                        "encoder_lengths": enc.lengths,
                        "alpha": alpha, "delays": cif_out.delays,
                        "cif_lengths": cif_out.cif_lengths}
