"""Transformer decoder (fairseq-semantics) with jittable incremental steps.

Mirrors the behavior of fairseq's TransformerDecoder as configured by the
reference's `s2t_transformer_s`/`s2t_emformer_s` archs
(/root/reference/codebase/models/s2t_emformer.py:398-413): pre-LN, sinusoidal
positions (padding_idx offset), GELU FFN, shared input/output embedding.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from simulst_tpu.nn import attention as attn
from simulst_tpu.nn.core import (ACTIVATIONS, dropout, embedding, embedding_init,
                                 layer_norm, layer_norm_init, linear, linear_init)
from simulst_tpu.ops.ffn_pallas import (ffn_pallas_supported, fused_ffn,
                                        seed_from_rng)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    embed_dim: int = 256
    ffn_dim: int = 2048
    num_layers: int = 6
    num_heads: int = 4
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = True
    share_input_output_embed: bool = True
    padding_idx: int = 1
    eos_idx: int = 2
    encoder_embed_dim: int = 256
    max_target_positions: int = 1024
    no_scale_embedding: bool = False
    compute_dtype: str = "float32"

    @property
    def embed_scale(self) -> float:
        return 1.0 if self.no_scale_embedding else math.sqrt(self.embed_dim)


# ---------------------------------------------------------------------------
# sinusoidal positions (fairseq SinusoidalPositionalEmbedding parity)
# ---------------------------------------------------------------------------

def sinusoidal_table(num_embeddings: int, dim: int, padding_idx: int) -> jnp.ndarray:
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = jnp.arange(num_embeddings, dtype=jnp.float32)[:, None] * freqs[None, :]
    table = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        table = jnp.concatenate([table, jnp.zeros((num_embeddings, 1))], axis=1)
    table = table.at[padding_idx].set(0.0)
    return table


def positions_from_tokens(tokens, padding_idx: int):
    """fairseq make_positions: pad stays padding_idx, others count from
    padding_idx + 1."""
    mask = tokens != padding_idx
    return (jnp.cumsum(mask, axis=1) * mask + padding_idx).astype(jnp.int32)


# ---------------------------------------------------------------------------
# decoder layer
# ---------------------------------------------------------------------------

def decoder_layer_init(key, cfg: DecoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "self_attn": attn.mha_init(ks[0], cfg.embed_dim, cfg.num_heads, dtype=dtype),
        "self_attn_ln": layer_norm_init(cfg.embed_dim, dtype),
        "encoder_attn": attn.mha_init(ks[1], cfg.embed_dim, cfg.num_heads,
                                      kdim=cfg.encoder_embed_dim,
                                      vdim=cfg.encoder_embed_dim, dtype=dtype),
        "encoder_attn_ln": layer_norm_init(cfg.embed_dim, dtype),
        "fc1": linear_init(ks[2], cfg.embed_dim, cfg.ffn_dim, dtype=dtype),
        "fc2": linear_init(ks[3], cfg.ffn_dim, cfg.embed_dim, dtype=dtype),
        "final_ln": layer_norm_init(cfg.embed_dim, dtype),
    }


def _ffn(p, cfg: DecoderConfig, x, rngs, deterministic):
    residual = x
    if cfg.normalize_before:
        x = layer_norm(p["final_ln"], x)
    w1 = p["fc1"]["weight"]
    if cfg.activation in ("gelu", "relu") and \
            ffn_pallas_supported(x, w1.shape[0], w1.shape[1]):
        rng_a, rng_b = _next(rngs), _next(rngs)
        act_rate = 0.0 if deterministic or rng_a is None \
            else cfg.activation_dropout
        out_rate = 0.0 if deterministic or rng_b is None else cfg.dropout
        seed = (seed_from_rng(rng_a) if act_rate or out_rate
                else jnp.zeros((1,), jnp.int32))
        d = x.dtype
        x = fused_ffn(x, w1.astype(d), p["fc1"]["bias"].astype(d),
                      p["fc2"]["weight"].astype(d),
                      p["fc2"]["bias"].astype(d), seed,
                      cfg.activation, act_rate, out_rate)
    else:
        act = ACTIVATIONS[cfg.activation]
        x = act(linear(p["fc1"], x))
        x = dropout(_next(rngs), x, cfg.activation_dropout, deterministic)
        x = linear(p["fc2"], x)
        x = dropout(_next(rngs), x, cfg.dropout, deterministic)
    x = x + residual
    if not cfg.normalize_before:
        x = layer_norm(p["final_ln"], x)
    return x


class _RngStream:
    """Deterministic rng splitter; None-safe."""

    def __init__(self, key):
        self.key = key

    def next(self):
        if self.key is None:
            return None
        self.key, sub = jax.random.split(self.key)
        return sub


def _next(rngs: Optional[_RngStream]):
    return None if rngs is None else rngs.next()


def decoder_layer_forward(p, cfg: DecoderConfig, x, encoder_out, encoder_valid,
                          *, self_attn_valid=None, rngs=None, deterministic=True):
    """Training forward. x: (B, T, D); encoder_out: (B, S, De)."""
    residual = x
    if cfg.normalize_before:
        x = layer_norm(p["self_attn_ln"], x)
    x, _ = attn.mha_forward(p["self_attn"], x, x, x, cfg.num_heads,
                            key_valid=self_attn_valid, causal=True,
                            dropout_rate=cfg.attention_dropout,
                            rng=_next(rngs), deterministic=deterministic,
                            epilogue=(residual, cfg.dropout, _next(rngs)))
    if not cfg.normalize_before:
        x = layer_norm(p["self_attn_ln"], x)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(p["encoder_attn_ln"], x)
    x, cross_probs = attn.mha_forward(p["encoder_attn"], x, encoder_out, encoder_out,
                                      cfg.num_heads, key_valid=encoder_valid,
                                      dropout_rate=cfg.attention_dropout,
                                      rng=_next(rngs), deterministic=deterministic,
                                      epilogue=(residual, cfg.dropout,
                                                _next(rngs)))
    if not cfg.normalize_before:
        x = layer_norm(p["encoder_attn_ln"], x)

    return _ffn(p, cfg, x, rngs, deterministic), cross_probs


def decoder_layer_step(p, cfg: DecoderConfig, cache: attn.KVCache, x_step,
                       encoder_out, encoder_valid) -> Tuple[jnp.ndarray, attn.KVCache]:
    """Incremental step (deterministic). x_step: (B, 1, D)."""
    residual = x_step
    x = layer_norm(p["self_attn_ln"], x_step) if cfg.normalize_before else x_step
    x, cache = attn.mha_step(p["self_attn"], cache, x, cfg.num_heads)
    x = x + residual
    if not cfg.normalize_before:
        x = layer_norm(p["self_attn_ln"], x)

    residual = x
    if cfg.normalize_before:
        x = layer_norm(p["encoder_attn_ln"], x)
    x, _ = attn.mha_forward(p["encoder_attn"], x, encoder_out, encoder_out,
                            cfg.num_heads, key_valid=encoder_valid)
    x = x + residual
    if not cfg.normalize_before:
        x = layer_norm(p["encoder_attn_ln"], x)

    return _ffn(p, cfg, x, None, True), cache


# ---------------------------------------------------------------------------
# full decoder
# ---------------------------------------------------------------------------

def decoder_init(key, cfg: DecoderConfig, dtype=jnp.float32):
    ke, kl, ko = jax.random.split(key, 3)
    p = {
        "embed_tokens": embedding_init(ke, cfg.vocab_size, cfg.embed_dim,
                                       cfg.padding_idx, dtype),
        "layers": [decoder_layer_init(k, cfg, dtype)
                   for k in jax.random.split(kl, cfg.num_layers)],
        "layer_norm": layer_norm_init(cfg.embed_dim, dtype),
    }
    if not cfg.share_input_output_embed:
        p["output_projection"] = linear_init(
            ko, cfg.embed_dim, cfg.vocab_size, bias=False,
            init="normal", gain=cfg.embed_dim ** -0.5, dtype=dtype)
    return p


def _pos_table(cfg: DecoderConfig):
    return sinusoidal_table(cfg.max_target_positions + cfg.padding_idx + 1,
                            cfg.embed_dim, cfg.padding_idx)


def decoder_embed(p, cfg: DecoderConfig, tokens, positions, rngs, deterministic):
    x = cfg.embed_scale * embedding(p["embed_tokens"], tokens,
                                    dtype=cfg.compute_dtype)
    table = _pos_table(cfg)
    x = x + table[positions].astype(x.dtype)
    return dropout(_next(rngs), x, cfg.dropout, deterministic)


def output_layer(p, cfg: DecoderConfig, x):
    if cfg.share_input_output_embed:
        return x @ p["embed_tokens"]["weight"].astype(x.dtype).T
    return linear(p["output_projection"], x)


def decoder_forward(p, cfg: DecoderConfig, prev_tokens, encoder_out, encoder_valid,
                    *, rng=None, deterministic=True, features_only=False):
    """Teacher-forced forward. prev_tokens: (B, T) with EOS moved to front."""
    rngs = _RngStream(rng) if rng is not None else None
    positions = positions_from_tokens(prev_tokens, cfg.padding_idx)
    x = decoder_embed(p, cfg, prev_tokens, positions, rngs, deterministic)
    self_valid = prev_tokens != cfg.padding_idx
    # fairseq passes self_attn_padding_mask only when padding exists; with
    # causal masking + loss masking the padded-key contribution is irrelevant,
    # but we mask anyway for cleanliness.
    for layer in p["layers"]:
        x, _ = decoder_layer_forward(layer, cfg, x, encoder_out, encoder_valid,
                                     self_attn_valid=self_valid, rngs=rngs,
                                     deterministic=deterministic)
    x = layer_norm(p["layer_norm"], x)
    if features_only:
        return x
    return output_layer(p, cfg, x)


class DecoderState(NamedTuple):
    caches: Tuple[attn.KVCache, ...]
    step: jnp.ndarray  # (B,) int32 — tokens consumed so far, per example


def decoder_init_state(cfg: DecoderConfig, batch: int, max_len: int,
                       dtype=jnp.float32) -> DecoderState:
    hd = cfg.embed_dim // cfg.num_heads
    caches = tuple(attn.kv_cache_init(batch, cfg.num_heads, max_len, hd, dtype)
                   for _ in range(cfg.num_layers))
    return DecoderState(caches=caches, step=jnp.zeros((batch,), jnp.int32))


def decoder_step(p, cfg: DecoderConfig, state: DecoderState, token, encoder_out,
                 encoder_valid) -> Tuple[jnp.ndarray, DecoderState]:
    """One greedy/beam decode step. token: (B,) int32 (the prev token)."""
    pos = cfg.padding_idx + 1 + state.step                  # (B,)
    x = cfg.embed_scale * embedding(p["embed_tokens"], token[:, None])
    x = x + _pos_table(cfg)[pos][:, None, :].astype(x.dtype)
    new_caches = []
    for layer, cache in zip(p["layers"], state.caches):
        x, cache = decoder_layer_step(layer, cfg, cache, x, encoder_out, encoder_valid)
        new_caches.append(cache)
    x = layer_norm(p["layer_norm"], x)
    logits = output_layer(p, cfg, x)
    return logits[:, 0], DecoderState(caches=tuple(new_caches), step=state.step + 1)
