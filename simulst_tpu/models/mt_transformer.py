"""MT transformer (`transformer_small`) — the seq-KD teacher.

Parity with /root/reference/codebase/models/mt_transformer.py:7-20:
256d / 4 heads / 6+6 layers / ffn 2048 (x8), pre-LN, shared decoder
input/output embeddings.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from simulst_tpu.models import register_model
from simulst_tpu.nn import attention as attn
from simulst_tpu.nn import transformer as tfm
from simulst_tpu.nn.core import (ACTIVATIONS, dropout, embedding, embedding_init,
                                 layer_norm, layer_norm_init, linear, linear_init)


@dataclasses.dataclass(frozen=True)
class MTConfig:
    vocab_size: int = 8000
    src_vocab_size: Optional[int] = None   # None -> joined dictionary (shared)
    embed_dim: int = 256
    ffn_dim: int = 2048
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 4
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    share_all_embeddings: bool = True
    padding_idx: int = 1
    eos_idx: int = 2
    max_positions: int = 1024

    @property
    def decoder(self) -> tfm.DecoderConfig:
        return tfm.DecoderConfig(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim, num_layers=self.decoder_layers,
            num_heads=self.num_heads, dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            activation=self.activation, share_input_output_embed=True,
            padding_idx=self.padding_idx, eos_idx=self.eos_idx,
            encoder_embed_dim=self.embed_dim,
            max_target_positions=self.max_positions)


def encoder_layer_init(key, cfg: MTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": attn.mha_init(ks[0], cfg.embed_dim, cfg.num_heads, dtype=dtype),
        "self_attn_ln": layer_norm_init(cfg.embed_dim, dtype),
        "fc1": linear_init(ks[1], cfg.embed_dim, cfg.ffn_dim, dtype=dtype),
        "fc2": linear_init(ks[2], cfg.ffn_dim, cfg.embed_dim, dtype=dtype),
        "final_ln": layer_norm_init(cfg.embed_dim, dtype),
    }


def text_encoder_forward(p, cfg: MTConfig, tokens, *, rng=None,
                         deterministic=True):
    rngs = tfm._RngStream(rng) if rng is not None else None
    act = ACTIVATIONS[cfg.activation]
    valid = tokens != cfg.padding_idx
    positions = tfm.positions_from_tokens(tokens, cfg.padding_idx)
    table = tfm.sinusoidal_table(cfg.max_positions + cfg.padding_idx + 1,
                                 cfg.embed_dim, cfg.padding_idx)
    x = math.sqrt(cfg.embed_dim) * embedding(p["embed_tokens"], tokens)
    x = x + table[positions].astype(x.dtype)
    x = dropout(tfm._next(rngs), x, cfg.dropout, deterministic)
    for layer in p["layers"]:
        residual = x
        xh = layer_norm(layer["self_attn_ln"], x)
        xh, _ = attn.mha_forward(layer["self_attn"], xh, xh, xh, cfg.num_heads,
                                 key_valid=valid,
                                 dropout_rate=cfg.attention_dropout,
                                 rng=tfm._next(rngs), deterministic=deterministic)
        x = residual + dropout(tfm._next(rngs), xh, cfg.dropout, deterministic)
        residual = x
        xh = layer_norm(layer["final_ln"], x)
        xh = act(linear(layer["fc1"], xh))
        xh = dropout(tfm._next(rngs), xh, cfg.activation_dropout, deterministic)
        xh = linear(layer["fc2"], xh)
        x = residual + dropout(tfm._next(rngs), xh, cfg.dropout, deterministic)
    return layer_norm(p["layer_norm"], x), valid


@register_model("mt_transformer")
class MTTransformerModel:
    Config = MTConfig

    def __init__(self, cfg: MTConfig):
        self.cfg = cfg

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        ke, kl, kd = jax.random.split(key, 3)
        src_vocab = cfg.src_vocab_size or cfg.vocab_size
        enc = {
            "embed_tokens": embedding_init(ke, src_vocab, cfg.embed_dim,
                                           cfg.padding_idx, dtype),
            "layers": [encoder_layer_init(k, cfg, dtype)
                       for k in jax.random.split(kl, cfg.encoder_layers)],
            "layer_norm": layer_norm_init(cfg.embed_dim, dtype),
        }
        dec = tfm.decoder_init(kd, cfg.decoder, dtype)
        if cfg.share_all_embeddings:
            dec["embed_tokens"] = enc["embed_tokens"]
        return {"encoder": enc, "decoder": dec}

    def forward(self, params, src_tokens, prev_tokens, *, rng=None,
                deterministic=True):
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        enc, enc_valid = text_encoder_forward(params["encoder"], self.cfg,
                                              src_tokens, rng=r1,
                                              deterministic=deterministic)
        logits = tfm.decoder_forward(params["decoder"], self.cfg.decoder,
                                     prev_tokens, enc, enc_valid, rng=r2,
                                     deterministic=deterministic)
        return logits, {"encoder_out": enc, "encoder_valid": enc_valid}
