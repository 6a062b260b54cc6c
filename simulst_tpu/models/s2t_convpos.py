"""s2t_transformer_convpos: offline S2T transformer with convolutional
positional embedding (parity with
/root/reference/codebase/models/s2t_transformer.py:25-111) — the ASR
architecture used before the Emformer; non-causal conv-pos, full
bidirectional self-attention encoder."""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from simulst_tpu.models import register_model
from simulst_tpu.models.s2t_emformer import EncoderOut, S2TEmformerConfig
from simulst_tpu.nn import attention as attn
from simulst_tpu.nn import conv as cnv
from simulst_tpu.nn import transformer as tfm
from simulst_tpu.nn.core import (ACTIVATIONS, dropout, gelu, layer_norm,
                                 layer_norm_init, linear, linear_init)


@dataclasses.dataclass(frozen=True)
class S2TConvPosConfig(S2TEmformerConfig):
    pass  # same dims; encoder is a plain transformer


def _conv_pos_noncausal(p, x, groups: int, kernel: int):
    """Non-causal weight-normed conv pos + SamePad + GELU
    (reference make_conv_pos :144-153): SAME padding k//2 each side, drop the
    trailing column when the kernel is even (fairseq SamePad)."""
    w = cnv._conv_pos_weight(p).astype(x.dtype)
    k = w.shape[0]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    y = cnv._conv1d(xp, w, 1, groups) + p["bias"].astype(x.dtype)
    if k % 2 == 0:
        y = y[:, :-1]
    return gelu(y)


def encoder_layer_init(key, cfg, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": attn.mha_init(ks[0], cfg.embed_dim, cfg.encoder_heads,
                                   dtype=dtype),
        "self_attn_ln": layer_norm_init(cfg.embed_dim, dtype),
        "fc1": linear_init(ks[1], cfg.embed_dim, cfg.ffn_dim, dtype=dtype),
        "fc2": linear_init(ks[2], cfg.ffn_dim, cfg.embed_dim, dtype=dtype),
        "final_ln": layer_norm_init(cfg.embed_dim, dtype),
    }


@register_model("s2t_transformer_convpos")
class S2TConvPosModel:
    Config = S2TConvPosConfig

    def __init__(self, cfg: S2TConvPosConfig):
        self.cfg = cfg

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        ks, kp, kl, kn, kd = jax.random.split(key, 5)
        enc = {
            "subsample": cnv.subsampler_init(ks, cfg.input_feat,
                                             cfg.conv_channels, cfg.embed_dim,
                                             cfg.conv_kernel_sizes, dtype),
            "conv_pos": _conv_pos_init_full(kp, cfg, dtype),
            "layers": [encoder_layer_init(k, cfg, dtype)
                       for k in jax.random.split(kl, cfg.encoder_layers)],
            "layer_norm": layer_norm_init(cfg.embed_dim, dtype),
        }
        return {"encoder": enc,
                "decoder": tfm.decoder_init(kd, cfg.decoder, dtype)}

    def encode(self, params, feats, feat_lengths, *, rng=None,
               deterministic=True) -> EncoderOut:
        cfg = self.cfg
        rngs = tfm._RngStream(rng) if rng is not None else None
        x, lengths = cnv.subsampler_apply(params["encoder"]["subsample"],
                                          feats, feat_lengths)
        x = cfg.embed_scale * x
        x = x + _conv_pos_noncausal(params["encoder"]["conv_pos"], x,
                                    cfg.conv_pos_groups, cfg.conv_pos)
        x = dropout(tfm._next(rngs), x, cfg.dropout, deterministic)
        valid = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
        act = ACTIVATIONS[cfg.activation]
        for layer in params["encoder"]["layers"]:
            residual = x
            xh = layer_norm(layer["self_attn_ln"], x)
            xh, _ = attn.mha_forward(layer["self_attn"], xh, xh, xh,
                                     cfg.encoder_heads, key_valid=valid,
                                     dropout_rate=cfg.attention_dropout,
                                     rng=tfm._next(rngs),
                                     deterministic=deterministic)
            x = residual + dropout(tfm._next(rngs), xh, cfg.dropout,
                                   deterministic)
            residual = x
            xh = layer_norm(layer["final_ln"], x)
            xh = act(linear(layer["fc1"], xh))
            xh = dropout(tfm._next(rngs), xh, cfg.activation_dropout,
                         deterministic)
            xh = linear(layer["fc2"], xh)
            x = residual + dropout(tfm._next(rngs), xh, cfg.dropout,
                                   deterministic)
        x = layer_norm(params["encoder"]["layer_norm"], x)
        return EncoderOut(encoder_out=x, lengths=lengths, ctc_logits=None)

    def forward(self, params, feats, feat_lengths, prev_tokens, *, rng=None,
                deterministic=True):
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        enc = self.encode(params, feats, feat_lengths, rng=r1,
                          deterministic=deterministic)
        valid = jnp.arange(enc.encoder_out.shape[1])[None, :] < enc.lengths[:, None]
        logits = tfm.decoder_forward(params["decoder"], self.cfg.decoder,
                                     prev_tokens, enc.encoder_out, valid,
                                     rng=r2, deterministic=deterministic)
        return logits, {"ctc_logits": None, "encoder_lengths": enc.lengths}


def _conv_pos_init_full(key, cfg, dtype):
    """Non-causal conv pos uses the FULL kernel size (reference :145-151),
    unlike the causal variant's (k+1)//2."""
    k = cfg.conv_pos
    std = math.sqrt(4.0 / (cfg.conv_pos * cfg.embed_dim))
    v = std * jax.random.normal(key, (k, cfg.embed_dim // cfg.conv_pos_groups,
                                      cfg.embed_dim), dtype)
    g = jnp.sqrt((v.astype(jnp.float32) ** 2).sum(axis=(1, 2), keepdims=True))
    return {"v": v, "g": g.astype(dtype), "bias": jnp.zeros((cfg.embed_dim,), dtype)}
