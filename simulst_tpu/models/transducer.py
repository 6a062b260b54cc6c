"""Transformer-Transducer model (experimental parity).

Parity with the reference's `transducer_model`
(/root/reference/codebase/models/transducer_model.py): Emformer encoder +
label encoder (transformer decoder WITHOUT cross-attention, with depth-scaled
init) + SimpleJoiner producing a (B, S, U, V) lattice; optional length-aware
average-pool source downsampling with last-frame rescale; streaming greedy
step that forces an emit at the source EOS, masks past frames to blank, and
picks the first non-blank frame (:165-209).  blank == bos (index 0).
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
from simulst_tpu.nn import transformer as tfm
from simulst_tpu.nn.core import (dropout, layer_norm, layer_norm_init, linear,
                                 linear_init, xavier_uniform)


@dataclasses.dataclass(frozen=True)
class TransducerConfig(s2t.S2TEmformerConfig):
    downsample: int = 1
    blank_idx: int = 0  # == bos


# ---------------------------------------------------------------------------
# label encoder (decoder stack without cross-attention)
# ---------------------------------------------------------------------------

def label_encoder_layer_init(key, cfg: TransducerConfig, dtype=jnp.float32):
    dcfg = cfg.decoder
    ks = jax.random.split(key, 3)
    scale = (3 * 2 * dcfg.num_layers) ** -0.25
    p = {
        "self_attn": attn.mha_init(ks[0], dcfg.embed_dim, dcfg.num_heads, dtype=dtype),
        "self_attn_ln": layer_norm_init(dcfg.embed_dim, dtype),
        "fc1": linear_init(ks[1], dcfg.embed_dim, dcfg.ffn_dim, dtype=dtype),
        "fc2": linear_init(ks[2], dcfg.ffn_dim, dcfg.embed_dim, dtype=dtype),
        "final_ln": layer_norm_init(dcfg.embed_dim, dtype),
    }
    # DeepNet-ish scaling the reference applies (:113-122)
    for name in ("fc1", "fc2"):
        p[name]["weight"] = p[name]["weight"] * scale
    p["self_attn"]["v_proj"]["weight"] = p["self_attn"]["v_proj"]["weight"] * scale
    p["self_attn"]["out_proj"]["weight"] = p["self_attn"]["out_proj"]["weight"] * scale
    return p


def joiner_init(key, cfg: TransducerConfig, dtype=jnp.float32):
    ks, kt = jax.random.split(key)
    d = cfg.embed_dim
    p = {
        "source_projection": {
            "weight": xavier_uniform(ks, (cfg.embed_dim, d),
                                     gain=(cfg.encoder_layers + 1) ** -0.5,
                                     dtype=dtype),
            "bias": jnp.zeros((d,), dtype)},
        "target_projection": {
            "weight": xavier_uniform(kt, (d, d),
                                     gain=(cfg.decoder_layers + 1) ** -0.5,
                                     dtype=dtype)},
    }
    return p


def transducer_decoder_init(key, cfg: TransducerConfig, dtype=jnp.float32):
    dcfg = cfg.decoder
    ke, kl, kj = jax.random.split(key, 3)
    emb = tfm.embedding_init(ke, dcfg.vocab_size, dcfg.embed_dim,
                             dcfg.padding_idx, dtype)
    emb["weight"] = emb["weight"] * ((3 * 2 * dcfg.num_layers) ** -0.25)
    return {
        "embed_tokens": emb,
        "layers": [label_encoder_layer_init(k, cfg, dtype)
                   for k in jax.random.split(kl, dcfg.num_layers)],
        "layer_norm": layer_norm_init(dcfg.embed_dim, dtype),
        "joiner": joiner_init(kj, cfg, dtype),
    }


def _label_features(p, cfg: TransducerConfig, tokens, rngs, deterministic):
    dcfg = cfg.decoder
    positions = tfm.positions_from_tokens(tokens, dcfg.padding_idx)
    x = tfm.decoder_embed(p, dcfg, tokens, positions, rngs, deterministic)
    valid = tokens != dcfg.padding_idx
    for layer in p["layers"]:
        residual = x
        xh = layer_norm(layer["self_attn_ln"], x)
        xh, _ = attn.mha_forward(layer["self_attn"], xh, xh, xh, dcfg.num_heads,
                                 key_valid=valid, causal=True,
                                 dropout_rate=dcfg.attention_dropout,
                                 rng=tfm._next(rngs), deterministic=deterministic)
        x = residual + dropout(tfm._next(rngs), xh, dcfg.dropout, deterministic)
        x = tfm._ffn(layer, dcfg, x, rngs, deterministic)
    return layer_norm(p["layer_norm"], x)


def joiner_forward(p, dec_params, cfg: TransducerConfig, src_feats, tgt_feats):
    """(B,S,De) x (B,U,Dd) -> (B, S, U, V) logits (reference :60-76)."""
    s = linear(p["source_projection"], src_feats)[:, :, None, :]
    t = tgt_feats @ p["target_projection"]["weight"].astype(tgt_feats.dtype)
    join = jnp.tanh(s + t[:, None, :, :])
    return tfm.output_layer(dec_params, cfg.decoder, join)


def downsample_pool(x, lengths, k: int):
    """Length-aware ceil-mode AvgPool with last-frame rescale
    (reference AvgPool1dTBCPad :79-98). x: (B, T, C).

    Every example's final pooled frame is the mean over its r = ((len-1)%k)+1
    actual frames: torch's ceil-mode AvgPool1d divides a trailing
    out-of-bounds window by the true overlap (which is why the reference
    masks its explicit rescale at lengths == T — the pool already divided by
    r there); our fixed-k mean needs the k/r rescale in BOTH cases."""
    if k <= 1:
        return x, lengths
    b, t, c = x.shape
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    x = jnp.where(valid[:, :, None], x, 0.0)
    n = -(-t // k)
    xp = jnp.pad(x, ((0, 0), (0, n * k - t), (0, 0)))
    pooled = xp.reshape(b, n, k, c).mean(axis=2)
    # rescale the last (possibly partial) pooled frame by k / remainder
    r = (lengths - 1) % k + 1
    last = (lengths - r) // k
    scale = (k / r.astype(jnp.float32)).astype(x.dtype)
    onehot = jnp.arange(n)[None, :] == last[:, None]
    pooled = pooled * jnp.where(onehot, scale[:, None],
                                jnp.ones((), x.dtype))[:, :, None]
    new_lengths = -(-lengths // k)
    return pooled, new_lengths


class TransducerState(NamedTuple):
    caches: Tuple[attn.KVCache, ...]
    prev_emit: jnp.ndarray  # (B,) int32 — last emitted source frame
    step: jnp.ndarray


@register_model("transducer")
class TransducerModel:
    Config = TransducerConfig

    def __init__(self, cfg: TransducerConfig):
        self.cfg = cfg

    def init(self, key, dtype=jnp.float32):
        ke, kd = jax.random.split(key)
        return {"encoder": s2t.encoder_init(ke, self.cfg, dtype),
                "decoder": transducer_decoder_init(kd, self.cfg, dtype)}

    def forward(self, params, feats, feat_lengths, prev_tokens, *, rng=None,
                deterministic=True):
        """Training forward -> (B, S, U, V) lattice.

        prev_tokens: target with EOS moved to front; the reference replaces
        the front EOS with BOS(=blank) and re-appends EOS at the tail
        (:140-156), so the label sequence is [bos, y_1..y_n, eos].
        """
        cfg = self.cfg
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        enc = s2t.encoder_forward(params["encoder"], cfg, feats, feat_lengths,
                                  rng=r1, deterministic=deterministic)
        src, src_lens = downsample_pool(enc.encoder_out, enc.lengths,
                                        cfg.downsample)
        b, t = prev_tokens.shape
        pad, eos, bos = cfg.padding_idx, cfg.eos_idx, cfg.blank_idx
        toks = jnp.asarray(prev_tokens).at[:, 0].set(bos)
        toks = jnp.concatenate([toks, jnp.full((b, 1), pad, toks.dtype)], axis=1)
        tl = (toks != pad).sum(axis=1)
        toks = jnp.asarray(toks)
        onehot = jnp.arange(toks.shape[1])[None, :] == tl[:, None]
        toks = jnp.where(onehot, eos, toks)

        rngs = tfm._RngStream(r2) if r2 is not None else None
        tgt = _label_features(params["decoder"], cfg, toks, rngs, deterministic)
        logits = joiner_forward(params["decoder"]["joiner"], params["decoder"],
                                cfg, src, tgt)
        return logits, {"encoder_lengths": src_lens,
                        "label_tokens": toks,
                        "label_lengths": tl + 1,
                        "ctc_logits": enc.ctc_logits}

    # ------------------------------------------------------------------
    # streaming greedy step
    # ------------------------------------------------------------------

    def init_decode_state(self, batch: int, max_len: int, dtype=jnp.float32
                          ) -> TransducerState:
        dcfg = self.cfg.decoder
        hd = dcfg.embed_dim // dcfg.num_heads
        return TransducerState(
            caches=tuple(attn.kv_cache_init(batch, dcfg.num_heads, max_len, hd,
                                            dtype)
                         for _ in range(dcfg.num_layers)),
            prev_emit=jnp.zeros((batch,), jnp.int32),
            step=jnp.zeros((batch,), jnp.int32))

    def decode_step(self, params, state: TransducerState, token, src_buf,
                    src_len, online=False):
        """One label step over the current source prefix (reference :165-209).

        token: (B,) previous label (bos at start). Returns
        (logits (B,V) at the chosen frame, emitted (B,) bool, new_state).

        online: when True (source still growing) the emit at the source EOS
        is NOT forced; emitted=False means every visible frame predicted
        blank — the streaming agent's READ signal (rollback = not adopting
        new_state).  Offline (online=False) a non-blank emit is forced at the
        last frame, so emitted is always True.

        With downsample > 1 the visible source prefix is pooled HERE, exactly
        like the reference's incremental path (transducer_model.py:133-135
        pools the full accumulated buffer on every call), so state.prev_emit
        and the returned emit positions live in POOLED coordinates; the last
        (possibly partial) pooled window is the rescaled mean of the frames
        visible so far and is recomputed as the source grows, matching the
        reference's per-call re-pooling.
        """
        cfg = self.cfg
        dcfg = cfg.decoder
        p = params["decoder"]
        b = token.shape[0]
        if cfg.downsample > 1:
            src_buf, src_len = downsample_pool(src_buf, src_len,
                                               cfg.downsample)
        s_max = src_buf.shape[1]
        pos = dcfg.padding_idx + 1 + state.step              # (B,)
        x = dcfg.embed_scale * tfm.embedding(p["embed_tokens"], token[:, None])
        x = x + tfm._pos_table(dcfg)[pos][:, None, :].astype(x.dtype)
        new_caches = []
        for layer, cache in zip(p["layers"], state.caches):
            residual = x
            xh = layer_norm(layer["self_attn_ln"], x)
            xh, cache = attn.mha_step(layer["self_attn"], cache, xh, dcfg.num_heads)
            x = residual + xh
            x = tfm._ffn(layer, dcfg, x, None, True)
            new_caches.append(cache)
        tgt = layer_norm(p["layer_norm"], x)                     # (B, 1, D)

        lattice = joiner_forward(p["joiner"], p, cfg, src_buf, tgt)[:, :, 0, :]
        bos = cfg.blank_idx
        src_eos = src_len - 1
        # force emit at the current source EOS (reference :170-180 always
        # biases blank to -1e4 at the last frame during incremental decode);
        # skipped while online so an all-blank prefix turns into a READ
        eos_onehot = jnp.arange(s_max)[None, :] == src_eos[:, None]
        force = ~jnp.asarray(online)
        lattice = jnp.where(force & eos_onehot[:, :, None]
                            & (jnp.arange(lattice.shape[-1]) == bos)[None, None, :],
                            -1e4, lattice)
        # frames beyond the valid source or before prev_emit become exactly
        # one-hot blank rows (reference :181-188)
        invalid = (jnp.arange(s_max)[None, :] >= src_len[:, None]) | \
                  (jnp.arange(s_max)[None, :] < state.prev_emit[:, None])
        blank_onehot = jax.nn.one_hot(bos, lattice.shape[-1], dtype=lattice.dtype)
        lattice = jnp.where(invalid[:, :, None], blank_onehot[None, None, :],
                            lattice)
        preds = lattice.argmax(-1)                               # (B, S)
        nonblank = preds != bos
        emitted = nonblank.any(axis=1)
        new_emit = jnp.argmax(jnp.cumsum(nonblank, axis=1) == 1, axis=1)
        new_emit = jnp.where(emitted, new_emit, state.prev_emit)
        logits = jnp.take_along_axis(lattice, new_emit[:, None, None], axis=1)[:, 0]
        new_state = TransducerState(caches=tuple(new_caches),
                                    prev_emit=new_emit.astype(jnp.int32),
                                    step=state.step + 1)
        return logits, emitted, new_state
