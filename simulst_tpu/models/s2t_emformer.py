"""S2T Emformer model: causal conv subsampler + conv-pos + Emformer encoder
+ Transformer decoder (+ optional CTC head).

Capability parity with the reference's `s2t_emformer` model
(/root/reference/codebase/models/s2t_emformer.py), re-designed so that both
the offline forward and every streaming chunk step are single jitted XLA
calls over static shapes.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from simulst_tpu.models import register_model
from simulst_tpu.nn import conv as cnv
from simulst_tpu.nn import emformer as emf
from simulst_tpu.nn import transformer as tfm
from simulst_tpu.nn.core import dropout, linear, normal_init


@dataclasses.dataclass(frozen=True)
class S2TEmformerConfig:
    """Defaults mirror arch `s2t_emformer_s` (reference :398-413) on top of
    fairseq's `s2t_transformer_s`."""
    vocab_size: int = 4096 + 4
    input_feat: int = 80
    conv_kernel_sizes: Tuple[int, ...] = (5, 5)
    conv_channels: int = 1024
    embed_dim: int = 256
    ffn_dim: int = 2048
    encoder_layers: int = 12
    encoder_heads: int = 4
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "gelu"
    conv_pos: int = 128
    conv_pos_groups: int = 16
    # Emformer geometry in PRE-subsampling frames (divided by the conv stride)
    segment_length: int = 64
    left_context: int = 128
    right_context: int = 32
    max_memory: int = 5
    tanh_on_mem: bool = True
    # rematerialize each encoder layer in backward (jax.checkpoint) — for
    # long-utterance training memory; reachable via --override remat=true
    remat: bool = False
    ctc_layer: bool = False
    no_scale_embedding: bool = False
    # decoder
    decoder_layers: int = 6
    decoder_heads: int = 4
    decoder_ffn_dim: int = 2048
    share_decoder_input_output_embed: bool = True
    max_target_positions: int = 1024
    # vocab special ids (fairseq Dictionary convention)
    padding_idx: int = 1
    eos_idx: int = 2
    blank_idx: int = 0
    # activations dtype for matmul-heavy paths; params stay fp32 and are
    # cast per-op (the reference's fp16 flag analog, bf16 needs no loss
    # scaling). LayerNorm/softmax compute fp32 internally regardless.
    compute_dtype: str = "float32"

    @property
    def stride(self) -> int:
        return 2 ** len(self.conv_kernel_sizes)

    @property
    def embed_scale(self) -> float:
        return 1.0 if self.no_scale_embedding else math.sqrt(self.embed_dim)

    @property
    def emformer(self) -> emf.EmformerConfig:
        s = self.stride
        return emf.EmformerConfig(
            input_dim=self.embed_dim, num_heads=self.encoder_heads,
            ffn_dim=self.ffn_dim, num_layers=self.encoder_layers,
            dropout=self.dropout, attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout, activation=self.activation,
            left_context=self.left_context // s,
            right_context=self.right_context // s,
            segment=self.segment_length // s,
            max_memory=self.max_memory, tanh_on_mem=self.tanh_on_mem,
            remat=self.remat)

    @property
    def decoder(self) -> tfm.DecoderConfig:
        return tfm.DecoderConfig(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            ffn_dim=self.decoder_ffn_dim, num_layers=self.decoder_layers,
            num_heads=self.decoder_heads, dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout, activation=self.activation,
            share_input_output_embed=self.share_decoder_input_output_embed,
            padding_idx=self.padding_idx, eos_idx=self.eos_idx,
            encoder_embed_dim=self.embed_dim,
            max_target_positions=self.max_target_positions,
            no_scale_embedding=self.no_scale_embedding,
            compute_dtype=self.compute_dtype)


class EncoderOut(NamedTuple):
    encoder_out: jnp.ndarray          # (B, T, D)
    lengths: jnp.ndarray              # (B,)
    ctc_logits: Optional[jnp.ndarray]  # (B, T, V) or None


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encoder_init(key, cfg: S2TEmformerConfig, dtype=jnp.float32):
    ks, kp, ke, kc = jax.random.split(key, 4)
    p = {
        "subsample": cnv.subsampler_init(ks, cfg.input_feat, cfg.conv_channels,
                                         cfg.embed_dim, cfg.conv_kernel_sizes, dtype),
        "conv_pos": cnv.conv_pos_init(kp, cfg.embed_dim, cfg.conv_pos,
                                      cfg.conv_pos_groups, dtype),
        "emformer": emf.emformer_init(ke, cfg.emformer, dtype),
    }
    if cfg.ctc_layer:
        p["ctc_layer"] = {"weight": normal_init(
            kc, (cfg.embed_dim, cfg.vocab_size), std=cfg.embed_dim ** -0.5, dtype=dtype)}
    return p


def _featurize(params, cfg: S2TEmformerConfig, feats):
    """subsample -> scale -> +conv_pos (offline, unmasked). feats: (B,T,F)."""
    x, _ = cnv.subsampler_apply(params["subsample"], feats,
                                jnp.full((feats.shape[0],), feats.shape[1]))
    x = cfg.embed_scale * x
    return x + cnv.conv_pos_apply(params["conv_pos"], x, cfg.conv_pos_groups)


def encoder_forward(params, cfg: S2TEmformerConfig, feats, feat_lengths, *,
                    rng=None, deterministic=True) -> EncoderOut:
    """Offline / training forward. feats: (B, T, F)."""
    ecfg = cfg.emformer
    feats = feats.astype(cfg.compute_dtype)
    x, lengths = cnv.subsampler_apply(params["subsample"], feats, feat_lengths)
    x = cfg.embed_scale * x
    x = x + cnv.conv_pos_apply(params["conv_pos"], x, cfg.conv_pos_groups)
    if rng is not None:
        rng, sub = jax.random.split(rng)
        x = dropout(sub, x, cfg.dropout, deterministic)
    valid = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
    x = jnp.where(valid[:, :, None], x, 0.0)
    x = jnp.pad(x, ((0, 0), (0, ecfg.right_context), (0, 0)))
    enc, _ = emf.emformer_forward(params["emformer"], ecfg, x, lengths,
                                  rng=rng, deterministic=deterministic)
    ctc_logits = None
    if "ctc_layer" in params:
        ctc_logits = linear(params["ctc_layer"], enc)
    return EncoderOut(encoder_out=enc, lengths=lengths, ctc_logits=ctc_logits)


def encoder_forward_packed(params, cfg: S2TEmformerConfig, feats,
                           feat_lengths, plan, *, rng=None,
                           deterministic=True) -> EncoderOut:
    """Training forward with SEQUENCE PACKING (train/packing.py).

    The conv frontend (subsampler + conv-pos; cross-frame receptive fields)
    runs on the padded (B, T) layout exactly like encoder_forward; the
    Emformer stack — ~80% of train FLOPs — runs over packed rows with
    example-id masking, then unpacks for the CTC head / decoder.
    Deterministic outputs equal encoder_forward exactly on every valid
    frame (tests/test_packing.py); `plan` is a packing.PackPlan whose array
    shapes are static per (n_rows, geometry) so this jits once per bucket.
    """
    ecfg = cfg.emformer
    feats = feats.astype(cfg.compute_dtype)
    x, lengths = cnv.subsampler_apply(params["subsample"], feats, feat_lengths)
    x = cfg.embed_scale * x
    x = x + cnv.conv_pos_apply(params["conv_pos"], x, cfg.conv_pos_groups)
    if rng is not None:
        rng, sub = jax.random.split(rng)
        x = dropout(sub, x, cfg.dropout, deterministic)
    valid = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
    x = jnp.where(valid[:, :, None], x, 0.0)

    from simulst_tpu.train import packing
    packed, rc_blocks = packing.pack_frames(x, plan)
    enc_p = emf.emformer_forward_packed(
        params["emformer"], ecfg, packed, rc_blocks, plan.frame_eid,
        plan.seg_eid, rng=rng, deterministic=deterministic)
    enc = packing.unpack_frames(enc_p, plan, x.shape[0], x.shape[1])
    ctc_logits = None
    if "ctc_layer" in params:
        ctc_logits = linear(params["ctc_layer"], enc)
    return EncoderOut(encoder_out=enc, lengths=lengths, ctc_logits=ctc_logits)


# ---------------------------------------------------------------------------
# streaming encoder session
# ---------------------------------------------------------------------------

class EncoderStreamState(NamedTuple):
    sub: cnv.SubsamplerCache
    pos: cnv.ConvCache
    emf: emf.EmformerState
    carry: jnp.ndarray   # (B, seg + rc, D) post-subsample carry buffer
    carry_len: int       # host-tracked (deterministic from chunk sizes)


def encoder_init_state(params, cfg: S2TEmformerConfig, batch: int = 1,
                       dtype=jnp.float32) -> EncoderStreamState:
    ecfg = cfg.emformer
    return EncoderStreamState(
        sub=cnv.subsampler_init_cache(params["subsample"], batch, dtype),
        pos=cnv.conv_pos_init_cache(params["conv_pos"], batch, cfg.embed_dim, dtype),
        emf=emf.emformer_init_state(ecfg, batch, dtype),
        carry=jnp.zeros((batch, ecfg.segment + ecfg.right_context, cfg.embed_dim), dtype),
        carry_len=0,
    )


def _featurize_step(params, cfg: S2TEmformerConfig, sub_cache, pos_cache, feats):
    x, sub_cache = cnv.subsampler_step(params["subsample"], sub_cache, feats)
    x = cfg.embed_scale * x
    pos, pos_cache = cnv.conv_pos_step(params["conv_pos"], pos_cache, x,
                                       cfg.conv_pos_groups)
    return x + pos, sub_cache, pos_cache


def _subsample_valid_len(cfg: S2TEmformerConfig, n):
    """Device-side per-example valid post-subsample length for n (B,) valid
    input frames (0 stays 0; else the causal-conv stride formula)."""
    m = n
    for _ in cfg.conv_kernel_sizes:
        m = jnp.where(m > 0, (m - 1) // 2 + 1, 0)
    return m.astype(jnp.int32)


def encoder_step(params, cfg: S2TEmformerConfig, state: EncoderStreamState,
                 feats: Optional[jnp.ndarray], finish: bool = False,
                 feat_valid: Optional[jnp.ndarray] = None
                 ) -> Tuple[EncoderOut, EncoderStreamState]:
    """Process one streaming chunk of NEW feature frames.

    Faithful port of the reference's carry protocol
    (s2t_emformer.py:199-260): concatenate leftover carry with new
    (featurized) frames, process exactly segment+rc frames, keep the
    remainder as carry; on finish, right-pad rc zeros and flush the carry
    with an extra Emformer call.  Unlike the reference, ALL real frames are
    reported in `lengths` (the reference's agent ignores out_lengths and
    consumes the full output tensor, default_agent.py:326-335 — accounting
    here is equivalent and complete).

    feats: (B, f, F) new frames (f % stride == 0 unless finish) or None.
    feat_valid: optional (B,) per-example count of REAL frames in feats, for
    batched FINAL chunks where utterances end at different offsets (shorter
    examples are zero-padded on the host).  Causality of the convs makes the
    first valid outputs identical to an unpadded run; everything past each
    example's valid region is zeroed (== the reference's zero right-pad) and
    its extra block steps only touch state that dies with the finish.
    """
    ecfg = cfg.emformer
    seg, rc = ecfg.segment, ecfg.right_context
    B = state.carry.shape[0]
    d = cfg.embed_dim

    sub_cache, pos_cache = state.sub, state.pos
    if feats is not None and feats.shape[1] > 0:
        x_new, sub_cache, pos_cache = _featurize_step(
            params, cfg, sub_cache, pos_cache, feats)
    else:
        x_new = jnp.zeros((B, 0, d), state.carry.dtype)

    v = state.carry_len + x_new.shape[1]       # real post-subsample frames
    x = jnp.concatenate([state.carry[:, :state.carry_len], x_new], axis=1)
    if feat_valid is not None:
        assert finish, "per-example feat_valid is only defined on the flush"
        v_b = state.carry_len + _subsample_valid_len(cfg, feat_valid)   # (B,)
        x = jnp.where(jnp.arange(x.shape[1])[None, :, None] < v_b[:, None, None],
                      x, 0.0)
    else:
        v_b = None
    if finish:
        x = jnp.pad(x, ((0, 0), (0, rc), (0, 0)))
    size = x.shape[1]

    def run_block(xb, uvc, emf_state, offset):
        """xb: (B, uvc + rc, D) — utterance frames then the rc slot."""
        utt = xb[:, :uvc]
        if uvc < seg:
            utt = jnp.pad(utt, ((0, 0), (0, seg - uvc), (0, 0)))
        blk = jnp.concatenate([utt, xb[:, uvc:]], axis=1)
        uv = (jnp.full((B,), uvc, jnp.int32) if v_b is None
              else jnp.clip(v_b - offset, 0, uvc))
        out, _, emf_state = emf.emformer_step(
            params["emformer"], ecfg, emf_state, blk, uv)
        return out[:, :uvc], emf_state

    # drain every complete segment (generalizes the reference, which
    # processes exactly one segment per infer call and would backlog
    # oversized chunks; for the standard seg-sized protocol the calls are
    # identical)
    outputs = []
    emf_state = state.emf
    o = 0
    while (size - o) >= seg + rc and (v - o) >= seg:
        out, emf_state = run_block(x[:, o:o + seg + rc], seg, emf_state, o)
        outputs.append(out)
        o += seg
    if finish and v - o > 0:
        rem = v - o                             # < seg real frames left
        out, emf_state = run_block(x[:, o:o + rem + rc], rem, emf_state, o)
        outputs.append(out)
        o += rem

    if outputs:
        enc = jnp.concatenate(outputs, axis=1) if len(outputs) > 1 else outputs[0]
    else:
        enc = x[:, :0]

    # remaining frames (< seg + rc) become the next carry
    carry_len_next = 0 if finish else size - o
    buf = jnp.zeros_like(state.carry)
    if carry_len_next > 0:
        buf = buf.at[:, :carry_len_next].set(x[:, o:])

    ctc_logits = None
    if "ctc_layer" in params:
        ctc_logits = linear(params["ctc_layer"], enc)

    new_state = EncoderStreamState(sub=sub_cache, pos=pos_cache, emf=emf_state,
                                   carry=buf, carry_len=carry_len_next)
    lengths = (jnp.full((B,), enc.shape[1], jnp.int32) if v_b is None
               else jnp.minimum(v_b, enc.shape[1]))
    return EncoderOut(encoder_out=enc, lengths=lengths, ctc_logits=ctc_logits), new_state


def make_encoder_stepper(params, cfg: S2TEmformerConfig):
    """Returns a jit-cached streaming step: step(state, feats, finish).

    Each distinct (n_new_frames, carry_len, finish) signature compiles once;
    the standard agent protocol uses exactly two signatures (first chunk,
    steady chunk) plus one flush, so every READ is a single XLA call.

    `params` is a RUNTIME ARGUMENT of the jitted step, never a closure
    capture: closure-captured weights become executable constants, and on
    the tunneled TPU backend loading such an executable degrades every
    later host<->device transfer in the process (measured 2 ms -> ~150 ms
    for the same 5 MB h2d).
    """
    import functools

    @functools.partial(jax.jit, static_argnames=("carry_len", "finish"))
    def _step(params, sub, pos, emf_state, carry, feats, carry_len, finish):
        state = EncoderStreamState(sub=sub, pos=pos, emf=emf_state,
                                   carry=carry, carry_len=carry_len)
        out, ns = encoder_step(params, cfg, state, feats, finish)
        return (out.encoder_out, out.ctc_logits, ns.sub, ns.pos, ns.emf,
                ns.carry)

    def step(state: EncoderStreamState, feats, finish: bool = False):
        n_new = 0 if feats is None else feats.shape[1]
        enc, ctc, sub, pos, emf_state, carry = _step(
            params, state.sub, state.pos, state.emf, state.carry, feats,
            state.carry_len, finish)
        new_len = _carry_plan(cfg, state.carry_len, n_new, finish)
        ns = EncoderStreamState(sub=sub, pos=pos, emf=emf_state, carry=carry,
                                carry_len=new_len)
        lengths = jnp.full((enc.shape[0],), enc.shape[1], jnp.int32)
        return EncoderOut(encoder_out=enc, lengths=lengths, ctc_logits=ctc), ns

    return step


def _carry_plan(cfg: S2TEmformerConfig, carry_len: int, n_new_feats: int,
                finish: bool) -> int:
    """Host-side mirror of encoder_step's segment-draining arithmetic,
    returning the next carry length (all quantities are deterministic
    functions of chunk sizes)."""
    ecfg = cfg.emformer
    seg, rc = ecfg.segment, ecfg.right_context
    m = 0
    if n_new_feats > 0:
        # per stride-2 causal conv layer: out = floor((L-1)/2) + 1
        m = n_new_feats
        for _ in cfg.conv_kernel_sizes:
            m = (m - 1) // 2 + 1
    v = carry_len + m
    size = v + (rc if finish else 0)
    o = 0
    while (size - o) >= seg + rc and (v - o) >= seg:
        o += seg
    if finish and v - o > 0:
        o += v - o
    return 0 if finish else size - o


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

@register_model("s2t_emformer")
class S2TEmformerModel:
    """Encoder-decoder ASR/ST model (functional; holds config only)."""

    Config = S2TEmformerConfig

    def __init__(self, cfg: S2TEmformerConfig):
        self.cfg = cfg

    def init(self, key, dtype=jnp.float32):
        ke, kd = jax.random.split(key)
        return {"encoder": encoder_init(ke, self.cfg, dtype),
                "decoder": tfm.decoder_init(kd, self.cfg.decoder, dtype)}

    def forward(self, params, feats, feat_lengths, prev_tokens, *, rng=None,
                deterministic=True, pack_plan=None):
        """Returns (logits (B,T,V), extra dict).  `pack_plan` (a
        train/packing.PackPlan for this batch's post-subsample lengths)
        routes the Emformer stack through sequence-packed rows — identical
        outputs, less zero-padding compute on bucketed batches."""
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        if pack_plan is not None:
            enc = encoder_forward_packed(params["encoder"], self.cfg, feats,
                                         feat_lengths, pack_plan, rng=r1,
                                         deterministic=deterministic)
        else:
            enc = encoder_forward(params["encoder"], self.cfg, feats,
                                  feat_lengths, rng=r1,
                                  deterministic=deterministic)
        enc_valid = jnp.arange(enc.encoder_out.shape[1])[None, :] < enc.lengths[:, None]
        logits = tfm.decoder_forward(params["decoder"], self.cfg.decoder,
                                     prev_tokens, enc.encoder_out, enc_valid,
                                     rng=r2, deterministic=deterministic)
        return logits, {"ctc_logits": enc.ctc_logits,
                        "encoder_lengths": enc.lengths,
                        "encoder_out": enc.encoder_out}
