"""Monotonic Multihead Attention (MMA) model.

Parity with the reference's `mma_model`
(/root/reference/codebase/models/mma_model.py) and its monotonic attention
zoo (/root/reference/codebase/modules/monotonic_multihead_attention.py,
fixed_pre_decision.py), re-designed for jit:

* Training: p_choose -> expected alignment (lax.scan, replacing the python
  tgt-loop) -> mass preservation -> expected soft attention (MILk) or hard
  (alpha); one batched pass per layer.
* Inference: the per-head stepwise scan (:152-299) becomes a branchless
  masked computation over a FIXED-CAPACITY encoder buffer; the decoder runs
  ALL layers and reports action = READ iff any head of any layer demands more
  source; on READ the caller simply discards the KV-cache state (rollback ==
  not adopting state), while the advanced monotonic head positions ARE
  adopted, mirroring the reference's clear_cache-but-keep-monotonic behavior
  (mma_model.py:191-210).

Variants: hard_aligned / infinite_lookback / waitk / chunkwise, each with the
fixed pre-decision pooling wrapper (--fixed-pre-decision-ratio).
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
from simulst_tpu.nn.core import dropout, layer_norm, linear, linear_init, neg_inf
from simulst_tpu.ops import monotonic as mono


@dataclasses.dataclass(frozen=True)
class MMAConfig(s2t.S2TEmformerConfig):
    simul_attn_type: str = "waitk_fixed_pre_decision"
    waitk_lagging: int = 3
    waitk_testtime: Optional[int] = None
    noise_var: float = 2.0
    noise_mean: float = 0.0
    energy_bias: bool = False
    energy_bias_init: float = -2.0
    attention_eps: float = 1e-6
    mass_preservation: bool = True
    fixed_pre_decision_ratio: int = 8
    fixed_pre_decision_type: str = "average"
    fixed_pre_decision_pad_threshold: float = 0.3
    mocha_chunk_size: Optional[int] = None

    @property
    def base_attn_type(self) -> str:
        return self.simul_attn_type.replace("_fixed_pre_decision", "")

    @property
    def pooled(self) -> bool:
        return self.simul_attn_type.endswith("_fixed_pre_decision")

    @property
    def soft_attention(self) -> bool:
        return self.base_attn_type in ("infinite_lookback", "waitk", "chunkwise")


# ---------------------------------------------------------------------------
# monotonic attention module
# ---------------------------------------------------------------------------

def mma_attention_init(key, cfg: MMAConfig, dtype=jnp.float32):
    """fairseq MultiheadAttention-style projections; separate soft-energy
    projections for infinite_lookback/chunkwise (waitk TIES soft==monotonic,
    reference :498-501)."""
    d, kd = cfg.embed_dim, cfg.embed_dim
    gain = 1 / math.sqrt(2)
    ks = jax.random.split(key, 6)
    p = {
        "q_proj": linear_init(ks[0], d, d, init="xavier", gain=gain, dtype=dtype),
        "k_proj": linear_init(ks[1], kd, d, init="xavier", gain=gain, dtype=dtype),
        "v_proj": linear_init(ks[2], kd, d, init="xavier", gain=gain, dtype=dtype),
        "out_proj": linear_init(ks[3], d, d, init="xavier", dtype=dtype),
    }
    p["out_proj"]["bias"] = jnp.zeros_like(p["out_proj"]["bias"])
    if cfg.base_attn_type in ("infinite_lookback", "chunkwise"):
        p["q_proj_soft"] = linear_init(ks[4], d, d, init="xavier", gain=gain, dtype=dtype)
        p["k_proj_soft"] = linear_init(ks[5], kd, d, init="xavier", gain=gain, dtype=dtype)
    if cfg.energy_bias:
        p["energy_bias"] = jnp.full((1,), cfg.energy_bias_init, dtype)
    return p


def _split(x, h):
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _energy(p, cfg: MMAConfig, query, key, which: str, key_padding_mask=None,
            add_bias: bool = False):
    """(B, H, Tq, Tk) scaled dot-product energies (reference :88-130)."""
    h = cfg.decoder_heads
    qp = p["q_proj_soft"] if (which == "soft" and "q_proj_soft" in p) else p["q_proj"]
    kp = p["k_proj_soft"] if (which == "soft" and "k_proj_soft" in p) else p["k_proj"]
    hd = cfg.embed_dim // h
    q = _split(linear(qp, query), h) * (hd ** -0.5)
    k = _split(linear(kp, key), h)
    e = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if add_bias and "energy_bias" in p:
        e = e + p["energy_bias"].astype(e.dtype)[0]
    if key_padding_mask is not None:
        e = jnp.where(key_padding_mask[:, None, None, :], neg_inf(e.dtype), e)
    return e


def _pool_keys(cfg: MMAConfig, key, src_len):
    """Fixed pre-decision pooling (reference fixed_pre_decision.py:31-54).
    key: (B, S, D) -> (B, ceil(S/r), D) ceil-mode average.

    Deliberate deviation: frames beyond src_len are ZEROED before pooling;
    the reference pools whatever garbage sits at padded positions (and then
    only drops pooled windows that are >30% pad).  Identical at inference
    (B=1, no padding); cleaner for padded training batches."""
    r = cfg.fixed_pre_decision_ratio
    b, s, d = key.shape
    n = -(-s // r)
    pad = n * r - s
    kp = jnp.pad(key, ((0, 0), (0, pad), (0, 0)))
    valid = (jnp.arange(n * r)[None, :] < src_len[:, None]).astype(key.dtype)
    sums = (kp * valid[:, :, None]).reshape(b, n, r, d).sum(axis=2)
    cnt_window = jnp.minimum(jnp.arange(n) * r + r, min(s, n * r)) - jnp.arange(n) * r
    # torch AvgPool divides by the window size (ceil mode -> shorter tail),
    # NOT by the valid count; padding inside a window counts as zeros.
    return sums / jnp.maximum(cnt_window, 1)[None, :, None].astype(key.dtype)


def _pool_padding_mask(cfg: MMAConfig, key_padding_mask):
    """Pooled pad mask: pooled-pad iff mean(pad) > threshold; position 0
    forced valid (reference fixed_pre_decision.py:112-121)."""
    r = cfg.fixed_pre_decision_ratio
    b, s = key_padding_mask.shape
    n = -(-s // r)
    pad = n * r - s
    m = jnp.pad(key_padding_mask.astype(jnp.float32), ((0, 0), (0, pad)),
                constant_values=1.0)
    sizes = jnp.minimum(jnp.arange(n) * r + r, s) - jnp.arange(n) * r
    frac = m.reshape(b, n, r).sum(2) / jnp.maximum(sizes, 1)[None, :]
    pooled = frac > cfg.fixed_pre_decision_pad_threshold
    return pooled.at[:, 0].set(False)


def _upsample_p_choose(p_choose_pooled, r: int, src_len_static: int):
    """insert_zeros upsampling: pooled value lands on the LAST frame of its
    block (reference fixed_pre_decision.py:85-95, conv_transpose kernel
    [0...0 1]); then pad/truncate to src_len with the final pooled value
    pinned at the last position when truncating (:143-159)."""
    b, h, tq, np_ = p_choose_pooled.shape
    up = jnp.zeros((b, h, tq, np_ * r), p_choose_pooled.dtype)
    up = up.at[..., r - 1::r].set(p_choose_pooled)
    if np_ * r < src_len_static:
        up = jnp.pad(up, ((0, 0),) * 3 + ((0, src_len_static - np_ * r),))
    else:
        last = p_choose_pooled[..., -1]
        up = up[..., :src_len_static].at[..., -1].set(last)
    return up


def mma_p_choose_train(p, cfg: MMAConfig, query, key, key_padding_mask, rng,
                       return_pooled: bool = False):
    """Training p_choose (B, H, Tq, S) — pooled if fixed_pre_decision.
    return_pooled=True skips the insert-zeros upsampling and returns the
    (B, H, Tq, ceil(S/r)) pooled probabilities (see mma_attention_forward's
    pooled-resolution alignment)."""
    b, tq = query.shape[0], query.shape[1]
    s = key.shape[1]
    h = cfg.decoder_heads
    if cfg.pooled:
        src_len = ((~key_padding_mask).sum(-1) if key_padding_mask is not None
                   else jnp.full((b,), s))
        key_p = _pool_keys(cfg, key, src_len)
        kpm_p = (_pool_padding_mask(cfg, key_padding_mask)
                 if key_padding_mask is not None else None)
    else:
        key_p, kpm_p = key, key_padding_mask

    if cfg.base_attn_type == "waitk":
        kk = cfg.waitk_lagging
        pc = mono.waitk_p_choose(tq, key_p.shape[1], b, kk, kpm_p, online=False)
        pc = jnp.broadcast_to(pc[:, None], (b, h, tq, key_p.shape[1]))
    else:
        energy = _energy(p, cfg, query, key_p, "monotonic", kpm_p, add_bias=True)
        pc = mono.learnable_p_choose(energy, cfg.noise_mean,
                                     math.sqrt(cfg.noise_var), rng)
    if cfg.pooled and not return_pooled:
        pc = _upsample_p_choose(pc, cfg.fixed_pre_decision_ratio, s)
    return pc


def mma_attention_forward(p, cfg: MMAConfig, query, key, value,
                          key_padding_mask=None, *, rng=None,
                          deterministic=True):
    """Training forward (reference :301-352, :354-423).

    query: (B, Tq, D); key/value: (B, S, De).
    Returns (attn_out (B,Tq,D), dict(p_choose, alpha, beta) each (B,H,Tq,S)).
    """
    b, tq, d = query.shape
    s = key.shape[1]
    h = cfg.decoder_heads
    kpm_flat = (jnp.repeat(key_padding_mask, h, axis=0)
                if key_padding_mask is not None else None)
    if cfg.pooled:
        # POOLED-RESOLUTION alignment (round 5): the upsampled p_choose is
        # zero at all but every r-th frame, and zeros ride the recursion as
        # exact identities (x*1 in cumprods, +0 in cumsums), so running the
        # DP at ceil(S/r) and insert-zeros-upsampling alpha is equivalent —
        # in fact CLOSER to the reference, whose safe_cumprod CLAMPS
        # (log 1 = 0 exactly) while our exclusive_cumprod adds eps inside
        # the log, which at full resolution accrues a spurious
        # exp(~(r-1)/r * S * eps) factor across the interleaved zeros.
        # 8x smaller DP panels: profiling showed the full-res path cost
        # ~2.5 ms/step in kernel panels, (BH,U,S) copies and relayouts.
        r = cfg.fixed_pre_decision_ratio
        pc_pool = mma_p_choose_train(p, cfg, query, key, key_padding_mask,
                                     rng, return_pooled=True)
        n_p = pc_pool.shape[-1]
        land_kpm = None
        if key_padding_mask is not None:
            # the frame each pooled value lands on (insert_zeros puts block
            # k at frame (k+1)r-1; the truncate branch pins the final block
            # at s-1) — masking pc at masked LANDING frames reproduces the
            # full-resolution key_padding_mask zeroing exactly
            src_len = (~key_padding_mask).sum(-1)
            land = jnp.minimum(jnp.arange(1, n_p + 1) * r - 1, s - 1)
            land_kpm = land[None, :] >= src_len[:, None]
        alpha_p = mono.expected_alignment_from_p_choose(
            pc_pool.reshape(b * h, tq, n_p),
            jnp.repeat(land_kpm, h, axis=0) if land_kpm is not None else None,
            eps=cfg.attention_eps)
        alpha = _upsample_p_choose(alpha_p.reshape(b, h, tq, n_p), r, s
                                   ).reshape(b * h, tq, s)
        pc = _upsample_p_choose(pc_pool, r, s)
    else:
        pc = mma_p_choose_train(p, cfg, query, key, key_padding_mask, rng)
        alpha = mono.expected_alignment_from_p_choose(
            pc.reshape(b * h, tq, s), kpm_flat, eps=cfg.attention_eps)
    if cfg.mass_preservation:
        alpha = mono.mass_preservation(alpha, kpm_flat)

    if cfg.soft_attention:
        soft_e = _energy(p, cfg, query, key, "soft", None).reshape(b * h, tq, s)
        beta = mono.expected_soft_attention(alpha, soft_e, kpm_flat,
                                            chunk_size=cfg.mocha_chunk_size,
                                            eps=cfg.attention_eps)
    else:
        beta = alpha

    v = _split(linear(p["v_proj"], value), h)                # (B,H,S,hd)
    beta_h = beta.reshape(b, h, tq, s)
    out = jnp.einsum("bhqk,bhkd->bhqd", beta_h.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
    out = linear(p["out_proj"], out)
    return out, {"p_choose": pc, "alpha": alpha.reshape(b, h, tq, s),
                 "beta": beta_h}


# ---------------------------------------------------------------------------
# inference step
# ---------------------------------------------------------------------------

class MonotonicState(NamedTuple):
    head_step: jnp.ndarray  # (B, H) int32 — source position of each head
    head_read: jnp.ndarray  # (B, H) bool — head demands more source


def monotonic_init_state(batch: int, num_heads: int) -> MonotonicState:
    return MonotonicState(head_step=jnp.zeros((batch, num_heads), jnp.int32),
                          head_read=jnp.zeros((batch, num_heads), bool))


def mma_attention_step(p, cfg: MMAConfig, state: MonotonicState, query_step,
                       key_buf, value_buf, src_len, tgt_step, online):
    """One incremental cross-attention step (reference :152-299).

    query_step: (B, 1, D); key_buf/value_buf: (B, S_max, De) with src_len
    valid; tgt_step: () int32 — number of target tokens consumed INCLUDING
    this one (1-based), for waitk; online: () bool — encoder still growing.
    """
    b, _, d = query_step.shape
    h = cfg.decoder_heads
    s_max = key_buf.shape[1]
    r = cfg.fixed_pre_decision_ratio if cfg.pooled else 1

    # --- p_choose on (pooled) keys
    if cfg.pooled:
        key_p = _pool_keys(cfg, key_buf, src_len)
        n_pool_max = key_p.shape[1]
        # floor semantics at inference, at least 1 (fixed_pre_decision:123-131)
        n_pool = jnp.maximum(src_len // r, 1)
        kpm_p = jnp.arange(n_pool_max)[None, :] >= n_pool[:, None]
    else:
        key_p = key_buf
        n_pool = src_len
        kpm_p = jnp.arange(s_max)[None, :] >= src_len[:, None]

    if cfg.base_attn_type == "waitk":
        kk = cfg.waitk_testtime or cfg.waitk_lagging
        step_pos = tgt_step - 1 + (kk - 1)                     # pooled index
        key_eos = n_pool - 1
        pos = jnp.where(online, step_pos, jnp.minimum(step_pos, key_eos))
        pc_pool = (jnp.arange(key_p.shape[1])[None, None, None, :]
                   == pos[:, None, None, None]).astype(jnp.float32)
        # when online, an out-of-range position yields all-zero p_choose and
        # the forced-stop machinery below turns that into a READ
        pc_pool = jnp.broadcast_to(pc_pool, (b, h, 1, key_p.shape[1]))
    else:
        energy = _energy(p, cfg, query_step, key_p, "monotonic", kpm_p,
                         add_bias=True)
        pc_pool = mono.learnable_p_choose(energy, rng=None)    # no noise at eval

    pc = _upsample_p_choose(pc_pool, r, s_max) if cfg.pooled else pc_pool
    pc = pc[:, :, 0, :].reshape(b * h, s_max)                  # (BH, S)

    src_lengths = jnp.repeat(src_len, h, axis=0)[:, None]      # (BH, 1)
    step = state.head_step.reshape(b * h, 1)

    if cfg.mass_preservation:
        max_steps = src_lengths - 1
    else:
        max_steps = src_lengths
        pc = jnp.pad(pc, ((0, 0), (0, 1)))
    sp = pc.shape[1]

    # mask past, force stop at max_steps, find first p >= 0.5
    idx = jnp.arange(sp)[None, :]
    pct = jnp.where(idx < step, 0.0, pc[:, :sp])
    pct = jnp.where(idx == max_steps, 1.0, pct)
    fired = (pct >= 0.5)
    new_step = jnp.argmax(jnp.cumsum(fired, axis=1) == 1, axis=1)[:, None]
    step_clamp = jnp.clip(new_step, 0, src_lengths - 1)
    p_i = jnp.take_along_axis(pc[:, :s_max], jnp.minimum(step_clamp, s_max - 1),
                              axis=1)

    head_read = ((new_step == max_steps) & (p_i < 0.5)).reshape(b, h)
    new_state = MonotonicState(head_step=new_step.reshape(b, h).astype(jnp.int32),
                               head_read=head_read)

    # alpha: one-hot at the stopped position
    alpha = (jnp.arange(s_max)[None, :] == step_clamp).astype(jnp.float32)
    if not cfg.mass_preservation:
        alpha = jnp.where(new_step == max_steps, 0.0, alpha)

    # beta
    if cfg.soft_attention:
        soft_e = _energy(p, cfg, query_step, key_buf, "soft",
                         jnp.arange(s_max)[None, :] >= src_len[:, None])
        soft_e = soft_e[:, :, 0, :].reshape(b * h, s_max).astype(jnp.float32)
        beta_mask = jnp.arange(s_max)[None, :] > step_clamp    # can't see future
        soft_e = jnp.where(beta_mask, neg_inf(jnp.float32), soft_e)
        beta = jax.nn.softmax(soft_e, axis=-1)
        beta = jnp.where(step_clamp == 0, 0.0, beta)           # head never moved
    else:
        beta = alpha

    v = _split(linear(p["v_proj"], value_buf), h)              # (B,H,S,hd)
    beta_h = beta.reshape(b, h, 1, s_max)
    out = jnp.einsum("bhqk,bhkd->bhqd", beta_h.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, 1, d)
    out = linear(p["out_proj"], out)
    return out, new_state


# ---------------------------------------------------------------------------
# MMA decoder
# ---------------------------------------------------------------------------

def mma_decoder_layer_init(key, cfg: MMAConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    dcfg = cfg.decoder
    return {
        "self_attn": attn.mha_init(ks[0], dcfg.embed_dim, dcfg.num_heads, dtype=dtype),
        "self_attn_ln": tfm.layer_norm_init(dcfg.embed_dim, dtype),
        "encoder_attn": mma_attention_init(ks[1], cfg, dtype),
        "encoder_attn_ln": tfm.layer_norm_init(dcfg.embed_dim, dtype),
        "fc1": linear_init(ks[2], dcfg.embed_dim, dcfg.ffn_dim, dtype=dtype),
        "fc2": linear_init(ks[3], dcfg.ffn_dim, dcfg.embed_dim, dtype=dtype),
        "final_ln": tfm.layer_norm_init(dcfg.embed_dim, dtype),
    }


def mma_decoder_init(key, cfg: MMAConfig, dtype=jnp.float32):
    dcfg = cfg.decoder
    ke, kl = jax.random.split(key)
    return {
        "embed_tokens": tfm.embedding_init(ke, dcfg.vocab_size, dcfg.embed_dim,
                                           dcfg.padding_idx, dtype),
        "layers": [mma_decoder_layer_init(k, cfg, dtype)
                   for k in jax.random.split(kl, dcfg.num_layers)],
        "layer_norm": tfm.layer_norm_init(dcfg.embed_dim, dtype),
    }


def mma_decoder_forward(p, cfg: MMAConfig, prev_tokens, encoder_out,
                        key_padding_mask, *, rng=None, deterministic=True):
    """Teacher-forced forward. Returns (logits, attn_list)."""
    dcfg = cfg.decoder
    rngs = tfm._RngStream(rng) if rng is not None else None
    positions = tfm.positions_from_tokens(prev_tokens, dcfg.padding_idx)
    x = tfm.decoder_embed(p, dcfg, prev_tokens, positions, rngs, deterministic)
    self_valid = prev_tokens != dcfg.padding_idx
    attn_list = []
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
        xh, extra = mma_attention_forward(layer["encoder_attn"], cfg, xh,
                                          encoder_out, encoder_out,
                                          key_padding_mask,
                                          rng=tfm._next(rngs),
                                          deterministic=deterministic)
        attn_list.append(extra)
        x = residual + dropout(tfm._next(rngs), xh, dcfg.dropout, deterministic)
        x = tfm._ffn(layer, dcfg, x, rngs, deterministic)
    x = layer_norm(p["layer_norm"], x)
    return tfm.output_layer(p, dcfg, x), attn_list


class MMADecoderState(NamedTuple):
    caches: Tuple[attn.KVCache, ...]
    monotonic: Tuple[MonotonicState, ...]
    step: jnp.ndarray  # (B,) int32 per-example decoded count


def mma_decoder_init_state(cfg: MMAConfig, batch: int, max_len: int,
                           dtype=jnp.float32) -> MMADecoderState:
    dcfg = cfg.decoder
    hd = dcfg.embed_dim // dcfg.num_heads
    return MMADecoderState(
        caches=tuple(attn.kv_cache_init(batch, dcfg.num_heads, max_len, hd, dtype)
                     for _ in range(dcfg.num_layers)),
        monotonic=tuple(monotonic_init_state(batch, dcfg.num_heads)
                        for _ in range(dcfg.num_layers)),
        step=jnp.zeros((batch,), jnp.int32))


def mma_decoder_step(p, cfg: MMAConfig, state: MMADecoderState, token,
                     key_buf, src_len, online):
    """One incremental decode attempt.

    Returns (logits (B,V), action (B,) int32 [1=WRITE, 0=READ], new_state).
    For examples with action==0 the caller should adopt ONLY the monotonic
    sub-state (see `adopt_on_read`), discarding the KV appends — the
    reference's prune_incremental_state rollback.
    """
    dcfg = cfg.decoder
    b = token.shape[0]
    pos = dcfg.padding_idx + 1 + state.step                 # (B,)
    x = dcfg.embed_scale * tfm.embedding(p["embed_tokens"], token[:, None])
    x = x + tfm._pos_table(dcfg)[pos][:, None, :].astype(x.dtype)

    new_caches, new_mono = [], []
    any_read = jnp.zeros((b,), bool)
    for layer, cache, mstate in zip(p["layers"], state.caches, state.monotonic):
        residual = x
        xh = layer_norm(layer["self_attn_ln"], x)
        xh, cache = attn.mha_step(layer["self_attn"], cache, xh, dcfg.num_heads)
        x = residual + xh

        residual = x
        xh = layer_norm(layer["encoder_attn_ln"], x)
        xh, mstate = mma_attention_step(layer["encoder_attn"], cfg, mstate, xh,
                                        key_buf, key_buf, src_len,
                                        state.step + 1, online)
        x = residual + xh
        x = tfm._ffn(layer, dcfg, x, None, True)
        new_caches.append(cache)
        new_mono.append(mstate)
        any_read = any_read | (online & mstate.head_read.any(axis=-1))

    x = layer_norm(p["layer_norm"], x)
    logits = tfm.output_layer(p, dcfg, x)[:, 0]
    action = jnp.where(any_read, 0, 1).astype(jnp.int32)
    new_state = MMADecoderState(caches=tuple(new_caches),
                                monotonic=tuple(new_mono),
                                step=state.step + 1)
    return logits, action, new_state


def adopt_on_read(old: MMADecoderState, attempted: MMADecoderState) -> MMADecoderState:
    """READ rollback: keep old KV caches and step, adopt advanced monotonic
    head positions (reference keeps the monotonic buffer after clear_cache)."""
    return MMADecoderState(caches=old.caches, monotonic=attempted.monotonic,
                           step=old.step)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

@register_model("mma")
class MMAModel:
    Config = MMAConfig

    def __init__(self, cfg: MMAConfig):
        self.cfg = cfg

    def init(self, key, dtype=jnp.float32):
        ke, kd = jax.random.split(key)
        return {"encoder": s2t.encoder_init(ke, self.cfg, dtype),
                "decoder": mma_decoder_init(kd, self.cfg, dtype)}

    def forward(self, params, feats, feat_lengths, prev_tokens, *, rng=None,
                deterministic=True):
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        enc = s2t.encoder_forward(params["encoder"], self.cfg, feats,
                                  feat_lengths, rng=r1, deterministic=deterministic)
        kpm = jnp.arange(enc.encoder_out.shape[1])[None, :] >= enc.lengths[:, None]
        logits, attn_list = mma_decoder_forward(
            params["decoder"], self.cfg, prev_tokens, enc.encoder_out, kpm,
            rng=r2, deterministic=deterministic)
        return logits, {"ctc_logits": enc.ctc_logits,
                        "encoder_lengths": enc.lengths,
                        "attn_list": attn_list}
