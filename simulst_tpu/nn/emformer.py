"""Emformer: block-processing streaming transformer encoder, TPU-native.

Re-designs the reference's vendored torchaudio Emformer
(/root/reference/codebase/models/torchaudio_models/emformer.py) for JAX/XLA:

* Training: one batched attention over [rc_blocks; utterance; summary] queries
  and [mems; rc_blocks; utterance] keys with a statically-precomputed
  block-diagonal mask (reference :700-793), all in a single fused XLA program.
* Streaming: per-layer state is FIXED-SHAPE ring buffers
  (mems (B,M,D), left-context K/V (B,L,D)) plus a validity counter, so one
  chunk step == one compiled XLA call.  The reference dynamically slices
  buffers by past_length (:404-429); here validity is expressed by key
  masking, which is numerically identical under softmax.

Semantics parity notes:
  * summary elements = ceil-mode AvgPool over the pre-attention-LayerNormed
    utterance (reference :472, :497-498); the initial memory bank for layer 0
    is pooled from the RAW utterance (:828-831).
  * memory outputs pass tanh (tanh_on_mem) or clamp to [-10, 10] (:214-217).
  * at streaming time the summary query row must not attend the memory bank
    (:299-302).
  * layer state stores this layer's INPUT mems (:510), while the attention's
    summary OUTPUT becomes the next layer's input mems (:885-892).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu.nn.core import (ACTIVATIONS, dropout, layer_norm,
                                 layer_norm_init, linear, linear_init, neg_inf)
from simulst_tpu.ops.emformer_attn_pallas import (AttnGeom, padded_tk,
                                                  attn_pallas_supported,
                                                  emformer_grouped_attention,
                                                  kernel_ctx_row_map)
from simulst_tpu.ops.ffn_pallas import (ffn_pallas_supported, fused_ffn,
                                        fused_ln_ffn_res, seed_from_rng)
from simulst_tpu.ops.linear_res_pallas import (fused_linear_drop_res,
                                               linear_res_supported)


@dataclasses.dataclass(frozen=True)
class EmformerConfig:
    input_dim: int = 256
    num_heads: int = 4
    ffn_dim: int = 2048
    num_layers: int = 12
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "gelu"
    left_context: int = 32     # post-subsample frames (128 / stride 4)
    right_context: int = 8     # 32 / 4
    segment: int = 16          # 64 / 4
    max_memory: int = 5
    tanh_on_mem: bool = True
    normalize_before: bool = True
    # rematerialize each layer in the backward pass (jax.checkpoint): trades
    # ~30% more FLOPs for O(layers) less activation memory on long batches
    remat: bool = False
    # TPU-first: batched per-segment attention (O(T*ctx)) instead of the
    # reference's dense masked attention (O(T^2)); numerically identical.
    segmented_attention: bool = True
    # process G consecutive segments per attention block over their UNION
    # context with a static per-row mask: ~2x fewer gather bytes and much
    # better MXU tiling (nq 25->200 rows) for ~2x attention-core speedup;
    # exactly equal output.  Auto-falls back to per-segment blocks when the
    # segment count doesn't divide by G.
    segment_group: int = 8

    @property
    def use_mem(self) -> bool:
        return self.max_memory > 0


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _attention_init(key, dim: int, gain: Optional[float], dtype):
    kkv, kq, ko = jax.random.split(key, 3)
    init = "xavier" if gain else "torch"
    g = gain or 1.0
    return {
        # fused key/value projection, torch layout (in, 2*in)
        "emb_to_key_value": linear_init(kkv, dim, 2 * dim, init=init, gain=g, dtype=dtype),
        "emb_to_query": linear_init(kq, dim, dim, init=init, gain=g, dtype=dtype),
        "out_proj": linear_init(ko, dim, dim, init="torch", dtype=dtype),
    }


def emformer_layer_init(key, cfg: EmformerConfig, gain: Optional[float], dtype=jnp.float32):
    ka, k1, k2 = jax.random.split(key, 3)
    init = "xavier" if gain else "torch"
    g = gain or 1.0
    return {
        "attention": _attention_init(ka, cfg.input_dim, gain, dtype),
        "ln_input": layer_norm_init(cfg.input_dim, dtype),
        "pos_ff": {
            "ln": layer_norm_init(cfg.input_dim, dtype),
            "fc1": linear_init(k1, cfg.input_dim, cfg.ffn_dim, init=init, gain=g, dtype=dtype),
            "fc2": linear_init(k2, cfg.ffn_dim, cfg.input_dim, init=init, gain=g, dtype=dtype),
        },
    }


def emformer_init(key, cfg: EmformerConfig, dtype=jnp.float32):
    """Depthwise weight-init gains 1/sqrt(layer+1) (reference :51-59)."""
    keys = jax.random.split(key, cfg.num_layers)
    layers = [emformer_layer_init(k, cfg, 1.0 / math.sqrt(i + 1), dtype)
              for i, k in enumerate(keys)]
    return {"layers": layers, "final_ln": layer_norm_init(cfg.input_dim, dtype)}


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def _num_segs(utterance_len: int, segment: int) -> int:
    return -(-utterance_len // segment)


def _segment_means(x, segment: int):
    """Ceil-mode AvgPool1d over time. x: (B, U, D) -> (B, ceil(U/seg), D).
    Divisors are the actual window sizes (torch ceil_mode semantics)."""
    b, u, d = x.shape
    n = _num_segs(u, segment)
    pad = n * segment - u
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(b, n, segment, d).sum(axis=2)
    sizes = np.minimum(segment, u - np.arange(n) * segment).astype(np.float32)
    return sums / jnp.asarray(sizes)[None, :, None].astype(x.dtype)


def _mem_transform(x, cfg: EmformerConfig):
    return jnp.tanh(x) if cfg.tanh_on_mem else jnp.clip(x, -10, 10)


def _pos_ff_res(p, cfg: EmformerConfig, x, rng_a, rng_b, deterministic):
    """x + FFN(LN(x)) — the pos_ff block WITH its pre-LN and residual.

    On TPU at training shapes the whole block runs as ONE Pallas kernel per
    pass (fused_ln_ffn_res): the LN, hidden, dropout masks and residual all
    stay in VMEM, removing two (B, T, D) HBM round trips per layer."""
    w1 = p["fc1"]["weight"]
    if cfg.activation in ("gelu", "relu") and \
            ffn_pallas_supported(x, w1.shape[0], w1.shape[1]):
        act_rate = 0.0 if deterministic or rng_a is None \
            else cfg.activation_dropout
        out_rate = 0.0 if deterministic or rng_b is None else cfg.dropout
        seed = (seed_from_rng(rng_a) if act_rate or out_rate
                else jnp.zeros((1,), jnp.int32))
        d = x.dtype
        return fused_ln_ffn_res(
            x, p["ln"]["scale"], p["ln"]["bias"],
            w1.astype(d), p["fc1"]["bias"].astype(d),
            p["fc2"]["weight"].astype(d), p["fc2"]["bias"].astype(d), seed,
            cfg.activation, act_rate, out_rate)
    return _pos_ff(p, cfg, x, rng_a, rng_b, deterministic) + x


def _pos_ff(p, cfg: EmformerConfig, x, rng_a, rng_b, deterministic):
    y = layer_norm(p["ln"], x)
    w1 = p["fc1"]["weight"]
    if cfg.activation in ("gelu", "relu") and \
            ffn_pallas_supported(y, w1.shape[0], w1.shape[1]):
        act_rate = 0.0 if deterministic or rng_a is None \
            else cfg.activation_dropout
        out_rate = 0.0 if deterministic or rng_b is None else cfg.dropout
        seed = (seed_from_rng(rng_a) if act_rate or out_rate
                else jnp.zeros((1,), jnp.int32))
        d = y.dtype
        return fused_ffn(y, w1.astype(d), p["fc1"]["bias"].astype(d),
                         p["fc2"]["weight"].astype(d),
                         p["fc2"]["bias"].astype(d), seed,
                         cfg.activation, act_rate, out_rate)
    act = ACTIVATIONS[cfg.activation]
    y = act(linear(p["fc1"], y))
    y = dropout(rng_a, y, cfg.activation_dropout, deterministic)
    y = linear(p["fc2"], y)
    y = dropout(rng_b, y, cfg.dropout, deterministic)
    return y


SCORE_CLAMP = 80.0

# Detection rail for the static clamp (ADVICE r3): if attention logits ever
# drifted past SCORE_CLAMP, exp(min(s, 80)) would silently flatten softmax
# and zero the gradient through clamped scores WITHOUT producing non-finite
# values (so the trainer's non-finite-grad skip can't see it).  Enable the
# monitor in smoke/convergence gates via `enable_score_monitor()`: every XLA
# attention pass then reports its max pre-clamp score through a host
# callback, and the gate asserts a wide margin below the clamp.  If the
# margin is ever approached, the mitigations are qk-layernorm or a learned
# logit soft-cap (tanh), not raising the clamp.
_score_monitor = None


def enable_score_monitor():
    """Start recording max pre-clamp attention scores (host-side list).
    Returns the live list; call disable_score_monitor() when done.  Forces a
    retrace of jitted callers (trace-time flag), so gate-only usage."""
    global _score_monitor
    _score_monitor = []
    return _score_monitor


def disable_score_monitor():
    global _score_monitor
    _score_monitor = None


def _record_score(m):
    if _score_monitor is not None:
        _score_monitor.append(float(m))


def _attn_softmax(scores):
    """Clamp-stabilized softmax over the last axis (fp32 in, fp32 out).

    exp(min(s, 80)) / (sum + 1e-30) instead of jax.nn.softmax: the fused
    attention kernel (ops/emformer_attn_pallas._probs_fwd) uses this form
    because the row-max reduce measured ~0.05 ms/layer/pass on the VPU while
    scores beyond 80 are unreachable for LN-bounded inputs; every XLA
    attention path here uses the SAME form so kernel and fallback stay
    numerically interchangeable.  Rows with no visible keys (all scores at
    the -1e9/-3e4 mask) come out as exact ZEROS — cleaner than
    jax.nn.softmax's uniform distribution over masked keys; no in-repo
    consumer reads such rows (they sit beyond the example's length and are
    length-masked downstream)."""
    if _score_monitor is not None:
        # masked entries sit at -1e9/-3e4, so max() reports only real scores
        jax.debug.callback(_record_score, scores.max())
    e = jnp.exp(jnp.minimum(scores, np.float32(SCORE_CLAMP)))
    return e / (e.sum(axis=-1, keepdims=True) + np.float32(1e-30))


def _attend(q, k, v, num_heads: int, bias, key_valid, *, rate=0.0, rng=None,
            deterministic=True):
    """q: (B,Tq,D), k/v: (B,Tk,D); bias (Tq,Tk) additive fp32 or None."""
    b, tq, d = q.shape
    hd = d // num_heads
    qh = q.reshape(b, tq, num_heads, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
    kh = k.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    if bias is not None:
        scores = scores + bias[None, None]
    if key_valid is not None:
        scores = jnp.where(key_valid[:, None, None, :], scores, neg_inf(q.dtype))
    probs = _attn_softmax(scores).astype(q.dtype)
    probs = dropout(rng, probs, rate, deterministic)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, d)


# ---------------------------------------------------------------------------
# training attention mask (static, cached per geometry)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _training_mask_np(U: int, seg: int, lc: int, rc: int, max_mem: int,
                      use_mem: bool) -> np.ndarray:
    """Additive-free boolean mask, True = BLOCKED, shape (Tq, Tk).
    Query rows: [rc_blocks(n*rc); utterance(U); summary(n if use_mem)].
    Key cols:   [mems(n-1 if use_mem); rc_blocks(n*rc); utterance(U)].
    Port of reference :711-793 (allowed-columns per segment)."""
    n = _num_segs(U, seg)
    mem_len = (n - 1) if use_mem else 0
    rc_len = n * rc
    tq = rc_len + U + (n if use_mem else 0)
    tk = mem_len + rc_len + U
    allowed = np.zeros((tq, tk), dtype=bool)
    for i in range(n):
        mem_lo, mem_hi = max(i - max_mem, 0), i
        rc_lo, rc_hi = i * rc, i * rc + rc
        utt_lo, utt_hi = max(i * seg - lc, 0), min((i + 1) * seg, U)
        row_blocks = [slice(i * rc, (i + 1) * rc),
                      slice(rc_len + i * seg, rc_len + min((i + 1) * seg, U))]
        for rows in row_blocks:
            if use_mem:
                allowed[rows, mem_lo:mem_hi] = True
            allowed[rows, mem_len + rc_lo:mem_len + rc_hi] = True
            allowed[rows, mem_len + rc_len + utt_lo:mem_len + rc_len + utt_hi] = True
        if use_mem:
            srow = rc_len + U + i
            allowed[srow, mem_len + rc_lo:mem_len + rc_hi] = True
            allowed[srow, mem_len + rc_len + utt_lo:mem_len + rc_len + utt_hi] = True
    return ~allowed


@functools.lru_cache(maxsize=64)
def _rc_gather_indices(U: int, seg: int, rc: int) -> np.ndarray:
    """Indices into the (U+rc)-long input that gather the per-segment
    right-context blocks (reference :700-709)."""
    n = _num_segs(U, seg)
    starts = [(i + 1) * seg for i in range(n - 1)] + [U]
    return np.concatenate([np.arange(s, s + rc) for s in starts]).astype(np.int32)


# ---------------------------------------------------------------------------
# segment-batched training attention (TPU-first)
#
# The reference materializes a full (Tq, Tk) block-diagonal mask and runs a
# dense O(T^2) attention (:711-793).  Since each segment only attends
# [<=M mems | its rc block | lc+seg utterance window], we instead GATHER the
# per-segment context into a (B, n_segs, ctx, D) tensor and run one batched
# attention of cost O(T * ctx) — identical math (masked softmax == gathered
# softmax), ~n_segs-fold fewer attention FLOPs for long utterances.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _segment_gather_indices(U: int, seg: int, lc: int, rc: int, max_mem: int,
                            use_mem: bool):
    """Static (n, slot) gather indices into the [mems | rc | utt] key tensor
    plus validity masks. Returns (idx (n, ctx), valid (n, ctx), utt_col (n,
    ctx) absolute utterance position or -1)."""
    n = _num_segs(U, seg)
    mem_len = (n - 1) if use_mem else 0
    rc_len = n * rc
    m_slots = max_mem if use_mem else 0
    ctx = m_slots + rc + lc + seg
    idx = np.zeros((n, ctx), np.int32)
    valid = np.zeros((n, ctx), bool)
    utt_col = np.full((n, ctx), -1, np.int32)
    for i in range(n):
        col = 0
        for j in range(m_slots):
            m = i - m_slots + j
            idx[i, col] = max(m, 0)
            valid[i, col] = m >= 0
            col += 1
        for j in range(rc):
            idx[i, col] = mem_len + i * rc + j
            valid[i, col] = True
            col += 1
        for j in range(lc + seg):
            u = i * seg - lc + j
            ok = 0 <= u < U
            idx[i, col] = mem_len + rc_len + (u if ok else 0)
            valid[i, col] = ok
            utt_col[i, col] = u if ok else -1
            col += 1
    return idx, valid, utt_col


@functools.lru_cache(maxsize=64)
def _group_gather_indices(U: int, seg: int, lc: int, rc: int, max_mem: int,
                          G: int):
    """Static gather indices + per-row allowed mask for GROUPED segments.

    Each group of G consecutive segments attends one UNION context
    [mems (max_mem+G-1 slots) | G rc blocks | lc + G*seg utterance window];
    a static (nq, ctx) mask restricts every query row to exactly the slots
    its own segment may see, so the masked softmax equals the per-segment
    gathered softmax while the matmuls run at (G*(rc+seg+1)) x ctx tiles.
    Requires U == n*seg and n % G == 0 (caller falls back otherwise).
    Returns (idx (ng, ctx), valid (ng, ctx), utt_col (ng, ctx), allowed
    (nq, ctx))."""
    n = U // seg
    ng = n // G
    mem_len = n - 1
    rc_len = n * rc
    m_slots = max_mem + G - 1
    ctx = m_slots + G * rc + lc + G * seg
    idx = np.zeros((ng, ctx), np.int32)
    valid = np.zeros((ng, ctx), bool)
    utt_col = np.full((ng, ctx), -1, np.int32)
    for g in range(ng):
        col = 0
        for t in range(m_slots):
            js = g * G - max_mem + t           # global segment-summary index
            idx[g, col] = max(min(js, mem_len - 1), 0)
            valid[g, col] = 0 <= js <= n - 2
            col += 1
        for j in range(G * rc):
            idx[g, col] = mem_len + g * G * rc + j
            valid[g, col] = True
            col += 1
        for j in range(lc + G * seg):
            u = g * G * seg - lc + j
            ok = 0 <= u < U
            idx[g, col] = mem_len + rc_len + (u if ok else 0)
            valid[g, col] = ok
            utt_col[g, col] = u if ok else -1
            col += 1
    # static per-row visibility: rows [G rc blocks | G segments | G summaries]
    nq = G * rc + G * seg + G
    allowed = np.zeros((nq, ctx), bool)
    for r in range(nq):
        if r < G * rc:
            i, is_sum = r // rc, False
        elif r < G * rc + G * seg:
            i, is_sum = (r - G * rc) // seg, False
        else:
            i, is_sum = r - G * rc - G * seg, True
        if not is_sum:   # summary rows don't see the memory bank
            allowed[r, i:i + max_mem] = True
        allowed[r, m_slots + i * rc: m_slots + (i + 1) * rc] = True
        lo = m_slots + G * rc + i * seg
        allowed[r, lo: lo + lc + seg] = True
    return idx, valid, utt_col, allowed


# ---------------------------------------------------------------------------
# sequence packing: example-id masks (train/packing.py supplies the ids)
#
# A packed row holds several examples at segment granularity; masking
# generalizes the per-example length rule to EXAMPLE-ID EQUALITY: a query of
# segment i (example e) may see a memory summary / utterance frame only if it
# carries the same id.  rc keys need no id check (block j belongs to segment
# j by construction; boundary rc content is zero rows, matching the padded
# batch's zero right-context — see train/packing.py).  Dead frames carry -1,
# dead segments -1, pad key rows -9.
# ---------------------------------------------------------------------------

class PackedEids(NamedTuple):
    frame_eid: jnp.ndarray             # (B, U) int32
    seg_eid: jnp.ndarray               # (B, n) int32
    kid: jnp.ndarray                   # (B, mem+rc+utt) per-key-row ids
    kernel_mask: Optional[jnp.ndarray]  # (B, ng, nq, ctx) int8 (Pallas path)


@functools.lru_cache(maxsize=64)
def _group_row_seg(seg: int, rc: int, G: int) -> np.ndarray:
    """Static (nq,) map: grouped query row -> local segment index within the
    group (rows are [G rc blocks | G segments | G summaries])."""
    nq = G * (rc + seg + 1)
    rows = np.arange(nq)
    return np.where(rows < G * rc, rows // rc,
                    np.where(rows < G * (rc + seg), (rows - G * rc) // seg,
                             rows - G * (rc + seg))).astype(np.int32)


def _build_kid(cfg: EmformerConfig, frame_eid, seg_eid):
    """(B, U)+(B, n) -> (B, (n-1) + n*rc + U) per-key-row example ids in the
    [mems | rc blocks | utterance] layout."""
    mem_id = seg_eid[:, :-1] if cfg.use_mem else seg_eid[:, :0]
    rc_id = jnp.repeat(seg_eid, cfg.right_context, axis=1)
    return jnp.concatenate([mem_id, rc_id, frame_eid], axis=1)


def make_packed_eids(cfg: EmformerConfig, U: int, frame_eid, seg_eid,
                     dim: int) -> PackedEids:
    """Precompute the layer-invariant id tensors (and, when the Pallas
    attention kernel is live, the (B, ng, nq, ctx) int8 visibility gate in
    the kernel's aligned-window context layout)."""
    frame_eid = jnp.asarray(frame_eid, jnp.int32)
    seg_eid = jnp.asarray(seg_eid, jnp.int32)
    kid = _build_kid(cfg, frame_eid, seg_eid)
    n = _num_segs(U, cfg.segment)
    G = _choose_group(n, U, cfg)
    kernel_mask = None
    if G > 1:
        geom = AttnGeom(U=U, seg=cfg.segment, lc=cfg.left_context,
                        rc=cfg.right_context, max_mem=cfg.max_memory,
                        G=G, num_heads=cfg.num_heads)
        if attn_pallas_supported(geom, dim):
            rows = jnp.asarray(kernel_ctx_row_map(geom))     # (ng, ctx)
            pad = padded_tk(geom) - kid.shape[1]
            kid_pad = jnp.pad(kid, ((0, 0), (0, pad)), constant_values=-9)
            eid_k = jnp.take(kid_pad, rows.reshape(-1), axis=1).reshape(
                kid.shape[0], geom.ng, geom.ctx)
            gi = (np.arange(geom.ng)[:, None] * G
                  + _group_row_seg(cfg.segment, cfg.right_context, G)[None])
            qid = jnp.take(seg_eid, jnp.asarray(gi.reshape(-1)),
                           axis=1).reshape(kid.shape[0], geom.ng, geom.nq)
            kernel_mask = (eid_k[:, :, None, :] == qid[..., None]
                           ).astype(jnp.int8)
    return PackedEids(frame_eid=frame_eid, seg_eid=seg_eid, kid=kid,
                      kernel_mask=kernel_mask)


def _choose_group(n: int, U: int, cfg: EmformerConfig) -> int:
    """Largest usable segment-group size G <= cfg.segment_group: G must
    divide n, and the first group's clamped utterance window must fit
    ((n - G) * seg >= lc).  Returns 1 when no grouping applies (ragged U,
    memory off, or no valid divisor) — smaller buckets (e.g. n = 4 or 12
    with the default G = 8) then still get a grouped kernel at G = 2/4/6
    instead of falling back to per-segment blocks."""
    if not (cfg.segmented_attention and cfg.use_mem
            and cfg.segment_group > 1 and U == n * cfg.segment and n >= 2):
        return 1
    for g in range(min(cfg.segment_group, n), 1, -1):
        if n % g == 0 and (n - g) * cfg.segment >= cfg.left_context:
            return g
    return 1


def _grouped_attention(p, cfg: EmformerConfig, G: int, utt_ln, rc_ln, mems,
                       summary, lengths, rngs, deterministic, rc_raw, utt_raw,
                       eids: Optional[PackedEids] = None):
    """Grouped-segment training attention WITH its epilogue: same math as
    _segmented_attention with G segments per block (see
    _group_gather_indices), followed by out_proj -> residual dropout ->
    +raw on the rc/utterance rows (summary rows get the plain projection).
    Returns (result (B, rc_len+U, D) — post-residual, pre-pos_ff — and
    summary_out (B, n, D)).  With `eids` (sequence packing) the per-example
    length rule is replaced by example-id equality."""
    b, U, d = utt_ln.shape
    seg, lc, rc = cfg.segment, cfg.left_context, cfg.right_context
    n = U // seg
    ng = n // G
    h = cfg.num_heads
    hd = d // h

    ap = p["attention"]
    geom = AttnGeom(U=U, seg=seg, lc=lc, rc=rc, max_mem=cfg.max_memory,
                    G=G, num_heads=h)
    use_pallas = attn_pallas_supported(geom, d)
    if eids is not None:
        # packed rows are full; the kernel's f < length rule must never bite
        lengths = jnp.full((b,), U, jnp.int32)
        use_pallas = use_pallas and eids.kernel_mask is not None
    kv_rows = [mems, rc_ln, utt_ln]
    if use_pallas:
        # build k/v already at the kernel's padded width: the zero rows ride
        # the existing concat for free instead of a pad+copy per layer, and
        # their grads vanish through the concat vjp (ops/emformer_attn_pallas
        # padded_tk)
        n_pad = padded_tk(geom) - geom.tk
        kv_rows.append(jnp.zeros((b, n_pad, d), utt_ln.dtype))
    kv = linear(ap["emb_to_key_value"], jnp.concatenate(kv_rows, axis=1))
    k, v = jnp.split(kv, 2, axis=-1)

    rc_q = rc_ln.reshape(b, ng, G * rc, d)
    utt_q = utt_ln.reshape(b, ng, G * seg, d)
    sum_q = summary.reshape(b, ng, G, d)
    q_in = jnp.concatenate([rc_q, utt_q, sum_q], axis=2)
    nq = q_in.shape[2]
    q = linear(ap["emb_to_query"], q_in)

    if use_pallas:
        rng = next(rngs)
        rate = 0.0 if deterministic or rng is None else cfg.attention_dropout
        seed = (seed_from_rng(rng) if rate > 0.0
                else jnp.zeros((1,), jnp.int32))
        out = emformer_grouped_attention(q, k, v, lengths.astype(jnp.int32),
                                         seed,
                                         None if eids is None
                                         else eids.kernel_mask, geom, rate)
        rng_ep = next(rngs)
        ep_rate = 0.0 if deterministic or rng_ep is None else cfg.dropout
        if linear_res_supported(out, d, d):
            # fused out_proj + residual dropout + residual add: group rows
            # are [G*rc rc | G*seg utt | G summary]; the residual tensor is
            # the raw (pre-LN) input reshaped into the same grouped layout,
            # zeros under the (plain-projection) summary rows.
            res = jnp.concatenate(
                [rc_raw.reshape(b, ng, G * rc, d),
                 utt_raw.reshape(b, ng, G * seg, d),
                 jnp.zeros((b, ng, G, d), out.dtype)], axis=2)
            seed_ep = (seed_from_rng(rng_ep) if ep_rate > 0.0
                       else jnp.zeros((1,), jnp.int32))
            w_o = ap["out_proj"]["weight"].astype(out.dtype)
            b_o = ap["out_proj"]["bias"].astype(out.dtype)
            y = fused_linear_drop_res(out, w_o, b_o, res, seed_ep, ep_rate,
                                      period=nq, res_rows=G * (rc + seg))
            rc_res = y[:, :, :G * rc].reshape(b, n * rc, d)
            utt_res = y[:, :, G * rc:G * (rc + seg)].reshape(b, U, d)
            summary_out = y[:, :, G * (rc + seg):].reshape(b, n, d)
            return jnp.concatenate([rc_res, utt_res], axis=1), summary_out
        out = linear(ap["out_proj"], out)
        rc_out = out[:, :, :G * rc].reshape(b, n * rc, d)
        utt_out = out[:, :, G * rc:G * (rc + seg)].reshape(b, U, d)
        summary_out = out[:, :, G * (rc + seg):].reshape(b, n, d)
        rc_utt_out = jnp.concatenate([rc_out, utt_out], axis=1)
        raw = jnp.concatenate([rc_raw, utt_raw], axis=1)
        result = dropout(rng_ep, rc_utt_out, cfg.dropout, deterministic) + raw
        return result, summary_out

    idx_np, valid_np, utt_col_np, allowed_np = _group_gather_indices(
        U, seg, lc, rc, cfg.max_memory, G)
    idx = jnp.asarray(idx_np)
    ctx = idx.shape[1]
    k_ctx = jnp.take(k, idx.reshape(-1), axis=1).reshape(b, ng, ctx, d)
    v_ctx = jnp.take(v, idx.reshape(-1), axis=1).reshape(b, ng, ctx, d)

    valid = jnp.asarray(valid_np)[None]
    utt_col = jnp.asarray(utt_col_np)
    if eids is None:
        in_len = (utt_col[None] < lengths[:, None, None]) | (utt_col[None] < 0)
        key_valid = valid & in_len                             # (B, ng, ctx)
        eid_ok = None
    else:
        key_valid = jnp.broadcast_to(valid, (b, ng, ctx))
        eid_k = jnp.take(eids.kid, idx.reshape(-1), axis=1).reshape(b, ng, ctx)
        gi = (np.arange(ng)[:, None] * G + _group_row_seg(seg, rc, G)[None])
        qid = jnp.take(eids.seg_eid, jnp.asarray(gi.reshape(-1)),
                       axis=1).reshape(b, ng, nq)
        eid_ok = eid_k[:, :, None, :] == qid[..., None]        # (B,ng,nq,ctx)

    qh = q.reshape(b, ng, nq, h, hd).transpose(0, 1, 3, 2, 4) * (hd ** -0.5)
    kh = k_ctx.reshape(b, ng, ctx, h, hd).transpose(0, 1, 3, 2, 4)
    vh = v_ctx.reshape(b, ng, ctx, h, hd).transpose(0, 1, 3, 2, 4)
    scores = jnp.einsum("bnhqd,bnhkd->bnhqk", qh, kh).astype(jnp.float32)
    ni = neg_inf(q.dtype)
    scores = jnp.where(key_valid[:, :, None, None, :], scores, ni)
    scores = jnp.where(jnp.asarray(allowed_np)[None, None, None], scores, ni)
    if eid_ok is not None:
        scores = jnp.where(eid_ok[:, :, None], scores, ni)
    probs = _attn_softmax(scores).astype(q.dtype)
    probs = dropout(next(rngs), probs, cfg.attention_dropout, deterministic)
    out = jnp.einsum("bnhqk,bnhkd->bnhqd", probs, vh)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, ng, nq, d)
    out = linear(ap["out_proj"], out)

    rc_out = out[:, :, :G * rc].reshape(b, n * rc, d)
    utt_out = out[:, :, G * rc:G * (rc + seg)].reshape(b, U, d)
    summary_out = out[:, :, G * (rc + seg):].reshape(b, n, d)
    rc_utt_out = jnp.concatenate([rc_out, utt_out], axis=1)
    raw = jnp.concatenate([rc_raw, utt_raw], axis=1)
    result = dropout(next(rngs), rc_utt_out, cfg.dropout, deterministic) + raw
    return result, summary_out


def _segmented_attention(p, cfg: EmformerConfig, utt_ln, rc_ln, mems, summary,
                         lengths, rngs, deterministic,
                         eids: Optional[PackedEids] = None):
    """Per-segment batched attention. Returns (rc_utt_out (B, rc_len+U, D),
    summary_out (B, n, D)).  With `eids` (sequence packing), key validity is
    example-id equality with the query segment's id instead of the
    per-example length rule (all query rows of a segment block share one
    id, so the gate folds into key_valid)."""
    b, U, d = utt_ln.shape
    n = _num_segs(U, cfg.segment)
    seg, lc, rc = cfg.segment, cfg.left_context, cfg.right_context
    h = cfg.num_heads
    hd = d // h

    ap = p["attention"]
    kv = linear(ap["emb_to_key_value"],
                jnp.concatenate([mems, rc_ln, utt_ln], axis=1))
    k, v = jnp.split(kv, 2, axis=-1)

    idx_np, valid_np, utt_col_np = _segment_gather_indices(
        U, seg, lc, rc, cfg.max_memory, cfg.use_mem)
    idx = jnp.asarray(idx_np)
    ctx = idx.shape[1]
    k_ctx = jnp.take(k, idx.reshape(-1), axis=1).reshape(b, n, ctx, d)
    v_ctx = jnp.take(v, idx.reshape(-1), axis=1).reshape(b, n, ctx, d)

    # validity: static + per-example utterance length (or packed ids)
    valid = jnp.asarray(valid_np)[None]                        # (1, n, ctx)
    utt_col = jnp.asarray(utt_col_np)                          # (n, ctx)
    if eids is None:
        in_len = (utt_col[None] < lengths[:, None, None]) | (utt_col[None] < 0)
        key_valid = valid & in_len                             # (B, n, ctx)
    else:
        eid_k = jnp.take(eids.kid, idx.reshape(-1), axis=1).reshape(b, n, ctx)
        key_valid = valid & (eid_k == eids.seg_eid[:, :, None])

    # queries: [rc block | seg utterance | summary] per segment
    pad_u = n * seg - U
    utt_q = jnp.pad(utt_ln, ((0, 0), (0, pad_u), (0, 0))).reshape(b, n, seg, d)
    rc_q = rc_ln.reshape(b, n, rc, d)
    parts = [rc_q, utt_q]
    ns = 1 if cfg.use_mem else 0   # summary rows per segment
    if ns:
        parts.append(summary.reshape(b, n, 1, d))
    q_in = jnp.concatenate(parts, axis=2)                      # (B, n, q, D)
    nq = q_in.shape[2]
    q = linear(ap["emb_to_query"], q_in)

    qh = q.reshape(b, n, nq, h, hd).transpose(0, 1, 3, 2, 4) * (hd ** -0.5)
    kh = k_ctx.reshape(b, n, ctx, h, hd).transpose(0, 1, 3, 2, 4)
    vh = v_ctx.reshape(b, n, ctx, h, hd).transpose(0, 1, 3, 2, 4)
    scores = jnp.einsum("bnhqd,bnhkd->bnhqk", qh, kh).astype(jnp.float32)
    ni = neg_inf(q.dtype)
    scores = jnp.where(key_valid[:, :, None, None, :], scores, ni)
    if ns:
        # summary rows don't attend the memory slots
        m_slots = cfg.max_memory if cfg.use_mem else 0
        row_is_summary = jnp.arange(nq) == nq - 1
        col_is_mem = jnp.arange(ctx) < m_slots
        block = row_is_summary[:, None] & col_is_mem[None, :]
        scores = jnp.where(block[None, None, None], ni, scores)
    probs = _attn_softmax(scores).astype(q.dtype)
    probs = dropout(next(rngs), probs, cfg.attention_dropout, deterministic)
    out = jnp.einsum("bnhqk,bnhkd->bnhqd", probs, vh)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, n, nq, d)
    out = linear(ap["out_proj"], out)

    rc_out = out[:, :, :rc].reshape(b, n * rc, d)
    utt_out = out[:, :, rc:rc + seg].reshape(b, n * seg, d)[:, :U]
    summary_out = out[:, :, rc + seg:].reshape(b, n * ns, d)
    return jnp.concatenate([rc_out, utt_out], axis=1), summary_out


# ---------------------------------------------------------------------------
# training forward
# ---------------------------------------------------------------------------

def _layer_forward(p, cfg: EmformerConfig, utterance, rc_blocks, mems, lengths,
                   mask_blocked, rng, deterministic,
                   eids: Optional[PackedEids] = None):
    """One Emformer layer, training path. Returns (utt_out, rc_out, next_mems).
    `eids` switches masking to sequence-packed example-id equality."""
    rngs = _rng_stream(rng)
    b, U, d = utterance.shape
    rc_len = rc_blocks.shape[1]
    raw = jnp.concatenate([rc_blocks, utterance], axis=1)
    ln = layer_norm(p["ln_input"], raw) if cfg.normalize_before else raw
    rc_ln, utt_ln = ln[:, :rc_len], ln[:, rc_len:]

    if cfg.use_mem:
        summary = _segment_means(utt_ln, cfg.segment)          # (B, n, D)
    else:
        summary = utt_ln[:, :0]
    n = _num_segs(U, cfg.segment)

    G = _choose_group(n, U, cfg)
    groupable = G > 1
    if groupable:
        # _grouped_attention applies the out_proj + dropout + residual
        # epilogue itself (fused into one Pallas pass when supported)
        result, summary_out = _grouped_attention(
            p, cfg, G, utt_ln, rc_ln, mems, summary, lengths, rngs,
            deterministic, rc_blocks, utterance, eids=eids)
    elif cfg.segmented_attention:
        rc_utt_out, summary_out = _segmented_attention(
            p, cfg, utt_ln, rc_ln, mems, summary, lengths, rngs,
            deterministic, eids=eids)
    else:
        assert eids is None, \
            "sequence packing requires segmented_attention=True"
        query_in = jnp.concatenate([rc_ln, utt_ln, summary], axis=1)
        kv_in = jnp.concatenate([mems, rc_ln, utt_ln], axis=1)
        ap = p["attention"]
        q = linear(ap["emb_to_query"], query_in)
        kv = linear(ap["emb_to_key_value"], kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        mem_len = mems.shape[1]
        utt_valid = jnp.arange(U)[None, :] < lengths[:, None]
        key_valid = jnp.concatenate(
            [jnp.ones((b, mem_len + rc_len), bool), utt_valid], axis=1)
        bias = jnp.where(mask_blocked, neg_inf(q.dtype), 0.0).astype(jnp.float32)
        out = _attend(q, k, v, cfg.num_heads, bias, key_valid,
                      rate=cfg.attention_dropout, rng=next(rngs),
                      deterministic=deterministic)
        out = linear(ap["out_proj"], out)
        rc_utt_out = out[:, :rc_len + U]
        summary_out = out[:, rc_len + U:]

    if cfg.use_mem:
        next_mems = _mem_transform(summary_out, cfg)[:, :n - 1]
    else:
        next_mems = mems

    if not groupable:
        result = dropout(next(rngs), rc_utt_out, cfg.dropout,
                         deterministic) + raw
    result = _pos_ff_res(p["pos_ff"], cfg, result, next(rngs), next(rngs),
                         deterministic)
    if not cfg.normalize_before:
        result = layer_norm(p["ln_input"], result)
    return result[:, rc_len:], result[:, :rc_len], next_mems


def _rng_stream(rng):
    while True:
        if rng is None:
            yield None
        else:
            rng, sub = jax.random.split(rng)
            yield sub


def emformer_forward(params, cfg: EmformerConfig, x, lengths, *, rng=None,
                     deterministic=True):
    """Training / offline forward.

    x: (B, U + right_context, D) — utterance right-padded with rc frames.
    lengths: (B,) valid utterance frames.
    Returns (B, U, D) encoded utterance and per-layer outputs list.
    """
    layer_rngs = (jax.random.split(rng, cfg.num_layers)
                  if rng is not None else [None] * cfg.num_layers)
    U = x.shape[1] - cfg.right_context
    utterance = x[:, :U]
    idx = jnp.asarray(_rc_gather_indices(U, cfg.segment, cfg.right_context))
    rc_blocks = jnp.take(x, idx, axis=1)
    mask = jnp.asarray(_training_mask_np(U, cfg.segment, cfg.left_context,
                                         cfg.right_context, cfg.max_memory,
                                         cfg.use_mem))
    if cfg.use_mem:
        n = _num_segs(U, cfg.segment)
        mems = _segment_means(utterance, cfg.segment)[:, :n - 1]
    else:
        mems = utterance[:, :0]

    def one_layer(layer, out, rc_blocks, mems, lrng):
        return _layer_forward(layer, cfg, out, rc_blocks, mems, lengths,
                              mask, lrng, deterministic)

    if cfg.remat:
        one_layer = jax.checkpoint(one_layer)
    out = utterance
    states = []
    for layer, lrng in zip(params["layers"], layer_rngs):
        out, rc_blocks, mems = one_layer(layer, out, rc_blocks, mems, lrng)
        states.append(out)
    if cfg.normalize_before:
        out = layer_norm(params["final_ln"], out)
    return out, states


def emformer_forward_packed(params, cfg: EmformerConfig, utterance, rc_blocks,
                            frame_eid, seg_eid, *, rng=None,
                            deterministic=True):
    """Training forward over SEQUENCE-PACKED rows (train/packing.py).

    utterance: (R, Up, D) packed frontend features (dead frames zero);
    rc_blocks: (R, n*rc, D) right-context gathered with ZERO rows at example
    boundaries (pack_frames); frame_eid (R, Up) / seg_eid (R, n): example
    ids, -1 dead.  Deterministic outputs at every frame of every example
    equal the padded-batch emformer_forward exactly (tested in
    tests/test_packing.py); with dropout the packed layout draws its own
    valid masks.  Returns (R, Up, D); unpack with packing.unpack_frames.
    """
    assert cfg.segmented_attention, \
        "sequence packing requires segmented_attention=True"
    layer_rngs = (jax.random.split(rng, cfg.num_layers)
                  if rng is not None else [None] * cfg.num_layers)
    U = utterance.shape[1]
    n = _num_segs(U, cfg.segment)
    assert U == n * cfg.segment, "packed rows must be whole segments"
    eids = make_packed_eids(cfg, U, frame_eid, seg_eid, utterance.shape[-1])
    if cfg.use_mem:
        mems = _segment_means(utterance, cfg.segment)[:, :n - 1]
    else:
        mems = utterance[:, :0]
    lengths = jnp.full((utterance.shape[0],), U, jnp.int32)

    def one_layer(layer, out, rc_blocks, mems, lrng):
        return _layer_forward(layer, cfg, out, rc_blocks, mems, lengths,
                              None, lrng, deterministic, eids=eids)

    if cfg.remat:
        one_layer = jax.checkpoint(one_layer)
    out = utterance
    for layer, lrng in zip(params["layers"], layer_rngs):
        out, rc_blocks, mems = one_layer(layer, out, rc_blocks, mems, lrng)
    if cfg.normalize_before:
        out = layer_norm(params["final_ln"], out)
    return out


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------

class EmformerLayerState(NamedTuple):
    mems: jnp.ndarray   # (B, M, D) — valid entries at the END of the buffer
    lc_k: jnp.ndarray   # (B, L, D) — ditto
    lc_v: jnp.ndarray   # (B, L, D)


class EmformerState(NamedTuple):
    layers: Tuple[EmformerLayerState, ...]
    past_length: jnp.ndarray  # (B,) int32


def emformer_init_state(cfg: EmformerConfig, batch: int, dtype=jnp.float32
                        ) -> EmformerState:
    d = cfg.input_dim
    mk = lambda n: jnp.zeros((batch, n, d), dtype)
    layers = tuple(
        EmformerLayerState(mems=mk(cfg.max_memory), lc_k=mk(cfg.left_context),
                           lc_v=mk(cfg.left_context))
        for _ in range(cfg.num_layers))
    return EmformerState(layers=layers,
                         past_length=jnp.zeros((batch,), jnp.int32))


def _shift_append(buf, new, valid_new):
    """buf: (B, N, D) valid-at-end; new: (B, S, D) with first `valid_new`
    entries valid. Returns last-N of the true stream [buf_valid, new_valid].

    Implemented as concat + per-batch dynamic gather (rows [u, u+N))."""
    b, n_buf, d = buf.shape
    full = jnp.concatenate([buf, new], axis=1)  # (B, N+S, D)
    rows = valid_new[:, None] + jnp.arange(n_buf)[None, :]       # (B, N)
    return jnp.take_along_axis(full, rows[:, :, None], axis=1)


def _layer_step(p, cfg: EmformerConfig, lstate: EmformerLayerState, utterance,
                rc, in_mems, utt_valid, past_length):
    """One streaming chunk through one layer.

    utterance: (B, S, D) with first utt_valid frames valid; rc: (B, R, D);
    in_mems: (B, 1, D) this layer's input memory element.
    Returns (utt_out, rc_out, summary_out_mems, new_layer_state).
    """
    b, S, d = utterance.shape
    R = rc.shape[1]
    M, L = cfg.max_memory, cfg.left_context

    raw = jnp.concatenate([rc, utterance], axis=1)
    ln = layer_norm(p["ln_input"], raw) if cfg.normalize_before else raw
    rc_ln, utt_ln = ln[:, :R], ln[:, R:]

    if cfg.use_mem:
        uv = jnp.arange(S)[None, :] < utt_valid[:, None]
        denom = jnp.maximum(utt_valid, 1).astype(utt_ln.dtype)[:, None]
        summary = (utt_ln * uv[:, :, None]).sum(axis=1, keepdims=True) / denom[:, :, None]
    else:
        summary = utt_ln[:, :0]
    ns = summary.shape[1]

    ap = p["attention"]
    q = linear(ap["emb_to_query"], jnp.concatenate([rc_ln, utt_ln, summary], axis=1))
    kv = linear(ap["emb_to_key_value"],
                jnp.concatenate([lstate.mems, rc_ln, utt_ln], axis=1))
    k, v = jnp.split(kv, 2, axis=-1)
    k_mems, k_rc, k_utt = k[:, :M], k[:, M:M + R], k[:, M + R:]
    v_mems, v_rc, v_utt = v[:, :M], v[:, M:M + R], v[:, M + R:]

    k_full = jnp.concatenate([k_mems, k_rc, lstate.lc_k, k_utt], axis=1)
    v_full = jnp.concatenate([v_mems, v_rc, lstate.lc_v, v_utt], axis=1)

    # validity: mems last vm, rc all, lc last vl, utt first utt_valid
    vm = jnp.minimum(M, -(-past_length // cfg.segment))     # ceil(past/seg)
    vl = jnp.minimum(L, past_length)
    mem_ok = jnp.arange(M)[None, :] >= (M - vm)[:, None]
    lc_ok = jnp.arange(L)[None, :] >= (L - vl)[:, None]
    utt_ok = jnp.arange(S)[None, :] < utt_valid[:, None]
    key_valid = jnp.concatenate(
        [mem_ok, jnp.ones((b, R), bool), lc_ok, utt_ok], axis=1)

    # summary query row must not see the memory bank (reference :299-302)
    tq, tk = R + S + ns, M + R + L + S
    bias = np.zeros((tq, tk), np.float32)
    if ns:
        bias[tq - 1, :M] = neg_inf(q.dtype)
    out = _attend(q, k_full, v_full, cfg.num_heads, jnp.asarray(bias), key_valid)
    out = linear(ap["out_proj"], out)

    rc_utt_out = out[:, :R + S]
    mems_out = _mem_transform(out[:, R + S:], cfg) if cfg.use_mem else out[:, :0]

    result = rc_utt_out + raw
    result = _pos_ff_res(p["pos_ff"], cfg, result, None, None, True)
    if not cfg.normalize_before:
        result = layer_norm(p["ln_input"], result)

    new_state = EmformerLayerState(
        mems=_shift_append(lstate.mems, in_mems,
                           jnp.ones_like(utt_valid)) if cfg.use_mem else lstate.mems,
        lc_k=_shift_append(lstate.lc_k, k_utt, utt_valid),
        lc_v=_shift_append(lstate.lc_v, v_utt, utt_valid),
    )
    return result[:, R:], result[:, :R], mems_out, new_state


def emformer_step(params, cfg: EmformerConfig, state: EmformerState, x,
                  utt_valid) -> Tuple[jnp.ndarray, jnp.ndarray, EmformerState]:
    """One streaming chunk.

    x: (B, segment + right_context, D) arranged [utterance | rc]; the
    utterance slot's first `utt_valid` frames are real, the rest must be
    zeros (only reached on the final flush).  rc carries lookahead frames
    (zeros on flush, matching the reference's zero right-pad,
    s2t_emformer.py:217-218).
    Returns (utt_out (B,S,D), out_valid (B,), new_state).
    """
    S = cfg.segment
    utterance, rc = x[:, :S], x[:, S:]
    if cfg.use_mem:
        uv = jnp.arange(S)[None, :] < utt_valid[:, None]
        denom = jnp.maximum(utt_valid, 1).astype(x.dtype)[:, None, None]
        mems = (utterance * uv[:, :, None]).sum(axis=1, keepdims=True) / denom
    else:
        mems = utterance[:, :0]

    out = utterance
    new_layers = []
    for layer, lstate in zip(params["layers"], state.layers):
        out, rc, mems, nls = _layer_step(layer, cfg, lstate, out, rc, mems,
                                         utt_valid, state.past_length)
        new_layers.append(nls)
    if cfg.normalize_before:
        out = layer_norm(params["final_ln"], out)
    new_state = EmformerState(layers=tuple(new_layers),
                              past_length=state.past_length + utt_valid)
    return out, utt_valid, new_state


# ---------------------------------------------------------------------------
# sequence-parallel training forward (shard_map over a "seq" mesh axis)
#
# The reference has NO sequence/context parallelism (SURVEY.md §2.6, §5.7 —
# long audio is handled only algorithmically).  Here the block-processing
# structure makes true sequence parallelism natural: shard the SEGMENTS over
# mesh devices; per layer each shard only needs small halos from its left
# neighbor (lc LayerNormed frames + M memory summaries) and, once at input,
# rc lookahead frames from its right neighbor — three lax.ppermute exchanges
# riding ICI, everything else local.  Math identical to emformer_forward.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _segment_gather_indices_local(n_loc: int, seg: int, lc: int, rc: int,
                                  max_mem: int):
    """Static gather indices for one shard's segments into the local key
    tensor [mems_ext(M+n_loc) | rc(n_loc*rc) | utt_ext(lc + n_loc*seg)].

    Returns (idx (n_loc, ctx), kind (n_loc, ctx) 0=mem/1=rc/2=utt,
    gpos (n_loc, ctx)): gpos is the SHARD-RELATIVE global position —
    mem slots: segment index - o_seg offset applies; utt slots: frame index
    - o_frames offset applies.  Dynamic validity is computed in-kernel from
    the shard's axis index.
    """
    M = max_mem
    ctx = M + rc + lc + seg
    idx = np.zeros((n_loc, ctx), np.int32)
    kind = np.zeros((n_loc, ctx), np.int32)
    gpos = np.zeros((n_loc, ctx), np.int32)
    rc_base = M + n_loc
    utt_base = rc_base + n_loc * rc
    for i in range(n_loc):
        col = 0
        for jj in range(M):
            # mems_ext[t] holds the summary of global segment o_seg - M + t;
            # slot jj of segment i wants global segment i_g - M + jj
            idx[i, col] = i + jj
            kind[i, col] = 0
            gpos[i, col] = i - M + jj            # + o_seg >= 0 => valid
            col += 1
        for j in range(rc):
            idx[i, col] = rc_base + i * rc + j
            kind[i, col] = 1
            col += 1
        for j in range(lc + seg):
            # utt_ext[t] holds frame o_frames - lc + t
            idx[i, col] = utt_base + i * seg + j
            kind[i, col] = 2
            gpos[i, col] = i * seg - lc + j      # + o_frames in [0, len)
            col += 1
    return idx, kind, gpos


def _shift_from_left(x, axis_name: str, n_dev: int):
    """Each shard receives its LEFT neighbor's buffer (shard 0 gets zeros)."""
    perm = [(i, i + 1) for i in range(n_dev - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def _shift_from_right(x, axis_name: str, n_dev: int):
    perm = [(i + 1, i) for i in range(n_dev - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def emformer_forward_seq_sharded(params, cfg: EmformerConfig, x, lengths,
                                 mesh, seq_axis: str = "seq", *, rng=None,
                                 deterministic: bool = True,
                                 data_axis: str = None):
    """Sequence-parallel TRAINING/offline forward.

    x: (B, U + right_context, D) — like emformer_forward; U must be a
    multiple of n_devices * segment, and U / n_devices / segment must be
    >= max_memory.  Output matches emformer_forward's utterance encoding
    exactly when deterministic (dropout off).

    Train-grade dropout: pass `rng` and deterministic=False — each shard
    folds its axis index into the key, so masks are iid across shards and
    the run is reproducible given the key (they are a DIFFERENT valid draw
    than the single-device path's, exactly like the reference's DDP workers
    each drawing their own torch dropout masks).

    data_axis: optional second mesh axis composing dp x sp on one 2-D mesh —
    the batch shards over it while the halo ppermutes stay scoped to
    seq_axis, so each data column processes its own examples.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    S = mesh.shape[seq_axis]
    seg, lc, rc, M = cfg.segment, cfg.left_context, cfg.right_context, cfg.max_memory
    U = x.shape[1] - rc
    assert U % (S * seg) == 0, (U, S, seg)
    n_loc = U // S // seg
    assert n_loc >= M, "need >= max_memory segments per shard"
    assert cfg.use_mem, "seq-sharded path assumes the memory bank is on"
    utterance, tail_rc = x[:, :U], x[:, U:]

    idx_np, kind_np, gpos_np = _segment_gather_indices_local(n_loc, seg, lc,
                                                             rc, M)
    u_loc = n_loc * seg
    rc_len = n_loc * rc
    h = cfg.num_heads
    d = cfg.input_dim
    hd = d // h

    def body(x_loc, tail, lens):
        ax = jax.lax.axis_index(seq_axis)
        o_frames = ax * u_loc
        o_seg = ax * n_loc
        b = x_loc.shape[0]
        rngs = _rng_stream(None if (rng is None or deterministic)
                           else jax.random.fold_in(rng, ax))

        # input-time right halo for the rc blocks (last shard uses the tail)
        halo_r = _shift_from_right(x_loc[:, :rc], seq_axis, S)
        halo_r = jnp.where((ax == S - 1), tail, halo_r)
        ext0 = jnp.concatenate([x_loc, halo_r], axis=1)
        rc_rows = np.concatenate(
            [np.arange((i + 1) * seg, (i + 1) * seg + rc)
             for i in range(n_loc)]).astype(np.int32)
        rc_blocks = jnp.take(ext0, jnp.asarray(rc_rows), axis=1)

        mems_loc = _segment_means(x_loc, seg)                 # (B, n_loc, D)
        out = x_loc

        idx = jnp.asarray(idx_np)
        kind = jnp.asarray(kind_np)
        gpos = jnp.asarray(gpos_np)
        mem_ok = (kind == 0)[None] & (o_seg + gpos[None] >= 0)
        rc_ok = (kind == 1)[None]
        utt_g = o_frames + gpos[None]                          # (1, n_loc, ctx)
        utt_ok = (kind == 2)[None] & (utt_g >= 0) \
            & (utt_g < lens[:, None, None])
        key_valid = mem_ok | rc_ok | utt_ok                    # (B, n_loc, ctx)

        for p in params["layers"]:
            raw = jnp.concatenate([rc_blocks, out], axis=1)
            ln = layer_norm(p["ln_input"], raw) if cfg.normalize_before else raw
            rc_ln, utt_ln = ln[:, :rc_len], ln[:, rc_len:]
            summary = _segment_means(utt_ln, seg)              # (B, n_loc, D)

            # per-layer halos from the left neighbor (ICI ppermute)
            halo_utt = _shift_from_left(utt_ln[:, -lc:], seq_axis, S)
            halo_mem = _shift_from_left(mems_loc[:, -M:], seq_axis, S)

            mems_ext = jnp.concatenate([halo_mem, mems_loc], axis=1)
            utt_ext = jnp.concatenate([halo_utt, utt_ln], axis=1)

            ap = p["attention"]
            kv = linear(ap["emb_to_key_value"],
                        jnp.concatenate([mems_ext, rc_ln, utt_ext], axis=1))
            k, v = jnp.split(kv, 2, axis=-1)
            ctx = idx.shape[1]
            k_ctx = jnp.take(k, idx.reshape(-1), axis=1).reshape(b, n_loc, ctx, d)
            v_ctx = jnp.take(v, idx.reshape(-1), axis=1).reshape(b, n_loc, ctx, d)

            utt_q = utt_ln.reshape(b, n_loc, seg, d)
            rc_q = rc_ln.reshape(b, n_loc, rc, d)
            q_in = jnp.concatenate([rc_q, utt_q, summary[:, :, None]], axis=2)
            nq = q_in.shape[2]
            q = linear(ap["emb_to_query"], q_in)

            qh = q.reshape(b, n_loc, nq, h, hd).transpose(0, 1, 3, 2, 4) * (hd ** -0.5)
            kh = k_ctx.reshape(b, n_loc, ctx, h, hd).transpose(0, 1, 3, 2, 4)
            vh = v_ctx.reshape(b, n_loc, ctx, h, hd).transpose(0, 1, 3, 2, 4)
            scores = jnp.einsum("bnhqd,bnhkd->bnhqk", qh, kh).astype(jnp.float32)
            ni = neg_inf(q.dtype)
            scores = jnp.where(key_valid[:, :, None, None, :], scores, ni)
            # summary rows must not attend the memory slots
            block = (jnp.arange(nq) == nq - 1)[:, None] & (jnp.arange(ctx) < M)[None, :]
            scores = jnp.where(block[None, None, None], ni, scores)
            probs = _attn_softmax(scores).astype(q.dtype)
            probs = dropout(next(rngs), probs, cfg.attention_dropout,
                            deterministic)
            o = jnp.einsum("bnhqk,bnhkd->bnhqd", probs, vh)
            o = o.transpose(0, 1, 3, 2, 4).reshape(b, n_loc, nq, d)
            o = linear(ap["out_proj"], o)

            rc_out = o[:, :, :rc].reshape(b, rc_len, d)
            utt_out = o[:, :, rc:rc + seg].reshape(b, u_loc, d)
            summary_out = o[:, :, rc + seg:].reshape(b, n_loc, d)
            mems_loc = _mem_transform(summary_out, cfg)

            rc_utt_out = jnp.concatenate([rc_out, utt_out], axis=1)
            result = dropout(next(rngs), rc_utt_out, cfg.dropout,
                             deterministic) + raw
            result = _pos_ff_res(p["pos_ff"], cfg, result, next(rngs),
                                 next(rngs), deterministic)
            if not cfg.normalize_before:
                result = layer_norm(p["ln_input"], result)
            out, rc_blocks = result[:, rc_len:], result[:, :rc_len]

        if cfg.normalize_before:
            out = layer_norm(params["final_ln"], out)
        return out

    dspec = data_axis if data_axis else None
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(dspec, seq_axis, None), P(dspec), P(dspec)),
                  out_specs=P(dspec, seq_axis, None), check_vma=False)
    return f(utterance, tail_rc, lengths)


def emformer_forward_pipelined(params, cfg: EmformerConfig, x, lengths,
                               mesh, pipe_axis: str = "pipe",
                               n_micro: int = None, *, rng=None,
                               deterministic: bool = True,
                               data_axis: str = None):
    """Pipeline-parallel TRAINING/offline forward (GPipe-style).

    The num_layers Emformer layers split into mesh.shape[pipe_axis]
    contiguous stages; each device holds only its stage's parameters
    (stacked layer params sharded over the pipe axis).  The batch splits
    into n_micro microbatches (default = number of stages) that flow
    through the stages in the standard n_micro + P - 1 tick schedule, the
    (utterance, rc_blocks, mems, lengths) activation hopping stage->stage
    over ICI (ppermute).  Output equals emformer_forward's utterance
    encoding exactly when deterministic; with rng/deterministic=False each
    (layer, microbatch) folds its indices into the key (a different valid
    dropout draw than the single-device path, like the seq-sharded runner).
    Differentiable: jax.grad through the shard_map runs the reverse-order
    pipeline automatically (ppermute transposes to the reverse permutation).
    The reference has data parallelism only (SURVEY.md §2.6).

    data_axis: optional second mesh axis composing dp x pp on one 2-D mesh —
    each microbatch's examples shard over it (collectives stay scoped to
    pipe_axis, so the data columns pipeline independently; the data-parallel
    gradient psum comes from the param sharding outside, as usual).

    Demo-scale notes: microbatch inputs/outputs are replicated across
    stages rather than streamed host->stage0 / stageP-1->host, and the
    per-tick final-layer outputs are all_gathered at the end — right for
    validating the schedule and shardings (the driver's virtual mesh),
    wasteful for a production input pipeline.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_stage = mesh.shape[pipe_axis]
    L = cfg.num_layers
    assert L % n_stage == 0, (L, n_stage)
    lpp = L // n_stage
    B = x.shape[0]
    n_micro = n_micro or n_stage
    assert B % n_micro == 0, (B, n_micro)
    mbs = B // n_micro
    n_data = mesh.shape[data_axis] if data_axis else 1
    assert mbs % n_data == 0, (mbs, n_data)

    U = x.shape[1] - cfg.right_context
    utterance = x[:, :U]
    idx = jnp.asarray(_rc_gather_indices(U, cfg.segment, cfg.right_context))
    rc_blocks = jnp.take(x, idx, axis=1)
    mask = jnp.asarray(_training_mask_np(U, cfg.segment, cfg.left_context,
                                         cfg.right_context, cfg.max_memory,
                                         cfg.use_mem))
    if cfg.use_mem:
        n = _num_segs(U, cfg.segment)
        mems0 = _segment_means(utterance, cfg.segment)[:, :n - 1]
    else:
        mems0 = utterance[:, :0]

    def split(a):
        return a.reshape(n_micro, mbs, *a.shape[1:])

    utt_s, rcb_s, mem_s = split(utterance), split(rc_blocks), split(mems0)
    len_s = lengths.reshape(n_micro, mbs)

    # (n_stage, lpp, *leaf) stacked stage parameters, sharded on axis 0
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls).reshape(n_stage, lpp, *ls[0].shape),
        *params["layers"])

    perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]
    n_tick = n_micro + n_stage - 1

    def body(stage_params, utt_s, rcb_s, mem_s, len_s):
        ax = jax.lax.axis_index(pipe_axis)
        sp = jax.tree_util.tree_map(lambda a: a[0], stage_params)  # (lpp,...)
        zero = (jnp.zeros_like(utt_s[0]), jnp.zeros_like(rcb_s[0]),
                jnp.zeros_like(mem_s[0]), jnp.zeros_like(len_s[0]))

        def tick(act, t):
            m = jnp.clip(t, 0, n_micro - 1)
            inject = tuple(
                jax.lax.dynamic_index_in_dim(a, m, 0, keepdims=False)
                for a in (utt_s, rcb_s, mem_s, len_s))
            first = ax == 0
            out, rcb, mems, lens = jax.tree_util.tree_map(
                lambda a, b: jnp.where(first, a, b), inject, act)
            for i in range(lpp):
                lp = jax.tree_util.tree_map(lambda a: a[i], sp)
                lrng = None
                if rng is not None and not deterministic:
                    lrng = jax.random.fold_in(
                        jax.random.fold_in(rng, ax * lpp + i), m)
                out, rcb, mems = _layer_forward(lp, cfg, out, rcb, mems,
                                                lens, mask, lrng,
                                                deterministic)
            y = (out, rcb, mems, lens)
            nxt = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, pipe_axis, perm), y)
            return nxt, out

        _, outs = jax.lax.scan(tick, zero, jnp.arange(n_tick))
        # microbatch m finishes on the LAST stage at tick m + n_stage - 1
        outs = jax.lax.all_gather(outs, pipe_axis)       # (P, T, mbs', U, D)
        return outs[n_stage - 1, n_stage - 1:]           # (n_micro, mbs', U, D)

    # activations replicate over the data axis only in the degenerate 1-D
    # case; with data_axis each data column pipelines its own batch shard
    dspec = data_axis if data_axis else None
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(pipe_axis), P(None, dspec), P(None, dspec),
                            P(None, dspec), P(None, dspec)),
                  out_specs=P(None, dspec), check_vma=False)
    final = f(stacked, utt_s, rcb_s, mem_s, len_s)       # (n_micro, mbs, U, D)
    out = final.reshape(B, U, final.shape[-1])
    if cfg.normalize_before:
        out = layer_norm(params["final_ln"], out)
    return out
