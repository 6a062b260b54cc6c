"""Fused grouped-segment Emformer attention Pallas kernel.

The XLA path (nn/emformer._grouped_attention) materializes in HBM, per layer:
gathered key/value context tensors (B, ng, ctx, D), fp32 score tensors
(B, ng, h, nq, ctx), dropout bits + masks of the same width, and the
(0,1,3,2,4) head transposes — profiling showed those gathers, transposes and
mask/softmax elementwise as the second-largest cost block after the FFN.

This kernel computes one (batch, group) attention block entirely in VMEM:

  * the three context regions (memory bank / rc blocks / lc+utterance
    window) are DYNAMIC-START STATIC-SIZE slices of the projected key/value
    rows — no gathered context tensor ever exists in HBM;
  * the per-row visibility mask (which segment sees which mems / rc block /
    utterance window, summary rows blind to mems — reference semantics
    torchaudio emformer.py:711-793, :299-302) is rebuilt from iotas on the
    VPU;
  * softmax runs in fp32 in VMEM; attention dropout uses the on-core PRNG
    seeded by (seed, b*ng+g) so backward regenerates bit-identical masks;
  * backward (custom_vjp) recomputes probabilities flash-attention-style and
    accumulates dk/dv in fp32 VMEM across the group loop (the utterance
    windows of neighboring groups overlap by lc frames).

Key layout contract (matches _grouped_attention): keys/values are the
projected rows of concat([mems (n-1), rc_blocks (n*rc), utterance (U)], 1);
queries are (B, ng, nq, D) with rows [G rc blocks | G segments | G
summaries] per group.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


ALIGN = 16  # sublane alignment for dynamic slices (bf16 tile = (16, 128))


def _round_up(x: int) -> int:
    return -(-x // ALIGN) * ALIGN


class AttnGeom(NamedTuple):
    """Static geometry of the grouped attention (hashable: custom_vjp
    nondiff arg)."""
    U: int
    seg: int
    lc: int
    rc: int
    max_mem: int
    G: int
    num_heads: int

    @property
    def n(self):
        return self.U // self.seg

    @property
    def ng(self):
        return self.n // self.G

    @property
    def m_slots(self):
        return self.max_mem + self.G - 1

    # context windows are widened by ALIGN: Mosaic requires dynamic-slice
    # starts to be sublane-aligned, so each region start is aligned DOWN and
    # the (static) window grows to still cover every needed row; the extra
    # rows are mask-blocked.
    @property
    def m_win(self):
        return _round_up(self.m_slots + ALIGN)

    @property
    def rc_win(self):
        return _round_up(self.G * self.rc + ALIGN)

    @property
    def utt_win(self):
        return _round_up(self.lc + self.G * self.seg + ALIGN)

    @property
    def ctx(self):
        return self.m_win + self.rc_win + self.utt_win

    @property
    def nq(self):
        return self.G * (self.rc + self.seg + 1)

    @property
    def tk(self):
        return (self.n - 1) + self.n * self.rc + self.U


def _align_down(i):
    return pl.multiple_of((i // ALIGN) * ALIGN, ALIGN)


def _starts(geom: AttnGeom, g):
    """Aligned dynamic row starts of the three context windows in the
    (padded) key tensor."""
    mem_len = geom.n - 1
    utt_base = mem_len + geom.n * geom.rc
    mem_start = _align_down(jnp.maximum(g * geom.G - geom.max_mem, 0))
    rc_start = _align_down(mem_len + g * geom.G * geom.rc)
    utt_start = _align_down(
        utt_base + jnp.maximum(g * geom.G * geom.seg - geom.lc, 0))
    return mem_start, rc_start, utt_start


def _masks(geom: AttnGeom, g, mem_start, rc_start, utt_start, length):
    """fp32 additive mask (nq, ctx): 0 where visible, -1e9 where blocked.
    Encodes reference visibility + per-example utterance length.  Row/col
    tables are rebuilt from iotas (Pallas kernels can't capture array
    constants)."""
    nq, ctx = geom.nq, geom.ctx
    m, grc = geom.m_slots, geom.G * geom.rc
    G, rc, seg = geom.G, geom.rc, geom.seg
    row = jax.lax.broadcasted_iota(jnp.int32, (nq, 1), 0)    # (nq, 1)
    # query rows: [G rc blocks | G segments | G summaries]
    row_seg = jnp.where(
        row < G * rc, row // rc,
        jnp.where(row < G * (rc + seg), (row - G * rc) // seg,
                  row - G * (rc + seg)))
    is_sum = row >= G * (rc + seg)
    gi = g * geom.G + row_seg                                # global segment

    mem_len = geom.n - 1
    utt_base = mem_len + geom.n * geom.rc
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, ctx), 1)
    # memory window: key row js = mem_start + col is the summary of segment js
    js = mem_start + col
    ok_mem = ((col < geom.m_win) & ~is_sum & (js >= gi - geom.max_mem)
              & (js <= gi - 1) & (js <= geom.n - 2))
    # rc window: key row -> global rc position p -> owning segment p // rc
    p_rc = rc_start + (col - geom.m_win) - mem_len
    ok_rc = ((col >= geom.m_win) & (col < geom.m_win + geom.rc_win)
             & (p_rc >= 0) & (p_rc < geom.n * geom.rc)
             & (p_rc // geom.rc == gi))
    # utterance window: key row -> frame f
    f = utt_start + (col - geom.m_win - geom.rc_win) - utt_base
    ok_utt = ((col >= geom.m_win + geom.rc_win)
              & (f >= gi * geom.seg - geom.lc) & (f >= 0)
              & (f < (gi + 1) * geom.seg)
              & (f < length) & (f < geom.U))
    allowed = ok_mem | ok_rc | ok_utt
    return jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)


def _load_ctx(ref, geom: AttnGeom, mem_start, rc_start, utt_start):
    """Concatenate the three aligned windows of a (Tk+ALIGN, D) ref
    -> (ctx, D)."""
    mem = ref[pl.ds(mem_start, geom.m_win), :]
    rcb = ref[pl.ds(rc_start, geom.rc_win), :]
    utt = ref[pl.ds(utt_start, geom.utt_win), :]
    return jnp.concatenate([mem, rcb, utt], axis=0)


def _probs_fwd(geom: AttnGeom, rate, seed_ref, q, k_ctx, mask, tile,
               exact_div=False):
    """Per-head fp32 probs (h, nq, ctx) and dropped probs (dtype).

    Softmax is stabilized by a STATIC clamp (exp(min(s, 80))) instead of the
    row-max subtraction: bisecting the kernel showed the cross-lane max
    reduce costing ~0.05 ms/layer/pass (the exp itself pipelines for free)
    while scores beyond 80 are unreachable for LN-bounded inputs — exp(80)
    and a 288-wide sum of it stay inside fp32, and any bf16/fp16 pipeline
    saturates long before |q.k|/sqrt(hd) reaches 80.  The +1e-30 on the
    denominator makes rows with NO visible keys (frames beyond a short
    example's length; exp of the -1e9 mask underflows to 0) come out as
    exact zeros instead of 0/0 — matching nn/emformer's _attn_softmax.
    Compiled kernels normalize with the VPU's approximate reciprocal
    (~2^-14 rel err, below bf16 resolution); interpret mode divides
    exactly (its reciprocal emulation is unreliable)."""
    h = geom.num_heads
    hd = q.shape[-1] // h
    scale = np.float32(hd ** -0.5)
    probs = []
    for hh in range(h):
        qh = q[:, hh * hd:(hh + 1) * hd]
        kh = k_ctx[:, hh * hd:(hh + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + mask
        e = jnp.exp(jnp.minimum(s, np.float32(80.0)))
        denom = e.sum(axis=-1, keepdims=True) + np.float32(1e-30)
        probs.append(e / denom if exact_div
                     else e * pl.reciprocal(denom, approx=True))
    p = jnp.stack(probs, axis=0)                            # (h, nq, ctx) f32
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], tile)
        bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
        thresh = np.uint32(min(int(round((1.0 - rate) * 2.0 ** 32)),
                               2 ** 32 - 1))
        pd = jnp.where(bits < thresh, p * np.float32(1.0 / (1.0 - rate)), 0.0)
    else:
        pd = p
    return p, pd


def _fwd_kernel(geom: AttnGeom, rate, exact_div, has_eid, seed_ref, len_ref,
                q_ref, k_ref, v_ref, *rest):
    if has_eid:
        eid_ref, o_ref = rest
    else:
        (o_ref,) = rest
    b, g = pl.program_id(0), pl.program_id(1)
    tile = b * geom.ng + g
    dtype = q_ref.dtype
    h = geom.num_heads
    hd = q_ref.shape[-1] // h

    mem_start, rc_start, utt_start = _starts(geom, g)
    k_ctx = _load_ctx(k_ref.at[0], geom, mem_start, rc_start, utt_start)
    v_ctx = _load_ctx(v_ref.at[0], geom, mem_start, rc_start, utt_start)
    mask = _masks(geom, g, mem_start, rc_start, utt_start, len_ref[b])
    if has_eid:
        # sequence packing: example-id equality gate (built in XLA from the
        # pack plan, layer-invariant; nn/emformer.make_packed_eids).  Kept
        # arithmetic (visible=1 -> +0, blocked=0 -> -1e9): a boolean compare
        # here produced an i1 vector whose relayout Mosaic rejects.
        mask = mask + (eid_ref[0, 0].astype(jnp.float32) - 1.0) \
            * np.float32(1e9)
    q = q_ref[0, 0]

    _, pd = _probs_fwd(geom, rate, seed_ref, q, k_ctx, mask, tile, exact_div)
    outs = []
    for hh in range(h):
        vh = v_ctx[:, hh * hd:(hh + 1) * hd]
        outs.append(jnp.dot(pd[hh].astype(dtype), vh,
                            preferred_element_type=jnp.float32).astype(dtype))
    o_ref[0, 0] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(geom: AttnGeom, rate, exact_div, has_eid, seed_ref, len_ref,
                q_ref, k_ref, v_ref, *rest):
    if has_eid:
        eid_ref, do_ref, dq_ref, dk_ref, dv_ref = rest
    else:
        do_ref, dq_ref, dk_ref, dv_ref = rest
    b, g = pl.program_id(0), pl.program_id(1)
    tile = b * geom.ng + g
    dtype = q_ref.dtype
    h = geom.num_heads
    hd = q_ref.shape[-1] // h
    scale = np.float32(hd ** -0.5)

    mem_start, rc_start, utt_start = _starts(geom, g)
    k_ctx = _load_ctx(k_ref.at[0], geom, mem_start, rc_start, utt_start)
    v_ctx = _load_ctx(v_ref.at[0], geom, mem_start, rc_start, utt_start)
    mask = _masks(geom, g, mem_start, rc_start, utt_start, len_ref[b])
    if has_eid:
        mask = mask + (eid_ref[0, 0].astype(jnp.float32) - 1.0) \
            * np.float32(1e9)
    q = q_ref[0, 0]
    do = do_ref[0, 0]

    p, pd = _probs_fwd(geom, rate, seed_ref, q, k_ctx, mask, tile, exact_div)
    if rate > 0.0:
        # dropout vjp: the mask positions are where pd survived (p>0 there)
        drop_scale = jnp.where(pd != 0.0, np.float32(1.0 / (1.0 - rate)), 0.0)
    else:
        drop_scale = None

    @pl.when(g == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    dqs, dks, dvs = [], [], []
    for hh in range(h):
        sl = slice(hh * hd, (hh + 1) * hd)
        qh, kh, vh, doh = q[:, sl], k_ctx[:, sl], v_ctx[:, sl], do[:, sl]
        # dv_h = pd^T @ do
        dvs.append(jax.lax.dot_general(
            pd[hh].astype(dtype), doh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        # d(pd) = do @ v^T
        dpd = jax.lax.dot_general(
            doh, vh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = dpd * drop_scale[hh] if rate > 0.0 else dpd
        # softmax vjp (fp32)
        ph = p[hh]
        ds = ph * (dp - (dp * ph).sum(axis=-1, keepdims=True))
        ds = (ds * scale).astype(dtype)
        dqs.append(jnp.dot(ds, kh,
                           preferred_element_type=jnp.float32).astype(dtype))
        dks.append(jax.lax.dot_general(
            ds, qh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))

    dq_ref[0, 0] = jnp.concatenate(dqs, axis=-1)
    dk_ctx = jnp.concatenate(dks, axis=-1)
    dv_ctx = jnp.concatenate(dvs, axis=-1)

    m, grc = geom.m_win, geom.rc_win
    dk_ref[0, pl.ds(mem_start, m), :] += dk_ctx[:m]
    dk_ref[0, pl.ds(rc_start, grc), :] += dk_ctx[m:m + grc]
    dk_ref[0, pl.ds(utt_start, geom.utt_win), :] += dk_ctx[m + grc:]
    dv_ref[0, pl.ds(mem_start, m), :] += dv_ctx[:m]
    dv_ref[0, pl.ds(rc_start, grc), :] += dv_ctx[m:m + grc]
    dv_ref[0, pl.ds(utt_start, geom.utt_win), :] += dv_ctx[m + grc:]


def _interpret_mode(flag):
    return pltpu.InterpretParams() if flag else False


def padded_tk(geom: AttnGeom) -> int:
    """Row count the kernel needs k/v padded to: widened (aligned-down)
    windows must stay in bounds AND the row count must be tile-aligned
    (Mosaic requires slice shapes aligned to the tiling).  Callers that
    build k/v at this width up front (zero rows appended before the kv
    projection) skip the pad+copy XLA otherwise inserts per layer
    (~0.17 ms/step at the bench geometry — round-3 profile)."""
    return _round_up(geom.tk + 2 * ALIGN)


def _pad_tk(a, geom: AttnGeom):
    pad = padded_tk(geom) - a.shape[1]
    if pad < 0:
        raise ValueError(f"k/v rows {a.shape[1]} exceed padded_tk "
                         f"{padded_tk(geom)}")
    return jnp.pad(a, ((0, 0), (0, pad), (0, 0))) if pad else a


def _fwd_call(q3, k, v, lengths, seed, eid_mask, geom: AttnGeom, rate,
              interpret):
    b, ng, nq, d = q3.shape
    k, v = _pad_tk(k, geom), _pad_tk(v, geom)
    tk = k.shape[1]
    has_eid = eid_mask is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, nq, d), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [seed, lengths, q3, k, v]
    if has_eid:
        in_specs.append(pl.BlockSpec((1, 1, nq, geom.ctx),
                                     lambda i, j: (i, j, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(eid_mask)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, geom, rate, bool(interpret), has_eid),
        grid=(b, ng),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, nq, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ng, nq, d), q3.dtype),
        interpret=_interpret_mode(interpret),
    )(*args)


def _bwd_call(q3, k, v, lengths, seed, eid_mask, do, geom: AttnGeom, rate,
              interpret):
    b, ng, nq, d = q3.shape
    tk_real = k.shape[1]
    k, v = _pad_tk(k, geom), _pad_tk(v, geom)
    tk = k.shape[1]
    has_eid = eid_mask is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, nq, d), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [seed, lengths, q3, k, v]
    if has_eid:
        in_specs.append(pl.BlockSpec((1, 1, nq, geom.ctx),
                                     lambda i, j: (i, j, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(eid_mask)
    in_specs.append(pl.BlockSpec((1, 1, nq, d), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(do)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, geom, rate, bool(interpret), has_eid),
        grid=(b, ng),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, nq, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, ng, nq, d), q3.dtype),
            jax.ShapeDtypeStruct((b, tk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, tk, d), jnp.float32),
        ),
        interpret=_interpret_mode(interpret),
    )(*args)
    return (dq, dk[:, :tk_real].astype(k.dtype),
            dv[:, :tk_real].astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def emformer_grouped_attention(q3, k, v, lengths, seed, eid_mask,
                               geom: AttnGeom, rate=0.0, interpret=False):
    """Fused grouped-segment attention (pre-out_proj).

    q3: (B, ng, nq, D) projected queries; k/v: (B, Tk, D) projected rows of
    [mems | rc_blocks | utterance]; lengths: (B,) int32; seed: (1,) int32;
    eid_mask: None, or (B, ng, nq, ctx) int8 (1 = visible) example-id
    equality gate for SEQUENCE-PACKED rows (nn/emformer._packed_kernel_mask
    builds it in the kernel's aligned-window ctx layout).
    Returns (B, ng, nq, D).
    """
    return _fwd_call(q3, k, v, lengths, seed, eid_mask, geom, rate, interpret)


def _attn_fwd(q3, k, v, lengths, seed, eid_mask, geom, rate, interpret):
    out = _fwd_call(q3, k, v, lengths, seed, eid_mask, geom, rate, interpret)
    return out, (q3, k, v, lengths, seed, eid_mask)


def _attn_bwd(geom, rate, interpret, res, g):
    q3, k, v, lengths, seed, eid_mask = res
    dq, dk, dv = _bwd_call(q3, k, v, lengths, seed, eid_mask, g, geom, rate,
                           interpret)
    return (dq, dk, dv,
            np.zeros(lengths.shape, jax.dtypes.float0),
            np.zeros(seed.shape, jax.dtypes.float0),
            None if eid_mask is None
            else np.zeros(eid_mask.shape, jax.dtypes.float0))


emformer_grouped_attention.defvjp(_attn_fwd, _attn_bwd)


def kernel_ctx_row_map(geom: AttnGeom) -> np.ndarray:
    """Static (ng, ctx) map: kernel context column -> key row index in the
    [mems (n-1) | rc (n*rc) | utterance (U)] key tensor, or the last PADDED
    row (kid there is a sentinel) for out-of-range/alignment-slack columns.
    Mirrors _starts/_load_ctx so XLA-side per-column metadata (example ids)
    can be gathered into exactly the layout the kernel sees."""
    def align_down(i):
        return (i // ALIGN) * ALIGN

    pad_row = padded_tk(geom) - 1
    mem_len = geom.n - 1
    utt_base = mem_len + geom.n * geom.rc
    rows = np.full((geom.ng, geom.ctx), pad_row, np.int64)
    for g in range(geom.ng):
        mem_start = align_down(max(g * geom.G - geom.max_mem, 0))
        rc_start = align_down(mem_len + g * geom.G * geom.rc)
        utt_start = align_down(
            utt_base + max(g * geom.G * geom.seg - geom.lc, 0))
        for w, (start, width) in enumerate(
                [(mem_start, geom.m_win), (rc_start, geom.rc_win),
                 (utt_start, geom.utt_win)]):
            off = [0, geom.m_win, geom.m_win + geom.rc_win][w]
            r = start + np.arange(width)
            rows[g, off: off + width] = np.where(r < geom.tk, r, pad_row)
    return rows.astype(np.int32)


def attn_pallas_supported(geom: AttnGeom, dim: int) -> bool:
    if os.environ.get("SIMULST_NO_FUSED_ATTN"):
        return False
    if jax.default_backend() == "cpu":
        return False
    # lane tiling: the feature dim and per-head dim must fill 128-wide lanes
    if dim % 128 != 0 or (dim // geom.num_heads) % 8 != 0:
        return False
    # the clamped first-group utterance window [0, lc + G*seg) must stay
    # inside the U utterance rows (out-of-bounds dynamic slices otherwise)
    if (geom.n - geom.G) * geom.seg < geom.lc:
        return False
    return geom.nq >= 8 and geom.ctx >= 8 and geom.max_mem > 0
