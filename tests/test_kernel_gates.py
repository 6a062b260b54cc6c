"""Pallas kernel gate logic exercised on CPU over stress geometries.

Every fused kernel gates OFF on CPU, so the default suite could never see an
illegal block choice (VERDICT r3 weak #6): the two real long-utterance bugs
(commit 010b9fc — a Mosaic-illegal CTC batch block, and a decoder-MHA block
chosen with no VMEM estimate) were hardware-only finds.  The gate/block
selectors are plain host Python; here jax.default_backend is monkeypatched
to 'tpu' and every gate must, at every geometry, either pick a Mosaic-LEGAL
block inside its VMEM budget or fall back (0/False) — exactly the asserts
that would have caught both 010b9fc bugs without a chip.
"""
import numpy as np
import pytest

import jax

from simulst_tpu.ops import ctc as ctc_mod
from simulst_tpu.ops import mha_pallas as mha_mod
from simulst_tpu.ops.emformer_attn_pallas import (AttnGeom,
                                                  attn_pallas_supported)

# (B, T_raw, U) train geometries from exp/geometry_stress.py plus streaming
# decoder shapes (cross-attention over a long encoder buffer = 010b9fc #2)
TRAIN_GEOMS = [
    (12, 1024, 64),
    (2, 512, 16),
    (32, 1024, 192),
    (16, 2048, 96),
    (8, 4096, 192),     # the round-3 bug finder
    (6, 384, 40),
    (32, 1024, 24),     # the standard bench geometry (kernels must stay ON)
    (1, 8192, 512),     # beyond the probe: single very long utterance
    (64, 1024, 24),
]
STRIDE = 4
EMBED, HEADS = 256, 4
VMEM_LIMIT = 16 * 2 ** 20


@pytest.fixture()
def tpu_backend(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # both modules call jax.default_backend through their own `jax` import,
    # so patching the attribute on the jax module covers them all
    yield


def _assert_ctc_block_legal(b, n_arrays, t, s):
    blk = ctc_mod._ctc_block(b, n_arrays, t, s)
    if blk == 0:
        return False
    # Mosaic legality: block dim multiple of 8 OR the full array dim
    assert blk % 8 == 0 or blk == b, (b, t, s, blk)
    assert b % blk == 0, (b, blk)
    s_pad = -(-s // 128) * 128
    assert n_arrays * t * blk * s_pad * 4 <= VMEM_LIMIT, (b, t, s, blk)
    return True


def test_ctc_block_legal_or_fallback(tpu_backend):
    picked = []
    for b, t_raw, u in TRAIN_GEOMS:
        t = t_raw // STRIDE
        s = 2 * u + 1
        for n_arrays in (2, 3):  # alpha kernel / d_em (beta) kernel panels
            picked.append(_assert_ctc_block_legal(b, n_arrays, t, s))
    # the gate must not be vacuous: some geometries keep the kernel ON
    assert any(picked)
    # ... and the 8x4096 long-utterance case must FALL BACK (010b9fc #1)
    assert ctc_mod._ctc_block(8, 3, 4096 // STRIDE, 2 * 192 + 1) == 0


def test_mha_batch_block_budgets_vmem(tpu_backend):
    picked = []
    for b, t_raw, u in TRAIN_GEOMS:
        tk = t_raw // STRIDE          # encoder buffer rows
        for tq in (u, 1):             # teacher-forced / incremental step
            bb = mha_mod._batch_block(b, tq, tk, EMBED, HEADS)
            if bb == 0:
                continue
            assert bb % 8 == 0 or bb == b, (b, tq, tk, bb)
            assert b % bb == 0
            assert mha_mod._vmem_estimate(bb, tq, tk, EMBED, HEADS) \
                <= 9 * 2 ** 20, (b, tq, tk, bb)
            picked.append((b, tq, tk, bb))
    assert picked
    # 010b9fc #2: B=8 T=4096 U=192 cross-attention must not claim ~50 MB
    est_full = mha_mod._vmem_estimate(8, 192, 1024, EMBED, HEADS)
    assert est_full > 9 * 2 ** 20     # full batch would blow the budget...
    bb = mha_mod._batch_block(8, 192, 1024, EMBED, HEADS)
    assert bb == 0                    # ...so the gate must fall back


def test_mha_supported_consistent_with_block(tpu_backend):
    for b, t_raw, u in TRAIN_GEOMS:
        tk = t_raw // STRIDE
        tq = u if u % 8 == 0 else -(-u // 8) * 8
        qp = jax.ShapeDtypeStruct((b, tq, EMBED), np.float32)
        kp = jax.ShapeDtypeStruct((b, tk, EMBED), np.float32)
        ok = mha_mod.mha_pallas_supported(qp, kp, HEADS)
        if ok:
            assert mha_mod._batch_block(b, tq, tk, EMBED, HEADS) > 0


def test_emformer_attn_gate_geometries(tpu_backend):
    from simulst_tpu.nn.emformer import EmformerConfig, _choose_group
    ecfg = EmformerConfig(input_dim=EMBED, num_heads=HEADS, ffn_dim=2048,
                          num_layers=12, segment=16, left_context=32,
                          right_context=8, max_memory=5)
    any_on = False
    for b, t_raw, u in TRAIN_GEOMS:
        T = t_raw // STRIDE
        n = T // ecfg.segment
        U = n * ecfg.segment
        if n < 1:
            continue
        G = _choose_group(n, U, ecfg)
        geom = AttnGeom(U=U, seg=ecfg.segment, lc=ecfg.left_context,
                        rc=ecfg.right_context, max_mem=ecfg.max_memory,
                        G=G, num_heads=HEADS)
        if G > 1 and attn_pallas_supported(geom, EMBED):
            any_on = True
            # the legality condition the gate must guarantee: the clamped
            # first-group utterance window stays inside the U rows
            assert (geom.n - geom.G) * geom.seg >= geom.lc
            assert geom.n % geom.G == 0
    assert any_on


def test_choose_group_divides_and_fits():
    from simulst_tpu.nn.emformer import EmformerConfig, _choose_group
    ecfg = EmformerConfig(input_dim=EMBED, num_heads=HEADS, ffn_dim=2048,
                          num_layers=12, segment=16, left_context=32,
                          right_context=8, max_memory=5)
    for n in range(1, 130):
        U = n * ecfg.segment
        G = _choose_group(n, U, ecfg)
        assert G >= 1
        if G > 1:
            assert n % G == 0
            assert (n - G) * ecfg.segment >= ecfg.left_context
    # ragged U (not segment-aligned) must never group
    assert _choose_group(8, 8 * ecfg.segment + 3, ecfg) == 1


def test_row_gates_alignment(tpu_backend):
    """ffn / linear_res / convpos gates: MXU alignment + row thresholds."""
    from simulst_tpu.ops.conv_pos_pallas import convpos_wgrad_supported
    from simulst_tpu.ops.ffn_pallas import ffn_pallas_supported
    from simulst_tpu.ops.linear_res_pallas import linear_res_supported

    x_big = jax.ShapeDtypeStruct((32, 256, EMBED), np.float32)
    x_small = jax.ShapeDtypeStruct((2, 8, EMBED), np.float32)
    assert ffn_pallas_supported(x_big, EMBED, 2048)
    assert not ffn_pallas_supported(x_small, EMBED, 2048)
    assert not ffn_pallas_supported(x_big, EMBED + 8, 2048)   # misaligned d
    assert linear_res_supported(x_big, EMBED, EMBED)
    assert not linear_res_supported(x_big, EMBED, EMBED + 8)

    # convpos wgrad: must fall back when xp + dy panels exceed its budget
    k = 33
    xp_ok = jax.ShapeDtypeStruct((4, 512 + k - 1, EMBED), np.float32)
    xp_huge = jax.ShapeDtypeStruct((64, 8192 + k - 1, EMBED), np.float32)
    assert convpos_wgrad_supported(xp_ok, EMBED, 16)
    assert not convpos_wgrad_supported(xp_huge, EMBED, 16)


def test_packed_eid_mask_geometry_consistency(tpu_backend):
    """Sequence-packing (round 5): for every packable row length the packer
    may choose, the XLA-side kernel mask layout (make_packed_eids via
    kernel_ctx_row_map) must agree with the kernel's static geometry —
    shape (R, ng, nq, ctx) — and the ctx row map must stay inside the
    padded key tensor.  Guards the aligned-window bookkeeping that the eid
    gate shares with the kernel's dynamic slices (a mismatch would read
    the wrong key rows' ids on hardware only)."""
    from simulst_tpu.nn.emformer import EmformerConfig, _choose_group
    from simulst_tpu.ops.emformer_attn_pallas import (kernel_ctx_row_map,
                                                      padded_tk)
    from simulst_tpu.train import packing

    ecfg = EmformerConfig(input_dim=EMBED, num_heads=HEADS, ffn_dim=2048,
                          num_layers=12, segment=16, left_context=32,
                          right_context=8, max_memory=5)
    for n_p in packing.usable_row_segments(ecfg, 8, 64):
        U = n_p * ecfg.segment
        G = _choose_group(n_p, U, ecfg)
        geom = AttnGeom(U=U, seg=ecfg.segment, lc=ecfg.left_context,
                        rc=ecfg.right_context, max_mem=ecfg.max_memory,
                        G=G, num_heads=HEADS)
        if not attn_pallas_supported(geom, EMBED):
            continue
        rows = kernel_ctx_row_map(geom)
        assert rows.shape == (geom.ng, geom.ctx)
        assert rows.min() >= 0 and rows.max() < padded_tk(geom), n_p
        # real key rows appear where the kernel's windows cover them: every
        # rc block and every utterance frame of each group's windows
        mem_len = geom.n - 1
        for g in range(geom.ng):
            lo = mem_len + g * geom.G * geom.rc
            assert set(range(lo, lo + geom.G * geom.rc)) <= set(rows[g]), n_p
