"""Sequence packing (train/packing.py + nn/emformer eid masks).

The load-bearing claim: a packed Emformer forward/backward equals the
per-example padded computation on every valid frame (deterministic mode).
Checked here at three levels:

  * pack/unpack round trip and plan invariants;
  * emformer_forward_packed == emformer_forward per example, forward AND
    parameter gradients, on BOTH the grouped and per-segment XLA paths;
  * the Pallas kernel's eid-mask path (interpret mode) == the XLA packed
    path, forward and gradients;
  * encoder_forward_packed == encoder_forward through the conv frontend
    and CTC head.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulst_tpu.nn import emformer as em
from simulst_tpu.train import packing


def _cfg(**kw):
    base = dict(input_dim=16, num_heads=2, ffn_dim=32, num_layers=2,
                dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
                segment=4, left_context=8, right_context=2, max_memory=2)
    base.update(kw)
    return em.EmformerConfig(**base)


def _batch(cfg, lengths, U, seed=0):
    rng = np.random.RandomState(seed)
    B = len(lengths)
    x = rng.randn(B, U + cfg.right_context, cfg.input_dim).astype(np.float32)
    # encoder_forward contract: zero beyond each example's length + rc pad
    for i, l in enumerate(lengths):
        x[i, l:] = 0.0
    return jnp.asarray(x)


def _pack_inputs(cfg, x, lengths, U, n_rows):
    plan = packing.pack_plan(np.asarray(lengths), U, cfg.segment,
                             cfg.right_context, n_rows)
    utterance = x[:, :U]
    packed, rc = packing.pack_frames(utterance, plan)
    return plan, packed, rc


def test_plan_and_roundtrip():
    cfg = _cfg()
    lengths = [13, 7, 16, 4]
    U = 16
    assert packing.plan_capacity(lengths, cfg.segment) == 4 + 2 + 4 + 1
    plan = packing.pack_plan(lengths, U, cfg.segment, cfg.right_context,
                             n_rows=3)
    # every example's frames appear exactly once with its id
    for e, l in enumerate(lengths):
        assert (plan.frame_eid == e).sum() == l
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, U, 3).astype(np.float32))
    xz = jnp.where(jnp.arange(U)[None, :, None]
                   < jnp.asarray(lengths)[:, None, None], x, 0.0)
    packed, rc = packing.pack_frames(xz, plan)
    back = packing.unpack_frames(packed, plan, 4, U)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(xz))
    # boundary rc blocks are zero rows; interior ones equal the next frames
    rc = np.asarray(rc)
    seg, rcn = cfg.segment, cfg.right_context
    pk = np.asarray(packed)
    for r in range(plan.seg_eid.shape[0]):
        for s in range(plan.seg_eid.shape[1]):
            blk = rc[r, s * rcn:(s + 1) * rcn]
            nxt = s + 1
            if (plan.seg_eid[r, s] >= 0 and nxt < plan.seg_eid.shape[1]
                    and plan.seg_eid[r, nxt] == plan.seg_eid[r, s]):
                np.testing.assert_array_equal(
                    blk, pk[r, nxt * seg: nxt * seg + rcn])
            else:
                assert (blk == 0).all()


def test_pack_plan_overflow_raises():
    with pytest.raises(ValueError):
        packing.pack_plan([16, 16, 16], 16, 4, 2, n_rows=2)


def _compare_packed_dense(cfg, lengths, U, n_rows, seed=0, grads=False):
    model_params = em.emformer_init(jax.random.PRNGKey(seed), cfg)
    x = _batch(cfg, lengths, U, seed=seed + 1)
    lens = jnp.asarray(lengths, jnp.int32)
    ref, _ = em.emformer_forward(model_params, cfg, x, lens)
    plan, packed, rc = _pack_inputs(cfg, x, lengths, U, n_rows)
    out_p = em.emformer_forward_packed(model_params, cfg, packed, rc,
                                       plan.frame_eid, plan.seg_eid)
    out = packing.unpack_frames(out_p, plan, len(lengths), U)
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(out)[i, :l],
                                   np.asarray(ref)[i, :l],
                                   atol=2e-5, rtol=2e-5, err_msg=f"ex {i}")
    if not grads:
        return

    mask = (jnp.arange(U)[None, :] < lens[:, None])[:, :, None]

    def dense_loss(p):
        o, _ = em.emformer_forward(p, cfg, x, lens)
        return (jnp.where(mask, o, 0.0) * jnp.cos(o * 0.1)).sum()

    def packed_loss(p):
        o_p = em.emformer_forward_packed(p, cfg, packed, rc, plan.frame_eid,
                                         plan.seg_eid)
        o = packing.unpack_frames(o_p, plan, len(lengths), U)
        return (jnp.where(mask, o, 0.0) * jnp.cos(o * 0.1)).sum()

    gd = jax.grad(dense_loss)(model_params)
    gp = jax.grad(packed_loss)(model_params)
    flat_d, _ = jax.tree_util.tree_flatten(gd)
    flat_p, _ = jax.tree_util.tree_flatten(gp)
    for a, b in zip(flat_d, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=3e-4)


def test_packed_matches_dense_segmented_path():
    """Per-segment XLA path (segment_group=1): packed == per-example."""
    cfg = _cfg(segment_group=1)
    _compare_packed_dense(cfg, [16, 13, 7, 4], U=16, n_rows=3, grads=True)


def test_packed_matches_dense_grouped_path():
    """Grouped XLA path (G=8, U=64): packing puts several examples per row
    and a group may straddle an example boundary."""
    cfg = _cfg(segment_group=8)
    # 16+9 segments -> rows of 16 segments; example 1 straddles groups
    _compare_packed_dense(cfg, [64, 34, 23, 12], U=64, n_rows=3, grads=True)


def test_packed_matches_dense_rc_gt_seg():
    """rc > seg: the rc window spans MORE than the neighbor segment (and can
    overrun a row end), so per-frame ownership in pack_plan's rc_gather is
    load-bearing — a per-neighbor-segment check would leak the next
    example's frames into the rc block (round-5 review finding)."""
    cfg = _cfg(segment=4, right_context=6, left_context=8)
    _compare_packed_dense(cfg, [16, 13, 7, 4], U=16, n_rows=3, grads=True)


def test_packed_kernel_interpret_matches_xla(monkeypatch):
    """The Pallas kernel's eid-mask path (interpret mode on CPU) must equal
    the packed XLA fallback, forward and gradients."""
    cfg = _cfg(input_dim=128, num_heads=2, segment_group=8)
    lengths = [64, 34, 23, 12]
    U, n_rows = 64, 3
    params = em.emformer_init(jax.random.PRNGKey(3), cfg)
    x = _batch(cfg, lengths, U, seed=4)
    plan, packed, rc = _pack_inputs(cfg, x, lengths, U, n_rows)

    def packed_out(p):
        o_p = em.emformer_forward_packed(p, cfg, packed, rc, plan.frame_eid,
                                         plan.seg_eid)
        return packing.unpack_frames(o_p, plan, len(lengths), U)

    ref = packed_out(params)
    gref = jax.grad(lambda p: jnp.sin(packed_out(p)).sum())(params)

    orig = em.emformer_grouped_attention
    monkeypatch.setattr(em, "attn_pallas_supported", lambda g, d: True)
    monkeypatch.setattr(
        em, "emformer_grouped_attention",
        lambda q, k, v, l, s, eid, geom, rate: orig(q, k, v, l, s, eid, geom,
                                                    rate, True))
    out = packed_out(params)
    lens = jnp.asarray(lengths)
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(out)[i, :l],
                                   np.asarray(ref)[i, :l],
                                   atol=5e-5, rtol=5e-5, err_msg=f"ex {i}")
    gk = jax.grad(lambda p: jnp.sin(packed_out(p)).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(gref),
                    jax.tree_util.tree_leaves(gk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-3, rtol=2e-3)


def test_encoder_forward_packed_matches_dense():
    from simulst_tpu.models import s2t_emformer as s2t
    cfg = s2t.S2TEmformerConfig(
        vocab_size=23, input_feat=80, conv_channels=16, embed_dim=16,
        ffn_dim=32, encoder_layers=2, encoder_heads=2, decoder_layers=1,
        decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
        left_context=32, right_context=8, max_memory=2, ctc_layer=True,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    params = s2t.encoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(5)
    B, T = 4, 256
    feats = jnp.asarray(rng.randn(B, T, 80).astype(np.float32))
    feat_lengths = jnp.asarray([256, 173, 129, 64], jnp.int32)
    ref = s2t.encoder_forward(params, cfg, feats, feat_lengths)

    # post-subsample lengths/U for the plan
    import simulst_tpu.nn.conv as cnv
    _, l4 = cnv.subsampler_apply(params["subsample"], feats, feat_lengths)
    U = T // cfg.stride
    ecfg = cfg.emformer
    plan = packing.pack_plan(np.asarray(l4), U, ecfg.segment,
                             ecfg.right_context, n_rows=3)
    out = s2t.encoder_forward_packed(params, cfg, feats, feat_lengths, plan)
    np.testing.assert_array_equal(np.asarray(out.lengths),
                                  np.asarray(ref.lengths))
    for i in range(B):
        l = int(ref.lengths[i])
        np.testing.assert_allclose(np.asarray(out.encoder_out)[i, :l],
                                   np.asarray(ref.encoder_out)[i, :l],
                                   atol=2e-5, rtol=2e-5, err_msg=f"ex {i}")
        np.testing.assert_allclose(np.asarray(out.ctc_logits)[i, :l],
                                   np.asarray(ref.ctc_logits)[i, :l],
                                   atol=2e-5, rtol=2e-5, err_msg=f"ctc {i}")


def test_train_cli_pack_plumbing():
    """The --pack path end to end at the loss level: build_loss's joint_ctc
    branch reconstructs the PackPlan from batch keys and the packed loss
    equals the dense loss (deterministic)."""
    import argparse
    from simulst_tpu.cli.train import build_loss
    from simulst_tpu.models import s2t_emformer as s2t

    cfg = s2t.S2TEmformerConfig(
        vocab_size=23, input_feat=80, conv_channels=16, embed_dim=16,
        ffn_dim=32, encoder_layers=1, encoder_heads=2, decoder_layers=1,
        decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
        left_context=32, right_context=8, max_memory=2, ctc_layer=True,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    model = s2t.S2TEmformerModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    args = argparse.Namespace(loss="joint_ctc", loss_overrides={},
                              specaugment=False)
    fn = build_loss(args, model)

    rng = np.random.RandomState(7)
    B, T = 4, 256
    batch = {
        "feats": jnp.asarray(rng.randn(B, T, 80).astype(np.float32)),
        "feat_lengths": jnp.asarray([256, 170, 131, 64], jnp.int32),
        "prev_tokens": jnp.asarray(rng.randint(3, 23, (B, 6)), jnp.int32),
        "target": jnp.asarray(rng.randint(3, 23, (B, 6)), jnp.int32),
    }
    ref_loss, _ = fn(params, batch, None)

    import simulst_tpu.nn.conv as cnv
    l4 = np.asarray(cnv.subsampler_apply(params["subsample"]
                                         if "subsample" in params
                                         else params["encoder"]["subsample"],
                                         batch["feats"],
                                         batch["feat_lengths"])[1])
    plan = packing.pack_plan(l4, T // cfg.stride, cfg.emformer.segment,
                             cfg.emformer.right_context)
    pb = dict(batch)
    for f in packing.PackPlan._fields:
        pb[f"pack_{f}"] = jnp.asarray(getattr(plan, f))
    packed_loss, _ = fn(params, pb, None)
    np.testing.assert_allclose(float(packed_loss), float(ref_loss),
                               rtol=1e-5)


def test_packed_rows_longer_than_source():
    """row_segs > U//seg (the production case: rows sized for 2-3 examples
    under length-sorted bucketing): packed == dense per example, forward and
    grads, with a group straddling example boundaries inside longer rows."""
    cfg = _cfg(segment_group=8)
    lengths = [30, 27, 23, 16]           # segments: 8+7+6+4 = 25
    U = 32                                # source layout (8 segments each)
    plan = packing.pack_plan(lengths, U, cfg.segment, cfg.right_context,
                             row_segs=16)  # two rows of 16 segments
    assert plan.frame_gather.shape == (2, 64)
    params = em.emformer_init(jax.random.PRNGKey(6), cfg)
    x = _batch(cfg, lengths, U, seed=7)
    lens = jnp.asarray(lengths, jnp.int32)
    ref, _ = em.emformer_forward(params, cfg, x, lens)
    packed, rc = packing.pack_frames(x[:, :U], plan)

    def packed_out(p):
        o_p = em.emformer_forward_packed(p, cfg, packed, rc, plan.frame_eid,
                                         plan.seg_eid)
        return packing.unpack_frames(o_p, plan, len(lengths), U)

    out = packed_out(params)
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(out)[i, :l],
                                   np.asarray(ref)[i, :l],
                                   atol=2e-5, rtol=2e-5, err_msg=f"ex {i}")
    mask = (jnp.arange(U)[None, :] < lens[:, None])[:, :, None]
    gd = jax.grad(lambda p: (jnp.where(
        mask, em.emformer_forward(p, cfg, x, lens)[0], 0.0) ** 2).sum())(params)
    gp = jax.grad(lambda p: (jnp.where(
        mask, packed_out(p), 0.0) ** 2).sum())(params)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=3e-4)
