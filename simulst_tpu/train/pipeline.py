"""Full-model pipeline-parallel training (GPipe schedule over a mesh axis).

``emformer_forward_pipelined`` (nn/emformer.py) stages only the encoder
layer stack; this module stages the WHOLE train step so "pipeline-parallel
training" means the real thing: the conv subsampler + positional frontend
feeds stage 0, microbatches hop stage->stage over ICI (``ppermute``), and the
last stage applies the final layer norm, CTC head, teacher-forced decoder and
the joint CTC criterion.  The summed loss is ``psum``'d over the pipe (and
optional data) axis, so ``pipelined_train_loss`` drops straight into
``train.state.make_train_step`` — optimizer, grad-norm clipping and the
non-finite skip all run unchanged on the pipelined gradients.

SPMD note: every device executes the same program, so the frontend and the
decoder/loss epilogue run (masked) on every stage and only stage 0's /
stage P-1's results are consumed.  Gradients are exact — the masks are
``jnp.where`` selects, whose transposes zero the dead stages' cotangents —
but at production scale the redundant frontend/epilogue FLOPs would be
hidden behind per-stage programs; at demo scale (the driver's virtual mesh)
the homogeneous program is the point: it validates the schedule, the
shardings and the reverse-pipeline backward.

The reference trains with data parallelism only (SURVEY.md §2.6); pipeline
parallelism is beyond-reference capability.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from simulst_tpu.losses.joint_ctc import JointCTCConfig, joint_ctc_loss
from simulst_tpu.models.s2t_emformer import S2TEmformerConfig
from simulst_tpu.nn import conv as cnv
from simulst_tpu.nn import transformer as tfm
from simulst_tpu.nn.core import dropout, layer_norm, linear
from simulst_tpu.nn.emformer import (_layer_forward, _num_segs,
                                     _rc_gather_indices, _segment_means,
                                     _training_mask_np)


def _frontend(enc_params, cfg: S2TEmformerConfig, feats, feat_lengths,
              idx, rng, deterministic):
    """encoder_forward's pre-Emformer section (s2t_emformer.py:140-153) plus
    the pipelined runner's utterance/rc_blocks/mems prep. feats: (mbs,T,F)."""
    ecfg = cfg.emformer
    x, lengths = cnv.subsampler_apply(enc_params["subsample"],
                                      feats.astype(cfg.compute_dtype),
                                      feat_lengths)
    x = cfg.embed_scale * x
    x = x + cnv.conv_pos_apply(enc_params["conv_pos"], x, cfg.conv_pos_groups)
    if rng is not None:
        x = dropout(rng, x, cfg.dropout, deterministic)
    valid = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
    x = jnp.where(valid[:, :, None], x, 0.0)
    x = jnp.pad(x, ((0, 0), (0, ecfg.right_context), (0, 0)))

    U = x.shape[1] - ecfg.right_context
    utterance = x[:, :U]
    rc_blocks = jnp.take(x, idx, axis=1)
    if ecfg.use_mem:
        n = _num_segs(U, ecfg.segment)
        mems = _segment_means(utterance, ecfg.segment)[:, :n - 1]
    else:
        mems = utterance[:, :0]
    return utterance, rc_blocks, mems, lengths


def _epilogue(params, cfg: S2TEmformerConfig, lcfg: JointCTCConfig,
              enc, enc_lens, prev_tokens, target, rng, deterministic):
    """Last-stage work: final LN -> CTC head -> decoder -> joint CTC loss."""
    if cfg.emformer.normalize_before:
        enc = layer_norm(params["encoder"]["emformer"]["final_ln"], enc)
    ctc_logits = None
    if "ctc_layer" in params["encoder"]:
        ctc_logits = linear(params["encoder"]["ctc_layer"], enc)
    enc_valid = jnp.arange(enc.shape[1])[None, :] < enc_lens[:, None]
    logits = tfm.decoder_forward(params["decoder"], cfg.decoder, prev_tokens,
                                 enc, enc_valid, rng=rng,
                                 deterministic=deterministic)
    loss, metrics = joint_ctc_loss(
        logits, {"ctc_logits": ctc_logits, "encoder_lengths": enc_lens},
        target, lcfg)
    return (loss.astype(jnp.float32),
            {k: jnp.asarray(v, jnp.float32) for k, v in metrics.items()})


def pipelined_train_loss(params, cfg: S2TEmformerConfig,
                         lcfg: JointCTCConfig, batch, mesh,
                         pipe_axis: str = "pipe",
                         data_axis: Optional[str] = None,
                         n_micro: Optional[int] = None, *, rng=None,
                         deterministic: bool = True):
    """Pipelined equivalent of ``joint_ctc_loss(model.forward(...))``.

    batch: dict with feats (B,T,F), lengths (B,), prev (B,L), target (B,L).
    Returns (summed loss, metrics) — the ``make_train_step`` loss_fn
    contract — with both psum'd across the mesh, replicated on every device.
    Deterministic outputs equal the dense path exactly; with dropout each
    (stage-layer, microbatch) folds its indices into the key (a different
    valid draw than single-device, like the seq-sharded runner).
    """
    ecfg = cfg.emformer
    # dead-stage/warmup ticks run the epilogue on zero activations with
    # enc_lens=0; their CTC losses are only finite (and safely masked by the
    # jnp.where select) under zero_infinity — make that precondition explicit
    assert lcfg.zero_infinity, \
        "pipelined_train_loss requires JointCTCConfig.zero_infinity"
    n_stage = mesh.shape[pipe_axis]
    L = ecfg.num_layers
    assert L % n_stage == 0, (L, n_stage)
    lpp = L // n_stage
    B = batch["feats"].shape[0]
    n_micro = n_micro or n_stage
    assert B % n_micro == 0, (B, n_micro)
    mbs = B // n_micro
    n_data = mesh.shape[data_axis] if data_axis else 1
    assert mbs % n_data == 0, (mbs, n_data)

    # static geometry: the subsampled length for this (static) T
    U = jax.eval_shape(
        lambda f, l: cnv.subsampler_apply(params["encoder"]["subsample"], f, l),
        jax.ShapeDtypeStruct(batch["feats"].shape, jnp.float32),
        jax.ShapeDtypeStruct((B,), jnp.int32))[0].shape[1]
    idx = jnp.asarray(_rc_gather_indices(U, ecfg.segment, ecfg.right_context))
    mask = jnp.asarray(_training_mask_np(U, ecfg.segment, ecfg.left_context,
                                         ecfg.right_context, ecfg.max_memory,
                                         ecfg.use_mem))

    def split(a):
        return a.reshape(n_micro, mbs, *a.shape[1:])

    feats_s = split(batch["feats"])
    flen_s = split(batch["lengths"])
    prev_s = split(batch["prev"])
    tgt_s = split(batch["target"])

    # (n_stage, lpp, *leaf) stacked stage parameters, sharded on the pipe axis
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls).reshape(n_stage, lpp, *ls[0].shape),
        *params["encoder"]["emformer"]["layers"])
    rest = {"encoder": {k: v for k, v in params["encoder"].items()
                        if k != "emformer"},
            "decoder": params["decoder"]}
    rest["encoder"]["emformer"] = {
        k: v for k, v in params["encoder"]["emformer"].items()
        if k != "layers"}

    perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]
    n_tick = n_micro + n_stage - 1
    zero_metrics = jax.eval_shape(
        lambda: _epilogue(rest, cfg, lcfg,
                          jnp.zeros((mbs // n_data, U, cfg.embed_dim)),
                          jnp.zeros((mbs // n_data,), jnp.int32),
                          prev_s[0, :mbs // n_data], tgt_s[0, :mbs // n_data],
                          None, True)[1])
    zero_metrics = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), zero_metrics)

    def body(stage_params, rep, feats_s, flen_s, prev_s, tgt_s):
        ax = jax.lax.axis_index(pipe_axis)
        sp = jax.tree_util.tree_map(lambda a: a[0], stage_params)  # (lpp,...)
        cd = cfg.compute_dtype
        zero_act = (jnp.zeros((feats_s.shape[1], U, cfg.embed_dim), cd),
                    jnp.zeros((feats_s.shape[1], idx.shape[0],
                               cfg.embed_dim), cd),
                    jnp.zeros((feats_s.shape[1],
                               _num_segs(U, ecfg.segment) - 1
                               if ecfg.use_mem else 0, cfg.embed_dim), cd),
                    jnp.zeros((feats_s.shape[1],), jnp.int32))

        def tick(carry, t):
            act, loss_acc, met_acc = carry
            m_inj = jnp.clip(t, 0, n_micro - 1)
            frng = None
            if rng is not None and not deterministic:
                frng = jax.random.fold_in(jax.random.fold_in(rng, 1000), m_inj)
            inject = _frontend(
                rep["encoder"], cfg,
                jax.lax.dynamic_index_in_dim(feats_s, m_inj, 0, False),
                jax.lax.dynamic_index_in_dim(flen_s, m_inj, 0, False),
                idx, frng, deterministic)
            first = ax == 0
            out, rcb, mems, lens = jax.tree_util.tree_map(
                lambda a, b: jnp.where(first, a, b), inject, act)

            def one_layer(lp, out, rcb, mems, lrng):
                return _layer_forward(lp, ecfg, out, rcb, mems, lens, mask,
                                      lrng, deterministic)
            if ecfg.remat:
                # match the dense path (emformer.py): keep only layer inputs
                # live per tick instead of all lpp layers' activations
                one_layer = jax.checkpoint(one_layer)
            for i in range(lpp):
                lp = jax.tree_util.tree_map(lambda a: a[i], sp)
                lrng = None
                if rng is not None and not deterministic:
                    lrng = jax.random.fold_in(
                        jax.random.fold_in(rng, ax * lpp + i), m_inj)
                out, rcb, mems = one_layer(lp, out, rcb, mems, lrng)
            # on the last stage, the stack output this tick IS microbatch
            # t - (n_stage-1)'s final encoding (valid once t >= n_stage-1)
            m_fin = jnp.clip(t - (n_stage - 1), 0, n_micro - 1)
            erng = None
            if rng is not None and not deterministic:
                erng = jax.random.fold_in(jax.random.fold_in(rng, 2000), m_fin)
            loss_t, met_t = _epilogue(
                rep, cfg, lcfg, out, lens,
                jax.lax.dynamic_index_in_dim(prev_s, m_fin, 0, False),
                jax.lax.dynamic_index_in_dim(tgt_s, m_fin, 0, False),
                erng, deterministic)
            valid = jnp.logical_and(ax == n_stage - 1, t >= n_stage - 1)
            loss_acc = loss_acc + jnp.where(valid, loss_t, 0.0)
            met_acc = jax.tree_util.tree_map(
                lambda a, b: a + jnp.where(valid, b, 0.0), met_acc, met_t)
            nxt = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, pipe_axis, perm),
                (out, rcb, mems, lens))
            return (nxt, loss_acc, met_acc), None

        (_, loss, metrics), _ = jax.lax.scan(
            tick, (zero_act, jnp.zeros(()), zero_metrics),
            jnp.arange(n_tick))
        axes = (pipe_axis,) + ((data_axis,) if data_axis else ())
        loss = jax.lax.psum(loss, axes)
        metrics = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, axes), metrics)
        return loss, metrics

    dspec = data_axis if data_axis else None
    mb = P(None, dspec)
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(pipe_axis), P(), mb, mb, mb, mb),
                  out_specs=(P(), P()), check_vma=False)
    return f(stacked, rest, feats_s, flen_s, prev_s, tgt_s)
