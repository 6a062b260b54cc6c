"""Full-model pipeline-parallel training == dense training.

train/pipeline.pipelined_train_loss stages the WHOLE train step (subsampler
frontend -> staged Emformer layers -> final LN + CTC head + decoder + joint
CTC loss on the last stage) over a 'pipe' mesh axis; the deterministic loss,
every summed metric, and every parameter gradient must equal the dense
``model.forward`` + ``joint_ctc_loss`` path, alone and composed with data
parallelism on one 2-D mesh.  The reference trains with DDP only
(SURVEY.md §2.6) — pipelining is beyond-reference capability.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from simulst_tpu.losses.joint_ctc import JointCTCConfig, joint_ctc_loss
from simulst_tpu.models.s2t_emformer import S2TEmformerConfig, S2TEmformerModel
from simulst_tpu.train.pipeline import pipelined_train_loss

CFG = S2TEmformerConfig(
    vocab_size=24, input_feat=12, conv_channels=16, embed_dim=16, ffn_dim=32,
    encoder_layers=4, encoder_heads=2, decoder_layers=2, decoder_heads=2,
    decoder_ffn_dim=32, segment_length=16, left_context=32, right_context=8,
    max_memory=2, ctc_layer=True, dropout=0.0, attention_dropout=0.0,
    activation_dropout=0.0, conv_pos=8, conv_pos_groups=4)
LCFG = JointCTCConfig()


def _batch(B=4, T=72, L=6):
    rng = np.random.RandomState(0)
    feats = rng.randn(B, T, CFG.input_feat).astype(np.float32)
    lengths = np.full((B,), T, np.int32)
    lengths[1] = T - 9
    feats[1, T - 9:] = 0.0
    lengths[B - 1] = T - 17
    feats[B - 1, T - 17:] = 0.0
    prev = rng.randint(4, CFG.vocab_size, (B, L)).astype(np.int32)
    prev[:, 0] = CFG.eos_idx
    target = np.roll(prev, -1, axis=1)
    target[:, -1] = CFG.eos_idx
    prev[2, L - 2:] = CFG.padding_idx   # one short target
    target[2, L - 3:] = [CFG.eos_idx, CFG.padding_idx, CFG.padding_idx]
    return {"feats": jnp.asarray(feats), "lengths": jnp.asarray(lengths),
            "prev": jnp.asarray(prev), "target": jnp.asarray(target)}


def _dense_loss(model, params, batch):
    logits, extra = model.forward(params, batch["feats"], batch["lengths"],
                                  batch["prev"])
    return joint_ctc_loss(logits, extra, batch["target"], LCFG)


@pytest.mark.parametrize("n_stage,n_micro,n_data", [(2, 2, 1), (4, 4, 1),
                                                    (2, 2, 2), (2, 4, 2)])
def test_pipelined_loss_matches_dense(n_stage, n_micro, n_data):
    if len(jax.devices()) < n_stage * n_data:
        pytest.skip("needs virtual device mesh")
    model = S2TEmformerModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    batch = _batch(B=max(4, n_micro * n_data))
    want, wmet = _dense_loss(model, params, batch)

    if n_data > 1:
        mesh = Mesh(np.array(jax.devices()[:n_stage * n_data]).reshape(
            n_stage, n_data), ("pipe", "data"))
        data_axis = "data"
    else:
        mesh = Mesh(np.array(jax.devices()[:n_stage]), ("pipe",))
        data_axis = None
    got, gmet = pipelined_train_loss(params, CFG, LCFG, batch, mesh,
                                     data_axis=data_axis, n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)
    for k in ("nll_loss", "ctc_loss", "ntokens", "sample_size", "nsentences"):
        np.testing.assert_allclose(np.asarray(gmet[k]),
                                   np.asarray(wmet[k]).astype(np.float32),
                                   rtol=2e-5, atol=1e-5, err_msg=k)


def test_pipelined_grads_match_dense():
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual device mesh")
    model = S2TEmformerModel(CFG)
    params = model.init(jax.random.PRNGKey(1))
    batch = _batch()
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("pipe", "data"))

    g_dense = jax.grad(
        lambda p: _dense_loss(model, p, batch)[0])(params)
    g_pipe = jax.grad(
        lambda p: pipelined_train_loss(p, CFG, LCFG, batch, mesh,
                                       data_axis="data", n_micro=2)[0])(params)
    flat_d, tree_d = jax.tree_util.tree_flatten_with_path(g_dense)
    flat_p = jax.tree_util.tree_leaves(g_pipe)
    assert len(flat_d) == len(flat_p)
    for (path, a), b in zip(flat_d, flat_p):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_pipelined_train_step_trains():
    """pipelined_train_loss drops into make_train_step: optimizer, clipping
    and the non-finite skip run unchanged on pipelined gradients."""
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual device mesh")
    from simulst_tpu.train.optim import OptimConfig
    from simulst_tpu.train.state import create_train_state, make_train_step

    model = S2TEmformerModel(CFG)
    params = model.init(jax.random.PRNGKey(2))
    batch = _batch()
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("pipe", "data"))

    def loss_fn(p, b, rng):
        return pipelined_train_loss(p, CFG, LCFG, b, mesh, data_axis="data",
                                    rng=rng, deterministic=rng is None)

    ocfg = OptimConfig(lr=1e-3, warmup_updates=2, clip_norm=1.0)
    step = jax.jit(make_train_step(loss_fn, ocfg))
    state = create_train_state(params, ocfg)
    with mesh:
        losses = []
        rng = jax.random.PRNGKey(3)
        for i in range(4):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["loss"] / metrics["sample_size"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4
