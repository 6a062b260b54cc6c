"""Sequence-parallel Emformer == single-device emformer_forward.

Segments sharded over a 4-device "seq" mesh axis with per-layer ICI halo
exchanges (nn/emformer.emformer_forward_seq_sharded); the reference has no
sequence/context parallelism at all (SURVEY.md §2.6).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from simulst_tpu.nn.emformer import (EmformerConfig, emformer_forward,
                                     emformer_forward_seq_sharded,
                                     emformer_init)

CFG = EmformerConfig(input_dim=32, num_heads=2, ffn_dim=48, num_layers=3,
                     dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
                     activation="gelu", left_context=6, right_context=2,
                     segment=4, max_memory=2, tanh_on_mem=True)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_seq_sharded_matches_single_device(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    params = emformer_init(jax.random.PRNGKey(0), CFG)
    S = CFG.segment
    n_loc = 2 if n_dev == 4 else CFG.max_memory  # >= max_memory
    U = n_dev * n_loc * S
    rng = np.random.RandomState(1)
    B = 2
    x = rng.randn(B, U + CFG.right_context, CFG.input_dim).astype(np.float32)
    lengths = np.array([U, U - 7], np.int32)
    x[1, U - 7:U] = 0.0  # zero the padded tail like the batcher

    want, _ = emformer_forward(params, CFG, jnp.asarray(x),
                               jnp.asarray(lengths))

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("seq",))
    got = emformer_forward_seq_sharded(params, CFG, jnp.asarray(x),
                                       jnp.asarray(lengths), mesh)

    w = np.asarray(want)
    g = np.asarray(got)
    np.testing.assert_allclose(g[0], w[0], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(g[1, :U - 7], w[1, :U - 7], atol=2e-5,
                               rtol=1e-4)


def test_seq_sharded_grads_match_dense():
    """Train-grade check: the deterministic seq-sharded forward's gradients
    equal the single-device emformer_forward's (same loss, same params)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual device mesh")
    params = emformer_init(jax.random.PRNGKey(3), CFG)
    U = 4 * 2 * CFG.segment
    rng = np.random.RandomState(4)
    B = 2
    x = jnp.asarray(rng.randn(B, U + CFG.right_context,
                              CFG.input_dim).astype(np.float32))
    lengths = jnp.array([U, U], jnp.int32)
    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))

    def loss_dense(p):
        out, _ = emformer_forward(p, CFG, x, lengths)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_shard(p):
        out = emformer_forward_seq_sharded(p, CFG, x, lengths, mesh)
        return (out.astype(jnp.float32) ** 2).sum()

    gd = jax.grad(loss_dense)(params)
    gs = jax.grad(loss_shard)(params)
    flat_d, _ = jax.tree_util.tree_flatten(gd)
    flat_s, _ = jax.tree_util.tree_flatten(gs)
    for a, b in zip(flat_s, flat_d):
        # per-shard partial sums + psum reorder fp32 accumulation; on leaves
        # whose gradient nearly cancels the absolute noise floor dominates
        ref = float(jnp.abs(b).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-2 * ref + 5e-6, rtol=2e-3)


def test_seq_sharded_dropout_per_shard_rngs():
    """With dropout on: reproducible given the key, different across keys,
    and the per-shard fold_in draws DIFFERENT masks on different shards
    (outputs of identical input shards must differ)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual device mesh")
    cfg = EmformerConfig(input_dim=32, num_heads=2, ffn_dim=48, num_layers=2,
                         dropout=0.3, attention_dropout=0.3,
                         activation_dropout=0.3, activation="gelu",
                         left_context=6, right_context=2, segment=4,
                         max_memory=2, tanh_on_mem=True)
    params = emformer_init(jax.random.PRNGKey(5), cfg)
    n_dev, n_loc = 4, 2
    U = n_dev * n_loc * cfg.segment
    shard_u = U // n_dev
    one = np.random.RandomState(6).randn(
        1, shard_u, cfg.input_dim).astype(np.float32)
    # identical content on every shard; zero rc tail
    x = np.concatenate([np.tile(one, (1, n_dev, 1)),
                        np.zeros((1, cfg.right_context, cfg.input_dim),
                                 np.float32)], axis=1)
    lengths = jnp.array([U], jnp.int32)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("seq",))

    key = jax.random.PRNGKey(7)
    y1 = emformer_forward_seq_sharded(params, cfg, jnp.asarray(x), lengths,
                                      mesh, rng=key, deterministic=False)
    y2 = emformer_forward_seq_sharded(params, cfg, jnp.asarray(x), lengths,
                                      mesh, rng=key, deterministic=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = emformer_forward_seq_sharded(params, cfg, jnp.asarray(x), lengths,
                                      mesh, rng=jax.random.PRNGKey(8),
                                      deterministic=False)
    assert not np.allclose(np.asarray(y1), np.asarray(y3))
    # shards 2 and 3 see identical inputs and identical left halos
    # (identical-content neighbors), so equal outputs would mean shared
    # dropout masks — fold_in(ax) must make them differ
    a = np.asarray(y1)[0, 2 * shard_u: 3 * shard_u]
    b = np.asarray(y1)[0, 3 * shard_u: 4 * shard_u]
    assert not np.allclose(a, b)
    # and the dropout-on forward still trains: grads are finite
    def loss(p):
        out = emformer_forward_seq_sharded(p, cfg, jnp.asarray(x), lengths,
                                           mesh, rng=key,
                                           deterministic=False)
        return (out.astype(jnp.float32) ** 2).sum()
    g = jax.grad(loss)(params)
    gsum = jax.tree_util.tree_reduce(
        lambda acc, l: acc + float(jnp.abs(l).sum()), g, 0.0)
    assert np.isfinite(gsum) and gsum > 0


def test_seq_sharded_grads_flow():
    """Differentiable end to end (the point is sequence-parallel TRAINING)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual device mesh")
    params = emformer_init(jax.random.PRNGKey(0), CFG)
    U = 4 * 2 * CFG.segment
    x = jnp.asarray(np.random.RandomState(2).randn(
        1, U + CFG.right_context, CFG.input_dim).astype(np.float32))
    lengths = jnp.array([U], jnp.int32)
    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))

    def loss(p):
        out = emformer_forward_seq_sharded(p, CFG, x, lengths, mesh)
        return (out.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(params)
    gsum = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()), g, 0.0)
    assert np.isfinite(gsum) and gsum > 0


def test_seq_sharded_composes_with_data_parallel():
    """dp x sp on one 2-D mesh: batch shards over the data axis while the
    halo exchanges stay seq-scoped; output equals single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs virtual device mesh")
    import numpy as np
    params = emformer_init(jax.random.PRNGKey(0), CFG)
    S, n_seq = CFG.segment, 4
    n_loc = 2
    U = n_seq * n_loc * S
    rng = np.random.RandomState(1)
    B = 4
    x = rng.randn(B, U + CFG.right_context, CFG.input_dim).astype(np.float32)
    lengths = np.full((B,), U, np.int32)
    lengths[2] = U - 5
    x[2, U - 5:U] = 0.0
    want, _ = emformer_forward(params, CFG, jnp.asarray(x),
                               jnp.asarray(lengths))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("seq", "data"))
    got = emformer_forward_seq_sharded(params, CFG, jnp.asarray(x),
                                       jnp.asarray(lengths), mesh,
                                       data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
