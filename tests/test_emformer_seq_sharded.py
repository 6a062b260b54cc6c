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
