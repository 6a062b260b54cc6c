"""Pipeline-parallel Emformer == single-device emformer_forward.

The num_layers layers split into contiguous stages over a "pipe" mesh axis,
microbatches flowing stage->stage via ppermute in the GPipe schedule
(nn/emformer.emformer_forward_pipelined); the reference has data
parallelism only (SURVEY.md §2.6).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from simulst_tpu.nn.emformer import (EmformerConfig, emformer_forward,
                                     emformer_forward_pipelined,
                                     emformer_init)

CFG = EmformerConfig(input_dim=32, num_heads=2, ffn_dim=48, num_layers=4,
                     dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
                     activation="gelu", left_context=6, right_context=2,
                     segment=4, max_memory=2, tanh_on_mem=True)


def _inputs(B=4, U=24):
    rng = np.random.RandomState(1)
    x = rng.randn(B, U + CFG.right_context, CFG.input_dim).astype(np.float32)
    lengths = np.full((B,), U, np.int32)
    lengths[1] = U - 5
    x[1, U - 5:U] = 0.0  # zero the padded tail like the batcher
    return jnp.asarray(x), jnp.asarray(lengths)


@pytest.mark.parametrize("n_stage,n_micro", [(2, 2), (4, 4), (4, 2)])
def test_pipelined_matches_single_device(n_stage, n_micro):
    if len(jax.devices()) < n_stage:
        pytest.skip("needs virtual device mesh")
    params = emformer_init(jax.random.PRNGKey(0), CFG)
    x, lengths = _inputs()
    want, _ = emformer_forward(params, CFG, x, lengths)
    mesh = Mesh(np.array(jax.devices()[:n_stage]), ("pipe",))
    got = emformer_forward_pipelined(params, CFG, x, lengths, mesh,
                                     n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_pipelined_grads_match_single_device():
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual device mesh")
    params = emformer_init(jax.random.PRNGKey(0), CFG)
    x, lengths = _inputs()
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    w = jax.random.normal(jax.random.PRNGKey(3), x[:, :24].shape)

    def loss_pipe(p, x):
        return (emformer_forward_pipelined(p, CFG, x, lengths, mesh) * w).sum()

    def loss_ref(p, x):
        return (emformer_forward(p, CFG, x, lengths)[0] * w).sum()

    gp = jax.grad(loss_pipe, argnums=(0, 1))(params, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        ref = max(float(jnp.abs(b).max()), 1e-8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5 * ref, rtol=1e-4)


def test_pipelined_dropout_runs_and_is_deterministic():
    """Train-grade: dropout on, key-deterministic, per-(layer, microbatch)
    independent draws."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual device mesh")
    cfg = EmformerConfig(**{**CFG.__dict__, "dropout": 0.2,
                            "attention_dropout": 0.1,
                            "activation_dropout": 0.1})
    params = emformer_init(jax.random.PRNGKey(0), cfg)
    x, lengths = _inputs()
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    r = jax.random.PRNGKey(9)
    a = emformer_forward_pipelined(params, cfg, x, lengths, mesh,
                                   rng=r, deterministic=False)
    b = emformer_forward_pipelined(params, cfg, x, lengths, mesh,
                                   rng=r, deterministic=False)
    c = emformer_forward_pipelined(params, cfg, x, lengths, mesh,
                                   rng=jax.random.PRNGKey(10),
                                   deterministic=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_pipelined_composes_with_data_parallel():
    """dp x pp on one 2-D mesh: each data column pipelines its own batch
    shard; output equals the single-device forward."""
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual device mesh")
    params = emformer_init(jax.random.PRNGKey(0), CFG)
    x, lengths = _inputs(B=4)
    want, _ = emformer_forward(params, CFG, x, lengths)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("pipe", "data"))
    got = emformer_forward_pipelined(params, CFG, x, lengths, mesh,
                                     n_micro=2, data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
