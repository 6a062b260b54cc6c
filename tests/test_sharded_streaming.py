"""Multi-chip streaming (serving path): the batched fused chunk step sharded
over a 'data' mesh axis must emit per-example tokens identical to the
single-device run (VERDICT r3 #5).  The reference serves one utterance per
process (cif_agent.py:341-343 asserts B == 1); here B concurrent sessions
spread across devices with policy divergence handled per-example on device.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simulst_tpu.models import cif as cif_mod
from simulst_tpu.models import mma as mma_mod
from simulst_tpu.stream import fused

_DIMS = dict(vocab_size=24, input_feat=8, conv_channels=16, embed_dim=16,
             ffn_dim=32, encoder_layers=1, encoder_heads=2, decoder_layers=1,
             decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
             left_context=32, right_context=8, max_memory=2,
             dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)

N_DEV = 4
MAX_TOKENS = 32


def _chunks(B, cfg, n_mid=3, seed=0):
    rs = np.random.RandomState(seed)
    seg, rc = cfg.segment_length, cfg.right_context
    out = [jnp.asarray(rs.randn(B, seg + rc, cfg.input_feat) * 0.5,
                       jnp.float32)]
    out += [jnp.asarray(rs.randn(B, seg, cfg.input_feat) * 0.5, jnp.float32)
            for _ in range(n_mid)]
    return out


def _run(step_fn, state, chunks, put):
    for i, ch in enumerate(chunks):
        state, _ = step_fn(state, put(ch), finish=(i == len(chunks) - 1))
    return state


def _assert_sharded_equals_dense(step_fn, init_state_fn, cfg):
    assert len(jax.devices()) >= N_DEV
    B = 2 * N_DEV
    chunks = _chunks(B, cfg)
    ref = _run(step_fn, init_state_fn(B), chunks, put=lambda c: c)

    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]), ("data",))
    dat = NamedSharding(mesh, P("data"))
    shard = lambda x: (jax.device_put(x, dat)
                       if isinstance(x, jnp.ndarray) else x)
    state = jax.tree.map(shard, init_state_fn(B))
    out = _run(step_fn, state, chunks, put=lambda c: jax.device_put(c, dat))

    np.testing.assert_array_equal(np.asarray(ref.n_tokens),
                                  np.asarray(out.n_tokens))
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(out.tokens))
    assert int(np.asarray(out.n_tokens).sum()) > 0, "no tokens emitted"
    # the sharded state must actually live on the data axis, not have been
    # silently gathered to one device
    spec = out.tokens.sharding.spec
    assert spec and spec[0] == "data", spec


def test_cif_fused_step_sharded_over_data_axis():
    cfg = cif_mod.CIFConfig(**_DIMS)
    params = cif_mod.CIFModel(cfg).init(jax.random.PRNGKey(0))
    step_fn = fused.make_cif_fused_step(params, cfg)
    _assert_sharded_equals_dense(
        step_fn,
        lambda B: fused.cif_fused_init(params, cfg, MAX_TOKENS, batch=B), cfg)


def test_mma_fused_step_sharded_over_data_axis():
    cfg = mma_mod.MMAConfig(**_DIMS, ctc_layer=False)
    params = mma_mod.MMAModel(cfg).init(jax.random.PRNGKey(0))
    step_fn = fused.make_mma_fused_step(params, cfg)
    _assert_sharded_equals_dense(
        step_fn,
        lambda B: fused.mma_fused_init(params, cfg, max_src=64,
                                       max_tokens=MAX_TOKENS, batch=B), cfg)
