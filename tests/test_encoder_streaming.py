"""Golden test: streaming encoder session == offline encoder forward.

This is the reference's de-facto correctness criterion (the disabled
assert_close scaffolding in its agents, default_agent.py:438-477)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.models.s2t_emformer import (S2TEmformerConfig, encoder_forward,
                                             encoder_init, encoder_init_state,
                                             encoder_step)


def tiny_cfg():
    return S2TEmformerConfig(
        vocab_size=40, input_feat=8, conv_channels=16, embed_dim=16, ffn_dim=32,
        encoder_layers=2, encoder_heads=2, segment_length=16, left_context=32,
        right_context=8, max_memory=2, ctc_layer=True,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)


def stream(params, cfg, feats, chunks):
    state = encoder_init_state(params, cfg, 1)
    outs, t = [], 0
    for i, c in enumerate(chunks):
        finish = i == len(chunks) - 1
        out, state = encoder_step(params, cfg, state, feats[:, t:t + c],
                                  finish=finish)
        outs.append(np.asarray(out.encoder_out))
        t += c
    return np.concatenate(outs, axis=1)


# chunk plans in raw feature frames (stride 4, seg=4 rc=2 post-subsample):
# standard protocol = first (seg+rc)*4 = 24, then seg*4 = 16
@pytest.mark.parametrize("chunks", [
    [24, 16, 16, 16, 8],        # standard agent protocol + partial flush
    [24, 16, 16, 16, 16],       # exact multiple
    [80, 0],                    # one oversized chunk + empty flush
    [24, 16, 4],                # tiny flush (u < rc)
])
def test_encoder_streaming_equals_offline(chunks):
    cfg = tiny_cfg()
    params = encoder_init(jax.random.PRNGKey(0), cfg)
    T = sum(chunks)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.input_feat))
    off = encoder_forward(params, cfg, feats, jnp.array([T]))
    st = stream(params, cfg, feats, chunks)
    assert st.shape[1] == off.encoder_out.shape[1], (
        st.shape, off.encoder_out.shape)
    np.testing.assert_allclose(st, np.asarray(off.encoder_out),
                               rtol=2e-4, atol=2e-5)


def test_encoder_streaming_batch2():
    """The streaming session machinery is batch-parallel for equal-length
    utterances (beyond the reference, which asserts B==1)."""
    cfg = tiny_cfg()
    params = encoder_init(jax.random.PRNGKey(0), cfg)
    T = 72
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, T, cfg.input_feat))
    off = encoder_forward(params, cfg, feats, jnp.array([T, T]))

    state = encoder_init_state(params, cfg, 2)
    outs, t = [], 0
    for i, c in enumerate([24, 16, 16, 16]):
        out, state = encoder_step(params, cfg, state, feats[:, t:t + c],
                                  finish=i == 3)
        outs.append(np.asarray(out.encoder_out))
        t += c
    st = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(st, np.asarray(off.encoder_out),
                               rtol=2e-4, atol=2e-5)
