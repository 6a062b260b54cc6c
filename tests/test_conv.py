import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.nn import conv


def test_causal_conv_offline_matches_naive():
    key = jax.random.PRNGKey(0)
    p = conv.conv1d_init(key, 4, 6, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 4))
    y = conv.causal_conv1d(p, x, stride=1)
    assert y.shape == (2, 10, 6)
    # position t only depends on inputs <= t
    x2 = x.at[:, 5:, :].set(0.0)
    y2 = conv.causal_conv1d(p, x2, stride=1)
    np.testing.assert_allclose(y[:, :5], y2[:, :5], rtol=1e-6)


@pytest.mark.parametrize("chunks", [[4, 4, 4, 4], [8, 4, 4], [16]])
def test_causal_conv_streaming_equals_offline(chunks):
    key = jax.random.PRNGKey(0)
    p = conv.conv1d_init(key, 4, 6, 5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4))
    y_off = conv.causal_conv1d(p, x, stride=2)

    cache = conv.causal_conv1d_init_cache(p, 2, 4)
    outs = []
    t = 0
    for c in chunks:
        y, cache = conv.causal_conv1d_step(p, cache, x[:, t:t + c], stride=2)
        outs.append(y)
        t += c
    y_str = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(y_str), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("chunks", [[96, 64, 64], [96, 64, 64, 32]])
def test_subsampler_streaming_equals_offline(chunks):
    key = jax.random.PRNGKey(0)
    p = conv.subsampler_init(key, 80, 64, 32, (5, 5))
    T = sum(chunks)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, 80))
    lengths = jnp.array([T])
    y_off, out_len = conv.subsampler_apply(p, x, lengths)
    assert y_off.shape[1] == int(out_len[0])

    cache = conv.subsampler_init_cache(p, 1)
    outs, t = [], 0
    for c in chunks:
        y, cache = conv.subsampler_step(p, cache, x[:, t:t + c])
        outs.append(y)
        t += c
    y_str = jnp.concatenate(outs, axis=1)
    assert y_str.shape[1] == y_off.shape[1]
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(y_str), rtol=1e-4, atol=1e-5)


def test_subsampler_out_lengths_formula():
    key = jax.random.PRNGKey(0)
    p = conv.subsampler_init(key, 8, 16, 8, (5, 5))
    for T in [4, 5, 17, 64, 96, 100]:
        x = jnp.ones((1, T, 8))
        y, out_len = conv.subsampler_apply(p, x, jnp.array([T]))
        assert y.shape[1] == int(out_len[0]), (T, y.shape, out_len)


@pytest.mark.parametrize("chunks", [[96, 64], [64, 64, 32]])
def test_conv_pos_streaming_equals_offline(chunks):
    key = jax.random.PRNGKey(0)
    groups = 4
    p = conv.conv_pos_init(key, 16, 32, groups)
    T = sum(chunks)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, 16))
    y_off = conv.conv_pos_apply(p, x, groups)

    cache = conv.conv_pos_init_cache(p, 1, 16)
    outs, t = [], 0
    for c in chunks:
        y, cache = conv.conv_pos_step(p, cache, x[:, t:t + c], groups)
        outs.append(y)
        t += c
    y_str = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(y_str), rtol=1e-5, atol=1e-6)


def test_vgg_block_shapes_and_causality():
    key = jax.random.PRNGKey(0)
    p = conv.vgg_block_init(key, input_dim=16, mid_channels=8, out_channels=12)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 16))
    y, lens = conv.vgg_block_apply(p, x, jnp.array([20, 12]))
    assert y.shape[0] == 2 and y.shape[2] == 12
    assert y.shape[1] == int(lens[0])
    # causality: zeroing future frames doesn't change early outputs
    x2 = x.at[:, 12:].set(0.0)
    y2, _ = conv.vgg_block_apply(p, x2, jnp.array([20, 12]))
    np.testing.assert_allclose(np.asarray(y[:, :3]), np.asarray(y2[:, :3]),
                               rtol=1e-5, atol=1e-6)


def test_strip_noise_tags():
    from simulst_tpu.data.mustc import strip_noise_tags
    assert strip_noise_tags("(Applause) hello world (Laughter)") == "hello world"
    assert strip_noise_tags("no tags here") == "no tags here"
