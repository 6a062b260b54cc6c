import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.ops.cif import cif_function


def test_teacher_forcing_lengths_and_weights():
    key = jax.random.PRNGKey(0)
    B, S, C = 2, 12, 4
    x = jax.random.normal(key, (B, S, C))
    alpha = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(1), (B, S)))
    tgt = jnp.array([3, 5])
    res = cif_function(x, alpha, beta=1.0, target_lengths=tgt, max_out_len=6)
    np.testing.assert_array_equal(np.asarray(res.cif_lengths), [3, 5])
    # complete buckets integrate weight exactly beta
    scaled = alpha * ((tgt * 1.0 + 1e-4) / alpha.sum(1))[:, None]
    ones = cif_function(jnp.ones((B, S, 1)), alpha, beta=1.0,
                        target_lengths=tgt, max_out_len=6)
    w = np.asarray(ones.cif_out)[..., 0]
    for b, L in enumerate([3, 5]):
        np.testing.assert_allclose(w[b, :L], 1.0, atol=1e-3)
        np.testing.assert_allclose(w[b, L + 1:], 0.0, atol=1e-6)


def test_fire_count_matches_alpha_sum():
    alpha = jnp.array([[0.4, 0.4, 0.4, 0.4, 0.4, 0.4]])  # sum 2.4
    x = jnp.ones((1, 6, 2))
    res = cif_function(x, alpha, beta=1.0, tail_thres=0.5, max_out_len=4)
    # 2 complete fires, tail weight 0.4 < 0.5 -> not counted
    assert int(res.cif_lengths[0]) == 2
    np.testing.assert_allclose(float(res.tail_weights[0]), 0.4, rtol=1e-5)
    res2 = cif_function(x, alpha, beta=1.0, tail_thres=0.3, max_out_len=4)
    assert int(res2.cif_lengths[0]) == 3


def test_delays_monotonic():
    key = jax.random.PRNGKey(2)
    alpha = jax.nn.sigmoid(jax.random.normal(key, (1, 20)))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 20, 3))
    res = cif_function(x, alpha, beta=1.0, tail_thres=0.5, max_out_len=22)
    L = int(res.cif_lengths[0])
    d = np.asarray(res.delays)[0, :L]
    assert (np.diff(d) > 0).all()
    assert d[-1] <= 20


def _stream_cif(x, alpha, beta, chunks):
    """Port of CIFLayer.infer carry protocol (cif_transformer.py:189-261)."""
    B = x.shape[0]
    carry_w = jnp.zeros((B, 0))
    carry_f = jnp.zeros((B, 0, x.shape[-1]))
    outs = []
    t = 0
    for ci, csz in enumerate(chunks):
        finish = ci == len(chunks) - 1
        a = jnp.concatenate([carry_w, alpha[:, t:t + csz]], axis=1)
        xx = jnp.concatenate([carry_f, x[:, t:t + csz]], axis=1)
        t += csz
        mol = xx.shape[1] + 2
        res = cif_function(xx, a, beta=beta,
                           tail_thres=(beta / 2) if finish else 0.0,
                           max_out_len=mol)
        L = int(res.cif_lengths[0])
        if not finish:
            emit = L - 1
            carry_f = res.cif_out[:, emit:emit + 1] / beta
            carry_w = res.tail_weights[:, None]
        else:
            emit = L
        outs.append(np.asarray(res.cif_out)[:, :emit])
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize("beta", [1.0, 0.8])
@pytest.mark.parametrize("chunks", [[5, 5, 5, 5], [7, 6, 4, 3], [20]])
def test_streaming_equals_offline(beta, chunks):
    key = jax.random.PRNGKey(4)
    S = sum(chunks)
    x = jax.random.normal(key, (1, S, 4))
    alpha = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(5), (1, S)))
    off = cif_function(x, alpha, beta=beta, tail_thres=beta / 2,
                       max_out_len=S + 2)
    L = int(off.cif_lengths[0])
    offline = np.asarray(off.cif_out)[:, :L]
    streamed = _stream_cif(x, alpha, beta, chunks)
    assert streamed.shape == offline.shape, (streamed.shape, offline.shape)
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)
