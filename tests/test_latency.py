import jax.numpy as jnp
import numpy as np

from simulst_tpu.losses import latency as lat


def naive_dal(delays, src_len, tgt_len):
    gamma = tgt_len / src_len
    g = None
    out = []
    for i, d in enumerate(delays):
        g = d if g is None else max(d, g + 1 / gamma)
        out.append(g - i / gamma)
    return sum(out) / len(out)


def test_dal_matches_naive_recursion():
    rng = np.random.RandomState(0)
    for _ in range(5):
        T, S = 7, 20
        delays = np.sort(rng.uniform(1, S, T))
        ours = lat.differentiable_average_lagging(
            jnp.asarray(delays)[None], jnp.array([S]), jnp.array([T]))
        ref = naive_dal(delays, S, T)
        np.testing.assert_allclose(float(ours[0]), ref, rtol=1e-5)


def test_dal_with_padding():
    delays = jnp.array([[2.0, 5.0, 9.0, 0.0, 0.0]])
    pad = jnp.array([[False, False, False, True, True]])
    ours = lat.differentiable_average_lagging(
        delays, jnp.array([10]), jnp.array([3]), target_padding_mask=pad)
    ref = naive_dal([2.0, 5.0, 9.0], 10, 3)
    np.testing.assert_allclose(float(ours[0]), ref, rtol=1e-5)


def test_average_lagging_cutoff():
    # delays reach src_len at step 2 -> tau = 2 (0-based)
    delays = jnp.array([[3.0, 6.0, 10.0, 10.0]])
    al = lat.average_lagging(delays, jnp.array([10]), jnp.array([4]))
    gamma = 4 / 10
    expect = np.mean([3 - 0 / gamma, 6 - 1 / gamma, 10 - 2 / gamma])
    np.testing.assert_allclose(float(al[0]), expect, rtol=1e-5)


def test_average_proportion():
    delays = jnp.array([[5.0, 10.0]])
    ap = lat.average_proportion(delays, jnp.array([10]), jnp.array([2]))
    np.testing.assert_allclose(float(ap[0]), 15.0 / 20.0, rtol=1e-6)
