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


# ---------------------------------------------------------------------------
# SimulEval-definition conformance fixtures, applied to BOTH the training
# metrics (losses/latency.py) and the evaluator's scorer
# (stream/evaluator._latency) so reported AL/AP/DAL are comparable to the
# BASELINE.md numbers (computed by SimulEval's instance.summarize with
# gamma = len(prediction)/source_ms).
# ---------------------------------------------------------------------------

from simulst_tpu.stream.evaluator import _latency


def test_conformance_al_basic():
    # gamma = 3/3 = 1; every lag = 1; tau hits at the last delay
    d = [1.0, 2.0, 3.0]
    assert abs(_latency(d, 3.0, 3, "AL") - 1.0) < 1e-9
    ours = lat.average_lagging(jnp.array([d]), jnp.array([3]), jnp.array([3]))
    np.testing.assert_allclose(float(ours[0]), 1.0, rtol=1e-6)


def test_conformance_al_tau_edge_first_delay_reaches_source():
    # d_0 >= src  =>  tau = 0, AL = d_0 (SimulEval stops at the first
    # delay covering the whole source)
    d = [3.0, 3.0, 3.0]
    assert abs(_latency(d, 3.0, 3, "AL") - 3.0) < 1e-9
    ours = lat.average_lagging(jnp.array([d]), jnp.array([3]), jnp.array([3]))
    np.testing.assert_allclose(float(ours[0]), 3.0, rtol=1e-6)


def test_conformance_al_no_delay_reaches_source():
    # none reach src (defensive: SimulEval then averages over all targets)
    d = [1.0, 1.0]
    gamma = 2 / 10.0
    expect = np.mean([1.0 - 0.0, 1.0 - 1.0 / gamma])
    assert abs(_latency(d, 10.0, 2, "AL") - expect) < 1e-9
    ours = lat.average_lagging(jnp.array([d]), jnp.array([10]), jnp.array([2]))
    np.testing.assert_allclose(float(ours[0]), expect, rtol=1e-6)


def test_conformance_ap():
    d = [5.0, 10.0]
    assert abs(_latency(d, 10.0, 2, "AP") - 15.0 / 20.0) < 1e-9


def test_conformance_dal_nonmonotone():
    # g_0 = 2; g_1 = max(1, 2+1) = 3; g_2 = max(3, 4) = 4 (gamma = 1)
    # DAL = mean(2-0, 3-1, 4-2) = 2
    d = [2.0, 1.0, 3.0]
    assert abs(_latency(d, 3.0, 3, "DAL") - 2.0) < 1e-9
    ours = lat.differentiable_average_lagging(jnp.array([d]), jnp.array([3]),
                                              jnp.array([3]))
    np.testing.assert_allclose(float(ours[0]), 2.0, rtol=1e-6)


def test_conformance_empty_output():
    assert _latency([], 1000.0, 0, "AL") == 0.0
    assert _latency([], 1000.0, 0, "AP") == 0.0
    assert _latency([], 1000.0, 0, "DAL") == 0.0
