import itertools

import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu.ops.ssnt import ssnt_loss


def brute_force_ssnt(lp, emit_logit, target, T, U):
    """Enumerate monotonic paths: at each (t,u) emit (advance u) or shift
    (advance t); must emit all U tokens by frame T-1."""
    import math

    def sig(x):
        return 1.0 / (1.0 + math.exp(-x))

    def logadd(a, b):
        if a == -math.inf:
            return b
        if b == -math.inf:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    total = -math.inf
    # choose frames t_1 <= t_2 <= ... <= t_U for the emissions
    for ts in itertools.combinations_with_replacement(range(T), U):
        lp_path = 0.0
        t_cur = 0
        for u, te in enumerate(ts):
            # shift from t_cur to te while holding u tokens emitted
            for t in range(t_cur, te):
                lp_path += math.log(1 - sig(emit_logit[t, u]))
            lp_path += math.log(sig(emit_logit[te, u])) + lp[te, u, target[u]]
            t_cur = te
        total = logadd(total, lp_path)
    return -total


def test_ssnt_matches_brute_force():
    T, U, V = 4, 2, 5
    key = jax.random.PRNGKey(0)
    lp = jax.nn.log_softmax(jax.random.normal(key, (1, T, U, V)), -1)
    emit = jax.random.normal(jax.random.PRNGKey(1), (1, T, U))
    target = np.array([[2, 3]])
    ours = ssnt_loss(lp, emit, jnp.asarray(target), jnp.array([T]),
                     jnp.array([U]))
    ref = brute_force_ssnt(np.asarray(lp)[0], np.asarray(emit)[0],
                           target[0], T, U)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_ssnt_gradients_finite():
    T, U, V = 4, 2, 5
    key = jax.random.PRNGKey(2)
    logits = jax.random.normal(key, (1, T, U, V))
    emit = jax.random.normal(jax.random.PRNGKey(3), (1, T, U))

    def f(lg, em):
        return ssnt_loss(jax.nn.log_softmax(lg, -1), em, jnp.array([[1, 2]]),
                         jnp.array([T]), jnp.array([U]))

    g1, g2 = jax.grad(f, argnums=(0, 1))(logits, emit)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
