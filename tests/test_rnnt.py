import itertools

import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu.ops.rnnt import rnnt_loss


def brute_force_rnnt(lp, target, T, U, blank=0):
    """Enumerate all monotonic lattice paths (T blanks + U emits)."""
    from math import inf
    import numpy as np

    def logadd(a, b):
        if a == -inf:
            return b
        if b == -inf:
            return a
        m = max(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    total = -inf
    # a path is an interleaving: sequence of moves, U emits and T blanks,
    # ending with the final blank at (T-1, U)
    for positions in itertools.combinations(range(T + U - 1), U):
        lp_path = 0.0
        t = u = 0
        for step in range(T + U - 1):
            if step in positions:
                lp_path += lp[t, u, target[u]]
                u += 1
            else:
                lp_path += lp[t, u, blank]
                t += 1
        assert t == T - 1 and u == U
        lp_path += lp[T - 1, U, blank]
        total = logadd(total, lp_path)
    return -total


def test_rnnt_matches_brute_force():
    T, U, V = 4, 2, 5
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (1, T, U + 1, V))
    lp = jax.nn.log_softmax(logits, -1)
    target = np.array([[2, 3]])
    ours = rnnt_loss(lp, jnp.asarray(target), jnp.array([T]), jnp.array([U]))
    ref = brute_force_rnnt(np.asarray(lp)[0], target[0], T, U)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_rnnt_batch_lengths():
    T, U, V = 5, 3, 6
    key = jax.random.PRNGKey(1)
    lp = jax.nn.log_softmax(jax.random.normal(key, (2, T, U + 1, V)), -1)
    targets = np.array([[1, 2, 3], [4, 5, 1]])
    in_lens = jnp.array([5, 4])
    tgt_lens = jnp.array([3, 2])
    batched = rnnt_loss(lp, jnp.asarray(targets), in_lens, tgt_lens)
    refs = []
    for b in range(2):
        refs.append(brute_force_rnnt(np.asarray(lp)[b, :int(in_lens[b])],
                                     targets[b][:int(tgt_lens[b])],
                                     int(in_lens[b]), int(tgt_lens[b])))
    np.testing.assert_allclose(float(batched), sum(refs), rtol=1e-5)


def test_rnnt_gradients_finite():
    T, U, V = 4, 2, 5
    key = jax.random.PRNGKey(2)
    logits = jax.random.normal(key, (1, T, U + 1, V))

    def f(lg):
        return rnnt_loss(jax.nn.log_softmax(lg, -1), jnp.array([[1, 2]]),
                         jnp.array([T]), jnp.array([U]), fastemit_lambda=0.1)

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
