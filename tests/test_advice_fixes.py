"""Regression tests for ADVICE r3 findings: the softmax-clamp detection
rail, need_probs on mha_forward, and strict int coercion in config."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulst_tpu import config as cfglib
from simulst_tpu.nn import emformer as emf


def test_score_monitor_records_max_under_jit():
    log = emf.enable_score_monitor()
    try:
        @jax.jit
        def f(s):
            return emf._attn_softmax(s)

        s = jnp.array([[1.0, 5.0, -1e9]], jnp.float32)
        f(s).block_until_ready()
        assert log and abs(log[-1] - 5.0) < 1e-6
        # a drifted score past the clamp must be visible to the rail
        f(s + 200.0).block_until_ready()
        assert max(log) > emf.SCORE_CLAMP
    finally:
        emf.disable_score_monitor()


def test_score_monitor_off_by_default():
    assert emf._score_monitor is None


def test_need_probs_forces_weight_materialization():
    from simulst_tpu.nn.attention import mha_forward, mha_init
    p = mha_init(jax.random.PRNGKey(0), 16, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
    out, probs = mha_forward(p, x, x, x, 2, need_probs=True)
    assert probs is not None
    assert probs.shape == (2, 2, 8, 8)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_int_coercion_rejects_non_integral():
    import dataclasses

    @dataclasses.dataclass
    class C:
        n: int = 1

    assert cfglib.from_dict(C, {"n": 2.0}).n == 2
    assert cfglib.from_dict(C, {"n": np.float64(3.0)}).n == 3
    assert cfglib.from_dict(C, {"n": np.int32(4)}).n == 4
    with pytest.raises(ValueError):
        cfglib.from_dict(C, {"n": 2.5})
    with pytest.raises(ValueError):
        cfglib.from_dict(C, {"n": np.float32(2.5)})
