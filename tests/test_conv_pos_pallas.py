"""Conv-pos weight-grad Pallas kernel (ops/conv_pos_pallas.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.nn.conv import _conv1d
from simulst_tpu.ops.conv_pos_pallas import convpos_wgrad_pallas

ON_CPU = jax.default_backend() == "cpu"


@pytest.mark.parametrize("geom", [(2, 12, 4, 256, 16), (3, 9, 7, 128, 8)])
def test_wgrad_matches_xla(geom):
    """Kernel wgrad == jax.grad of the grouped VALID conv."""
    b, t, k, d, groups = geom
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(b, t + k - 1, d).astype(np.float32))
    w = jnp.asarray(rng.randn(k, d // groups, d).astype(np.float32) * 0.1)
    gy = jnp.asarray(rng.randn(b, t, d).astype(np.float32))

    def loss(w_):
        return (_conv1d(xp, w_, 1, groups) * gy).sum()

    want = jax.grad(loss)(w)
    got = convpos_wgrad_pallas(xp, gy, k, groups, interpret=ON_CPU)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_conv_pos_grads_equal_plain_path(monkeypatch):
    """conv_pos_apply's fast-wgrad path produces the same gradients as the
    plain XLA conv for all params and the input."""
    if ON_CPU:
        # force the kernel path (interpret mode) despite the CPU gate
        import simulst_tpu.ops.conv_pos_pallas as cpp
        import simulst_tpu.nn.conv as cnv
        monkeypatch.setattr(cpp, "convpos_wgrad_supported",
                            lambda *a: True)
        monkeypatch.setattr(
            cnv, "convpos_wgrad_pallas",
            lambda xp, dy, k, g: cpp.convpos_wgrad_pallas(
                xp, dy, k, g, interpret=True), raising=False)
        # route the custom-vjp bwd through interpret mode
        orig = cpp.convpos_wgrad_pallas
        monkeypatch.setattr(
            cpp, "convpos_wgrad_pallas",
            lambda xp, dy, k, g, interpret=False: orig(xp, dy, k, g,
                                                       interpret=True))
    from simulst_tpu.nn import conv as cnv
    d, groups = 128, 8
    p = cnv.conv_pos_init(jax.random.PRNGKey(0), d, 16, groups)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, d))

    def loss(p_, x_, use_fast):
        import os
        if not use_fast:
            os.environ["SIMULST_NO_FUSED_CONVPOS"] = "1"
        else:
            os.environ.pop("SIMULST_NO_FUSED_CONVPOS", None)
        try:
            return (cnv.conv_pos_apply(p_, x_, groups) ** 2).sum()
        finally:
            os.environ.pop("SIMULST_NO_FUSED_CONVPOS", None)

    g_fast = jax.grad(loss, argnums=(0, 1))(p, x, True)
    g_plain = jax.grad(loss, argnums=(0, 1))(p, x, False)
    flat_f, _ = jax.tree_util.tree_flatten(g_fast)
    flat_p, _ = jax.tree_util.tree_flatten(g_plain)
    for a, b in zip(flat_f, flat_p):
        ref = float(jnp.abs(b).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4 * ref, rtol=1e-3)
