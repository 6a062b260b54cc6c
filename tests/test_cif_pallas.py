"""Pallas CIF kernel vs XLA einsum twin (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.ops import cif_pallas as cp


@pytest.mark.parametrize("S,T,C", [(40, 16, 8), (130, 128, 16), (100, 130, 8)])
def test_pallas_kernel_matches_einsum(S, T, C, monkeypatch):
    # run the kernel in interpreter mode (no TPU in tests)
    import functools
    orig = cp.pl.pallas_call
    monkeypatch.setattr(cp.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, S, C))
    alpha = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(1), (2, S)))
    out_p, del_p = cp._forward_pallas(x, alpha, 1.0, T)
    out_r, del_r = cp.cif_integrate_reference(x, alpha, 1.0, T)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(del_p), np.asarray(del_r),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_gradients(monkeypatch):
    import functools
    orig = cp.pl.pallas_call
    monkeypatch.setattr(cp.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 20, 4))
    alpha = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(3), (1, 20)))

    def f_pallas(x, a):
        out, delays = cp.cif_integrate(x, a, 1.0, 16)
        return (out ** 2).sum() + delays.sum()

    def f_ref(x, a):
        out, delays = cp.cif_integrate_reference(x, a, 1.0, 16)
        return (out ** 2).sum() + delays.sum()

    gx_p, ga_p = jax.grad(f_pallas, argnums=(0, 1))(x, alpha)
    gx_r, ga_r = jax.grad(f_ref, argnums=(0, 1))(x, alpha)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_r),
                               rtol=1e-4, atol=1e-5)
