"""Fused FFN Pallas kernel (ops/ffn_pallas.py).

CPU runs use interpret mode.  NOTE: interpret-mode prng_random_bits returns
all-zero bits, i.e. every dropout mask keeps (threshold comparison is still
exercised); the stochastic behavior itself (keep-rate, same-seed determinism)
is asserted under the TPU-only tests at the bottom, which skip on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.nn.core import ACTIVATIONS
from simulst_tpu.ops.ffn_pallas import ffn_reference, fused_ffn

D, H = 256, 1024
ON_CPU = jax.default_backend() == "cpu"
INTERP = ON_CPU


def _params(key, scale=0.05):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (4, 70, D), jnp.float32)
    w1 = jax.random.normal(ks[1], (D, H)) * scale
    b1 = jax.random.normal(ks[2], (H,)) * scale
    w2 = jax.random.normal(ks[3], (H, D)) * scale
    b2 = jax.random.normal(ks[4], (D,)) * scale
    return x, w1, b1, w2, b2


SEED = jnp.array([3], jnp.int32)


@pytest.mark.parametrize("activation", ["gelu", "relu"])
def test_deterministic_matches_reference(activation):
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(0))
    y_k = fused_ffn(x, w1, b1, w2, b2, SEED, activation, 0.0, 0.0, INTERP)
    y_r = ffn_reference(x, w1, b1, w2, b2, None, None, activation)
    # gelu is the tanh form (~5e-4 of exact erf)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               atol=2e-3, rtol=1e-3)


def test_deterministic_grads_match_reference():
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(1))

    def loss_k(*args):
        return (fused_ffn(*args, SEED, "gelu", 0.0, 0.0, INTERP) ** 2).sum()

    def loss_r(*args):
        return (ffn_reference(*args, None, None, "gelu") ** 2).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for name, a, b in zip("x w1 b1 w2 b2".split(), gk, gr):
        ref = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3 * ref, rtol=5e-3,
                                   err_msg=f"grad {name}")


def test_gelu_polynomial_accuracy():
    # tanh-form GELU: ~4.7e-4 (value) / ~1.1e-3 (derivative) max abs error
    # vs the exact erf form — well below bf16's 2^-8 resolution (3.9e-3).
    # df must also be the TRUE derivative of f (not just near dgelu_exact):
    # the custom VJP relies on f/df consistency.
    # range deliberately reaches past u = -10.9 where the unclamped
    # exp(-2g) would overflow fp32 to +inf (the exponent is clamped at 80)
    u = jnp.linspace(-30.0, 30.0, 6001, dtype=jnp.float32)
    from simulst_tpu.ops.ffn_pallas import _act_pair
    f, df = _act_pair("gelu", exact_div=True)  # no kernel context
    exact = jax.nn.gelu(u, approximate=False)
    np.testing.assert_allclose(np.asarray(f(u)), np.asarray(exact), atol=6e-4)
    dexact = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(u)
    np.testing.assert_allclose(np.asarray(df(u)), np.asarray(dexact),
                               atol=1.5e-3)
    dself = jax.vmap(jax.grad(f))(u)
    np.testing.assert_allclose(np.asarray(df(u)), np.asarray(dself),
                               atol=1e-5)


def test_dropout_scaling_and_vjp_consistency():
    """Interpret-mode bits are all-keep, so the kernel must equal the
    closed-form all-keep forward (scaling logic), and its VJP must be the
    VJP of that same function (fwd/bwd mask consistency)."""
    if not ON_CPU:
        pytest.skip("closed-form all-keep check is interpret-mode-only")
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(2))
    ka, ko = 0.9, 0.9

    def allkeep(x, w1, b1, w2, b2):
        h = ACTIVATIONS["gelu"](x @ w1 + b1) / ka
        return (h @ w2 + b2) / ko

    y_k = fused_ffn(x, w1, b1, w2, b2, SEED, "gelu", 0.1, 0.1, True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(allkeep(x, w1, b1, w2, b2)),
                               atol=2e-3, rtol=1e-3)

    gk = jax.grad(lambda *a: (fused_ffn(*a, SEED, "gelu", 0.1, 0.1, True) ** 2).sum(),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(lambda *a: (allkeep(*a) ** 2).sum(),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for name, a, b in zip("x w1 b1 w2 b2".split(), gk, gr):
        ref = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3 * ref, rtol=5e-3,
                                   err_msg=f"grad {name}")


def test_row_padding():
    """Rows not divisible by the tile: padded rows must not corrupt output
    or weight grads."""
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(3))
    x_odd = x.reshape(-1, D)[:137]
    y = fused_ffn(x_odd, w1, b1, w2, b2, SEED, "gelu", 0.0, 0.0, INTERP)
    y_ref = ffn_reference(x_odd, w1, b1, w2, b2, None, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-3, rtol=1e-3)
    gw1 = jax.grad(lambda w: (fused_ffn(x_odd, w, b1, w2, b2, SEED, "gelu",
                                        0.0, 0.0, INTERP) ** 2).sum())(w1)
    gw1_ref = jax.grad(lambda w: (ffn_reference(x_odd, w, b1, w2, b2,
                                                None, None) ** 2).sum())(w1)
    ref = float(jnp.abs(gw1_ref).max())
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw1_ref),
                               atol=5e-3 * ref, rtol=5e-3)


# ---------------------------------------------------------------------------
# fused LN -> FFN -> +residual (the pos_ff block)
# ---------------------------------------------------------------------------

def _ln_params(key):
    x, w1, b1, w2, b2 = _params(key)
    kg, kb = jax.random.split(jax.random.fold_in(key, 7))
    g = 1.0 + 0.1 * jax.random.normal(kg, (D,))
    be = 0.1 * jax.random.normal(kb, (D,))
    return x, g, be, w1, b1, w2, b2


@pytest.mark.parametrize("activation", ["gelu", "relu"])
def test_ln_ffn_res_matches_reference(activation):
    from simulst_tpu.ops.ffn_pallas import fused_ln_ffn_res, ln_ffn_res_reference
    x, g, be, w1, b1, w2, b2 = _ln_params(jax.random.PRNGKey(5))
    y_k = fused_ln_ffn_res(x, g, be, w1, b1, w2, b2, SEED, activation,
                           0.0, 0.0, INTERP)
    y_r = ln_ffn_res_reference(x, g, be, w1, b1, w2, b2, None, None,
                               activation)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               atol=2e-3, rtol=1e-3)


def test_ln_ffn_res_grads_match_reference():
    from simulst_tpu.ops.ffn_pallas import fused_ln_ffn_res, ln_ffn_res_reference
    x, g, be, w1, b1, w2, b2 = _ln_params(jax.random.PRNGKey(6))

    def loss_k(*args):
        return (fused_ln_ffn_res(*args, SEED, "gelu", 0.0, 0.0,
                                 INTERP) ** 2).sum()

    def loss_r(*args):
        return (ln_ffn_res_reference(*args, None, None, "gelu") ** 2).sum()

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)
    for name, a, b in zip("x g be w1 b1 w2 b2".split(), gk, gr):
        ref = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3 * ref, rtol=5e-3,
                                   err_msg=f"grad {name}")


def test_ln_ffn_res_row_padding_and_dropout_vjp():
    from simulst_tpu.ops.ffn_pallas import fused_ln_ffn_res, ln_ffn_res_reference
    x, g, be, w1, b1, w2, b2 = _ln_params(jax.random.PRNGKey(7))
    x_odd = x.reshape(-1, D)[:137]
    y = fused_ln_ffn_res(x_odd, g, be, w1, b1, w2, b2, SEED, "gelu",
                         0.0, 0.0, INTERP)
    y_ref = ln_ffn_res_reference(x_odd, g, be, w1, b1, w2, b2, None, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-3, rtol=1e-3)
    if not ON_CPU:
        return
    # interpret-mode all-keep masks: kernel VJP must equal the closed-form
    # all-keep function's VJP (LN grads included)
    from simulst_tpu.nn.core import layer_norm

    def allkeep(x, g, be, w1, b1, w2, b2):
        y = layer_norm({"scale": g, "bias": be}, x)
        h = ACTIVATIONS["gelu"](y @ w1 + b1) / 0.9
        return x + (h @ w2 + b2) / 0.9

    gk = jax.grad(lambda *a: (fused_ln_ffn_res(*a, SEED, "gelu", 0.1, 0.1,
                                               True) ** 2).sum(),
                  argnums=tuple(range(7)))(x_odd, g, be, w1, b1, w2, b2)
    gr = jax.grad(lambda *a: (allkeep(*a) ** 2).sum(),
                  argnums=tuple(range(7)))(x_odd, g, be, w1, b1, w2, b2)
    for name, a, b in zip("x g be w1 b1 w2 b2".split(), gk, gr):
        ref = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3 * ref, rtol=5e-3,
                                   err_msg=f"grad {name}")


# ---------------------------------------------------------------------------
# TPU-only: real PRNG behavior
# ---------------------------------------------------------------------------

@pytest.mark.skipif(ON_CPU, reason="needs the hardware PRNG")
def test_tpu_dropout_statistics_and_determinism():
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(4))
    xb = x.astype(jnp.bfloat16)
    args = tuple(a.astype(jnp.bfloat16) for a in (w1, b1, w2, b2))
    y1 = fused_ffn(xb, *args, SEED, "gelu", 0.1, 0.1, False)
    y2 = fused_ffn(xb, *args, SEED, "gelu", 0.1, 0.1, False)
    assert bool(jnp.all(y1 == y2)), "same seed must give identical masks"
    zf = float((y1 == 0).mean())
    assert 0.05 < zf < 0.15, f"output dropout rate {zf} !~ 0.1"
    y3 = fused_ffn(xb, *args, SEED + 1, "gelu", 0.1, 0.1, False)
    assert not bool(jnp.all(y1 == y3)), "different seed must differ"
