"""Fused linear+dropout+residual kernel (ops/linear_res_pallas.py).

CPU runs use interpret mode (all-keep PRNG bits — see test_ffn_pallas.py's
header note); equality tests therefore run deterministic or compare against
the closed-form all-keep scaling.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.ops.linear_res_pallas import fused_linear_drop_res

D_IN, D_OUT = 256, 256
ON_CPU = jax.default_backend() == "cpu"
INTERP = ON_CPU
SEED = jnp.array([7], jnp.int32)


def _params(key, rows=600):
    ks = jax.random.split(key, 4)
    h = jax.random.normal(ks[0], (rows, D_IN), jnp.float32)
    w = jax.random.normal(ks[1], (D_IN, D_OUT)) * 0.05
    b = jax.random.normal(ks[2], (D_OUT,)) * 0.05
    res = jax.random.normal(ks[3], (rows, D_OUT))
    return h, w, b, res


def _reference(h, w, b, res, period=0, res_rows=0, inv=1.0):
    y = h @ w + b
    if period == 0:
        return res + y * inv
    ridx = jnp.arange(h.shape[0]) % period
    is_res = (ridx < res_rows)[:, None]
    return jnp.where(is_res, res + y * inv, y)


def test_deterministic_matches_reference():
    h, w, b, res = _params(jax.random.PRNGKey(0))
    y = fused_linear_drop_res(h, w, b, res, SEED, 0.0, 0, 0, INTERP)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_reference(h, w, b, res)),
                               atol=1e-4, rtol=1e-4)


def test_periodic_gating():
    """Rows with row % period >= res_rows take the PLAIN projection (the
    Emformer summary rows): no residual, no dropout scaling."""
    h, w, b, res = _params(jax.random.PRNGKey(1), rows=1000)
    period, res_rows = 200, 192
    y = fused_linear_drop_res(h, w, b, res, SEED, 0.0, period, res_rows, INTERP)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_reference(h, w, b, res, period, res_rows)),
        atol=1e-4, rtol=1e-4)


def test_deterministic_grads_match_reference():
    h, w, b, res = _params(jax.random.PRNGKey(2))

    def loss_k(h, w, b, res):
        return (fused_linear_drop_res(h, w, b, res, SEED, 0.0, 0, 0,
                                      INTERP) ** 2).sum()

    def loss_r(h, w, b, res):
        return (_reference(h, w, b, res) ** 2).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(h, w, b, res)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(h, w, b, res)
    for name, a, bb in zip("h w b res".split(), gk, gr):
        ref = float(jnp.abs(bb).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4 * ref, rtol=1e-3,
                                   err_msg=f"grad {name}")


def test_dropout_allkeep_vjp_consistency():
    """Interpret-mode bits are all-keep: the kernel must equal the
    closed-form all-keep scaling (residual rows only) and its VJP must be
    the VJP of that same function."""
    if not ON_CPU:
        pytest.skip("closed-form all-keep check is interpret-mode-only")
    h, w, b, res = _params(jax.random.PRNGKey(3), rows=1000)
    period, res_rows, rate = 200, 192, 0.1
    inv = 1.0 / (1.0 - rate)

    y = fused_linear_drop_res(h, w, b, res, SEED, rate, period, res_rows, True)
    np.testing.assert_allclose(
        np.asarray(y),
        np.asarray(_reference(h, w, b, res, period, res_rows, inv)),
        atol=1e-4, rtol=1e-4)

    gk = jax.grad(lambda *a: (fused_linear_drop_res(
        *a, SEED, rate, period, res_rows, True) ** 2).sum(),
        argnums=(0, 1, 2, 3))(h, w, b, res)
    gr = jax.grad(lambda *a: (_reference(
        *a, period, res_rows, inv) ** 2).sum(),
        argnums=(0, 1, 2, 3))(h, w, b, res)
    for name, a, bb in zip("h w b res".split(), gk, gr):
        ref = float(jnp.abs(bb).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4 * ref, rtol=1e-3,
                                   err_msg=f"grad {name}")


def test_row_padding():
    """Rows not divisible by the tile: padded rows must not corrupt output
    or the weight grads."""
    h, w, b, res = _params(jax.random.PRNGKey(4), rows=137)

    def loss_k(w, b):
        return (fused_linear_drop_res(h, w, b, res, SEED, 0.0, 0, 0,
                                      INTERP) ** 2).sum()

    def loss_r(w, b):
        return (_reference(h, w, b, res) ** 2).sum()

    gk = jax.grad(loss_k, argnums=(0, 1))(w, b)
    gr = jax.grad(loss_r, argnums=(0, 1))(w, b)
    for name, a, bb in zip("w b".split(), gk, gr):
        ref = float(jnp.abs(bb).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4 * ref, rtol=1e-3,
                                   err_msg=f"grad {name}")


def test_decoder_layer_fused_epilogue_equals_plain(monkeypatch):
    """decoder_layer_forward with the fused epilogue forced (interpret
    mode) equals the plain dropout+residual path, forward and grads."""
    import simulst_tpu.nn.attention as attn_mod
    from simulst_tpu.nn import transformer as tr

    monkeypatch.setattr(attn_mod, "linear_res_supported", lambda *a: True)
    monkeypatch.setattr(
        attn_mod, "fused_linear_drop_res",
        functools.partial(fused_linear_drop_res, interpret=True))

    cfg = tr.DecoderConfig(vocab_size=50, embed_dim=D_IN, ffn_dim=512,
                           num_layers=1, num_heads=4)
    p = tr.decoder_layer_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, D_IN))
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 20, D_IN))
    valid = jnp.ones((2, 20), bool)

    def run(p, x):
        y, _ = tr.decoder_layer_forward(p, cfg, x, enc, valid)
        return y

    y_fused = run(p, x)
    monkeypatch.setattr(attn_mod, "linear_res_supported", lambda *a: False)
    y_plain = run(p, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               atol=2e-4, rtol=1e-3)

    monkeypatch.setattr(attn_mod, "linear_res_supported", lambda *a: True)
    g_fused = jax.grad(lambda p_: (run(p_, x) ** 2).sum())(p)
    monkeypatch.setattr(attn_mod, "linear_res_supported", lambda *a: False)
    g_plain = jax.grad(lambda p_: (run(p_, x) ** 2).sum())(p)
    fa, _ = jax.tree_util.tree_flatten(g_fused)
    fb, _ = jax.tree_util.tree_flatten(g_plain)
    for a, bb in zip(fa, fb):
        # absolute floor: near-cancelling leaves (some bias grads are ~1e-6)
        # otherwise turn fp32 rounding noise into failures
        ref = float(jnp.abs(bb).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-4 * ref + 1e-5, rtol=1e-3)


def test_emformer_grouped_fused_epilogue_equals_plain(monkeypatch):
    """emformer_forward with BOTH the attention kernel and the fused
    out_proj epilogue forced (interpret mode) equals the gathered-XLA
    path with the plain epilogue."""
    import simulst_tpu.nn.emformer as em

    cfg = em.EmformerConfig(num_layers=2)
    params = em.emformer_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 256 + cfg.right_context, cfg.input_dim))
    lengths = jnp.array([256, 144], jnp.int32)
    ref, _ = em.emformer_forward(params, cfg, x, lengths)

    orig = em.emformer_grouped_attention
    monkeypatch.setattr(em, "attn_pallas_supported", lambda g, d: True)
    monkeypatch.setattr(
        em, "emformer_grouped_attention",
        lambda q, k, v, l, s, eid, geom, rate: orig(q, k, v, l, s, eid,
                                                    geom, rate, True))
    monkeypatch.setattr(em, "linear_res_supported", lambda *a: True)
    monkeypatch.setattr(
        em, "fused_linear_drop_res",
        functools.partial(fused_linear_drop_res, interpret=True))
    out, _ = em.emformer_forward(params, cfg, x, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
