"""Monotonic expected-alignment Pallas kernels (ops/monotonic_pallas.py).

Contracts:
  * interpret-mode kernel == lax.scan fallback BIT-EXACT (same op order:
    both run the cumsum as the same triangular MXU dot), fwd and bwd;
  * the hand-derived VJP matches jax autodiff of a plain reference
    recursion (the pre-kernel jnp.cumsum/clip formulation) at interior
    points;
  * expected_alignment_from_p_choose keeps its brute-force semantics and
    stays differentiable end-to-end from p_choose.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.ops import monotonic as mono
from simulst_tpu.ops import monotonic_pallas as mp


def _rand(n, u, s, seed=0):
    kp, kd = jax.random.split(jax.random.PRNGKey(seed))
    # interior-valued p keeps the recursion away from the clip boundaries
    p = jax.random.uniform(kp, (n, u, s), minval=0.05, maxval=0.95)
    cumprod = mono.exclusive_cumprod(1 - p, axis=2)
    prefix = (p * cumprod).astype(jnp.float32)
    denom = jnp.clip(cumprod, 1e-6, 1.0).astype(jnp.float32)
    return prefix, denom


@pytest.mark.parametrize("n,u,s", [(4, 6, 128), (8, 3, 256), (2, 1, 128)])
def test_interpret_kernel_bitexact_vs_scan(n, u, s):
    prefix, denom = _rand(n, u, s)
    ref = mp.alignment_fwd_scan(prefix, denom)
    out = mp.alignment_fwd_pallas(prefix, denom, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    g = jax.random.normal(jax.random.PRNGKey(9), ref.shape, jnp.float32)
    dp_ref, dd_ref = mp.alignment_bwd_scan(prefix, denom, ref, g)
    dp, dd = mp.alignment_bwd_pallas(prefix, denom, ref, g, interpret=True)
    np.testing.assert_array_equal(np.asarray(dp), np.asarray(dp_ref))
    np.testing.assert_array_equal(np.asarray(dd), np.asarray(dd_ref))


def _reference_recursion(prefix, denom):
    """The pre-kernel formulation: jnp.cumsum + jnp.clip, autodiffed."""
    n, u, s = prefix.shape
    a0 = jnp.zeros((n, s), jnp.float32).at[:, 0].set(1.0)

    def step(aprev, inp):
        pref_u, den_u = inp
        a = jnp.clip(pref_u * jnp.cumsum(aprev / den_u, axis=1), 0.0, 1.0)
        return a, a

    xs = (jnp.moveaxis(prefix, 1, 0), jnp.moveaxis(denom, 1, 0))
    _, alphas = jax.lax.scan(step, a0, xs)
    return jnp.moveaxis(alphas, 0, 1)


def test_hand_vjp_matches_autodiff():
    """The hand backward equals jax autodiff of the plain formulation at
    every position where the clip is not EXACTLY at a boundary.  At pre == 0
    (the cumprod underflows to exact zero at the tail, so prefix == 0 there)
    jax's clip assigns the tie a 0.5 subgradient while the hand VJP uses
    torch-clamp semantics (hard zero, matching the reference's autograd);
    the difference never reaches d_p because it is multiplied by the same
    zero cumprod (covered by test_expected_alignment_end_to_end_grad)."""
    prefix, denom = _rand(4, 5, 128, seed=3)
    g = jax.random.normal(jax.random.PRNGKey(7), prefix.shape, jnp.float32)

    ref = _reference_recursion(prefix, denom)
    new = mono._alignment_recursion(prefix, denom)
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    loss_ref = lambda pf, dn: (_reference_recursion(pf, dn) * g).sum()
    loss_new = lambda pf, dn: (mono._alignment_recursion(pf, dn) * g).sum()
    dp_ref, dd_ref = jax.grad(loss_ref, argnums=(0, 1))(prefix, denom)
    dp, dd = jax.grad(loss_new, argnums=(0, 1))(prefix, denom)
    interior = np.asarray((new > 0.0) & (new < 1.0))
    assert interior.mean() > 0.5          # the comparison is not vacuous
    np.testing.assert_allclose(np.asarray(dp)[interior],
                               np.asarray(dp_ref)[interior],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dd), np.asarray(dd_ref),
                               rtol=1e-4, atol=1e-5)
    # zero-boundary positions: prefix is exactly zero there (underflowed
    # cumprod), so the d_prefix disagreement is killed by the chain rule
    # into d_p; saturated-high positions get a hard zero from both gates
    np.testing.assert_array_equal(
        np.asarray(prefix)[np.asarray(new) <= 0.0], 0.0)
    np.testing.assert_array_equal(np.asarray(dp)[~interior], 0.0)


def test_expected_alignment_end_to_end_grad():
    """Gradient flows from a scalar of alpha back to p_choose and matches
    autodiff of the plain formulation."""
    k = jax.random.PRNGKey(1)
    p = jax.random.uniform(k, (3, 4, 128), minval=0.1, maxval=0.9)
    kpm = jnp.zeros((3, 128), bool).at[1, 100:].set(True)

    def plain(p):
        pm = jnp.where(kpm[:, None, :], 0.0, p)
        cp = mono.exclusive_cumprod(1 - pm, axis=2)
        return (_reference_recursion(pm * cp, jnp.clip(cp, 1e-6, 1.0))
                ** 2).sum()

    def fused(p):
        return (mono.expected_alignment_from_p_choose(p, kpm) ** 2).sum()

    # MXU-dot cumsum vs jnp.cumsum: same math, different accumulation order
    np.testing.assert_allclose(float(fused(p)), float(plain(p)),
                               rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.grad(fused)(p)),
                               np.asarray(jax.grad(plain)(p)),
                               rtol=1e-4, atol=2e-5)


def test_waitk_onehot_alpha_unchanged():
    """waitk's one-hot p_choose drives alpha to one-hot rows; the recursion
    (clip boundaries hit exactly) must still produce the same alphas."""
    pc = mono.waitk_p_choose(tgt_len=5, src_len=128, bsz=2, waitk_lagging=3)
    ref = _reference_recursion(
        pc * mono.exclusive_cumprod(1 - pc, axis=2),
        jnp.clip(mono.exclusive_cumprod(1 - pc, axis=2), 1e-6, 1.0))
    out = mono.expected_alignment_from_p_choose(pc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gate_shapes():
    """Gate: S % 128 != 0 or CPU backend -> fallback; legal shapes pick a
    divisor-of-N (or full-N) block within VMEM."""
    assert mp.monotonic_block(128, 64, 256, 3) == 0      # cpu backend here
    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        assert mp.monotonic_block(128, 64, 96, 3) == 0   # S not 128-aligned
        blk = mp.monotonic_block(128, 64, 256, 3)
        assert blk > 0 and 128 % blk == 0
        blk = mp.monotonic_block(24, 64, 256, 6)         # odd batch
        assert blk in (8, 24) or blk == 0
        for n, u, s in [(128, 64, 256), (32, 256, 1024), (24, 40, 128),
                        (4, 512, 2048), (512, 192, 512)]:
            for nio in (3, 6):
                blk = mp.monotonic_block(n, u, s, nio)
                if blk:
                    assert n % blk == 0
                    n_tri = 1 if nio == 3 else 2
                    vmem = (nio * blk * s * 4) * 2 + n_tri * s * s * 4 \
                        + blk * s * 4
                    assert vmem <= 10 * 2 ** 20
    finally:
        jax.default_backend = orig


def test_pooled_resolution_alignment_equals_full_resolution():
    """models/mma.py pooled branch (round 5): running the expected-alignment
    DP at ceil(S/r) pooled resolution and insert-zeros-upsampling alpha must
    match the full-resolution DP on the upsampled p_choose — interleaved
    zeros ride the recursion as exact identities; only the eps-inside-log of
    exclusive_cumprod accrues a tiny extra factor at full resolution (which
    is why the tolerance is 1e-5, not exact).  Covers padded examples whose
    final pooled block lands beyond src_len."""
    import numpy as np
    import jax.numpy as jnp
    from simulst_tpu.models import mma as jmma
    from simulst_tpu.ops import monotonic as mono

    rng = np.random.RandomState(0)
    B, H, U, S, r = 2, 2, 5, 29, 4          # ragged: n_p*r = 32 > S
    n_p = -(-S // r)
    pc_pool = jnp.asarray(rng.rand(B, H, U, n_p).astype(np.float32)) * 0.9
    src_len = jnp.asarray([29, 22])
    kpm = jnp.arange(S)[None, :] >= src_len[:, None]

    # full-resolution path (the pre-round-5 formulation)
    pc_full = jmma._upsample_p_choose(pc_pool, r, S)
    kpm_flat = jnp.repeat(kpm, H, axis=0)
    a_full = mono.expected_alignment_from_p_choose(
        pc_full.reshape(B * H, U, S), kpm_flat, eps=1e-6)

    # pooled path (what mma_attention_forward now does)
    land = jnp.minimum(jnp.arange(1, n_p + 1) * r - 1, S - 1)
    land_kpm = land[None, :] >= src_len[:, None]
    a_pool = mono.expected_alignment_from_p_choose(
        pc_pool.reshape(B * H, U, n_p), jnp.repeat(land_kpm, H, axis=0),
        eps=1e-6)
    a_up = jmma._upsample_p_choose(a_pool.reshape(B, H, U, n_p), r, S
                                   ).reshape(B * H, U, S)

    np.testing.assert_allclose(np.asarray(a_up), np.asarray(a_full),
                               atol=1e-5, rtol=1e-4)
    # nonzeros only at landing frames
    mask = np.zeros(S, bool)
    mask[np.asarray(land)] = True
    assert (np.asarray(a_up)[:, :, ~mask] == 0).all()
