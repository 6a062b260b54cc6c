import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.ops import ctc as ctc_ops


def _rand_case(key, B, T, V, L):
    kl, kt, ki, kj = jax.random.split(key, 4)
    logits = jax.random.normal(kl, (B, T, V))
    lprobs = jax.nn.log_softmax(logits, -1)
    targets = jax.random.randint(kt, (B, L), 1, V)  # avoid blank=0
    in_lens = jax.random.randint(ki, (B,), max(2 * L, 1), T + 1)
    tgt_lens = jax.random.randint(kj, (B,), 1, L + 1)
    return lprobs, targets, in_lens, tgt_lens


def test_ctc_loss_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    B, T, V, L = 3, 12, 7, 4
    lprobs, targets, in_lens, tgt_lens = _rand_case(jax.random.PRNGKey(0), B, T, V, L)
    ours = ctc_ops.ctc_loss(lprobs, in_lens, targets, tgt_lens, blank=0)

    lp_t = torch.tensor(np.asarray(lprobs)).transpose(0, 1)  # (T, B, V)
    tl = torch.tensor(np.asarray(tgt_lens))
    flat = torch.cat([torch.tensor(np.asarray(targets))[i, :tl[i]] for i in range(B)])
    ref = F.ctc_loss(lp_t, flat, torch.tensor(np.asarray(in_lens)), tl,
                     blank=0, reduction="sum", zero_infinity=True)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_ctc_loss_impossible_zeroed():
    # target longer than input -> inf -> zeroed (zero_infinity)
    lprobs = jax.nn.log_softmax(jnp.zeros((1, 3, 5)), -1)
    loss = ctc_ops.ctc_loss(lprobs, jnp.array([3]), jnp.array([[1, 2, 3, 4]]),
                            jnp.array([4]), blank=0)
    assert float(loss) == 0.0


def _brute_force_best_alignment(lprobs, target, blank):
    """Enumerate all monotonic augmented-state paths; return best path."""
    T = lprobs.shape[0]
    L = len(target)
    S = 2 * L + 1
    labels = [blank if s % 2 == 0 else target[(s - 1) // 2] for s in range(S)]

    def can_skip(s):
        return labels[s] != blank and (s < 2 or labels[s] != labels[s - 2])

    best = (-np.inf, None)
    # path = sequence of states, start at 0 or 1, end at S-1 or S-2
    def rec(t, s, lp, path):
        nonlocal best
        lp = lp + lprobs[t, labels[s]]
        if t == T - 1:
            if s in (S - 1, S - 2):
                if lp > best[0]:
                    best = (lp, path + [s])
            return
        for ns in (s, s + 1, s + 2):
            if ns >= S:
                continue
            if ns == s + 2 and not can_skip(ns):
                continue
            rec(t + 1, ns, lp, path + [s])
    for s0 in (0, 1):
        rec(0, s0, 0.0, [])
    return best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_best_alignment_matches_brute_force(seed):
    T, V, L = 6, 5, 2
    key = jax.random.PRNGKey(seed)
    lprobs = jax.nn.log_softmax(jax.random.normal(key, (1, T, V)), -1)
    target = np.array([[1, 3]])
    states = ctc_ops.best_alignment(lprobs, jnp.array([T]), jnp.asarray(target),
                                    jnp.array([L]), blank=0)
    score, path = _brute_force_best_alignment(np.asarray(lprobs)[0], target[0], 0)
    assert path is not None
    np.testing.assert_array_equal(np.asarray(states)[0], np.array(path))


def test_best_alignment_respects_lengths():
    T, V = 8, 5
    key = jax.random.PRNGKey(3)
    lprobs = jax.nn.log_softmax(jax.random.normal(key, (2, T, V)), -1)
    targets = jnp.array([[1, 3], [2, 2]])
    in_lens = jnp.array([8, 5])
    tgt_lens = jnp.array([2, 2])
    states = np.asarray(ctc_ops.best_alignment(lprobs, in_lens, targets, tgt_lens))
    # valid prefix must be monotonic, start at state 0 or 1, end at 2L or 2L-1
    for b, il, tl in [(0, 8, 2), (1, 5, 2)]:
        seq = states[b, :il]
        assert seq[0] in (0, 1)
        assert seq[-1] in (2 * tl, 2 * tl - 1)
        assert ((seq[1:] - seq[:-1]) >= 0).all()
        assert ((seq[1:] - seq[:-1]) <= 2).all()


def test_ctc_loss_raw_equals_log_softmax_path():
    """ctc_loss_raw folds the logsumexp into the emission selection; values
    AND gradients must match log_softmax -> ctc_loss."""
    import jax
    from simulst_tpu.ops.ctc import ctc_loss, ctc_loss_raw

    rng = np.random.RandomState(5)
    b, t, v, l = 3, 12, 17, 5
    logits = jnp.asarray(rng.randn(b, t, v).astype(np.float32)) * 2.0
    targets = jnp.asarray(rng.randint(1, v, size=(b, l)).astype(np.int32))
    in_lens = jnp.asarray([12, 9, 7], jnp.int32)
    tgt_lens = jnp.asarray([5, 3, 0], jnp.int32)

    def via_lsm(x):
        lp = jax.nn.log_softmax(x, axis=-1)
        return ctc_loss(lp, in_lens, targets, tgt_lens)

    def via_raw(x):
        return ctc_loss_raw(x, in_lens, targets, tgt_lens)

    np.testing.assert_allclose(float(via_raw(logits)), float(via_lsm(logits)),
                               rtol=1e-5)
    g_raw = jax.grad(via_raw)(logits)
    g_lsm = jax.grad(via_lsm)(logits)
    np.testing.assert_allclose(np.asarray(g_raw), np.asarray(g_lsm),
                               atol=1e-5, rtol=1e-4)


def test_ctc_raw_smoothed_matches_explicit():
    """ctc_raw_smoothed folds the label-smoothing term into the alpha-beta
    backward; both outputs' values AND the combined gradient must match the
    explicit log_softmax formulation."""
    from simulst_tpu.ops.ctc import ctc_loss, ctc_raw_smoothed

    rng = np.random.RandomState(7)
    b, t, v, l = 3, 10, 13, 4
    logits = jnp.asarray(rng.randn(b, t, v).astype(np.float32)) * 2.0
    targets = jnp.asarray(rng.randint(1, v, size=(b, l)).astype(np.int32))
    in_lens = jnp.asarray([10, 8, 9], jnp.int32)
    tgt_lens = jnp.asarray([4, 2, 3], jnp.int32)

    def explicit(x):
        lp = jax.nn.log_softmax(x, axis=-1)
        nll = ctc_loss(lp, in_lens, targets, tgt_lens)
        valid = jnp.arange(t)[None, :] < in_lens[:, None]
        smooth = jnp.where(valid, -lp.sum(-1), 0.0).sum()
        return nll, smooth

    def fused(x):
        return ctc_raw_smoothed(x, in_lens, targets, tgt_lens, 0, True, True)

    for w_nll, w_sm in [(1.0, 0.0), (0.0, 1.0), (0.9, 0.1 / v)]:
        comb_e = lambda x: sum(w * o for w, o in zip((w_nll, w_sm), explicit(x)))
        comb_f = lambda x: sum(w * o for w, o in zip((w_nll, w_sm), fused(x)))
        np.testing.assert_allclose(float(comb_f(logits)), float(comb_e(logits)),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(jax.grad(comb_f)(logits)),
                                   np.asarray(jax.grad(comb_e)(logits)),
                                   atol=1e-5, rtol=1e-4)


def test_ctc_raw_zero_infinity_grad_zeroed():
    """An impossible target (longer than the input) contributes neither loss
    nor gradient; other batch rows keep their gradients."""
    from simulst_tpu.ops.ctc import ctc_loss_raw

    rng = np.random.RandomState(9)
    logits = jnp.asarray(rng.randn(2, 4, 6).astype(np.float32))
    targets = jnp.asarray([[1, 2, 3, 4, 5], [1, 2, 0, 0, 0]], jnp.int32)
    in_lens = jnp.asarray([4, 4], jnp.int32)
    tgt_lens = jnp.asarray([5, 2], jnp.int32)  # row 0 impossible (2L-1 > T)

    loss, g = jax.value_and_grad(
        lambda x: ctc_loss_raw(x, in_lens, targets, tgt_lens))(logits)
    g = np.asarray(g)
    assert np.abs(g[0]).max() == 0.0
    assert np.abs(g[1]).max() > 0.0
    assert np.isfinite(float(loss))


def test_pallas_dp_kernels_match_scans_exactly():
    """The Pallas alpha/beta DP kernels (interpret mode here) must equal the
    lax.scan forms EXACTLY — same op order per step, so any disagreement is
    a real indexing/masking bug (the kernels replace the reference's only
    custom CUDA kernel family, best_alignment.cu / cuDNN CTC)."""
    from simulst_tpu.ops.ctc import (NEG, _ctc_masks, _emissions, alphas_pallas,
                                     d_em_pallas)
    rng = np.random.RandomState(0)
    B, T, V, L = 4, 23, 17, 6
    logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32)) * 2
    in_len = jnp.asarray([23, 19, 23, 7], jnp.int32)
    targets = jnp.asarray(rng.randint(4, V, (B, L)), jnp.int32)
    tgt_len = jnp.asarray([6, 3, 6, 0], jnp.int32)

    labels, can_skip = _ctc_masks(targets, 0)
    lse = jax.nn.logsumexp(logits, axis=-1)
    em_all = _emissions(logits, labels) - jnp.moveaxis(lse, 0, 1)[:, :, None]
    s = labels.shape[1]

    # scan alphas
    alpha0 = jnp.full((B, s), NEG)
    alpha0 = alpha0.at[:, 0].set(em_all[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(tgt_len > 0, em_all[0, :, 1], NEG))

    def astep(alpha, inp):
        em, t_idx = inp
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG)[:, :s]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG)[:, :s]
        a2 = jnp.where(can_skip, a2, NEG)
        new = em + jnp.logaddexp(jnp.logaddexp(alpha, a1), a2)
        new = jnp.where((t_idx < in_len)[:, None], new, alpha)
        return new, new

    _, tail = jax.lax.scan(astep, alpha0, (em_all[1:], jnp.arange(1, T)))
    alphas_ref = jnp.concatenate([alpha0[None], tail], axis=0)
    alphas_k = alphas_pallas(em_all, can_skip, in_len, tgt_len,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(alphas_k),
                                  np.asarray(alphas_ref))

    # scan betas / d_em
    end = 2 * tgt_len
    iota_s = jnp.arange(s)[None, :]
    beta_last = jnp.where(
        (iota_s == end[:, None])
        | ((iota_s == jnp.maximum(end - 1, 0)[:, None])
           & (tgt_len > 0)[:, None]), 0.0, NEG)
    nll_b = jnp.asarray(rng.randn(B).astype(np.float32))
    scale = jnp.asarray(rng.rand(B).astype(np.float32))

    def bstep(beta, inp):
        em, alpha, t_idx = inp
        d_em = scale[:, None] * jnp.exp(alpha + beta + nll_b[:, None])
        live = (t_idx < in_len)[:, None]
        d_em = jnp.where(live, d_em, 0.0)
        b0 = em + beta
        b1 = jnp.pad(b0, ((0, 0), (0, 1)), constant_values=NEG)[:, 1:]
        b2m = jnp.where(can_skip, b0, NEG)
        b2 = jnp.pad(b2m, ((0, 0), (0, 2)), constant_values=NEG)[:, 2:]
        new = jnp.logaddexp(jnp.logaddexp(b0, b1), b2)
        return jnp.where(live, new, beta), d_em

    _, d_em_ref = jax.lax.scan(bstep, beta_last,
                               (em_all, alphas_ref, jnp.arange(T)),
                               reverse=True)
    d_em_k = d_em_pallas(em_all, alphas_ref, can_skip, in_len, tgt_len,
                         scale, nll_b, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_em_k), np.asarray(d_em_ref))


def test_ctc_block_gate_returns_mosaic_legal_blocks():
    """The batch block must be a multiple of 8 or the full batch (Mosaic's
    last-two-dims constraint; S is never split) and must fit the VMEM
    budget — the 8x4096 long-utterance geometry must FALL BACK to the scan
    (caught by a long-utterance train probe: blk=2 was shape-illegal)."""
    from simulst_tpu.ops import ctc as C
    import unittest.mock as mock
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        for b, n, t, s in [(32, 2, 256, 129), (8, 2, 1024, 385),
                           (12, 3, 256, 129), (4, 2, 100, 65),
                           (32, 3, 256, 129), (10, 2, 500, 200)]:
            blk = C._ctc_block(b, n, t, s)
            assert blk == 0 or blk % 8 == 0 or blk == b, (b, n, t, s, blk)
            if blk:
                s_pad = -(-s // 128) * 128
                assert n * t * blk * s_pad * 4 <= 10 * 2 ** 20
                assert b % blk == 0
        # the long-utterance case must fall back (full batch exceeds VMEM)
        assert C._ctc_block(8, 2, 1024, 385) == 0
        # the bench geometry keeps a 16-row block
        assert C._ctc_block(32, 2, 256, 129) == 16
