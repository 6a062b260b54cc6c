"""Fused grouped-segment attention kernel (ops/emformer_attn_pallas.py) vs
the gathered XLA formulation (nn/emformer._grouped_attention) — interpret
mode, fp32, so any disagreement is a real math bug, not precision."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.nn import emformer as em
from simulst_tpu.ops.emformer_attn_pallas import (AttnGeom,
                                                  emformer_grouped_attention)

CFG = em.EmformerConfig(num_layers=1)
GEOM = AttnGeom(U=256, seg=CFG.segment, lc=CFG.left_context,
                rc=CFG.right_context, max_mem=CFG.max_memory,
                G=CFG.segment_group, num_heads=CFG.num_heads)


def _inputs(key):
    b = 3
    ks = jax.random.split(key, 3)
    q3 = jax.random.normal(ks[0], (b, GEOM.ng, GEOM.nq, CFG.input_dim))
    k = jax.random.normal(ks[1], (b, GEOM.tk, CFG.input_dim))
    v = jax.random.normal(ks[2], (b, GEOM.tk, CFG.input_dim))
    lengths = jnp.array([256, 201, 130], jnp.int32)
    return q3, k, v, lengths


def _reference(q3, k, v, lengths):
    """The gathered-softmax formulation, lifted from _grouped_attention
    (post-projection part)."""
    b, ng, nq, d = q3.shape
    U, seg, lc, rc, G = GEOM.U, GEOM.seg, GEOM.lc, GEOM.rc, GEOM.G
    h = GEOM.num_heads
    hd = d // h
    idx_np, valid_np, utt_col_np, allowed_np = em._group_gather_indices(
        U, seg, lc, rc, GEOM.max_mem, G)
    idx = jnp.asarray(idx_np)
    ctx = idx.shape[1]
    k_ctx = jnp.take(k, idx.reshape(-1), axis=1).reshape(b, ng, ctx, d)
    v_ctx = jnp.take(v, idx.reshape(-1), axis=1).reshape(b, ng, ctx, d)
    valid = jnp.asarray(valid_np)[None]
    utt_col = jnp.asarray(utt_col_np)
    in_len = (utt_col[None] < lengths[:, None, None]) | (utt_col[None] < 0)
    key_valid = valid & in_len
    qh = q3.reshape(b, ng, nq, h, hd).transpose(0, 1, 3, 2, 4) * (hd ** -0.5)
    kh = k_ctx.reshape(b, ng, ctx, h, hd).transpose(0, 1, 3, 2, 4)
    vh = v_ctx.reshape(b, ng, ctx, h, hd).transpose(0, 1, 3, 2, 4)
    scores = jnp.einsum("bnhqd,bnhkd->bnhqk", qh, kh).astype(jnp.float32)
    ni = -1e9
    scores = jnp.where(key_valid[:, :, None, None, :], scores, ni)
    scores = jnp.where(jnp.asarray(allowed_np)[None, None, None], scores, ni)
    probs = jax.nn.softmax(scores, axis=-1).astype(q3.dtype)
    out = jnp.einsum("bnhqk,bnhkd->bnhqd", probs, vh)
    return out.transpose(0, 1, 3, 2, 4).reshape(b, ng, nq, d)


SEED = jnp.array([11], jnp.int32)
_INTERP = jax.default_backend() == "cpu"


def _kernel(q3, k, v, lengths, seed):
    return emformer_grouped_attention(q3, k, v, lengths, seed, None, GEOM,
                                      0.0, _INTERP)


def test_forward_matches_gathered_softmax():
    q3, k, v, lengths = _inputs(jax.random.PRNGKey(0))
    out_k = _kernel(q3, k, v, lengths, SEED)
    out_r = _reference(q3, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=2e-5)


def test_grads_match_gathered_softmax():
    q3, k, v, lengths = _inputs(jax.random.PRNGKey(1))
    w = jax.random.normal(jax.random.PRNGKey(2), (GEOM.nq, CFG.input_dim))

    def loss_k(q3, k, v):
        return (_kernel(q3, k, v, lengths, SEED) * w).sum()

    def loss_r(q3, k, v):
        return (_reference(q3, k, v, lengths) * w).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q3, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q3, k, v)
    for name, a, b in zip("q k v".split(), gk, gr):
        ref = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5 * ref, rtol=1e-4,
                                   err_msg=f"grad {name}")


def test_emformer_forward_uses_kernel_equivalently(monkeypatch):
    """Full 2-layer emformer_forward: kernel path == gathered path (the
    dispatcher is CPU-gated, so drive the kernel branch directly)."""
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
        lambda q, k, v, l, s, eid, geom, rate: orig(q, k, v, l, s, eid, geom,
                                                    rate, True))
    out, _ = em.emformer_forward(params, cfg, x, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
