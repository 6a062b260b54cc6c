"""The segment-batched attention must be numerically identical to the dense
masked attention (the reference formulation)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.nn import emformer as emf
from tests.test_emformer import tiny_cfg


@pytest.mark.parametrize("U,lengths", [
    (16, [16, 16]), (20, [20, 13]), (11, [11, 7]), (40, [40, 33]),
])
def test_segmented_equals_dense(U, lengths):
    cfg_seg = tiny_cfg(segmented_attention=True)
    cfg_dense = dataclasses.replace(cfg_seg, segmented_attention=False)
    params = emf.emformer_init(jax.random.PRNGKey(0), cfg_seg)
    B = len(lengths)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (B, U + cfg_seg.right_context, cfg_seg.input_dim))
    lens = jnp.asarray(lengths)
    out_s, _ = emf.emformer_forward(params, cfg_seg, x, lens)
    out_d, _ = emf.emformer_forward(params, cfg_dense, x, lens)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=2e-4, atol=2e-5)


def test_segmented_no_mem():
    cfg_seg = tiny_cfg(segmented_attention=True, max_memory=0)
    cfg_dense = dataclasses.replace(cfg_seg, segmented_attention=False)
    params = emf.emformer_init(jax.random.PRNGKey(0), cfg_seg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 22, cfg_seg.input_dim))
    lens = jnp.array([20])
    out_s, _ = emf.emformer_forward(params, cfg_seg, x, lens)
    out_d, _ = emf.emformer_forward(params, cfg_dense, x, lens)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=2e-4, atol=2e-5)


def test_remat_matches_no_remat():
    cfg = tiny_cfg()
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = emf.emformer_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 20 + cfg.right_context, cfg.input_dim))
    lens = jnp.array([20, 14])

    def loss(p, c):
        out, _ = emf.emformer_forward(p, c, x, lens)
        return (out ** 2).sum()

    l1, g1 = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(p, cfg_r))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_grouped_attention_equals_per_segment():
    """segment_group > 1 (union-context blocks with static row masks) must
    equal per-segment attention exactly, incl. padded lengths."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    from simulst_tpu.nn.emformer import (EmformerConfig, emformer_forward,
                                         emformer_init)

    base = EmformerConfig(input_dim=32, num_heads=2, ffn_dim=48, num_layers=2,
                          dropout=0.0, attention_dropout=0.0,
                          activation_dropout=0.0, left_context=6,
                          right_context=2, segment=4, max_memory=2,
                          tanh_on_mem=True, segment_group=1)
    params = emformer_init(jax.random.PRNGKey(0), base)
    U = 16 * base.segment        # divisible by groups 2/4/8
    rng = np.random.RandomState(1)
    x = rng.randn(2, U + base.right_context, 32).astype(np.float32)
    lengths = np.array([U, U - 9], np.int32)
    x[1, U - 9:U] = 0.0
    want, _ = emformer_forward(params, base, jnp.asarray(x),
                               jnp.asarray(lengths))
    for G in (2, 4, 8):
        cfg = dataclasses.replace(base, segment_group=G)
        got, _ = emformer_forward(params, cfg, jnp.asarray(x),
                                  jnp.asarray(lengths))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4, err_msg=f"G={G}")


def test_choose_group_adaptive():
    """Largest divisor of n that keeps the first group's clamped window
    inside the utterance; 1 when no grouping applies."""
    from simulst_tpu.nn.emformer import EmformerConfig, _choose_group
    cfg = EmformerConfig()          # seg=16, lc=32, G=8
    assert _choose_group(16, 256, cfg) == 8
    assert _choose_group(12, 192, cfg) == 6     # 12 % 8 != 0 -> G=6
    assert _choose_group(4, 64, cfg) == 2       # (4-2)*16 >= 32
    assert _choose_group(8, 128, cfg) == 4      # (8-8)*16 < 32 -> G=4
    assert _choose_group(10, 160, cfg) == 5
    assert _choose_group(47, 750, cfg) == 1     # ragged U != n*seg
    assert _choose_group(2, 32, cfg) == 1       # no divisor fits the window
    nomem = EmformerConfig(max_memory=0)
    assert _choose_group(16, 256, nomem) == 1
