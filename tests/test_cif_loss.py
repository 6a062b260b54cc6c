import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu.losses.cif_loss import CIFLossConfig, quantity_loss, _clipped_l2


def test_clipped_l2_matches_reference_semantics():
    # reference clipped_l2_loss (cif_criterion.py:59-68): clip the TARGET into
    # [x - sqrt(clip), x + sqrt(clip)] before the squared error
    x = jnp.array([0.0, 0.0, 5.0])
    y = jnp.array([1.0, 100.0, 5.5])
    out = np.asarray(_clipped_l2(x, y, clip=4.0))
    np.testing.assert_allclose(out, [1.0, 4.0, 0.25], rtol=1e-6)


def test_quantity_loss_sum_mode():
    cfg = CIFLossConfig(quant_type="sum", cif_beta=1.0, quant_clip=100.0)
    alpha = jnp.array([[0.5, 0.5, 0.5, 0.5]])        # sum 2.0
    l, acc = quantity_loss(alpha, None, jnp.array([4]), jnp.array([[5, 2]]),
                           jnp.array([2]), cfg)
    np.testing.assert_allclose(float(l), 0.0, atol=1e-6)  # 2.0/1.0 == 2
    assert int(acc) == 1
    l2, _ = quantity_loss(alpha, None, jnp.array([4]), jnp.array([[5, 2, 6]]),
                          jnp.array([3]), cfg)
    np.testing.assert_allclose(float(l2), 1.0, atol=1e-6)  # (2-3)^2


def test_quantity_loss_align_mode_hand_case():
    """Force a known CTC best alignment and check boundary targets.

    Vocab {0:blank, 1, 2}; target [1, 2]; 4 frames with near-one-hot probs
    [1, 1, 2, 2] -> alignment states [1, 1, 3, 3]; boundaries at the LAST
    frame of each run: frames 1 and 3 -> quant targets cumsum = [.,1,.,2].
    """
    cfg = CIFLossConfig(quant_type="align", cif_beta=1.0, quant_clip=100.0,
                        blank_idx=0)
    logits = np.full((1, 4, 3), -10.0, np.float32)
    for t, lab in enumerate([1, 1, 2, 2]):
        logits[0, t, lab] = 10.0
    lprobs = jax.nn.log_softmax(jnp.asarray(logits), -1)
    # alpha whose cumsum/beta at frames 1 and 3 equals exactly 1 and 2
    alpha = jnp.array([[0.5, 0.5, 0.5, 0.5]])
    l, _ = quantity_loss(alpha, lprobs, jnp.array([4]), jnp.array([[1, 2]]),
                         jnp.array([2]), cfg)
    np.testing.assert_allclose(float(l), 0.0, atol=1e-5)
    # shifting alpha off the boundaries produces positive loss
    alpha2 = jnp.array([[0.2, 0.2, 0.2, 0.2]])
    l2, _ = quantity_loss(alpha2, lprobs, jnp.array([4]), jnp.array([[1, 2]]),
                          jnp.array([2]), cfg)
    assert float(l2) > 0.1


def test_quantity_align_single_segment_boundary():
    """Single-label utterance: the LAST VALID frame must be a boundary even
    with no following segment (a roll-based next-frame comparison would wrap
    to frame 0 and miss it)."""
    cfg = CIFLossConfig(quant_type="align", cif_beta=1.0, quant_clip=100.0,
                        blank_idx=0)
    # one label spanning all 4 valid frames: states [1, 1, 1, 1]
    logits = np.full((1, 5, 3), -10.0, np.float32)
    for t in range(5):
        logits[0, t, 1] = 10.0
    lprobs = jax.nn.log_softmax(jnp.asarray(logits), -1)
    # cumsum(alpha)/beta at the last valid frame (index 3) == 1 -> loss 0
    alpha = jnp.array([[0.25, 0.25, 0.25, 0.25, 9.9]])   # frame 4 is padding
    l, _ = quantity_loss(alpha, lprobs, jnp.array([4]), jnp.array([[1]]),
                         jnp.array([1]), cfg)
    np.testing.assert_allclose(float(l), 0.0, atol=1e-5)
    # off-boundary alpha must be penalized (proves the boundary exists)
    alpha2 = jnp.array([[0.1, 0.1, 0.1, 0.1, 9.9]])
    l2, _ = quantity_loss(alpha2, lprobs, jnp.array([4]), jnp.array([[1]]),
                          jnp.array([1]), cfg)
    assert float(l2) > 0.1
