"""Forward + loss + grad smoke for every registered model family."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.losses.cif_loss import CIFLossConfig, cif_loss
from simulst_tpu.losses.joint_ctc import JointCTCConfig, joint_ctc_loss
from simulst_tpu.losses.mma_loss import MMALossConfig, mma_loss
from simulst_tpu.losses.rnnt_loss import RNNTLossConfig, rnnt_criterion
from simulst_tpu.models import get_model

COMMON = dict(vocab_size=20, input_feat=8, conv_channels=16, embed_dim=16,
              ffn_dim=32, encoder_layers=1, encoder_heads=2, decoder_layers=1,
              decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
              left_context=32, right_context=8, max_memory=2,
              dropout=0.1, attention_dropout=0.1, activation_dropout=0.1)

B, T, L = 2, 64, 6
FEATS = np.random.RandomState(0).randn(B, T, 8).astype(np.float32)
LENS = np.array([64, 40], np.int32)
TGT = np.array([[5, 6, 7, 8, 2, 1], [9, 10, 2, 1, 1, 1]], np.int32)
PREV = np.array([[2, 5, 6, 7, 8, 1], [2, 9, 10, 1, 1, 1]], np.int32)


def _grad_ok(loss_fn, params):
    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gn = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads))))
    assert np.isfinite(gn) and gn > 0
    return loss


def test_s2t_emformer_with_joint_ctc():
    model = get_model("s2t_emformer")(
        get_model("s2t_emformer").Config(**COMMON, ctc_layer=True))
    params = model.init(jax.random.PRNGKey(0))
    lcfg = JointCTCConfig()

    def f(p):
        logits, extra = model.forward(p, FEATS, LENS, PREV,
                                      rng=jax.random.PRNGKey(1),
                                      deterministic=False)
        return joint_ctc_loss(logits, extra, TGT, lcfg)[0]
    _grad_ok(f, params)


@pytest.mark.parametrize("attn_type", [
    "waitk_fixed_pre_decision", "infinite_lookback_fixed_pre_decision",
    "hard_aligned"])
def test_mma_with_latency_loss(attn_type):
    cls = get_model("mma")
    model = cls(cls.Config(**COMMON, simul_attn_type=attn_type,
                           waitk_lagging=2, fixed_pre_decision_ratio=2))
    params = model.init(jax.random.PRNGKey(0))
    lcfg = MMALossConfig(latency_avg_weight=0.1, latency_var_weight=0.1)

    def f(p):
        logits, extra = model.forward(p, FEATS, LENS, PREV,
                                      rng=jax.random.PRNGKey(1),
                                      deterministic=False)
        return mma_loss(logits, extra, TGT, LENS, lcfg)[0]
    _grad_ok(f, params)


def test_cif_with_cif_loss():
    cls = get_model("cif")
    model = cls(cls.Config(**COMMON))
    params = model.init(jax.random.PRNGKey(0))
    lcfg = CIFLossConfig(latency_factor=0.1)

    def f(p):
        logits, extra = model.forward(p, FEATS, LENS, PREV,
                                      rng=jax.random.PRNGKey(1),
                                      deterministic=False)
        return cif_loss(logits, extra, TGT, LENS, lcfg)[0]
    _grad_ok(f, params)


def test_transducer_with_rnnt_loss():
    cls = get_model("transducer")
    model = cls(cls.Config(**COMMON, downsample=2))
    params = model.init(jax.random.PRNGKey(0))
    lcfg = RNNTLossConfig(fastemit_lambda=0.01)

    def f(p):
        lattice, extra = model.forward(p, FEATS, LENS, PREV,
                                       rng=jax.random.PRNGKey(1),
                                       deterministic=False)
        return rnnt_criterion(lattice, extra, lcfg)[0]
    _grad_ok(f, params)


def test_mt_transformer_ce():
    cls = get_model("mt_transformer")
    model = cls(cls.Config(vocab_size=20, embed_dim=16, ffn_dim=32,
                           encoder_layers=1, decoder_layers=1, num_heads=2))
    params = model.init(jax.random.PRNGKey(0))
    src = np.array([[4, 5, 6, 2], [7, 8, 2, 1]], np.int32)

    from simulst_tpu.losses.label_smoothed_ce import ce_loss

    def f(p):
        logits, _ = model.forward(p, src, PREV[:, :4],
                                  rng=jax.random.PRNGKey(1),
                                  deterministic=False)
        return ce_loss(logits, TGT[:, :4], 0.1, 1)[0]
    _grad_ok(f, params)


def test_s2t_convpos_forward():
    cls = get_model("s2t_transformer_convpos")
    model = cls(cls.Config(**COMMON))
    params = model.init(jax.random.PRNGKey(0))
    logits, extra = model.forward(params, FEATS, LENS, PREV)
    assert logits.shape == (B, L, 20)
    assert np.isfinite(np.asarray(logits)).all()
