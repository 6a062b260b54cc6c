"""Offline beam/greedy decode for the streaming model families."""
import jax
import numpy as np
import pytest

from simulst_tpu.cli.generate import decode_batch
from simulst_tpu.decode.beam import BeamConfig
from simulst_tpu.models import get_model

COMMON = dict(vocab_size=20, input_feat=8, conv_channels=16, embed_dim=16,
              ffn_dim=32, encoder_layers=1, encoder_heads=2, decoder_layers=1,
              decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
              left_context=32, right_context=8, max_memory=2,
              dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)

BATCH = {
    "feats": np.random.RandomState(0).randn(2, 64, 8).astype(np.float32),
    "feat_lengths": np.array([64, 48], np.int32),
}


@pytest.mark.parametrize("beam", [1, 2])
def test_cif_offline_decode(beam):
    cls = get_model("cif")
    model = cls(cls.Config(**COMMON))
    params = model.init(jax.random.PRNGKey(0))
    tokens, lengths = decode_batch(model, params, BATCH,
                                   BeamConfig(beam_size=beam, max_len=8))
    assert tokens.shape[0] == 2
    assert np.isfinite(np.asarray(lengths)).all()


@pytest.mark.parametrize("attn", ["waitk_fixed_pre_decision",
                                  "infinite_lookback_fixed_pre_decision"])
def test_mma_offline_decode(attn):
    cls = get_model("mma")
    model = cls(cls.Config(**COMMON, simul_attn_type=attn, waitk_lagging=2,
                           fixed_pre_decision_ratio=2))
    params = model.init(jax.random.PRNGKey(0))
    tokens, lengths = decode_batch(model, params, BATCH,
                                   BeamConfig(beam_size=2, max_len=8))
    assert tokens.shape == (2, 8)
