"""Fused agent sessions produce the same words as step-wise sessions."""
import numpy as np
import pytest

import jax

from simulst_tpu.data.vocab import SPECIALS, Vocabulary
from simulst_tpu.models.cif import CIFConfig, CIFModel
from simulst_tpu.models.mma import MMAConfig, MMAModel
from simulst_tpu.stream.agents import AgentConfig, CIFAgent, MMAAgent
from simulst_tpu.stream.evaluator import run_session


def _vocab(n=24):
    syms = list(SPECIALS) + [f"▁w{i}" for i in range(n - 8)] + \
        [f"x{i}" for i in range(4)]
    return Vocabulary(syms)


def small_kwargs(v):
    return dict(vocab_size=len(v), input_feat=80, conv_channels=16,
                embed_dim=16, ffn_dim=32, encoder_layers=1, encoder_heads=2,
                decoder_layers=1, decoder_heads=2, decoder_ffn_dim=32,
                segment_length=16, left_context=32, right_context=8,
                max_memory=2, dropout=0.0, attention_dropout=0.0,
                activation_dropout=0.0)


@pytest.fixture(scope="module")
def audio():
    return (np.random.RandomState(0).randn(16000) * 0.05).astype(np.float32)


def test_cif_fused_agent_matches_stepwise(audio):
    v = _vocab()
    cfg = CIFConfig(**small_kwargs(v))
    model = CIFModel(cfg)
    params = model.init(jax.random.PRNGKey(1))
    acfg = AgentConfig(max_tgt_len=16, max_src_frames=256)
    w1, d1, _ = run_session(CIFAgent(model, params, v, acfg), audio)
    w2, d2, _ = run_session(CIFAgent(model, params, v, acfg, fused=True),
                            audio)
    assert w1 == w2
    assert d1 == d2


def test_mma_fused_agent_matches_stepwise(audio):
    v = _vocab()
    cfg = MMAConfig(**small_kwargs(v), simul_attn_type="waitk_fixed_pre_decision",
                    waitk_lagging=2, fixed_pre_decision_ratio=2)
    model = MMAModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    acfg = AgentConfig(max_tgt_len=16, max_src_frames=256)
    w1, d1, _ = run_session(MMAAgent(model, params, v, acfg), audio)
    w2, d2, _ = run_session(MMAAgent(model, params, v, acfg, fused=True),
                            audio)
    assert w1 == w2
    assert d1 == d2
