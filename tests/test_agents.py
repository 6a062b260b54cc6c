"""End-to-end streaming agent smoke tests (random weights).

These exercise the full READ/WRITE loop: online fbank -> incremental encoder
-> policy -> incremental decoder -> word merge -> latency metrics."""
import numpy as np
import pytest

from simulst_tpu.data.vocab import SPECIALS, Vocabulary
from simulst_tpu.models.cif import CIFConfig, CIFModel
from simulst_tpu.models.mma import MMAConfig, MMAModel
from simulst_tpu.stream.agents import AgentConfig, CIFAgent, MMAAgent
from simulst_tpu.stream.evaluator import evaluate, run_session

import jax


def _vocab(n=24):
    syms = list(SPECIALS) + [f"▁w{i}" for i in range(n - 4 - 4)] + \
        [f"x{i}" for i in range(4)]
    return Vocabulary(syms)


def small_kwargs(v):
    return dict(vocab_size=len(v), input_feat=80, conv_channels=16,
                embed_dim=16, ffn_dim=32, encoder_layers=2, encoder_heads=2,
                decoder_layers=2, decoder_heads=2, decoder_ffn_dim=32,
                segment_length=16, left_context=32, right_context=8,
                max_memory=2, dropout=0.0, attention_dropout=0.0,
                activation_dropout=0.0)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.RandomState(0)
    return (rng.randn(16000) * 0.05).astype(np.float32)  # 1s


def test_waitk_agent_runs(audio):
    v = _vocab()
    cfg = MMAConfig(**small_kwargs(v), simul_attn_type="waitk_fixed_pre_decision",
                    waitk_lagging=2, fixed_pre_decision_ratio=2)
    model = MMAModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    agent = MMAAgent(model, params, v, AgentConfig(max_tgt_len=16,
                                                   max_src_frames=256))
    words, delays, elapsed, _ = run_session(agent, audio)
    # delays must be monotone, within the utterance duration + finish
    assert all(d2 >= d1 for d1, d2 in zip(delays, delays[1:]))
    assert all(0 < d <= 1000 + 1 for d in delays)


def test_cif_agent_runs_and_scores(audio):
    v = _vocab()
    cfg = CIFConfig(**small_kwargs(v))
    model = CIFModel(cfg)
    params = model.init(jax.random.PRNGKey(1))
    agent = CIFAgent(model, params, v, AgentConfig(max_tgt_len=16,
                                                   max_src_frames=256))
    scores = evaluate(agent, [audio], references=["w1 w2"])
    assert "BLEU" in scores and "AL" in scores and "DAL" in scores
    assert np.isfinite(scores["AL"])


def test_waitk_agent_latency_scales_with_k(audio):
    """Larger wait-k must not DECREASE the first-emission delay."""
    v = _vocab()
    firsts = []
    for k in (1, 6):
        cfg = MMAConfig(**small_kwargs(v),
                        simul_attn_type="waitk_fixed_pre_decision",
                        waitk_lagging=k, fixed_pre_decision_ratio=2)
        model = MMAModel(cfg)
        params = model.init(jax.random.PRNGKey(0))
        agent = MMAAgent(model, params, v, AgentConfig(max_tgt_len=8,
                                                       max_src_frames=256))
        words, delays, _, _ = run_session(agent, audio)
        firsts.append(delays[0] if delays else 1000.0)
    assert firsts[1] >= firsts[0]
