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
    w1, d1, _, _ = run_session(CIFAgent(model, params, v, acfg), audio)
    w2, d2, _, _ = run_session(CIFAgent(model, params, v, acfg, fused=True),
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
    w1, d1, _, _ = run_session(MMAAgent(model, params, v, acfg), audio)
    w2, d2, _, _ = run_session(MMAAgent(model, params, v, acfg, fused=True),
                            audio)
    assert w1 == w2
    assert d1 == d2


def test_waitk_large_k_matches_offline_greedy(audio):
    """With k >= all pooled source frames, the streaming wait-k agent reads
    everything before writing, so its output must equal offline greedy."""
    from simulst_tpu.cli.generate import decode_batch
    from simulst_tpu.decode.beam import BeamConfig
    from simulst_tpu.ops.fbank import fbank_np
    from simulst_tpu.data.vocab import EOS

    v = _vocab()
    cfg = MMAConfig(**small_kwargs(v), simul_attn_type="waitk_fixed_pre_decision",
                    waitk_lagging=1000, fixed_pre_decision_ratio=2,
                    mass_preservation=True)
    model = MMAModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    acfg = AgentConfig(max_tgt_len=12, max_src_frames=256)
    agent = MMAAgent(model, params, v, acfg)
    from simulst_tpu.stream.evaluator import run_session
    words, delays, _, _ = run_session(agent, audio)
    # delays must all equal the full utterance duration (read-everything)
    assert all(abs(d - 1000.0) < 30 for d in delays), delays

    # offline greedy on the same features
    feats = fbank_np(audio * 2 ** 15)
    batch = {"feats": feats[None], "feat_lengths":
             np.array([feats.shape[0]], np.int32)}
    # min_len=0: the streaming agent may emit EOS immediately, while the
    # fairseq-default min_len=1 would block offline EOS at the first step
    tokens, lengths = decode_batch(model, params, batch,
                                   BeamConfig(beam_size=1, max_len=11,
                                              min_len=0))
    ids = [int(t) for t in np.asarray(tokens)[0][: int(lengths[0])]
           if t != EOS]
    offline_words = []
    buf = []
    for t in ids:
        piece = v.symbols[t]
        if piece.startswith("▁") and buf:
            offline_words.append("".join(buf).replace("▁", ""))
            buf = []
        buf.append(piece)
    if buf:
        offline_words.append("".join(buf).replace("▁", ""))
    offline_words = [w for w in offline_words if w]
    assert words == offline_words, (words, offline_words)
