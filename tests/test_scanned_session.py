"""Whole-session scanned evaluation (3 dispatches per bucket) must be
token-for-token identical to the per-chunk fused loop (stream/fused.py
make_scanned_runner; FusedBatchSession.process_session)."""
import json

import numpy as np
import pytest
import jax

from simulst_tpu.data.vocab import SPECIALS, Vocabulary
from simulst_tpu.models.cif import CIFConfig, CIFModel
from simulst_tpu.models.mma import MMAConfig, MMAModel
from simulst_tpu.stream.agents import AgentConfig, CIFAgent, MMAAgent
from simulst_tpu.stream.evaluator import evaluate_batched


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


def _audios():
    rng = np.random.RandomState(0)
    # incl. a single-chunk utterance (fallback path) and mixed final sizes
    secs = [0.25, 0.9, 1.0, 1.3, 1.0]
    return [(rng.randn(int(16000 * s)) * 0.05).astype(np.float32)
            for s in secs]


def _eval(agent, audios, tmp_path, scan):
    log = str(tmp_path / f"instances_{scan}.log")
    scores = evaluate_batched(agent, audios, references=["r"] * len(audios),
                              batch_size=3, log_path=log, scan=scan)
    inst = [json.loads(l) for l in open(log)]
    inst.sort(key=lambda x: x["index"])
    return scores, [(x["prediction"], x["delays"]) for x in inst]


def test_cif_scanned_matches_chunked(tmp_path):
    v = _vocab()
    cfg = CIFConfig(**small_kwargs(v))
    model = CIFModel(cfg)
    params = model.init(jax.random.PRNGKey(1))
    acfg = AgentConfig(max_tgt_len=24, max_src_frames=256)
    agent = CIFAgent(model, params, v, acfg, fused=True)
    audios = _audios()
    _, chunked = _eval(agent, audios, tmp_path, scan=False)
    _, scanned = _eval(agent, audios, tmp_path, scan=True)
    for i, ((pc, dc), (ps, ds)) in enumerate(zip(chunked, scanned)):
        assert pc == ps, f"utt {i}: {pc!r} != {ps!r}"
        np.testing.assert_allclose(dc, ds, atol=1e-6, err_msg=f"utt {i}")


def test_mma_scanned_matches_chunked(tmp_path):
    v = _vocab()
    cfg = MMAConfig(**small_kwargs(v),
                    simul_attn_type="waitk_fixed_pre_decision",
                    waitk_lagging=2, fixed_pre_decision_ratio=2)
    model = MMAModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    acfg = AgentConfig(max_tgt_len=24, max_src_frames=256)
    agent = MMAAgent(model, params, v, acfg, fused=True)
    audios = _audios()
    _, chunked = _eval(agent, audios, tmp_path, scan=False)
    _, scanned = _eval(agent, audios, tmp_path, scan=True)
    for i, ((pc, dc), (ps, ds)) in enumerate(zip(chunked, scanned)):
        assert pc == ps, f"utt {i}: {pc!r} != {ps!r}"
        np.testing.assert_allclose(dc, ds, atol=1e-6, err_msg=f"utt {i}")


@pytest.mark.parametrize("downsample", [1, 2])
def test_transducer_scanned_matches_chunked(tmp_path, downsample):
    from simulst_tpu.models.transducer import TransducerConfig, TransducerModel
    from simulst_tpu.stream.agents import TransducerAgent
    v = _vocab()
    cfg = TransducerConfig(**small_kwargs(v), ctc_layer=False,
                           downsample=downsample)
    model = TransducerModel(cfg)
    params = model.init(jax.random.PRNGKey(2))
    acfg = AgentConfig(max_tgt_len=24, max_src_frames=256)
    agent = TransducerAgent(model, params, v, acfg, fused=True)
    audios = _audios()
    _, chunked = _eval(agent, audios, tmp_path, scan=False)
    _, scanned = _eval(agent, audios, tmp_path, scan=True)
    for i, ((pc, dc), (ps, ds)) in enumerate(zip(chunked, scanned)):
        assert pc == ps, f"utt {i}: {pc!r} != {ps!r}"
        np.testing.assert_allclose(dc, ds, atol=1e-6, err_msg=f"utt {i}")


def test_int16_staged_matches_float_unstaged():
    """int16 PCM wavs uploaded via stage_session_wavs (1/4 the bytes, cast
    on device) must produce token-for-token the same session as float32
    wavs through the unstaged path: the fbank's float path scales by 2^15,
    which is exactly the int16 sample value (both paths feed identical
    numbers into the device fbank)."""
    from simulst_tpu.stream.agents import stage_session_wavs

    v = _vocab()
    cfg = CIFConfig(**small_kwargs(v))
    model = CIFModel(cfg)
    params = model.init(jax.random.PRNGKey(1))
    acfg = AgentConfig(max_tgt_len=24, max_src_frames=256)
    agent = CIFAgent(model, params, v, acfg, fused=True)

    rng = np.random.RandomState(3)
    i16 = [(rng.randn(int(16000 * s)) * 1500).astype(np.int16)
           for s in (1.0, 0.95, 1.0)]
    f32 = [w.astype(np.float32) / (2 ** 15) for w in i16]

    ref = agent.new_batched_session(3).process_session_wavs(f32)
    staged = stage_session_wavs(agent, i16)
    assert staged.wav_mat.dtype == np.int16
    out = agent.new_batched_session(3).process_session_wavs(i16,
                                                            staged=staged)
    assert out == ref


def test_process_session_features_matches_chunked():
    """The FEATURES-input scanned path (process_session -> fused.
    make_scanned_runner) must match the per-chunk loop token-for-token.
    Regression: the round-5 single-dispatch refactor briefly left
    make_scanned_runner's body unreachable inside make_session_executor,
    breaking this path with an ImportError."""
    from simulst_tpu.stream.agents import _session_schedule

    v = _vocab()
    cfg = CIFConfig(**small_kwargs(v))
    model = CIFModel(cfg)
    params = model.init(jax.random.PRNGKey(1))
    acfg = AgentConfig(max_tgt_len=24, max_src_frames=256)
    agent = CIFAgent(model, params, v, acfg, fused=True)

    rng = np.random.RandomState(7)
    wavs = [(rng.randn(int(16000 * s)) * 0.05).astype(np.float32)
            for s in (1.0, 0.9, 1.0)]
    n_first, n_steady, n_chunks, _ = _session_schedule(agent.cfg, wavs)
    assert n_chunks >= 3, "want a steady-scan segment in this test"

    def chunks_of(w):
        cuts = [0, n_first] + [min(n_first + k * n_steady, len(w))
                               for k in range(1, n_chunks)]
        return [w[a:b] for a, b in zip(cuts, cuts[1:])]

    chunk_lists = [chunks_of(w) for w in wavs]

    ref_sess = agent.new_batched_session(3)
    ref = []
    for k in range(n_chunks):
        ref.append(ref_sess.process_chunk_batch(
            [c[k] for c in chunk_lists], finished=(k == n_chunks - 1)))
    # per-example, per-chunk
    ref = [[ref[k][i] for k in range(n_chunks)] for i in range(3)]

    out = agent.new_batched_session(3).process_session(chunk_lists)
    assert out == ref


def test_mixed_dtype_bucket_matches_float():
    """A lock-step bucket mixing int16 PCM and float32 wavs falls back to a
    float32 sample matrix; the int16 members must be rescaled to [-1, 1]
    there (the device featurize multiplies FLOAT input by 2^15 — raw int16
    values would be scaled twice; round-5 review finding)."""
    v = _vocab()
    cfg = CIFConfig(**small_kwargs(v))
    model = CIFModel(cfg)
    params = model.init(jax.random.PRNGKey(1))
    acfg = AgentConfig(max_tgt_len=24, max_src_frames=256)
    agent = CIFAgent(model, params, v, acfg, fused=True)

    rng = np.random.RandomState(5)
    i16 = [(rng.randn(int(16000 * s)) * 1500).astype(np.int16)
           for s in (1.0, 0.95, 1.0)]
    f32 = [w.astype(np.float32) / (2 ** 15) for w in i16]
    mixed = [i16[0], f32[1], i16[2]]

    ref = agent.new_batched_session(3).process_session_wavs(f32)
    out = agent.new_batched_session(3).process_session_wavs(mixed)
    assert out == ref
