"""Transducer end-to-end wiring: rnnt training loss converges, offline
greedy decode runs, and the streaming agent emits tokens.

Covers the reference's transducer path (transducer_model.py:165-239 +
criterion/rnnt_criterion.py:44-147 + eval/eval_transducer.sh), which round 1
left unwired.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simulst_tpu.data.vocab import SPECIALS, Vocabulary
from simulst_tpu.losses.rnnt_loss import RNNTLossConfig, rnnt_criterion
from simulst_tpu.models.transducer import TransducerConfig, TransducerModel
from simulst_tpu.stream.agents import AgentConfig, TransducerAgent
from simulst_tpu.stream.evaluator import run_session


def _vocab(n=24):
    syms = list(SPECIALS) + [f"▁w{i}" for i in range(n - 8)] + \
        [f"x{i}" for i in range(4)]
    return Vocabulary(syms)


def _cfg(v):
    return TransducerConfig(
        vocab_size=len(v), input_feat=80, conv_channels=16, embed_dim=16,
        ffn_dim=32, encoder_layers=1, encoder_heads=2, decoder_layers=1,
        decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
        left_context=32, right_context=8, max_memory=2, ctc_layer=False,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)


@pytest.fixture(scope="module")
def setup():
    v = _vocab()
    cfg = _cfg(v)
    model = TransducerModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 48, 80).astype(np.float32))
    lengths = jnp.array([48, 40], jnp.int32)
    # prev_tokens fairseq-style: eos-fronted, right-padded
    prev = jnp.asarray([[2, 5, 6, 7], [2, 8, 9, 1]], jnp.int32)
    return v, cfg, model, params, feats, lengths, prev


def test_rnnt_training_converges(setup):
    """A few optimization steps on one fixed batch must reduce the loss
    (the --loss rnnt wiring, cli/train.py)."""
    import optax
    v, cfg, model, params, feats, lengths, prev = setup
    lcfg = RNNTLossConfig()

    def loss_fn(p):
        lattice, extra = model.forward(p, feats, lengths, prev)
        loss, metrics = rnnt_criterion(lattice, extra, lcfg)
        return loss / jnp.maximum(metrics["ntokens"], 1)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    p = params
    losses = []
    for _ in range(25):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


def test_offline_greedy_decode(setup):
    from simulst_tpu.cli.generate import decode_batch
    from simulst_tpu.decode.beam import BeamConfig
    v, cfg, model, params, feats, lengths, prev = setup
    batch = {"feats": np.asarray(feats), "feat_lengths": np.asarray(lengths)}
    tokens, lens = decode_batch(model, params, batch,
                                BeamConfig(beam_size=1, max_len=8))
    assert tokens.shape == (2, 8)
    assert (np.asarray(lens) >= 1).all()


def test_streaming_agent_emits(setup):
    v, cfg, model, params, feats, lengths, prev = setup
    agent = TransducerAgent(model, params, v,
                            AgentConfig(max_tgt_len=16, max_src_frames=128))
    audio = (np.random.RandomState(1).randn(12000) * 0.05).astype(np.float32)
    words, delays, elapsed, _ = run_session(agent, audio)
    # random weights: content is arbitrary, but the protocol must terminate
    # with per-word delays within the utterance duration
    assert len(words) == len(delays)
    assert all(0 < d <= 760.0 for d in delays), delays


def test_offline_beam_decode(setup):
    """Beam search over the emit-scan path (the reference runs fairseq's
    SequenceGenerator over TransducerDecoder's incremental forward —
    transducer_model.py:165-209): the chosen hypothesis must score at least
    as well as greedy under the model's own per-step log-probs, replayed
    through the same step function."""
    from simulst_tpu.cli.generate import decode_batch
    from simulst_tpu.decode.beam import BeamConfig
    from simulst_tpu.models import s2t_emformer as s2t

    v, cfg, model, params, feats, lengths, prev = setup
    batch = {"feats": np.asarray(feats), "feat_lengths": np.asarray(lengths)}
    bcfg = BeamConfig(beam_size=1, max_len=8)
    g_tokens, g_lens = decode_batch(model, params, batch, bcfg)
    bcfg4 = BeamConfig(beam_size=4, max_len=8)
    b_tokens, b_lens = decode_batch(model, params, batch, bcfg4)
    assert b_tokens.shape == (2, 8) and (np.asarray(b_lens) >= 1).all()

    # replay a hypothesis through decode_step, summing log-probs
    # (decode_step pools the visible source itself when downsample > 1)
    enc = s2t.encoder_forward(params["encoder"], cfg, feats, lengths)
    src, src_lens = enc.encoder_out, enc.lengths

    def replay_score(tokens, lens):
        state = model.init_decode_state(2, 16)
        prev_t = jnp.full((2,), cfg.blank_idx, jnp.int32)
        total = np.zeros(2)
        tokens = np.asarray(tokens)
        for t in range(tokens.shape[1]):
            logits, _, state = model.decode_step(params, state, prev_t, src,
                                                 src_lens, online=False)
            lp = np.asarray(jax.nn.log_softmax(
                logits.astype(jnp.float32), -1))
            for i in range(2):
                if t < int(lens[i]):
                    total[i] += lp[i, tokens[i, t]]
            prev_t = jnp.asarray(tokens[:, t])
        # length-normalized, as the search scores hypotheses
        return total / np.maximum(np.asarray(lens), 1)

    gs = replay_score(g_tokens, g_lens)
    bs = replay_score(b_tokens, b_lens)
    assert (bs >= gs - 1e-4).all(), (bs, gs)
