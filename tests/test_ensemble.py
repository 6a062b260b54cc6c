"""Ensemble decoding (colon-separated checkpoints, per-step probability
averaging — reference /root/reference/eval/generate.py:96-103 + fairseq
EnsembleModel semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.cli.generate import (_build_std, build_ensemble,
                                      decode_batch, decode_batch_ensemble)
from simulst_tpu.decode.beam import BeamConfig
from simulst_tpu.decode.beam import greedy_decode
from simulst_tpu.models import get_model

COMMON = dict(vocab_size=20, input_feat=8, conv_channels=16, embed_dim=16,
              ffn_dim=32, encoder_layers=1, encoder_heads=2, decoder_layers=1,
              decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
              left_context=32, right_context=8, max_memory=2, ctc_layer=False,
              dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)

BATCH = {
    "feats": np.random.RandomState(0).randn(2, 64, 8).astype(np.float32),
    "feat_lengths": np.array([64, 48], np.int32),
}


def _two_models():
    cls = get_model("s2t_emformer")
    models = [cls(cls.Config(**COMMON)) for _ in range(2)]
    params = [m.init(jax.random.PRNGKey(s)) for s, m in zip((0, 1), models)]
    return models, params


def test_ensemble_step_equals_manual_average():
    models, params = _two_models()
    cfg = BeamConfig(beam_size=1, max_len=6)
    b0 = _build_std(models[0], params[0], BATCH, cfg)
    b1 = _build_std(models[1], params[1], BATCH, cfg)
    step, state, _ = build_ensemble([
        _build_std(m, p, BATCH, cfg) for m, p in zip(models, params)])
    toks = jnp.full((2,), 2, jnp.int32)  # eos bos
    got, _ = step(state, toks)
    l0, _ = b0[0](b0[1], toks)
    l1, _ = b1[0](b1[1], toks)
    want = jax.nn.logsumexp(jnp.stack([
        jax.nn.log_softmax(l0.astype(jnp.float32), -1),
        jax.nn.log_softmax(l1.astype(jnp.float32), -1)]), axis=0) - jnp.log(2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("beam", [1, 2])
def test_ensemble_of_identical_members_is_noop(beam):
    models, params = _two_models()
    cfg = BeamConfig(beam_size=beam, max_len=8)
    single_t, single_l = decode_batch(models[0], params[0], BATCH, cfg)
    ens_t, ens_l = decode_batch_ensemble([models[0], models[0]],
                                         [params[0], params[0]], BATCH, cfg)
    np.testing.assert_array_equal(np.asarray(single_t), np.asarray(ens_t))
    np.testing.assert_array_equal(np.asarray(single_l), np.asarray(ens_l))


def test_ensemble_beats_either_member():
    """Toy task: member A is confidently right on even steps and confidently
    wrong (but less confident) on odd steps; member B is the reverse.  The
    probability average recovers the full correct sequence; each member
    alone gets half of it wrong."""
    V, L, target = 8, 6, [3, 4, 5, 3, 4, 2]

    def make_member(good_parity):
        def step(state, tokens):
            t = state
            right = jax.nn.one_hot(jnp.asarray(target[0]), V) * 0.0
            logits = jnp.zeros((tokens.shape[0], V))
            tgt = jnp.asarray(target)[jnp.minimum(t, L - 1)]
            wrong = (tgt + 1) % V
            good = (t % 2) == good_parity
            # confident-right (logit 5) when good; mildly-wrong (logit 1 on
            # a wrong token) when bad, so the other member's confidence wins
            logits = logits.at[:, tgt].add(jnp.where(good, 5.0, 0.0))
            logits = logits.at[:, wrong].add(jnp.where(good, 0.0, 1.0))
            return logits, t + 1
        return step

    cfg = BeamConfig(beam_size=1, max_len=L)
    outs = {}
    for name, parities in [("A", (0,)), ("B", (1,)), ("ens", (0, 1))]:
        step, state, _ = build_ensemble(
            [(make_member(p), jnp.asarray(0), lambda s, i: s)
             for p in parities])
        toks, lens = greedy_decode(step, state, 1, cfg)
        outs[name] = list(np.asarray(toks)[0][: int(np.asarray(lens)[0])])

    def n_correct(seq):
        return sum(a == b for a, b in zip(seq, target))

    assert outs["ens"] == target
    assert n_correct(outs["A"]) < L and n_correct(outs["B"]) < L
