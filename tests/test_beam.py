import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu.decode.beam import BeamConfig, beam_search, greedy_decode


def _toy_step(table):
    """Deterministic 'model': logits depend only on (prev_token, t)."""
    def step_fn(state, tokens):
        t = state
        logits = table[tokens, t]
        return logits, t + 1
    return step_fn


def test_greedy_matches_argmax_chain():
    V, T = 6, 4
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (V, T + 1, V))
    # make token 2 (EOS) unlikely until the end
    table = table.at[:, :, 2].add(-5.0)
    table = table.at[:, T - 1, 2].add(20.0)
    step = _toy_step(table)
    cfg = BeamConfig(beam_size=1, max_len=T)
    tokens, lengths = greedy_decode(step, jnp.zeros((), jnp.int32), 1, cfg)
    # manual chain
    cur, out = 2, []
    for t in range(T):
        nxt = int(jnp.argmax(table[cur, t]))
        out.append(nxt)
        cur = nxt
        if nxt == 2:
            break
    np.testing.assert_array_equal(np.asarray(tokens)[0, :len(out)], out)


def test_beam_finds_higher_score_than_greedy():
    V, T = 8, 5
    key = jax.random.PRNGKey(1)
    table = jax.random.normal(key, (V, T + 1, V)) * 2.0
    table = table.at[:, :, 1].add(-100.0)  # never PAD
    step = _toy_step(table)

    def total_logprob(seq):
        lp, cur = 0.0, 2
        for t, tok in enumerate(seq):
            lp += float(jax.nn.log_softmax(table[cur, t])[tok])
            cur = tok
        return lp

    g_tokens, g_len = greedy_decode(step, jnp.zeros((), jnp.int32), 1,
                                    BeamConfig(beam_size=1, max_len=T))
    res = beam_search(step, jnp.zeros((), jnp.int32), 1,
                      BeamConfig(beam_size=4, max_len=T),
                      reorder_fn=lambda s, idx: s)
    g_seq = [int(x) for x in np.asarray(g_tokens)[0][:int(g_len[0])]]
    b_seq = [int(x) for x in np.asarray(res.tokens)[0, 0][:int(res.lengths[0, 0])]]
    assert total_logprob(b_seq) >= total_logprob(g_seq) - 1e-5


def test_beam_respects_eos_freeze():
    """A beam that hits EOS must stay frozen (PAD continuation)."""
    V, T = 5, 6
    table = jnp.zeros((V, T + 1, V)).at[:, 2, 2].add(10.0)  # EOS at t=2
    step = _toy_step(table)
    res = beam_search(step, jnp.zeros((), jnp.int32), 1,
                      BeamConfig(beam_size=2, max_len=T),
                      reorder_fn=lambda s, idx: s)
    toks = np.asarray(res.tokens)[0, 0]
    eos_pos = int(np.argmax(toks == 2))
    assert (toks[eos_pos + 1:] == 1).all()  # PAD after EOS


def test_banked_beam_recovers_early_eos_hypothesis():
    """A short high-scoring EOS hypothesis must be banked and win over longer
    continuations even though it leaves the live beam."""
    V, T = 5, 6
    # at t=0: token 3 good; at t=1 from 3: EOS very likely (short good hyp),
    # alternatives mediocre forever after
    table = jnp.full((V, T + 1, V), -3.0)
    table = table.at[2, 0, 3].set(4.0)         # seed(2) -> 3
    table = table.at[3, 1, 2].set(6.0)         # 3 -> EOS (strong)
    table = table.at[3, 1, 4].set(2.0)         # 3 -> 4 (weaker live path)
    step = _toy_step(table)
    res = beam_search(step, jnp.zeros((), jnp.int32), 1,
                      BeamConfig(beam_size=2, max_len=T, len_penalty=1.0),
                      reorder_fn=lambda s, idx: s)
    best = np.asarray(res.tokens)[0, 0]
    assert best[0] == 3 and best[1] == 2       # [3, EOS]
    assert int(res.lengths[0, 0]) == 2


def test_min_len_blocks_early_eos():
    """A model that always prefers EOS must still emit >= min_len tokens
    (fairseq generation_args min_len; inference_config.py:8-77)."""
    V, T = 6, 6
    table = jnp.zeros((V, T + 1, V)).at[:, :, 2].set(10.0)  # EOS dominates
    table = table.at[:, :, 4].set(5.0)                      # runner-up
    step = _toy_step(table)
    for beam in (1, 3):
        cfg = BeamConfig(beam_size=beam, max_len=T, min_len=3)
        if beam == 1:
            tokens, lengths = greedy_decode(step, jnp.zeros((), jnp.int32),
                                            1, cfg)
        else:
            res = beam_search(step, jnp.zeros((), jnp.int32), 1, cfg,
                              lambda s, i: s)
            tokens, lengths = res.tokens[:, 0], res.lengths[:, 0]
        toks = np.asarray(tokens)[0][: int(np.asarray(lengths)[0])]
        assert int(lengths[0]) >= 4, toks       # 3 tokens + EOS
        assert list(toks[:3]) == [4, 4, 4]
        assert toks[3] == 2


def test_unk_penalty_steers_away_from_unk():
    V, T = 6, 3
    table = jnp.zeros((V, T + 1, V)).at[:, :, 3].set(1.0)   # UNK best
    table = table.at[:, :, 5].set(0.9)                      # runner-up
    table = table.at[:, T - 1, 2].set(30.0)
    step = _toy_step(table)
    cfg = BeamConfig(beam_size=1, max_len=T, unk_penalty=0.0)
    tokens, _ = greedy_decode(step, jnp.zeros((), jnp.int32), 1, cfg)
    assert int(np.asarray(tokens)[0, 0]) == 3
    cfg = BeamConfig(beam_size=1, max_len=T, unk_penalty=5.0)
    tokens, _ = greedy_decode(step, jnp.zeros((), jnp.int32), 1, cfg)
    assert int(np.asarray(tokens)[0, 0]) == 5
    res = beam_search(step, jnp.zeros((), jnp.int32), 1,
                      BeamConfig(beam_size=2, max_len=T, unk_penalty=5.0),
                      lambda s, i: s)
    assert int(np.asarray(res.tokens)[0, 0, 0]) == 5


def test_prefix_tokens_constrain_hypotheses():
    """fairseq --prefix-size semantics: hypotheses start with the given
    per-example prefix; PAD rows in the prefix are unconstrained."""
    V, T = 7, 5
    key = jax.random.PRNGKey(3)
    table = jax.random.normal(key, (V, T + 1, V))
    table = table.at[:, :, 2].add(-8.0)   # no early EOS
    table = table.at[:, :, 1].add(-50.0)  # and never PAD
    step = _toy_step(table)
    prefix = jnp.asarray([[5, 6], [1, 1]], jnp.int32)  # row 1 unconstrained

    def batch_step(state, tokens):
        t = state
        return table[tokens, t], t + 1

    cfg = BeamConfig(beam_size=3, max_len=T)
    res = beam_search(batch_step, jnp.zeros((), jnp.int32), 2, cfg,
                      lambda s, i: s, prefix_tokens=prefix)
    best = np.asarray(res.tokens)[:, 0]
    assert list(best[0][:2]) == [5, 6]
    free = beam_search(batch_step, jnp.zeros((), jnp.int32), 2, cfg,
                       lambda s, i: s)
    np.testing.assert_array_equal(best[1], np.asarray(free.tokens)[1, 0])
    # greedy honors the same contract
    toks, _ = greedy_decode(batch_step, jnp.zeros((), jnp.int32), 2,
                            BeamConfig(beam_size=1, max_len=T),
                            prefix_tokens=prefix)
    assert list(np.asarray(toks)[0][:2]) == [5, 6]
