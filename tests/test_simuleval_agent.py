"""SimulEval-protocol contract tests for `stream/simuleval_agent.py`.

simuleval is not installed in this environment; the adapter degrades to local
protocol stand-ins and is driven here by a mock event loop that replays the
SimulEval client semantics the reference relied on
(/root/reference/eval/1-simuleval.sh:80-101 driving
codebase/agents/default_agent.py:97-477): policy() -> READ_ACTION pulls
`speech_segment_size` ms of samples through segment_to_units +
update_states_read; WRITE_ACTION pulls predict() into the unit queue and
units_to_segment merges BPE ids into words until DEFAULT_EOS.

Contract checked: the word stream produced through the SimulEval protocol is
IDENTICAL to the built-in evaluator's run_session on the same agent+audio.
"""
import types

import numpy as np
import pytest

import jax

from simulst_tpu.data.vocab import SPECIALS, Vocabulary
from simulst_tpu.models.cif import CIFConfig
from simulst_tpu.models.mma import MMAConfig
from simulst_tpu.stream import simuleval_agent as sva
from simulst_tpu.stream.evaluator import run_session
from simulst_tpu.train.checkpoint import save_checkpoint

SR = 16000


def _vocab(n=24):
    syms = list(SPECIALS) + [f"▁w{i}" for i in range(n - 4 - 4)] + \
        [f"x{i}" for i in range(4)]
    return Vocabulary(syms)


SMALL = dict(input_feat=80, conv_channels=16, embed_dim=16, ffn_dim=32,
             encoder_layers=2, encoder_heads=2, decoder_layers=2,
             decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
             left_context=32, right_context=8, max_memory=2, dropout=0.0,
             attention_dropout=0.0, activation_dropout=0.0)


class ListEntry:
    """simuleval's ListEntry surface used by the protocol (front-pop)."""

    def __init__(self):
        self.value = []

    def __len__(self):
        return len(self.value)

    def __getitem__(self, i):
        return self.value[i]

    def __iter__(self):
        return iter(self.value)

    def append(self, x):
        self.value.append(x)

    def pop(self):
        return self.value.pop(0)


def _mock_states():
    states = types.SimpleNamespace()
    states.units = types.SimpleNamespace(source=ListEntry(),
                                         target=ListEntry())
    states._finished_source = False
    states.finish_read = lambda: states._finished_source
    return states


def run_simuleval_session(agent, wav, max_actions=2000):
    """Mock SimulEval client/server event loop."""
    states = _mock_states()
    agent.initialize_states(states)
    unit_queue = ListEntry()
    pos = 0
    words = []

    def handle_segment(seg_out):
        done = False
        if seg_out is None:
            return False
        if not isinstance(seg_out, list):
            seg_out = [seg_out]
        for s in seg_out:
            if s == sva.DEFAULT_EOS:
                done = True
            elif s:
                words.extend(s.split())
        return done

    for _ in range(max_actions):
        action = agent.policy(states)
        if action == sva.READ_ACTION:
            n = int(round(agent.speech_segment_size / 1000.0 * SR))
            seg = wav[pos: pos + n]
            pos += len(seg)
            if pos >= len(wav):
                states._finished_source = True
            units = agent.segment_to_units(list(seg), states)
            for u in units:
                states.units.source.append(u)
            agent.update_states_read(states)
        else:
            unit = agent.predict(states)
            states.units.target.append(unit)
            unit_queue.append(unit)
            if handle_segment(agent.units_to_segment(unit_queue, states)):
                return words
    raise AssertionError("mock SimulEval session did not terminate")


def _make_agent(tmp_path, model_name, cfg_dict, agent_type, seed=0, **args_over):
    from simulst_tpu.models import get_model
    cls = get_model(model_name)
    v = _vocab()
    cfg = cls.Config(vocab_size=len(v), **cfg_dict)
    params = cls(cfg).init(jax.random.PRNGKey(seed))
    ckpt = str(tmp_path / f"ckpt_{model_name}_{agent_type}")
    save_checkpoint(ckpt, params, metadata={"model": model_name,
                                            "config": cfg_dict})
    vpath = str(tmp_path / "vocab.txt")
    with open(vpath, "w") as f:
        for s in v.symbols[4:]:
            f.write(f"{s} 1\n")
    args = types.SimpleNamespace(
        model_path=ckpt, tgt_splitter_path=vpath, agent_type=agent_type,
        model=None, global_stats=None, waitk=None, cif_beta=None,
        overshoot_weight=1.0, force_finish=False, max_len_a=10,
        max_len_b=16, fused=False, sample_rate=SR, **args_over)
    return sva.SimulSTAgent(args)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.RandomState(0)
    return (rng.randn(int(SR * 1.2)) * 0.05).astype(np.float32)


def test_importable_without_simuleval():
    assert not sva.HAVE_SIMULEVAL  # this environment has no simuleval
    assert sva.READ_ACTION != sva.WRITE_ACTION
    assert isinstance(sva.SimulSTAgent.speech_segment_size, (int, float))


def test_chunk_geometry_matches_reference_formula(tmp_path):
    agent = _make_agent(tmp_path, "mma",
                        dict(**SMALL, simul_attn_type="waitk_fixed_pre_decision",
                             waitk_lagging=2, fixed_pre_decision_ratio=2,
                             ctc_layer=False),
                        "waitk")
    cfg = agent.agent.cfg
    stride_ms = cfg.stride * 10
    first = (cfg.segment_length // cfg.stride
             + cfg.right_context // cfg.stride) * stride_ms + 25 - 10
    steady = (cfg.segment_length // cfg.stride) * stride_ms
    assert agent.first_segment_size == first
    assert agent.steady_segment_size == steady
    assert agent.speech_segment_size == first  # before the first READ


@pytest.mark.parametrize("kind", ["waitk", "cif"])
def test_protocol_output_matches_builtin_evaluator(tmp_path, audio, kind):
    if kind == "waitk":
        agent = _make_agent(
            tmp_path, "mma",
            dict(**SMALL, simul_attn_type="waitk_fixed_pre_decision",
                 waitk_lagging=2, fixed_pre_decision_ratio=2,
                 ctc_layer=False), "waitk")
    else:
        agent = _make_agent(tmp_path, "cif", dict(SMALL), "cif")

    sim_words = run_simuleval_session(agent, audio)
    ref_words, _, _, _ = run_session(agent.agent, audio)
    assert " ".join(sim_words).split() == " ".join(ref_words).split(), (
        f"simuleval-protocol output differs:\n  simuleval: {sim_words}\n"
        f"  builtin:   {ref_words}")


def test_first_read_then_steady_chunks(tmp_path, audio):
    agent = _make_agent(tmp_path, "cif", dict(SMALL), "cif")
    states = _mock_states()
    agent.initialize_states(states)
    act = agent.policy(states)
    assert act == sva.READ_ACTION
    first_n = int(round(agent.speech_segment_size / 1000.0 * SR))
    seg = audio[:first_n]
    agent.segment_to_units(list(seg), states)
    agent.update_states_read(states)
    act2 = agent.policy(states)
    if act2 == sva.READ_ACTION:
        assert agent.speech_segment_size == agent.steady_segment_size
