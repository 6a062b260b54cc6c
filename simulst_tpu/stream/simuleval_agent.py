"""SimulEval interop: expose this repo's streaming agents through SimulEval's
`SpeechAgent` states/policy/predict contract.

The reference's published numbers were produced by the actual SimulEval
client/server (/root/reference/eval/1-simuleval.sh:80-101) driving
`codebase/agents/default_agent.py` / `cif_agent.py`.  This module is the
drop-in equivalent for OUR models:

    simuleval --agent simulst_tpu/stream/simuleval_agent.py \
        --model-path ckpt --tgt-splitter-path spm.model --agent-type cif ...

so a future parity run can be scored by the same tool the baseline used.

Protocol surface replicated from the reference agent
(default_agent.py:97-477):
  * `speech_segment_size` chunk geometry — first READ requests
    (segment+rc)*stride*10ms + window-shift extra, later READs
    segment*stride*10ms (:364-376);
  * `segment_to_units` accumulates raw samples (DSP happens inside our
    session's OnlineFbank, matching OnlineFeatureExtractor :28-73);
  * `policy` drives the underlying session: the MMA/wait-k model decides via
    its monotonic heads, CIF compares fired vs decoded length (:364-413);
  * `predict` returns the argmax token id, with the force-finish None trick
    (:415-436);
  * `units_to_segment` merges BPE units into words at the "▁" boundary and
    terminates with DEFAULT_EOS (:241-301).

Importable WITHOUT simuleval installed: the simuleval base class and action
constants degrade to local stand-ins so the protocol can be contract-tested
against a mock event loop (tests/test_simuleval_agent.py).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

try:  # pragma: no cover - exercised only when simuleval is installed
    from simuleval import READ_ACTION, WRITE_ACTION, DEFAULT_EOS
    from simuleval.agents import SpeechAgent as _SimulEvalSpeechAgent
    HAVE_SIMULEVAL = True
except Exception:  # simuleval absent: local protocol stand-ins
    READ_ACTION, WRITE_ACTION = "get", "send"
    DEFAULT_EOS = "</s>"
    HAVE_SIMULEVAL = False

    class _SimulEvalSpeechAgent:  # minimal base: ctor stores args
        data_type = "speech"

        def __init__(self, args):
            self.args = args

from simulst_tpu.data.vocab import EOS
from simulst_tpu.stream.agents import BOW_PREFIX, READ, chunk_geometry_ms

SAMPLE_RATE = 16000


class SimulSTAgent(_SimulEvalSpeechAgent):
    """SimulEval SpeechAgent over a simulst_tpu streaming session."""

    data_type = "speech"
    speech_segment_size = 640  # overwritten per-model in __init__

    @staticmethod
    def add_args(parser):
        parser.add_argument("--model-path", type=str, required=True,
                            help="path to a simulst_tpu checkpoint")
        parser.add_argument("--tgt-splitter-path", type=str, required=True,
                            help="target vocab (.model SPM or .txt)")
        parser.add_argument("--agent-type", type=str, default="mma",
                            choices=["mma", "waitk", "cif", "transducer"])
        parser.add_argument("--model", type=str, default=None,
                            help="model registry name override")
        parser.add_argument("--global-stats", type=str, default=None,
                            help="npz with global CMVN mean/std")
        parser.add_argument("--waitk", type=int, default=None,
                            help="test-time wait-k override")
        parser.add_argument("--cif-beta", type=float, default=None,
                            help="test-time CIF beta recalibration")
        parser.add_argument("--overshoot-weight", type=float, default=1.0)
        parser.add_argument("--force-finish", default=False,
                            action="store_true")
        parser.add_argument("--max-len-a", type=float, default=1)
        parser.add_argument("--max-len-b", type=int, default=0)
        parser.add_argument("--fused", default=False, action="store_true")
        parser.add_argument("--sample-rate", type=int, default=SAMPLE_RATE)
        return parser

    def __init__(self, args):
        super().__init__(args)
        from simulst_tpu.stream.build import build_agent, load_vocab
        self.vocab = load_vocab(args.tgt_splitter_path)
        self.agent = build_agent(
            args.model_path, self.vocab, agent_type=args.agent_type,
            model_name=getattr(args, "model", None),
            waitk=getattr(args, "waitk", None),
            cif_beta=getattr(args, "cif_beta", None),
            overshoot_weight=getattr(args, "overshoot_weight", 1.0),
            global_cmvn_path=getattr(args, "global_stats", None))
        self.agent.acfg.force_finish = bool(getattr(args, "force_finish",
                                                    False))
        self.sample_rate = getattr(args, "sample_rate", SAMPLE_RATE)
        first_ms, steady_ms = chunk_geometry_ms(self.agent.cfg)
        self.first_segment_size = first_ms
        self.steady_segment_size = steady_ms
        self.speech_segment_size = first_ms
        a, b = getattr(args, "max_len_a", 1), getattr(args, "max_len_b", 0)
        self.max_len = lambda src_units: a * src_units + b

    # -- SimulEval protocol --------------------------------------------------

    def initialize_states(self, states):
        states.session = self.agent.new_session()
        states.pending_samples: List[np.ndarray] = []
        self.speech_segment_size = self.first_segment_size

    def build_states(self, args, client, sentence_id):
        # only called by real simuleval (SpeechStates import lives there)
        from simuleval.states import SpeechStates
        states = SpeechStates(args, client, sentence_id, self)
        self.initialize_states(states)
        return states

    def segment_to_units(self, segment, states):
        """Raw samples pass through as one unit; DSP (kaldi fbank + CMVN)
        happens inside the session's OnlineFbank on READ."""
        samples = np.asarray(segment, np.float32)
        if samples.size == 0:
            return []
        states.pending_samples.append(samples)
        return [samples]

    def update_states_read(self, states):
        if not states.pending_samples and not states.finish_read():
            return
        samples = (np.concatenate(states.pending_samples)
                   if states.pending_samples
                   else np.zeros((0,), np.float32))
        states.pending_samples = []
        states.session.push_audio(samples, finished=states.finish_read())

    def policy(self, states):
        session = states.session
        if not session._got_first:
            if states.finish_read():
                # rare: source ended before one full first chunk
                # (default_agent.py:368-377 calls update_states_read itself)
                self.update_states_read(states)
            else:
                self.speech_segment_size = self.first_segment_size
                return READ_ACTION
        if session.finished:
            return WRITE_ACTION  # drain: predict() emits EOS
        if session.policy() == READ:
            self.speech_segment_size = self.steady_segment_size
            return READ_ACTION
        return WRITE_ACTION

    def predict(self, states):
        session = states.session
        if session.finished:
            return EOS  # drain/terminate (EOS emitted or length cap hit)
        return session.predict()  # None = force-finish trick; else token id

    def units_to_segment(self, unit_queue, states):
        """BPE ids -> whole words (reference :241-301)."""
        units = list(getattr(unit_queue, "value", unit_queue))
        if not units:
            return None
        if units[0] == EOS:
            return DEFAULT_EOS
        if None in units:
            unit_queue.value.remove(None)
            units = [u for u in units if u is not None]
            if not units:
                return None

        src_units = len(states.units.source)
        if (units and units[-1] == EOS) or \
                len(states.units.target) > self.max_len(src_units):
            toks = [self.vocab.symbols[u] for u in units if u != EOS]
            hyp = "".join(toks).replace(BOW_PREFIX, " ").strip()
            return [hyp] + [DEFAULT_EOS]

        segment = []
        for u in units:
            token = self.vocab.symbols[u]
            if token.startswith(BOW_PREFIX):
                if len(segment) == 0:
                    segment.append(token[len(BOW_PREFIX):])
                else:
                    for _ in range(len(segment)):
                        unit_queue.pop()
                    out = ["".join(segment)]
                    if list(getattr(unit_queue, "value", unit_queue))[0] == EOS:
                        out.append(DEFAULT_EOS)
                    return out
            else:
                segment.append(token.replace(BOW_PREFIX, ""))
        return None
