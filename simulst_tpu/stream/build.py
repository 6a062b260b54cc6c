"""Shared agent construction: checkpoint -> model -> streaming agent.

Used by both `cli/stream_eval.py` (the built-in evaluator) and
`stream/simuleval_agent.py` (the SimulEval SpeechAgent adapter), mirroring the
reference's load_model_vocab plumbing
(/root/reference/codebase/agents/default_agent.py:194-231).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from simulst_tpu import config as cfglib
from simulst_tpu.data.vocab import Vocabulary
from simulst_tpu.models import get_model
from simulst_tpu.stream.agents import (AgentConfig, CIFAgent, MMAAgent,
                                       SpeechAgent, TransducerAgent)
from simulst_tpu.train.checkpoint import load_checkpoint


def load_vocab(path: str) -> Vocabulary:
    return (Vocabulary.from_spm(path) if path.endswith(".model")
            else Vocabulary.from_txt(path))


def auto_buffer_sizes(cfg, max_samples: int, sample_rate: int = 16000):
    """(max_src_frames, max_tgt_len) sized to the longest utterance.

    The reference's agents grow encoder state unboundedly
    (default_agent.py:76-94 TensorListEntry); our static-shape buffers must
    instead be sized upfront — this picks a capacity that fits `max_samples`
    of audio (e.g. the 60s robustness splits, seg_mustc_data.py:26-104) with
    one extra segment of slack, rounded up to 128 post-subsample frames."""
    n_fbank = max_samples // (sample_rate // 100) + 2   # 10ms shift
    frames = (-(-n_fbank // cfg.stride)
              + cfg.segment_length // cfg.stride + 8)
    frames = max(1024, -(-frames // 128) * 128)
    # ~1 token per 2 encoder frames is far above real BPE emission rates
    tgt = max(256, min(2048, -(-(frames // 2) // 64) * 64))
    return frames, tgt


def build_agent(checkpoint: str, vocab: Vocabulary, agent_type: str = "mma",
                model_name: Optional[str] = None, overrides=None,
                waitk: Optional[int] = None, cif_beta: Optional[float] = None,
                overshoot_weight: float = 1.0,
                global_cmvn_path: Optional[str] = None, fused: bool = False,
                max_src_frames: Optional[int] = None,
                max_tgt_len: Optional[int] = None,
                warn=print) -> SpeechAgent:
    """Restore a checkpoint and wire the matching streaming agent.

    `overrides` are model-config overrides applied on top of the checkpoint's
    stamped config (the reference's --model-overrides,
    default_agent.py:136-137,201-205); `cif_beta` is the CIF test-time
    recalibration knob (cif_agent.py:207-209)."""
    restored, meta = load_checkpoint(checkpoint)
    default_model = {"cif": "cif", "transducer": "transducer"}.get(
        agent_type, "mma")
    name = model_name or (meta or {}).get("model", default_model)
    model_cls = get_model(name)
    overrides = dict(overrides or {})
    if waitk is not None:
        overrides["waitk_testtime"] = waitk
    base = ((meta or {}).get("config") or {})
    mcfg = cfglib.from_dict(model_cls.Config,
                            {**base, **overrides, "vocab_size": len(vocab)})
    model = model_cls(mcfg)

    gcmvn = None
    if global_cmvn_path:
        stats = np.load(global_cmvn_path)
        gcmvn = (stats["mean"], stats["std"])
    trained_cmvn = (meta or {}).get("cmvn")
    if trained_cmvn == "global" and gcmvn is None:
        warn("WARNING: checkpoint was trained with GLOBAL CMVN but no "
             "global-cmvn stats were given — the agent will feed "
             "un-normalized features and quality will collapse.")
    elif trained_cmvn == "utterance":
        warn("WARNING: checkpoint was trained with UTTERANCE CMVN, which a "
             "streaming agent cannot reproduce (the future is unknown). "
             "Retrain with --cmvn global and pass global CMVN stats here.")

    sizes = {}
    if max_src_frames is not None:
        sizes["max_src_frames"] = max_src_frames
    if max_tgt_len is not None:
        sizes["max_tgt_len"] = max_tgt_len
    acfg = AgentConfig(overshoot_weight=overshoot_weight, **sizes)
    if agent_type in ("mma", "waitk"):
        return MMAAgent(model, restored, vocab, acfg, global_cmvn=gcmvn,
                        fused=fused)
    if agent_type == "transducer":
        return TransducerAgent(model, restored, vocab, acfg,
                               global_cmvn=gcmvn, fused=fused)
    return CIFAgent(model, restored, vocab, acfg, cif_beta=cif_beta,
                    global_cmvn=gcmvn, fused=fused)
