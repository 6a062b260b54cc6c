"""Streaming evaluator: local SimulEval equivalent.

The reference delegates streaming evaluation to the external SimulEval
server/client (/root/reference/eval/1-simuleval.sh); this module implements
the same READ/WRITE protocol, word-level delay bookkeeping (a word's delay =
ms of source consumed when the word is COMMITTED, i.e. when the next
word-initial unit arrives — mirroring the agents' units_to_segment BPE merge,
default_agent.py:248-301), BLEU, and the AL/AP/DAL latency metrics incl.
computation-aware (_CA) variants from wall-clock timestamps.
"""
from __future__ import annotations

import dataclasses
import json
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from simulst_tpu.data.vocab import EOS
from simulst_tpu.decode.scoring import corpus_bleu
from simulst_tpu.stream.agents import READ, WRITE, BOW_PREFIX

SAMPLE_RATE = 16000


def _latency(delays: List[float], src_ms: float, tgt_len: int, kind: str):
    if not delays:
        return 0.0
    d = np.asarray(delays, np.float64)
    n = len(d)
    if kind == "AP":
        return float(d.sum() / (src_ms * n))
    gamma = n / src_ms
    idx = np.arange(n)
    if kind == "AL":
        reached = d >= src_ms
        tau = int(np.argmax(reached)) if reached.any() else n - 1
        lag = d[: tau + 1] - idx[: tau + 1] / gamma
        return float(lag.mean())
    if kind == "DAL":
        g = np.maximum.accumulate(d - idx / gamma) + idx / gamma
        return float((g - idx / gamma).mean())
    raise ValueError(kind)


@dataclasses.dataclass
class Instance:
    index: int
    prediction: str
    reference: str
    delays: List[float]
    elapsed: List[float]
    source_length_ms: float

    def metrics(self) -> Dict[str, float]:
        n = max(len(self.delays), 1)
        out = {}
        for kind in ("AL", "AP", "DAL"):
            out[kind] = _latency(self.delays, self.source_length_ms, n, kind)
            out[kind + "_CA"] = _latency(self.elapsed, self.source_length_ms,
                                         n, kind)
        return out


def run_session(agent, waveform: np.ndarray, max_actions: int = 10000
                ) -> Tuple[List[str], List[float], List[float]]:
    """Drive one utterance; returns (words, delays_ms, elapsed_ms)."""
    session = agent.new_session()
    if hasattr(session, "process_chunk"):
        return _run_fused(agent, session, waveform)
    total = len(waveform)
    consumed = 0
    words, delays, elapsed = [], [], []
    unit_buf: List[str] = []
    t0 = time.perf_counter()
    force_read = False

    def flush_word():
        if unit_buf:
            w = "".join(unit_buf).replace(BOW_PREFIX, "").strip()
            if w:
                words.append(w)
                delays.append(consumed / SAMPLE_RATE * 1000.0)
                elapsed.append((time.perf_counter() - t0) * 1000.0
                               + consumed / SAMPLE_RATE * 1000.0)
            unit_buf.clear()

    for _ in range(max_actions):
        if session.finished:
            break
        action = READ if force_read else session.policy()
        force_read = False
        if action == READ:
            if session.finished_read:
                # nothing left to read; avoid a livelock
                if session.policy() == READ:
                    break
                continue
            n = int(session.next_chunk_ms / 1000.0 * SAMPLE_RATE)
            chunk = waveform[consumed: consumed + n]
            consumed = min(consumed + n, total)
            session.push_audio(chunk, finished=consumed >= total)
        else:
            tok = session.predict()
            if tok is None:
                force_read = True
                continue
            if tok == EOS:
                break
            piece = agent.vocab.symbols[tok]
            if piece.startswith(BOW_PREFIX) and unit_buf:
                flush_word()
            unit_buf.append(piece)
    flush_word()
    return words, delays, elapsed


def _run_fused(agent, session, waveform: np.ndarray):
    """Chunk-level driver for fused device-side sessions: one call per chunk,
    word/delay bookkeeping identical to the step-wise protocol (tokens are
    committed at the chunk on which they were emitted)."""
    total = len(waveform)
    consumed = 0
    words, delays, elapsed = [], [], []
    unit_buf: List[str] = []
    t0 = time.perf_counter()

    def flush_word():
        if unit_buf:
            w = "".join(unit_buf).replace(BOW_PREFIX, "").strip()
            if w:
                words.append(w)
                delays.append(consumed / SAMPLE_RATE * 1000.0)
                elapsed.append((time.perf_counter() - t0) * 1000.0
                               + consumed / SAMPLE_RATE * 1000.0)
            unit_buf.clear()

    while consumed < total and not session.finished:
        n = int(session.next_chunk_ms / 1000.0 * SAMPLE_RATE)
        chunk = waveform[consumed: consumed + n]
        consumed = min(consumed + n, total)
        new_tokens = session.process_chunk(chunk, finished=consumed >= total)
        for tok in new_tokens:
            if tok == EOS:
                break
            piece = agent.vocab.symbols[tok]
            if piece.startswith(BOW_PREFIX) and unit_buf:
                flush_word()
            unit_buf.append(piece)
    flush_word()
    return words, delays, elapsed


def evaluate(agent, utterances, references: Optional[List[str]] = None,
             log_path: Optional[str] = None) -> Dict[str, float]:
    """utterances: list of waveforms (float [-1,1]); returns scores dict
    (BLEU + mean latency metrics), mirroring SimulEval's `scores` json."""
    instances = []
    for i, wav in enumerate(utterances):
        words, delays, elapsed = run_session(agent, np.asarray(wav))
        ref = references[i] if references else ""
        instances.append(Instance(index=i, prediction=" ".join(words),
                                  reference=ref, delays=delays,
                                  elapsed=elapsed,
                                  source_length_ms=len(wav) / SAMPLE_RATE * 1e3))
    scores: Dict[str, float] = {}
    if references:
        scores["BLEU"] = corpus_bleu([x.reference for x in instances],
                                     [x.prediction for x in instances])
    for kind in ("AL", "AL_CA", "AP", "AP_CA", "DAL", "DAL_CA"):
        vals = [inst.metrics()[kind] for inst in instances if inst.delays]
        scores[kind] = float(np.mean(vals)) if vals else 0.0
    if log_path:
        with open(log_path, "w") as f:
            for inst in instances:
                f.write(json.dumps(dataclasses.asdict(inst)) + "\n")
    return scores
