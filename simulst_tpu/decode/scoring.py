"""Corpus scoring: WER + BLEU.

Native replacement for the fairseq scorers used by the reference's tasks
(/root/reference/codebase/tasks/speech_to_text_infer.py:162-289): WER as
word-level edit distance with summable error/length counts, BLEU via
sacrebleu when available with summable ngram statistics for distributed
reduction (psum of the count vectors).
"""
from __future__ import annotations

from collections import Counter
from typing import List, Sequence, Tuple

import numpy as np


def edit_distance(ref: Sequence[str], hyp: Sequence[str]) -> int:
    m, n = len(ref), len(hyp)
    dp = np.arange(n + 1)
    for i in range(1, m + 1):
        prev = dp.copy()
        dp[0] = i
        for j in range(1, n + 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                        prev[j - 1] + (ref[i - 1] != hyp[j - 1]))
    return int(dp[n])


def wer_counts(refs: List[str], hyps: List[str]) -> Tuple[int, int]:
    """Returns (errors, ref_words) — summable across workers."""
    err = sum(edit_distance(r.split(), h.split()) for r, h in zip(refs, hyps))
    total = sum(len(r.split()) for r in refs)
    return err, total


def wer(refs: List[str], hyps: List[str]) -> float:
    e, t = wer_counts(refs, hyps)
    return 100.0 * e / max(t, 1)


def bleu_stats(refs: List[str], hyps: List[str], order: int = 4):
    """Summable corpus BLEU sufficient statistics:
    (counts[4], totals[4], sys_len, ref_len) — mirrors the reference's
    distributed ngram-count reduction (speech_to_text_infer.py:219-261)."""
    counts = np.zeros(order, np.int64)
    totals = np.zeros(order, np.int64)
    sys_len = ref_len = 0
    for r, h in zip(refs, hyps):
        rw, hw = r.split(), h.split()
        sys_len += len(hw)
        ref_len += len(rw)
        for n in range(1, order + 1):
            hn = Counter(tuple(hw[i:i + n]) for i in range(len(hw) - n + 1))
            rn = Counter(tuple(rw[i:i + n]) for i in range(len(rw) - n + 1))
            counts[n - 1] += sum(min(c, rn[g]) for g, c in hn.items())
            totals[n - 1] += max(len(hw) - n + 1, 0)
    return counts, totals, sys_len, ref_len


def bleu_from_stats(counts, totals, sys_len, ref_len, smooth: str = "exp"):
    """BLEU from summable stats, matching sacrebleu's compute_bleu with its
    default smooth_method='exp' (mteval-style: each zero-count order doubles
    an accumulator m and scores 1/(m * total))."""
    import math
    precisions = []
    smooth_mteval = 1.0
    for n in range(4):
        c, t = int(counts[n]), int(totals[n])
        if t == 0:
            # sacrebleu leaves the precision at 0 (my_log -> -inf): score 0
            return 0.0
        if c == 0:
            if smooth != "exp":
                return 0.0
            smooth_mteval *= 2.0
            precisions.append(1.0 / (smooth_mteval * t))
        else:
            precisions.append(c / t)
    log_p = sum(math.log(p) for p in precisions) / 4
    bp = 1.0 if sys_len > ref_len else (
        math.exp(1 - ref_len / sys_len) if sys_len > 0 else 0.0)
    return 100.0 * bp * math.exp(log_p)


def corpus_bleu(refs: List[str], hyps: List[str]) -> float:
    try:
        import sacrebleu
        return sacrebleu.corpus_bleu(hyps, [refs]).score
    except ImportError:
        return bleu_from_stats(*bleu_stats(refs, hyps))
