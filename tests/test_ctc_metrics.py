"""CTC greedy recall/precision/F1 training metrics.

Formula-matched to the reference's calc_recall_precision
(/root/reference/codebase/criterion/joint_ctc_criterion.py:24-48): bag-of-
tokens min-count match over the full vocab, recall over non-pad target
tokens, precision over non-blank predicted frames. The brute-force oracle
here replicates those semantics with collections.Counter.
"""
import collections

import numpy as np

from simulst_tpu.losses.joint_ctc import (
    JointCTCConfig, ctc_greedy_recall_precision)
from simulst_tpu.train.loop import summarize_metrics

CFG = JointCTCConfig()  # blank=0, pad=1, eos=2


def _oracle(pred, target, eps=1e-8):
    rec = prec = 0.0
    for p_row, t_row in zip(pred, target):
        cp, ct = collections.Counter(p_row.tolist()), collections.Counter(t_row.tolist())
        match = sum(min(cp[k], ct[k]) for k in set(cp) | set(ct))
        rec += match / (int((t_row != CFG.padding_idx).sum()) + eps)
        prec += match / (int((p_row != CFG.blank_idx).sum()) + eps)
    return rec, prec


def test_hand_example():
    pred = np.array([[0, 5, 5, 6, 1]], np.int32)
    target = np.array([[5, 6, 2, 1, 1]], np.int32)
    r, p = ctc_greedy_recall_precision(pred, target, 12, CFG)
    # match = {5:1, 6:1, pad:1} = 3; 3 non-pad targets; 4 non-blank preds
    assert abs(float(r) - 1.0) < 1e-6
    assert abs(float(p) - 0.75) < 1e-6


def test_matches_reference_semantics_random():
    rng = np.random.RandomState(0)
    pred = rng.randint(0, 12, size=(8, 37)).astype(np.int32)
    target = rng.randint(3, 12, size=(8, 11)).astype(np.int32)
    # right-pad targets like real batches (eos then pad)
    for i in range(8):
        n = rng.randint(1, 10)
        target[i, n] = CFG.eos_idx
        target[i, n + 1:] = CFG.padding_idx
    r, p = ctc_greedy_recall_precision(pred, target, 12, CFG)
    r0, p0 = _oracle(pred, target)
    np.testing.assert_allclose(float(r), r0, rtol=1e-6)
    np.testing.assert_allclose(float(p), p0, rtol=1e-6)


def test_summarize_metrics_f1():
    m = {"loss": 10.0, "sample_size": 5, "ntokens": 5, "nsentences": 2,
         "nll_loss": 8.0, "ctc_loss": 4.0, "blank_rate": 1.0,
         "ctc_recall": 1.6, "ctc_precision": 1.2}
    out = summarize_metrics(m)
    assert abs(out["ctc_recall"] - 0.8) < 1e-9
    assert abs(out["ctc_precision"] - 0.6) < 1e-9
    assert abs(out["ctc_f1"] - round(2 * 0.8 * 0.6 / 1.4, 3)) < 1e-9
    assert abs(out["ctc_loss"] - 0.8) < 1e-9
    assert abs(out["nll_loss"] - 1.6) < 1e-9
    # F1 of zero-signal metrics is defined as 0
    z = summarize_metrics({"nsentences": 2, "ctc_recall": 0.0,
                           "ctc_precision": 0.0, "sample_size": 1})
    assert z["ctc_f1"] == 0.0
