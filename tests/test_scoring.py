"""Fallback BLEU (summable-stats path) must match sacrebleu exactly.

The summable stats mirror the reference's distributed ngram-count reduction
(/root/reference/codebase/tasks/speech_to_text_infer.py:219-261); the
closed-form scorer mirrors sacrebleu's compute_bleu with the default 'exp'
smoothing, so the fallback engaging never skews scores.
"""
import numpy as np
import pytest

sacrebleu = pytest.importorskip("sacrebleu")

from simulst_tpu.decode.scoring import bleu_from_stats, bleu_stats, wer

WORDS = ["the", "cat", "sat", "on", "mat", "a", "dog", "ran", "fast", "home"]


def _random_corpus(rng, n, lo, hi):
    refs, hyps = [], []
    for _ in range(n):
        r = [WORDS[rng.randint(len(WORDS))] for _ in range(rng.randint(lo, hi))]
        h = [w if rng.rand() > 0.3 else WORDS[rng.randint(len(WORDS))]
             for w in r]
        if rng.rand() < 0.3:
            h = h[:max(1, len(h) - 2)]
        refs.append(" ".join(r))
        hyps.append(" ".join(h))
    return refs, hyps


@pytest.mark.parametrize("seed,lo,hi", [(0, 5, 15), (1, 5, 15), (2, 1, 4),
                                        (3, 2, 6), (4, 10, 30)])
def test_fallback_matches_sacrebleu(seed, lo, hi):
    rng = np.random.RandomState(seed)
    refs, hyps = _random_corpus(rng, 12, lo, hi)
    want = sacrebleu.corpus_bleu(hyps, [refs]).score
    got = bleu_from_stats(*bleu_stats(refs, hyps))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_fallback_zero_count_smoothing_matches():
    # no 3/4-gram matches at all -> exercises the exp-smoothing branch
    refs = ["the cat sat on the mat", "a dog ran home"]
    hyps = ["cat the on sat mat the", "dog a home ran"]
    want = sacrebleu.corpus_bleu(hyps, [refs]).score
    got = bleu_from_stats(*bleu_stats(refs, hyps))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_fallback_degenerate_short_hyps():
    # corpus-wide hyp length < 4 words: sacrebleu scores ~0 (my_log of a
    # zero precision); fallback must agree, not crash
    refs = ["the cat sat", "a dog"]
    hyps = ["the", "a"]
    want = sacrebleu.corpus_bleu(hyps, [refs]).score
    got = bleu_from_stats(*bleu_stats(refs, hyps))
    assert got < 1e-6 and want < 1e-6


def test_wer_basic():
    assert wer(["a b c"], ["a b c"]) == 0.0
    assert wer(["a b c"], ["a x c"]) == pytest.approx(100.0 / 3)
