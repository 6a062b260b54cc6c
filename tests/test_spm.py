"""Native SentencePiece: proto IO, Viterbi segmentation, unigram training.

Replaces the sentencepiece package (absent in this image) for both reading
the reference's released `.model` files and training fresh vocabs
(reference gen_vocab, DATA/data_utils.py:26-70).
"""
import math

import numpy as np
import pytest

from simulst_tpu.data import spm
from simulst_tpu.data.vocab import SPECIALS, Vocabulary


def test_model_proto_roundtrip(tmp_path):
    pieces = [("<s>", 0.0, spm.CONTROL), ("<pad>", 0.0, spm.CONTROL),
              ("</s>", 0.0, spm.CONTROL), ("<unk>", 0.0, spm.UNKNOWN),
              ("(Applause)", 0.0, spm.USER_DEFINED),
              ("▁the", -2.5, spm.NORMAL), ("▁a", -3.25, spm.NORMAL),
              ("t", -7.125, spm.NORMAL), ("ü", -8.0, spm.NORMAL)]
    path = str(tmp_path / "m.model")
    spm.save_model(path, pieces)
    got = spm.load_model(path)
    assert [(p, t) for p, _, t in got] == [(p, t) for p, _, t in pieces]
    np.testing.assert_allclose([s for _, s, _ in got],
                               [s for _, s, _ in pieces], rtol=1e-6)


def test_viterbi_prefers_high_score_merge():
    pieces = [("<unk>", 0.0, spm.UNKNOWN),
              ("▁", -4.0, spm.NORMAL),
              ("a", -4.0, spm.NORMAL), ("b", -4.0, spm.NORMAL),
              ("▁ab", -3.0, spm.NORMAL)]
    m = spm.UnigramModel(pieces)
    # "▁ab" (-3) beats "▁"+"a"+"b" (-12)
    assert m.encode("ab") == ["▁ab"]
    # unknown char falls back to a single-char piece mapped to unk id
    out = m.encode("az")
    assert out[-1] == "z"
    assert m.piece_to_id("z") == 0  # index of <unk> in this piece list


def test_viterbi_whitespace_and_normalization():
    pieces = [("<unk>", 0.0, spm.UNKNOWN), ("▁", -5.0, spm.NORMAL),
              ("▁hi", -2.0, spm.NORMAL), ("▁yo", -2.0, spm.NORMAL)]
    m = spm.UnigramModel(pieces)
    assert m.encode("hi   yo") == ["▁hi", "▁yo"]   # collapse + dummy prefix


def test_train_unigram_learns_frequent_words(tmp_path):
    corpus = ["the cat sat on the mat", "the cat ate the fish",
              "a cat and a mat", "the fish sat"] * 30
    pieces = spm.train_unigram(corpus, vocab_size=40)
    assert pieces[0][0] == "<s>" and pieces[3][0] == "<unk>"
    learned = [p for p, _, t in pieces if t == spm.NORMAL]
    assert len(pieces) <= 40
    # frequent whole words should surface as single pieces
    assert "▁the" in learned and "▁cat" in learned
    # every character is covered (coverage 1.0): encoding never hits unk
    m = spm.UnigramModel(pieces)
    for text in corpus[:4]:
        ids = m.encode(text, out_type=int)
        assert m.unk_id not in ids
        got = "".join(m.id_to_piece(i) for i in ids).replace(spm.BOW, " ")
        assert got.strip() == text


def test_vocabulary_build_and_reload_native(tmp_path):
    corpus = ["hello world", "hello there world", "worlds collide"] * 20
    prefix = str(tmp_path / "spm_unigram32_st")
    v = Vocabulary.build(corpus, vocab_size=32, save_prefix=prefix)
    assert v.symbols[:4] == SPECIALS
    # .model reloads through from_spm without sentencepiece
    v2 = Vocabulary.from_spm(prefix + ".model")
    assert v2.symbols == v.symbols
    ids = v2.encode("hello world")
    assert ids[-1] == 2  # EOS appended
    assert v2.decode_ids(ids) == "hello world"
    # .txt side-channel written in fairseq format
    v3 = Vocabulary.from_txt(prefix + ".txt")
    assert v3.symbols == v.symbols


def test_user_defined_symbols_pinned_after_specials():
    corpus = ["x (Applause) y"] * 10
    pieces = spm.train_unigram(corpus, vocab_size=24,
                               user_defined=["(Applause)"])
    assert pieces[4] == ("(Applause)", 0.0, spm.USER_DEFINED)
