import os

import numpy as np

from simulst_tpu.data import manifest as mf
from simulst_tpu.data.dataset import BatcherConfig, SpeechDataset, make_batches
from simulst_tpu.data.vocab import EOS, PAD, Vocabulary
from simulst_tpu.decode.scoring import corpus_bleu, wer


def test_zip_roundtrip(tmp_path):
    feats = {f"utt{i}": np.random.RandomState(i).randn(10 + i, 4).astype(np.float32)
             for i in range(3)}
    zp = str(tmp_path / "feats.zip")
    specs = mf.create_feature_zip(feats, zp)
    for uid, spec in specs.items():
        back = mf.read_feature(spec)
        np.testing.assert_array_equal(back, feats[uid])


def test_manifest_tsv_roundtrip(tmp_path):
    rows = [{"id": "a", "audio": "x.zip:0:10", "n_frames": "100",
             "src_text": "hello world", "tgt_text": "hallo welt",
             "speaker": "spk1"}]
    p = str(tmp_path / "m.tsv")
    mf.save_tsv(rows, p)
    assert mf.load_tsv(p) == rows


def test_vocab_native_spm_encode_decode():
    # native unigram trainer (data/spm.py): round-trips and covers all chars
    v = Vocabulary.build(["hello world", "world peace"], vocab_size=24)
    ids = v.encode("hello world")
    assert ids[-1] == EOS
    assert v.decode_ids(ids) == "hello world"
    # unknown CHARACTER -> UNK but still decodes the rest
    ids2 = v.encode("hello θ")
    assert 3 in ids2


def test_batcher_static_buckets(tmp_path):
    feats = {f"u{i}": np.random.randn(50 + 37 * i, 8).astype(np.float32)
             for i in range(5)}
    zp = str(tmp_path / "f.zip")
    specs = mf.create_feature_zip(feats, zp)
    rows = [{"id": k, "audio": specs[k], "n_frames": str(feats[k].shape[0]),
             "src_text": "a b", "tgt_text": "x y z", "speaker": "s"}
            for k in feats]
    v = Vocabulary.build(["x y z"], vocab_size=10)
    cfg = BatcherConfig(max_tokens=2000, frame_buckets=(64, 128, 256),
                        token_buckets=(8, 16), shuffle=False, batch_multiple=2)
    ds = SpeechDataset(rows, v, cfg)
    shapes = set()
    total = 0
    for b in make_batches(ds):
        assert b["feats"].shape[1] in (64, 128, 256)
        assert b["target"].shape[1] in (8, 16)
        assert b["feats"].shape[0] % 2 == 0
        assert (b["prev_tokens"][:b["n_real"], 0] == EOS).all()
        shapes.add(b["feats"].shape[1:])
        total += b["n_real"]
    assert total == 5


def test_batcher_tgt_sort_tightens_token_buckets(tmp_path):
    """tgt_sort re-sorts by target length inside each frame-bucket group:
    the example multiset and total frame slots stay intact while total
    token slots shrink on a manifest whose target lengths vary independent
    of frames (the padding-gap residual, docs/perf.md)."""
    rng = np.random.RandomState(0)
    n = 64
    frames = rng.randint(40, 250, n)
    feats = {f"u{i}": np.zeros((int(frames[i]), 4), np.float32)
             for i in range(n)}
    zp = str(tmp_path / "f.zip")
    specs = mf.create_feature_zip(feats, zp)
    texts = [" ".join(["ab"] * int(rng.randint(1, 12))) for _ in range(n)]
    rows = [{"id": f"u{i}", "audio": specs[f"u{i}"],
             "n_frames": str(int(frames[i])), "src_text": texts[i],
             "tgt_text": texts[i], "speaker": "s"} for i in range(n)]
    v = Vocabulary.build(texts, vocab_size=16)

    def run(tgt_sort):
        cfg = BatcherConfig(max_tokens=2000, cmvn="none", shuffle=True,
                            frame_buckets=(64, 128, 256),
                            token_buckets=(4, 8, 12, 16, 24, 32),
                            tgt_sort=tgt_sort, batch_multiple=2)
        ds = SpeechDataset(rows, v, cfg)
        ids, f_slots, t_slots = [], 0, 0
        for b in make_batches(ds, num_shards=1, shard_id=0):
            ids += b["ids"]
            f_slots += b["feats"].shape[0] * b["feats"].shape[1]
            t_slots += b["target"].shape[0] * b["target"].shape[1]
        return sorted(ids), f_slots, t_slots

    ids0, f0, t0 = run(False)
    ids1, f1, t1 = run(True)
    assert ids0 == ids1 == sorted(f"u{i}" for i in range(n))
    assert t1 < t0          # tighter token buckets
    assert f1 <= f0 * 1.05  # frame slots essentially unchanged


def test_batcher_multiple_carry_and_batch_list_shuffle(tmp_path):
    """Batches form on the fully sorted order with cuts on batch_multiple
    boundaries (remainders carried forward), and epochs shuffle the BATCH
    LIST: compositions are epoch-invariant, order is not, zero-row padding
    appears only where a batch is smaller than the multiple."""
    rng = np.random.RandomState(7)
    n = 120
    frames = rng.randint(40, 400, n)
    feats = {f"u{i}": np.zeros((int(frames[i]), 4), np.float32)
             for i in range(n)}
    zp = str(tmp_path / "f.zip")
    specs = mf.create_feature_zip(feats, zp)
    texts = [" ".join(["ab"] * int(rng.randint(1, 10))) for _ in range(n)]
    rows = [{"id": f"u{i}", "audio": specs[f"u{i}"],
             "n_frames": str(int(frames[i])), "src_text": texts[i],
             "tgt_text": texts[i], "speaker": "s"} for i in range(n)]
    v = Vocabulary.build(texts, vocab_size=16)
    m = 4
    cfg = BatcherConfig(max_tokens=3000, cmvn="none", shuffle=True,
                        frame_buckets=(64, 128, 256, 512),
                        token_buckets=(8, 16, 32), batch_multiple=m)
    ds = SpeechDataset(rows, v, cfg)

    def epoch_batches(epoch):
        return [tuple(b["ids"]) + (b["n_real"], b["feats"].shape[0])
                for b in make_batches(ds, epoch=epoch)]

    e0, e1 = epoch_batches(0), epoch_batches(1)
    # same batch compositions, different order across epochs
    assert sorted(e0) == sorted(e1) and e0 != e1
    all_ids = [i for b in e0 for i in b[:-2]]
    assert sorted(all_ids) == sorted(f"u{i}" for i in range(n))
    # multiple-carry: any batch with more than m real rows is an exact
    # multiple of m (so its padded size == its real size: no zero rows)
    for b in e0:
        n_real, padded = b[-2], b[-1]
        if n_real > m:
            assert n_real % m == 0 and padded == n_real, b
        else:
            assert padded == m


def test_wer_and_bleu():
    refs = ["the cat sat on the mat", "hello world"]
    assert wer(refs, refs) == 0.0
    assert wer(["a b c"], ["a x c"]) == 100.0 / 3
    assert corpus_bleu(refs, refs) > 99.0


def test_mtl_src_targets(tmp_path):
    from simulst_tpu.data.dataset import SpeechDataset, make_batches
    feats = {"u0": np.random.randn(40, 8).astype(np.float32)}
    zp = str(tmp_path / "m.zip")
    specs = mf.create_feature_zip(feats, zp)
    rows = [{"id": "u0", "audio": specs["u0"], "n_frames": "40",
             "src_text": "a b c", "tgt_text": "x y", "speaker": "s"}]
    v = Vocabulary.build(["a b c", "x y"], vocab_size=12)
    cfg = BatcherConfig(max_tokens=1000, shuffle=False, batch_multiple=1,
                        frame_buckets=(64,), token_buckets=(8,))
    ds = SpeechDataset(rows, v, cfg, "tgt_text", mtl_src=True)
    batch = next(make_batches(ds))
    assert "src_target" in batch
    assert batch["src_target"].shape[0] == batch["target"].shape[0]
    # src_target/target are the encoded texts + eos (segmentation-agnostic)
    assert (batch["src_target"][0] != PAD).sum() == len(v.encode("a b c"))
    assert (batch["target"][0] != PAD).sum() == len(v.encode("x y"))


def test_native_loader_matches_python_path(tmp_path):
    """C++ batched zip loader (native/dataloader.cpp) == per-example numpy
    path, for utterance/global/none CMVN."""
    from simulst_tpu.data import native
    from simulst_tpu.data.dataset import BatcherConfig, SpeechDataset, _collate
    if not native.loader_available():
        import pytest
        pytest.skip("native toolchain unavailable")

    rng = np.random.RandomState(3)
    feats = {f"u{i}": (rng.randn(20 + 9 * i, 8) * (1 + i)).astype(np.float32)
             for i in range(4)}
    zp = str(tmp_path / "f.zip")
    specs = mf.create_feature_zip(feats, zp)
    rows = [{"id": k, "audio": specs[k], "n_frames": str(v.shape[0]),
             "src_text": "a b", "tgt_text": "x", "speaker": "s"}
            for k, v in feats.items()]
    v = Vocabulary.build(["a b", "x"], vocab_size=16)
    stats = {"mean": np.full((8,), 0.5, np.float32),
             "std": np.full((8,), 2.0, np.float32)}

    for cmvn in ("utterance", "global", "none"):
        cfg = BatcherConfig(max_tokens=10000, shuffle=False, batch_multiple=1,
                            frame_buckets=(64,), token_buckets=(8,), cmvn=cmvn)
        ds = SpeechDataset(rows, v, cfg, "tgt_text", global_stats=stats)
        nat = _collate(ds, list(range(4)), cfg)
        # force the python fallback by monkeying the native loader off
        import simulst_tpu.data.native as nmod
        orig = nmod.load_feature_batch
        nmod.load_feature_batch = lambda *a, **k: None
        try:
            py = _collate(ds, list(range(4)), cfg)
        finally:
            nmod.load_feature_batch = orig
        np.testing.assert_array_equal(nat["feat_lengths"], py["feat_lengths"])
        np.testing.assert_allclose(nat["feats"], py["feats"], atol=1e-5,
                                   rtol=1e-5, err_msg=cmvn)
