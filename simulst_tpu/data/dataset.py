"""Dataset + static-shape bucketing batcher.

The reference relies on fairseq's Cython bucketing (SURVEY.md §2.5, "not
replicated — superseded by XLA; batch bucketing reimplemented host-side").
TPU-first twist: batch SHAPES are quantized to a small fixed set of
(frame, token) buckets so the jitted train step compiles once per bucket
instead of once per batch.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from simulst_tpu.data.features import global_cmvn, utterance_cmvn
from simulst_tpu.data.manifest import read_feature
from simulst_tpu.data.vocab import EOS, PAD, Vocabulary


@dataclasses.dataclass
class BatcherConfig:
    max_tokens: int = 40000          # frames per batch (fairseq --max-tokens)
    max_sentences: Optional[int] = None
    # every bucket's post-subsample length is a multiple of the Emformer
    # segment (16), so the grouped-attention fast path always applies
    # (64 raw frames = segment 16 x stride 4 is therefore the finest legal
    # step); 3072 covers the manifest filter's 3000-frame maximum.  The
    # ladders are FINE by default — the measured padding lever (docs/
    # perf.md, exp/probe_tgt_sort.py + bench_batcher_eff on a MuST-C-shaped
    # manifest): step-64 frame buckets + step-8 token buckets + tgt_sort +
    # batch-list shuffle + multiple-of-8 carry lift the whole-epoch
    # useful/slot FLOP ratio from 0.80 (coarse ladder, block shuffle,
    # zero-row padding) to 0.915, i.e. epoch-effective MFU 28.3 -> 32.5 %
    # at the bench headline's device MFU.  Cost: more distinct
    # (frame, token) shapes to compile — 36 realized over this manifest vs
    # 31 at step 128, one jit each, amortized by the persistent compile
    # cache; coarsen for quick runs where compile time dominates.
    frame_buckets: Sequence[int] = tuple(range(64, 2048 + 1, 64)) + \
        (2560, 3072)
    token_buckets: Sequence[int] = tuple(range(8, 128 + 1, 8))
    cmvn: str = "utterance"          # "utterance" | "global" | "none"
    shuffle: bool = True
    seed: int = 1
    batch_multiple: int = 8          # pad batch size for even device sharding
    # secondary sort by target length WITHIN each frame-bucket group: every
    # example in a group pads to the same frame bucket no matter the order,
    # so reordering there leaves frame slots invariant while making each
    # batch's token bucket tight (targets otherwise spread ~0.6U..U per
    # batch because sorting is by frames only — the measured residual of
    # the padding gap, docs/perf.md "Sequence packing").  Measured on a
    # MuST-C-shaped manifest (exp/probe_tgt_sort.py, bench_batcher_eff):
    # token fill 0.74 -> 0.82 under the production ladders; frame slots
    # per group are order-invariant.
    tgt_sort: bool = True


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def move_eos_to_begin(tokens: List[int]) -> List[int]:
    """prev_output_tokens construction (fairseq convention; reference
    tasks/speech_to_text_infer.py:23-42)."""
    assert tokens[-1] == EOS
    return [EOS] + tokens[:-1]


class SpeechDataset:
    """Loads manifest rows into (features, target ids)."""

    def __init__(self, rows: List[Dict[str, str]], vocab: Vocabulary,
                 cfg: BatcherConfig, target_field: str = "tgt_text",
                 global_stats=None, mtl_src: bool = False):
        """mtl_src: also emit transcript token targets (`src_target`) so a
        criterion can put CTC on transcripts while CE trains on translations
        (the reference's --do-mtl keeps src_txt_tokens in the sample,
        tasks/speech_to_text_infer.py:63-111)."""
        self.rows = rows
        self.vocab = vocab
        self.cfg = cfg
        self.target_field = target_field
        self.global_stats = global_stats
        self.mtl_src = mtl_src
        self._feat_dim = None

    def __len__(self):
        return len(self.rows)

    def feat_dim(self) -> int:
        if self._feat_dim is None:
            self._feat_dim = read_feature(self.rows[0]["audio"]).shape[1]
        return self._feat_dim

    def example(self, i: int):
        r = self.rows[i]
        feats = read_feature(r["audio"])
        if self.cfg.cmvn == "utterance":
            feats = utterance_cmvn(feats)
        elif self.cfg.cmvn == "global" and self.global_stats is not None:
            feats = global_cmvn(feats, self.global_stats)
        target = self.vocab.encode(r[self.target_field], append_eos=True)
        src = (self.vocab.encode(r["src_text"], append_eos=True)
               if self.mtl_src else None)
        return feats, np.asarray(target, np.int32), r["id"], src


def make_batches(dataset: SpeechDataset, cfg: Optional[BatcherConfig] = None,
                 epoch: int = 0, num_shards: Optional[int] = None,
                 shard_id: Optional[int] = None
                 ) -> Iterator[Dict[str, np.ndarray]]:
    """Yields padded batches with bucketed static shapes:
    feats (B, Tb, F), feat_lengths, target (B, Lb) [with EOS], prev_tokens,
    ids.  Multi-host runs shard the manifest by process (mirroring the
    reference's distributed eval sharding, eval/generate.py:151-152)."""
    cfg = cfg or dataset.cfg
    if num_shards is None:
        import jax
        num_shards, shard_id = jax.process_count(), jax.process_index()
    order = np.argsort([int(r["n_frames"]) for r in dataset.rows])
    if num_shards > 1:
        order = order[shard_id::num_shards]
    if cfg.tgt_sort and len(order):
        # character length is a monotone-enough proxy for SPM token count;
        # lexsort is stable, so equal-length targets keep the frame order
        tlen = np.asarray([len(dataset.rows[i].get(dataset.target_field, ""))
                           for i in order])
        fbuck = np.asarray([_bucket(int(dataset.rows[i]["n_frames"]),
                                    cfg.frame_buckets) for i in order])
        order = order[np.lexsort((tlen, fbuck))]
    # batches form on the FULLY SORTED order and the BATCH LIST is shuffled
    # per epoch (fairseq's batch_by_size + epoch batch shuffle semantics):
    # within-batch examples stay length-adjacent regardless of the epoch,
    # unlike shuffling pre-batch blocks, whose boundaries mixed far-apart
    # buckets into one batch (a measured ~1.5 MFU-point fill loss on a
    # MuST-C-shaped manifest, exp/probe_tgt_sort.py)
    batches, batch, max_f = [], [], 0
    for i in order:
        n = int(dataset.rows[i]["n_frames"])
        nf = max(max_f, n)
        if batch and (nf * (len(batch) + 1) > cfg.max_tokens or
                      (cfg.max_sentences and len(batch) >= cfg.max_sentences)):
            # cut at a batch_multiple boundary, carrying the remainder into
            # the next batch (fairseq's required_batch_size_multiple
            # semantics) — zero-row padding was a measured 5.9 % of an
            # epoch's frame slots; carried examples are length-adjacent so
            # bucket inflation is ~nil
            m = cfg.batch_multiple
            keep = len(batch) % m if len(batch) > m else 0
            batches.append(batch[:len(batch) - keep])
            batch = batch[len(batch) - keep:]
            max_f = max((int(dataset.rows[j]["n_frames"]) for j in batch),
                        default=0)
        batch.append(i)
        max_f = max(max_f, n)
    if batch:
        batches.append(batch)
    if cfg.shuffle:
        np.random.RandomState(cfg.seed + epoch).shuffle(batches)
    for batch in batches:
        yield _collate(dataset, batch, cfg)


def _load_feats(dataset: SpeechDataset, rows, feats, cfg: BatcherConfig):
    """Fill feats[:len(rows)] + return per-example lengths.  Hot host path:
    tries the threaded C++ loader (native/dataloader.cpp: zip-member npy
    read + CMVN in one call per batch), falling back to per-example numpy."""
    bsz = len(rows)
    tb = feats.shape[1]
    lengths = np.zeros((feats.shape[0],), np.int32)
    mode = cfg.cmvn
    if mode == "global" and dataset.global_stats is None:
        mode = "none"
    from simulst_tpu.data import native
    got = native.load_feature_batch([r["audio"] for r in rows], feats[:bsz],
                                    cmvn=mode,
                                    global_stats=dataset.global_stats)
    if got is not None:
        lengths[:bsz] = np.minimum(got, tb)
        return lengths
    for j, r in enumerate(rows):
        f = read_feature(r["audio"])
        if mode == "utterance":
            f = utterance_cmvn(f)
        elif mode == "global":
            f = global_cmvn(f, dataset.global_stats)
        n = min(f.shape[0], tb)
        feats[j, :n] = f[:n]
        lengths[j] = n
    return lengths


def _collate(dataset: SpeechDataset, idxs, cfg: BatcherConfig):
    rows = [dataset.rows[i] for i in idxs]
    targets = [np.asarray(dataset.vocab.encode(r[dataset.target_field]),
                          np.int32) for r in rows]
    srcs = ([np.asarray(dataset.vocab.encode(r["src_text"]), np.int32)
             for r in rows] if dataset.mtl_src else None)
    tb = _bucket(max(int(r["n_frames"]) for r in rows), cfg.frame_buckets)
    lb = _bucket(max(len(t) for t in targets), cfg.token_buckets)
    bsz = len(rows)
    b_pad = -(-bsz // cfg.batch_multiple) * cfg.batch_multiple

    feats = np.zeros((b_pad, tb, dataset.feat_dim()), np.float32)
    feat_lengths = _load_feats(dataset, rows, feats, cfg)
    target = np.full((b_pad, lb), PAD, np.int32)
    prev = np.full((b_pad, lb), PAD, np.int32)
    ids = []
    for j, (r, t) in enumerate(zip(rows, targets)):
        L = min(len(t), lb)
        tt = t[:L].copy()
        tt[-1] = EOS
        target[j, :L] = tt
        prev[j, :L] = np.asarray(move_eos_to_begin(list(tt)), np.int32)
        ids.append(r["id"])
    # padded (dummy) rows keep feat_lengths=0 / all-PAD targets: they
    # contribute zero to sum losses and sample_size.
    batch = {"feats": feats, "feat_lengths": feat_lengths, "target": target,
             "prev_tokens": prev, "ids": ids, "n_real": bsz}
    if dataset.mtl_src:
        sb = _bucket(max(len(s) for s in srcs), cfg.token_buckets)
        src_target = np.full((b_pad, sb), PAD, np.int32)
        for j, s in enumerate(srcs):
            L = min(len(s), sb)
            ss = np.asarray(s[:L], np.int32)
            ss[-1] = EOS
            src_target[j, :L] = ss
        batch["src_target"] = src_target
    return batch
