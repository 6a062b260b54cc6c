"""Measure the target-length secondary-sort lever in the batcher.

docs/perf.md ("Sequence packing") found the residual of the padding gap is
TARGET-side: sorting is by frames only, so each batch's targets spread
~0.6U..U and pad to a max-based token bucket.  BatcherConfig.tgt_sort
re-sorts by target length inside N-item frame-sorted blocks (frames there
are near-equal, so the frame fill cost is ~nil).  This probe runs the
PRODUCTION make_batches on a MuST-C-shaped synthetic manifest (lognormal
durations, target chars ~ duration with +-25% noise — the en-de ratio is
~17 chars/s) and reports, per config:

  frame_fill  = sum(feat_lengths) / sum(B_pad * frame_bucket)
  token_fill  = sum(real token lens) / sum(B_pad * token_bucket)
  tok_bucket  = batch-weighted mean token bucket (smaller = fewer decoder
                FLOPs outright, independent of fill)

Usage: python exp/probe_tgt_sort.py
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simulst_tpu.data.dataset import BatcherConfig, SpeechDataset, make_batches
from simulst_tpu.data.synthetic import mustc_like_rows as build_rows
from simulst_tpu.data.vocab import Vocabulary


def measure(rows, vocab, tgt_sort, frame_buckets,
            token_buckets=(16, 32, 48, 64, 96, 128)):
    cfg = BatcherConfig(max_tokens=32 * 1024, cmvn="none", shuffle=True,
                        seed=1, frame_buckets=frame_buckets,
                        token_buckets=token_buckets, tgt_sort=tgt_sort)
    ds = SpeechDataset(rows, vocab, cfg)
    f_real = f_slot = t_real = t_slot = rows_pad = 0
    n_b = 0
    from simulst_tpu.data.vocab import PAD
    for b in make_batches(ds, num_shards=1, shard_id=0):
        Bp, Tb = b["feats"].shape[:2]
        Lb = b["target"].shape[1]
        f_real += int(b["feat_lengths"].sum())
        f_slot += Bp * Tb
        t_real += int((b["target"] != PAD).sum())
        t_slot += Bp * Lb
        rows_pad += Bp
        n_b += 1
    return (f_real / f_slot, t_real / t_slot, t_slot / rows_pad,
            n_b, f_slot, t_slot)


def main():
    with tempfile.TemporaryDirectory() as td:
        rows = build_rows(tmpdir=td)
        texts = [r["tgt_text"] for r in rows[:400]]
        vocab = Vocabulary.build(texts, vocab_size=1000)
        for fb, fb_name in (((256, 512, 768, 1024, 1536, 2048, 3072),
                             "coarse(r4)"),
                            (tuple(range(128, 3072 + 1, 128)), "fine(128)")):
            for blk in (False, True):
                for tb, tb_name in (((16, 32, 48, 64, 96, 128), "tok16"),
                                    (tuple(range(8, 129, 8)), "tok8")):
                    f_fill, t_fill, mean_lb, n_b, f_slot, t_slot = \
                        measure(rows, vocab, blk, fb, tb)
                    print(f"buckets={fb_name:16s} {tb_name:5s} "
                          f"tgt_sort={blk!s:5s}  "
                          f"frame_fill={f_fill:.4f}  token_fill={t_fill:.4f}"
                          f"  mean_tok_bucket={mean_lb:.1f}  "
                          f"(batches={n_b}, tok_slots={t_slot})")


if __name__ == "__main__":
    main()
