"""MuST-C preparation CLI (DATA/mustc/get_mustc.sh + prep_mustc_data.py)."""
from __future__ import annotations

import argparse

from simulst_tpu.data import mustc


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True, help="MuST-C root (en-XX dirs)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--tgt-lang", default="de")
    p.add_argument("--vocab-size", type=int, default=4096)
    p.add_argument("--splits", nargs="+", default=mustc.SPLITS)
    p.add_argument("--task", default="st", choices=["st", "asr"])
    p.add_argument("--long-seconds", nargs="*", type=float, default=[],
                   help="also build N-second long-utterance robustness "
                        "splits from tst-COMMON (reference: 20 40 60)")
    args = p.parse_args(argv)

    train_rows = None
    for split in args.splits:
        rows = mustc.process_split(args.data_root, split, args.out_dir,
                                   tgt_lang=args.tgt_lang)
        if split == "train":
            train_rows = rows
        print(f"{split}: {len(rows)} utterances")
    for secs in args.long_seconds:
        n = mustc.process_long_split(args.data_root, "tst-COMMON",
                                     args.out_dir, secs,
                                     tgt_lang=args.tgt_lang)
        print(f"tst-COMMON-{int(secs)}s: {n} long utterances")
    if train_rows:
        fields = ("src_text",) if args.task == "asr" else ("tgt_text",)
        mustc.build_vocab(train_rows, args.out_dir, args.vocab_size, fields)
        mustc.write_config(args.out_dir, args.vocab_size)
        mustc.write_gcmvn(args.out_dir, train_rows)


if __name__ == "__main__":
    main()
