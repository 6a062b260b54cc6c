"""Best-N checkpoint averaging CLI (scripts/average_checkpoints.py parity)."""
from __future__ import annotations

import argparse

from simulst_tpu.train.checkpoint import (average_params, find_best_checkpoints,
                                          load_checkpoint, save_checkpoint)


def main(argv=None):
    from simulst_tpu.config import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True)
    p.add_argument("--n", type=int, default=5)
    p.add_argument("--maximize", action="store_true", default=None,
                   help="higher metric is better (default: inferred from "
                        "the checkpoint metric name; bleu maximizes)")
    p.add_argument("--minimize", dest="maximize", action="store_false",
                   help="force lower-is-better selection")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    paths = find_best_checkpoints(args.dir, args.n, args.maximize)
    if not paths:
        raise SystemExit(f"no checkpoint.best_* entries under {args.dir}")
    print("averaging:", *paths, sep="\n  ")
    trees = []
    meta = None
    for path in paths:
        t, m = load_checkpoint(path, to_device=False)
        trees.append(t)
        meta = meta or m
    avg = average_params(trees)
    save_checkpoint(args.output, avg, metadata=meta)
    print("saved:", args.output)


if __name__ == "__main__":
    main()
