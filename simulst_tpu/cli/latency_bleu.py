"""Latency-BLEU reporting — the eval/latency-bleu.ipynb replacement.

Collects SimulEval-style `scores` jsons from one or more result directories
and prints the BLEU-vs-latency tradeoff table (and optionally a tsv for
plotting)."""
from __future__ import annotations

import argparse
import json
import os

COLUMNS = ["BLEU", "AL", "AL_CA", "AP", "AP_CA", "DAL", "DAL_CA"]


def collect(result_dirs):
    rows = []
    for d in result_dirs:
        path = os.path.join(d, "scores")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            scores = json.load(f)
        rows.append((d, scores))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dirs", nargs="+", help="result dirs containing `scores`")
    p.add_argument("--tsv", default=None)
    args = p.parse_args(argv)

    rows = collect(args.dirs)
    header = ["system"] + COLUMNS
    lines = ["\t".join(header)]
    for name, scores in sorted(rows, key=lambda r: r[1].get("AL", 0.0)):
        # identify the cell by its last two path components (model/split)
        parts = name.rstrip("/").split(os.sep)
        label = "/".join(parts[-2:]) if len(parts) >= 2 else parts[-1]
        lines.append("\t".join(
            [label] + [f"{scores.get(c, 0.0):.2f}" for c in COLUMNS]))
    out = "\n".join(lines)
    print(out)
    if args.tsv:
        with open(args.tsv, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
