"""Rewrite feature-zip paths inside tsv manifests after moving data
(parity with /root/reference/scripts/migrate_data_path.sh)."""
from __future__ import annotations

import argparse

from simulst_tpu.data.manifest import load_tsv, save_tsv


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("tsvs", nargs="+")
    p.add_argument("--old", required=True, help="path prefix to replace")
    p.add_argument("--new", required=True)
    args = p.parse_args(argv)
    for path in args.tsvs:
        rows = load_tsv(path)
        n = 0
        for r in rows:
            if r["audio"].startswith(args.old):
                r["audio"] = args.new + r["audio"][len(args.old):]
                n += 1
        save_tsv(rows, path)
        print(f"{path}: rewrote {n}/{len(rows)}")


if __name__ == "__main__":
    main()
