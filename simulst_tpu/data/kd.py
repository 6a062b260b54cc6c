"""Sequence-level knowledge distillation manifest builder.

Replaces the tgt_text column of a train manifest with MT-teacher
translations (parity with /root/reference/DATA/create_distillation_tsv.py:35-58,
which parses fairseq-generate 'D-' lines by sample id).
"""
from __future__ import annotations

from typing import Dict, List

from simulst_tpu.data import manifest as mf


def parse_generation_output(lines) -> Dict[int, str]:
    """Parse 'D-<id>\t<score>\t<text>' lines (our generate CLI emits the same
    format as fairseq-generate)."""
    out = {}
    for line in lines:
        if line.startswith("D-"):
            parts = line.rstrip("\n").split("\t")
            idx = int(parts[0][2:])
            out[idx] = parts[2] if len(parts) > 2 else ""
    return out


def create_distillation_tsv(train_tsv: str, generation_output: str,
                            out_tsv: str):
    rows = mf.load_tsv(train_tsv)
    with open(generation_output) as f:
        hyps = parse_generation_output(f)
    missing = 0
    for i, r in enumerate(rows):
        if i in hyps:
            r["tgt_text"] = hyps[i]
        else:
            missing += 1
    mf.save_tsv(rows, out_tsv)
    return missing
