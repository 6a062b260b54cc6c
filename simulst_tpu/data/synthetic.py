"""Synthetic MuST-C-shaped manifests for batcher/fill measurements.

The real corpus isn't available in this environment (VERDICT missing #1),
so data-pipeline levers (bucketing ladders, target-length sorting, packing)
are measured on a manifest whose marginals match MuST-C en-de: lognormal
durations around ~6 s clipped to 1..20 s (the prep filter range,
reference DATA/get_mustc.sh + data_utils length filtering), and target
character counts proportional to duration at ~17 chars/s with ±25 % noise
(the en-de ratio).  Features are zero-filled — bucketing and fill factors
depend only on shapes.
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from simulst_tpu.data import manifest as mf


def mustc_like_rows(n: int = 3000, seed: int = 0, tmpdir: str = ".",
                    feat_dim: int = 4, chars_per_sec: float = 17.0
                    ) -> List[Dict[str, str]]:
    """Build manifest rows (with a real zero-feature zip under tmpdir) whose
    duration/target-length joint distribution is MuST-C-en-de-shaped."""
    rng = np.random.RandomState(seed)
    secs = np.clip(np.exp(rng.normal(1.7, 0.55, n)), 1.0, 20.0)
    frames = (secs * 100).astype(int)
    words = []
    for s in secs:
        n_chars = max(4, int(s * chars_per_sec * rng.uniform(0.75, 1.25)))
        w, left = [], n_chars
        while left > 0:
            wl = int(rng.randint(2, 9))
            w.append("".join(rng.choice(list("abcdefghij"), wl)))
            left -= wl + 1
        words.append(" ".join(w))
    feats = {f"u{i}": np.zeros((int(frames[i]), feat_dim), np.float32)
             for i in range(n)}
    zp = os.path.join(tmpdir, "synthetic_feats.zip")
    specs = mf.create_feature_zip(feats, zp)
    return [{"id": f"u{i}", "audio": specs[f"u{i}"],
             "n_frames": str(int(frames[i])), "src_text": words[i],
             "tgt_text": words[i], "speaker": "s"} for i in range(n)]
