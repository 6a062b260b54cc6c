"""MuST-C data preparation.

Native replacement for /root/reference/DATA/mustc/prep_mustc_data.py and
seg_mustc_data.py: parse per-split yaml segment lists + transcript/translation
text files, cut wav segments, extract kaldi-parity fbank80, pack a feature
zip, write {split}_st.tsv manifests, train the SPM vocab (pinned special
ids), and write the data config yaml.  Also builds the long-utterance
robustness splits (consecutive segments concatenated to >= N seconds,
seg_mustc_data.py:26-104).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from simulst_tpu.data import manifest as mf
from simulst_tpu.data.vocab import Vocabulary
from simulst_tpu.ops.fbank import fbank_np

SPLITS = ["train", "dev", "tst-COMMON", "tst-HE"]
SAMPLE_RATE = 16000


import re

_NOISE_TAG = re.compile(r"\([A-Z][a-zA-Z ]*\)")  # e.g. (Applause), (Laughter)


def strip_noise_tags(text: str) -> str:
    """Remove parenthesized event tags from transcripts (the reference ships
    DATA/mustc/mustc_noise.list enumerating such tags)."""
    return " ".join(_NOISE_TAG.sub(" ", text).split())


def read_wav(path: str, keep_int16: bool = False) -> Tuple[np.ndarray, int]:
    """keep_int16=True returns 16-bit PCM sources AS int16: the streaming
    evaluator uploads those at 1/4 the float bytes and the conversion is
    exact either way (the fbank's 2^15 float scale is the int16 identity —
    stream/agents.stage_session_wavs)."""
    from scipy.io import wavfile
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        if not keep_int16:
            data = data.astype(np.float32) / 32768.0
    elif data.dtype != np.float32:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data[:, 0]
    return data, sr


def parse_segments(root: str, split: str, src_lang: str, tgt_lang: str
                   ) -> List[Dict]:
    """Parse {split}.yaml + {split}.{src,tgt} (prep_mustc_data.py:43-105)."""
    import yaml
    base = Path(root) / f"en-{tgt_lang}" / "data" / split
    with open(base / "txt" / f"{split}.yaml") as f:
        segments = yaml.safe_load(f)
    for lang in (src_lang, tgt_lang):
        with open(base / "txt" / f"{split}.{lang}") as f:
            lines = [l.strip() for l in f]
        assert len(lines) == len(segments)
        key = "src_text" if lang == src_lang else "tgt_text"
        for seg, line in zip(segments, lines):
            seg[key] = line
    for i, seg in enumerate(segments):
        seg["wav_path"] = str(base / "wav" / seg["wav"])
        seg["id"] = f"{Path(seg['wav']).stem}_{i}"
    return segments


def iter_segment_audio(segments: List[Dict]) -> Iterator[Tuple[str, np.ndarray]]:
    """Yields (utt_id, waveform) cutting [offset, offset+duration) per
    segment, grouping by wav file to read each once."""
    by_wav: Dict[str, List[Dict]] = {}
    for s in segments:
        by_wav.setdefault(s["wav_path"], []).append(s)
    for wav_path, segs in by_wav.items():
        data, sr = read_wav(wav_path)
        assert sr == SAMPLE_RATE, f"expected 16k audio, got {sr}"
        for s in segs:
            a = int(float(s["offset"]) * sr)
            b = a + int(float(s["duration"]) * sr)
            yield s["id"], data[a:b]


def process_split(root: str, split: str, out_dir: str, src_lang: str = "en",
                  tgt_lang: str = "de") -> List[Dict[str, str]]:
    """fbank -> zip -> manifest rows for one split
    (prep_mustc_data.py:108-237)."""
    os.makedirs(out_dir, exist_ok=True)
    segments = parse_segments(root, split, src_lang, tgt_lang)
    feats = {}
    for uid, wav in iter_segment_audio(segments):
        feats[uid] = fbank_np(wav * (2 ** 15))
    zip_path = os.path.join(out_dir, f"fbank80_{split}.zip")
    specs = mf.create_feature_zip(feats, zip_path)
    rows = []
    for s in segments:
        uid = s["id"]
        rows.append({"id": uid, "audio": specs[uid],
                     "n_frames": str(feats[uid].shape[0]),
                     "src_text": s["src_text"], "tgt_text": s["tgt_text"],
                     "speaker": s.get("speaker_id", "unknown")})
    if split == "train":
        rows = mf.filter_by_frames(rows)
    mf.save_tsv(rows, os.path.join(out_dir, f"{split}_st.tsv"))
    return rows


def write_gcmvn(out_dir: str, train_rows: List[Dict[str, str]]):
    """Global CMVN stats over the train features (reference
    data_utils.py:273-280 + gcmvn.npz used by the streaming agents)."""
    from simulst_tpu.data.features import compute_global_cmvn
    from simulst_tpu.data.manifest import read_feature
    stats = compute_global_cmvn(read_feature(r["audio"]) for r in train_rows)
    path = os.path.join(out_dir, "gcmvn.npz")
    np.savez(path, **stats)
    return path


def build_vocab(train_rows: List[Dict[str, str]], out_dir: str,
                vocab_size: int = 4096, fields=("tgt_text",)) -> Vocabulary:
    texts = [r[f] for r in train_rows for f in fields]
    prefix = os.path.join(out_dir, f"spm_unigram{vocab_size}_st")
    return Vocabulary.build(texts, vocab_size=vocab_size, save_prefix=prefix)


def write_config(out_dir: str, vocab_size: int = 4096):
    """Data config yaml (data_utils.py:136-209 gen_config_yaml)."""
    import yaml
    cfg = {
        "vocab_filename": f"spm_unigram{vocab_size}_st.txt",
        "bpe_tokenizer": {"bpe": "sentencepiece",
                          "sentencepiece_model": f"spm_unigram{vocab_size}_st.model"},
        "input_channels": 1,
        "input_feat_per_channel": 80,
        "sampling_alpha": 1.0,
        "use_audio_input": False,
        "specaugment": {"freq_mask_F": 27, "freq_mask_N": 2,
                        "time_mask_N": 2, "time_mask_T": 100,
                        "time_mask_p": 1.0, "time_wrap_W": 0},
        "transforms": {"_train": ["specaugment"], "*": ["utterance_cmvn"]},
    }
    with open(os.path.join(out_dir, "config_st.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)


def build_long_utterances(segments: List[Dict], min_seconds: float
                          ) -> List[List[Dict]]:
    """Concatenate consecutive same-wav segments until >= min_seconds
    (seg_mustc_data.py:26-104) for the 20/40/60s robustness splits."""
    groups, cur, dur = [], [], 0.0
    prev_wav = None
    for s in segments:
        if prev_wav is not None and s["wav_path"] != prev_wav and cur:
            groups.append(cur)
            cur, dur = [], 0.0
        cur.append(s)
        dur += float(s["duration"])
        prev_wav = s["wav_path"]
        if dur >= min_seconds:
            groups.append(cur)
            cur, dur = [], 0.0
    if cur:
        groups.append(cur)
    return groups


def process_long_split(root: str, split: str, out_dir: str,
                       min_seconds: float, src_lang: str = "en",
                       tgt_lang: str = "de"):
    """Build a long-utterance robustness split: concatenate consecutive
    segments to >= min_seconds, write per-group wavs + wav_list + reference
    (reference seg_mustc_data.py + docs/simuleval_instruction.md)."""
    from scipy.io import wavfile
    segments = parse_segments(root, split, src_lang, tgt_lang)
    groups = build_long_utterances(segments, min_seconds)
    tag = f"{split}-{int(min_seconds)}s"
    wav_dir = os.path.join(out_dir, tag + "_wavs")
    os.makedirs(wav_dir, exist_ok=True)
    wav_list, refs = [], []
    cache: Dict[str, np.ndarray] = {}
    for gi, group in enumerate(groups):
        wp = group[0]["wav_path"]
        if wp not in cache:
            cache.clear()  # one file at a time (groups are wav-contiguous)
            cache[wp], _ = read_wav(wp)
        data = cache[wp]
        parts = []
        for s in group:
            a = int(float(s["offset"]) * SAMPLE_RATE)
            parts.append(data[a:a + int(float(s["duration"]) * SAMPLE_RATE)])
        wav = np.concatenate(parts)
        path = os.path.join(wav_dir, f"{tag}_{gi}.wav")
        wavfile.write(path, SAMPLE_RATE, (wav * 32767).astype(np.int16))
        wav_list.append(os.path.abspath(path))
        refs.append(" ".join(s["tgt_text"] for s in group))
    with open(os.path.join(out_dir, tag + ".wav_list"), "w") as f:
        f.write("\n".join(wav_list) + "\n")
    with open(os.path.join(out_dir, f"{tag}.{tgt_lang}"), "w") as f:
        f.write("\n".join(refs) + "\n")
    return len(groups)


def write_simul_lists(rows: List[Dict[str, str]], wav_dir: str, out_prefix: str,
                      tgt_lang: str = "de"):
    """Write {split}.wav_list + {split}.{lang} for streaming eval
    (reference eval/0-gen_simul_list.sh + seg_mustc_data.py:106-136)."""
    with open(out_prefix + ".wav_list", "w") as fw, \
            open(out_prefix + "." + tgt_lang, "w") as ft:
        for r in rows:
            fw.write(os.path.join(wav_dir, r["id"] + ".wav") + "\n")
            ft.write(r["tgt_text"] + "\n")
