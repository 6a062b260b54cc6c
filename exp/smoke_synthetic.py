"""End-to-end smoke on real hardware: synthetic corpus -> cli.train ->
checkpoint averaging -> fused batched SCANNED streaming eval.

Fabricates a learnable micro language (each word is a distinct tone, so the
audio genuinely determines the text), builds reference-layout manifests +
feature zip + vocab, then drives the REAL CLIs end to end.  Exercises the
whole production stack together: Pallas kernels (when on TPU), donated
train state, non-finite-step skipping, checkpoint metadata, and the
scanned batched evaluator.

Run: PYTHONPATH=.:/root/.axon_site python exp/smoke_synthetic.py [workdir]
Exits non-zero unless training converges and streaming eval produces a
sane BLEU on held-out audio (the threshold detects collapse, not quality:
this corpus/arch scores ~28 streaming at ~730 ms AL when healthy).

Last full run (v5e, 2026-08-17): CIF inline dev BLEU 34.3 best; scanned
batched streaming eval BLEU 27.8 @ AL 728 ms / AP 0.92 / DAL 865 ms.
SMOKE_MMA=1 phase: wait-k MMA inline dev BLEU 66.7 best; streaming
BLEU 61.4 @ AL 1040 ms.
Runs to date caught three real bugs: a missing lane-alignment gate on the
attention kernel, orbax device-restore wedging through the tunnel, and
the utterance-CMVN train/stream mismatch.
"""
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simulst_tpu.data import manifest as mf
from simulst_tpu.ops.fbank import fbank_np

WORDS = ["eins", "zwei", "drei", "vier", "fuenf", "sechs"]
TONES = [440.0, 550.0, 660.0, 770.0, 880.0, 990.0]
SR = 16000
WORD_S = 0.32


def synth(words, rng):
    parts = []
    for w in words:
        f = TONES[WORDS.index(w)]
        t = np.arange(int(SR * WORD_S)) / SR
        parts.append(np.sin(2 * np.pi * f * t) * 0.3)
    wav = np.concatenate(parts) + rng.randn(
        int(SR * WORD_S) * len(words)) * 0.01
    return wav.astype(np.float32)


def build_corpus(root, n_train=768, n_dev=16):
    rng = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    all_rows = {"train": [], "dev": []}
    feats = {}
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    dev_wavs, dev_refs = [], []
    for split, n in (("train", n_train), ("dev", n_dev)):
        for i in range(n):
            words = [WORDS[rng.randint(len(WORDS))]
                     for _ in range(rng.randint(2, 6))]
            text = " ".join(words)
            wav = synth(words, rng)
            uid = f"{split}_{i}"
            f = fbank_np(wav * 2 ** 15)
            feats[uid] = f
            all_rows[split].append(
                {"id": uid, "n_frames": str(f.shape[0]),
                 "src_text": text, "tgt_text": text, "speaker": "s"})
            if split == "dev":
                import wave, struct
                path = os.path.join(wav_dir, uid + ".wav")
                with wave.open(path, "w") as w:
                    w.setnchannels(1); w.setsampwidth(2); w.setframerate(SR)
                    w.writeframes((wav * 32767).astype(np.int16).tobytes())
                dev_wavs.append(os.path.abspath(path))
                dev_refs.append(text)
    train_feats = [feats[r["id"]] for r in all_rows["train"]]
    allf = np.concatenate(train_feats, axis=0)
    np.savez(os.path.join(root, "gcmvn.npz"), mean=allf.mean(0),
             std=allf.std(0) + 1e-8)
    specs = mf.create_feature_zip(feats, os.path.join(root, "fbank80.zip"))
    for split in ("train", "dev"):
        for r in all_rows[split]:
            r["audio"] = specs[r["id"]]
        mf.save_tsv(all_rows[split], os.path.join(root, f"{split}_st.tsv"))
    # fairseq-format vocab txt; the whitespace-fallback tokenizer prefixes
    # each word with the BOW marker, so symbols are "▁word"
    with open(os.path.join(root, "spm_unigram4096_st.txt"), "w") as f:
        for w in WORDS:
            f.write(f"▁{w} 1\n")
    with open(os.path.join(root, "dev.wav_list"), "w") as f:
        f.write("\n".join(dev_wavs) + "\n")
    with open(os.path.join(root, "dev.de"), "w") as f:
        f.write("\n".join(dev_refs) + "\n")
    return root


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="simulst_smoke_")
    data = build_corpus(os.path.join(work, "data"))
    save = os.path.join(work, "ckpt_cif")
    py = [sys.executable, "-m"]
    common_model = [
        "--override", "embed_dim=64", "--override", "ffn_dim=256",
        "--override", "encoder_layers=2", "--override", "decoder_layers=2",
        "--override", "conv_channels=32", "--override", "dropout=0.1",
        "--override", "compute_dtype=bfloat16",
    ]
    # GLOBAL CMVN throughout: streaming agents cannot apply utterance-level
    # normalization (the future is unknown), so training must use the same
    # global stats the agent applies (--global-cmvn); mismatched features
    # collapse the CIF alpha and the streaming session emits nothing
    run(py + ["simulst_tpu.cli.train", "--data", data, "--task", "st",
              "--model", "cif", "--loss", "cif", "--cmvn", "global",
              "--lr", "1e-3", "--warmup-updates", "100",
              "--max-tokens", "6000", "--max-updates", "1000",
              "--eval-metric", "bleu", "--save-dir", save] + common_model)
    run(py + ["simulst_tpu.cli.average_checkpoints", "--dir", save,
              "--n", "2", "--output", os.path.join(save, "checkpoint_avg")])
    out = os.path.join(work, "simul_out")
    run(py + ["simulst_tpu.cli.stream_eval",
              "--source", os.path.join(data, "dev.wav_list"),
              "--target", os.path.join(data, "dev.de"),
              "--checkpoint", os.path.join(save, "checkpoint_avg"),
              "--vocab", os.path.join(data, "spm_unigram4096_st.txt"),
              "--agent", "cif", "--fused", "--batch-size", "4",
              "--scan-sessions", "--global-cmvn",
              os.path.join(data, "gcmvn.npz"), "--output", out])
    scores = json.load(open(os.path.join(out, "scores")))
    print("scores:", scores)
    assert scores["BLEU"] > 20.0, f"streaming BLEU too low: {scores}"
    assert scores["AL"] > 0.0

    if os.environ.get("SMOKE_MMA"):
        save_m = os.path.join(work, "ckpt_mma")
        run(py + ["simulst_tpu.cli.train", "--data", data, "--task", "st",
                  "--model", "mma", "--loss", "mma", "--cmvn", "global",
                  "--lr", "1e-3", "--warmup-updates", "100",
                  "--max-tokens", "6000", "--max-updates", "1000",
                  "--eval-metric", "bleu", "--save-dir", save_m,
                  "--override", "simul_attn_type=waitk_fixed_pre_decision",
                  "--override", "waitk_lagging=3",
                  "--override", "fixed_pre_decision_ratio=8"] + common_model)
        run(py + ["simulst_tpu.cli.average_checkpoints", "--dir", save_m,
                  "--n", "2", "--output",
                  os.path.join(save_m, "checkpoint_avg")])
        out_m = os.path.join(work, "simul_out_mma")
        run(py + ["simulst_tpu.cli.stream_eval",
                  "--source", os.path.join(data, "dev.wav_list"),
                  "--target", os.path.join(data, "dev.de"),
                  "--checkpoint", os.path.join(save_m, "checkpoint_avg"),
                  "--vocab", os.path.join(data, "spm_unigram4096_st.txt"),
                  "--agent", "mma", "--fused", "--batch-size", "4",
                  "--scan-sessions", "--global-cmvn",
                  os.path.join(data, "gcmvn.npz"), "--output", out_m])
        scores_m = json.load(open(os.path.join(out_m, "scores")))
        print("mma scores:", scores_m)
        assert scores_m["BLEU"] > 20.0, f"mma streaming BLEU low: {scores_m}"

    if os.environ.get("SMOKE_TRANSDUCER"):
        # rnnt lattice memory scales with B*S*U*V: cap the batch (the tone
        # vocab is tiny so V is small, but keep the smoke cheap)
        save_t = os.path.join(work, "ckpt_transducer")
        run(py + ["simulst_tpu.cli.train", "--data", data, "--task", "st",
                  "--model", "transducer", "--loss", "rnnt",
                  "--cmvn", "global", "--lr", "1e-3",
                  "--warmup-updates", "100", "--max-tokens", "4000",
                  "--max-updates", "1000", "--eval-metric", "bleu",
                  "--save-dir", save_t] + common_model)
        run(py + ["simulst_tpu.cli.average_checkpoints", "--dir", save_t,
                  "--n", "2", "--output",
                  os.path.join(save_t, "checkpoint_avg")])
        out_t = os.path.join(work, "simul_out_transducer")
        run(py + ["simulst_tpu.cli.stream_eval",
                  "--source", os.path.join(data, "dev.wav_list"),
                  "--target", os.path.join(data, "dev.de"),
                  "--checkpoint", os.path.join(save_t, "checkpoint_avg"),
                  "--vocab", os.path.join(data, "spm_unigram4096_st.txt"),
                  "--agent", "transducer", "--fused", "--batch-size", "4",
                  "--scan-sessions", "--global-cmvn",
                  os.path.join(data, "gcmvn.npz"), "--output", out_t])
        scores_t = json.load(open(os.path.join(out_t, "scores")))
        print("transducer scores:", scores_t)
        assert scores_t["BLEU"] > 15.0, \
            f"transducer streaming BLEU low: {scores_t}"

    print("SMOKE OK:", work)


if __name__ == "__main__":
    main()
