"""CIF firing / CTC alignment visualization — the eval/visualize.ipynb
replacement.  Dumps per-utterance CIF alpha weights, fire boundaries, and CTC
best-alignment segment boundaries as npz + an ASCII timeline."""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from simulst_tpu import config as cfglib
from simulst_tpu.data.dataset import BatcherConfig, SpeechDataset, make_batches
from simulst_tpu.data.manifest import load_tsv
from simulst_tpu.data.vocab import Vocabulary
from simulst_tpu.losses.label_smoothed_ce import log_softmax
from simulst_tpu.models import get_model
from simulst_tpu.ops.ctc import best_alignment
from simulst_tpu.train.checkpoint import load_checkpoint


def ascii_timeline(alpha, boundaries, width: int = 100):
    n = len(alpha)
    step = max(n // width, 1)
    line_a, line_b = [], []
    for i in range(0, n, step):
        a = float(np.max(alpha[i:i + step]))
        line_a.append(" .:-=+*#%@"[min(int(a * 10), 9)])
        line_b.append("|" if boundaries[i:i + step].any() else " ")
    return "".join(line_a) + "\n" + "".join(line_b)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--subset", default="dev")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--vocab", required=True)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--out", default="viz")
    args = p.parse_args(argv)

    vocab = (Vocabulary.from_spm(args.vocab) if args.vocab.endswith(".model")
             else Vocabulary.from_txt(args.vocab))
    restored, meta = load_checkpoint(args.checkpoint)
    model_cls = get_model((meta or {}).get("model", "cif"))
    mcfg = cfglib.from_dict(model_cls.Config,
                            {**((meta or {}).get("config") or {}),
                             "vocab_size": len(vocab)})
    model = model_cls(mcfg)

    rows = load_tsv(os.path.join(args.data, f"{args.subset}_st.tsv"))[: args.n]
    ds = SpeechDataset(rows, vocab, BatcherConfig(
        shuffle=False, batch_multiple=1, max_sentences=1,
        # coarse: one compile per realized bucket; a handful of utterances
        frame_buckets=(256, 512, 768, 1024, 1536, 2048, 3072),
        token_buckets=(16, 32, 48, 64, 96, 128)))
    os.makedirs(args.out, exist_ok=True)
    for batch in make_batches(ds):
        logits, extra = model.forward(
            restored, jnp.asarray(batch["feats"]),
            jnp.asarray(batch["feat_lengths"]), jnp.asarray(batch["prev_tokens"]))
        alpha = np.asarray(extra["alpha"])[0]
        lp = log_softmax(extra["ctc_logits"])
        states = np.asarray(best_alignment(
            lp, jnp.asarray(extra["encoder_lengths"]),
            jnp.asarray(batch["target"]),
            (jnp.asarray(batch["target"]) != 1).sum(-1)))[0]
        seg = states // 2
        boundary = (seg != np.roll(seg, -1)) & (states % 2 != 0)
        uid = batch["ids"][0]
        np.savez(os.path.join(args.out, uid + ".npz"), alpha=alpha,
                 states=states, boundary=boundary)
        print(f"== {uid}")
        print(ascii_timeline(alpha, boundary))


if __name__ == "__main__":
    main()
