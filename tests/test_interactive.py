"""Interactive CLI smoke test: stdin text lines -> H- hypothesis lines
(the reference's eval/interactive.py:42-105 raw-text MT mode)."""
import io

import numpy as np
import pytest

import jax

from simulst_tpu.data.vocab import SPECIALS, Vocabulary
from simulst_tpu.models import get_model
from simulst_tpu.train.checkpoint import save_checkpoint


def test_interactive_mt_text_mode(tmp_path, monkeypatch, capsys):
    syms = list(SPECIALS) + [f"▁w{i}" for i in range(12)]
    v = Vocabulary(syms)
    vpath = str(tmp_path / "vocab.txt")
    with open(vpath, "w") as f:
        for s in syms[4:]:
            f.write(f"{s} 1\n")

    cls = get_model("mt_transformer")
    cfg = cls.Config(vocab_size=len(v), embed_dim=16, ffn_dim=32,
                     encoder_layers=1, decoder_layers=1, num_heads=2)
    model = cls(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, params, metadata={
        "model": "mt_transformer",
        "config": {"embed_dim": 16, "ffn_dim": 32, "encoder_layers": 1,
                   "decoder_layers": 1, "num_heads": 2}})

    from simulst_tpu.cli.interactive import main
    monkeypatch.setattr("sys.stdin", io.StringIO("w1 w2\nw3\n"))
    main(["--checkpoint", ckpt, "--vocab", vpath, "--task", "mt",
          "--beam", "1", "--max-len", "6"])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("H-")]
    assert len(lines) == 2
    assert lines[0].startswith("H-0\t") and lines[1].startswith("H-1\t")
