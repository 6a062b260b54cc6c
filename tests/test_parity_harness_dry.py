"""Dry run of the checkpoint-parity harness (exp/5_parity_eval.sh).

The real harness needs MuST-C + released fairseq checkpoints (environment
-blocked, VERDICT r3 missing #1), so this keeps it warm: a torch-saved
fairseq-style checkpoint goes through the exact pipeline the script runs —
``convert()`` -> ``save_checkpoint`` (with the script's metadata layout) ->
``load_checkpoint`` + config rebuilt from metadata the way ``cli/generate.py``
does -> one forward — and the reloaded model must match the in-memory
converted one bit-for-bit.  Catches drift in the converter, the orbax
checkpoint format, or the metadata coercion before real checkpoints exist.
Ref layout: /root/reference/eval/generate.py:96-103 (ensemble loader).
"""
import os
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu import config as cfglib
from simulst_tpu.compat.fairseq_converter import convert
from simulst_tpu.models import get_model
from simulst_tpu.train.checkpoint import load_checkpoint, save_checkpoint

from test_converter import (fake_sd_for_decoder, fake_sd_for_encoder,
                            small_kwargs)


def _fake_fairseq_ckpt(name, cfg, path, seed):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(seed)
    cross = {"s2t_emformer": "standard", "mma": "mma", "cif": "fake"}[name]
    sd = {**fake_sd_for_encoder(cfg, rng),
          **fake_sd_for_decoder(cfg, rng, cross=cross)}
    if name == "cif":
        d = cfg.embed_dim
        sd["encoder.cif_layer.alpha_proj.0.weight"] = rng.randn(
            cfg.cif_conv_kernel, d, d).astype(np.float32)
        sd["encoder.cif_layer.alpha_proj.0.bias"] = rng.randn(d).astype(np.float32)
        sd["encoder.cif_layer.alpha_proj.1.weight"] = rng.randn(d).astype(np.float32)
        sd["encoder.cif_layer.alpha_proj.1.bias"] = rng.randn(d).astype(np.float32)
        sd["encoder.cif_layer.alpha_proj.4.weight"] = rng.randn(1, d).astype(np.float32)
        sd["encoder.cif_layer.alpha_proj.4.bias"] = rng.randn(1).astype(np.float32)
    if name == "mma":
        del sd["encoder.ctc_layer.weight"]
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()},
                "cfg": {"model": {"arch": name}}}, path)


@pytest.mark.parametrize("name", ["s2t_emformer", "mma", "cif"])
def test_parity_harness_dry(name, tmp_path):
    kw = small_kwargs()
    if name == "mma":
        kw["ctc_layer"] = False
        kw["simul_attn_type"] = "infinite_lookback_fixed_pre_decision"
    cls = get_model(name)
    cfg = cls.Config(**kw)
    model = cls(cfg)
    params = model.init(jax.random.PRNGKey(0))

    pt = os.path.join(tmp_path, "reference.pt")
    # zlib.crc32 is deterministic across runs (hash() is salted by
    # PYTHONHASHSEED, which would make failures non-reproducible)
    _fake_fairseq_ckpt(name, cfg, pt, seed=zlib.crc32(name.encode()) % 1000)

    # --- the script's conversion block, verbatim semantics ---
    converted = convert(name, params, pt)
    out = os.path.join(tmp_path, "converted")
    save_checkpoint(out, converted,
                    metadata={"model": name, "config": cfglib.to_dict(cfg)})

    # --- the generate CLI's loading recipe ---
    restored, meta = load_checkpoint(out)
    assert meta["model"] == name
    mcfg = cfglib.from_dict(cls.Config,
                            {**meta["config"], "vocab_size": cfg.vocab_size})
    assert mcfg == cfg, "config did not survive the metadata round-trip"
    reloaded = cls(mcfg)

    for a, b in zip(jax.tree.leaves(converted), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    feats = jnp.asarray(np.random.RandomState(7).randn(2, 40, cfg.input_feat),
                        jnp.float32)
    lens = jnp.array([40, 33])
    prev = jnp.array([[2, 5, 6], [2, 7, 1]])
    ref = model.forward(converted, feats, lens, prev)[0]
    got = reloaded.forward(restored, feats, lens, prev)[0]
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    assert np.isfinite(np.asarray(got)).all()
