"""End-to-end pipeline: synthetic data -> manifest/zip/vocab -> train steps
-> checkpoint save/avg/load -> offline decode."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.data import manifest as mf
from simulst_tpu.data.dataset import BatcherConfig, SpeechDataset, make_batches
from simulst_tpu.data.vocab import Vocabulary
from simulst_tpu.decode.beam import BeamConfig
from simulst_tpu.losses.joint_ctc import JointCTCConfig, joint_ctc_loss
from simulst_tpu.models.s2t_emformer import S2TEmformerConfig, S2TEmformerModel
from simulst_tpu.ops.fbank import fbank_np
from simulst_tpu.train.checkpoint import (average_params, load_checkpoint,
                                          save_checkpoint)
from simulst_tpu.train.loop import LoopConfig, Trainer
from simulst_tpu.train.optim import OptimConfig


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    texts = ["ja gut", "gut ja", "ja ja gut", "gut"] * 2
    feats = {}
    rows = []
    for i, t in enumerate(texts):
        wav = rng.randn(16000 // 4).astype(np.float32) * 0.1
        f = fbank_np(wav * 2 ** 15)
        feats[f"u{i}"] = f
        rows.append({"id": f"u{i}", "n_frames": str(f.shape[0]),
                     "src_text": t, "tgt_text": t, "speaker": "s"})
    specs = mf.create_feature_zip(feats, str(root / "fb.zip"))
    for r in rows:
        r["audio"] = specs[r["id"]]
    mf.save_tsv(rows, str(root / "train_st.tsv"))
    vocab = Vocabulary.build(texts, vocab_size=16)
    return root, rows, vocab


def _model(vocab):
    cfg = S2TEmformerConfig(
        vocab_size=len(vocab), input_feat=80, conv_channels=16, embed_dim=16,
        ffn_dim=32, encoder_layers=1, encoder_heads=2, decoder_layers=1,
        decoder_heads=2, decoder_ffn_dim=32, segment_length=16,
        left_context=32, right_context=8, max_memory=2, ctc_layer=True,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    return S2TEmformerModel(cfg)


def test_train_loop_reduces_loss(tiny_data, tmp_path):
    root, rows, vocab = tiny_data
    model = _model(vocab)
    params = model.init(jax.random.PRNGKey(0))
    lcfg = JointCTCConfig(ctc_factor=0.0)

    def loss_fn(p, batch, rng):
        logits, extra = model.forward(p, batch["feats"], batch["feat_lengths"],
                                      batch["prev_tokens"], rng=rng,
                                      deterministic=rng is None)
        return joint_ctc_loss(logits, extra, batch["target"], lcfg)

    bcfg = BatcherConfig(max_tokens=4000, shuffle=False, batch_multiple=1,
                         frame_buckets=(64,), token_buckets=(8,))
    ds = SpeechDataset(rows, vocab, bcfg)
    trainer = Trainer(loss_fn, OptimConfig(lr=5e-3, warmup_updates=4,
                                           clip_norm=1.0),
                      LoopConfig(max_updates=12, log_interval=100,
                                 validate_interval_updates=1000,
                                 save_dir=str(tmp_path / "ck")),
                      params)

    losses = []

    def batches(epoch):
        for b in make_batches(ds, epoch=epoch):
            b.pop("ids"); b.pop("n_real")
            yield {k: jnp.asarray(v) for k, v in b.items()}

    # track loss around fit by evaluating before/after
    def eval_loss(p):
        total, n = 0.0, 0.0
        for b in batches(0):
            l, m = loss_fn(p, b, None)
            total += float(l); n += float(m["sample_size"])
        return total / n

    before = eval_loss(trainer.state.params)
    state = trainer.fit(batches)
    after = eval_loss(state.params)
    assert after < before, (before, after)


def test_checkpoint_roundtrip_and_average(tmp_path):
    vocab = Vocabulary.build(["a b"], vocab_size=8)
    model = _model(vocab)
    p1 = model.init(jax.random.PRNGKey(0))
    p2 = model.init(jax.random.PRNGKey(1))
    save_checkpoint(str(tmp_path / "c1"), p1, metadata={"model": "s2t_emformer"})
    restored, meta = load_checkpoint(str(tmp_path / "c1"))
    assert meta["model"] == "s2t_emformer"
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    avg = average_params([p1, p2])
    la, l1, l2 = (jax.tree.leaves(t) for t in (avg, p1, p2))
    np.testing.assert_allclose(np.asarray(la[0]),
                               (np.asarray(l1[0]) + np.asarray(l2[0])) / 2,
                               rtol=1e-6)


def test_offline_decode_runs(tiny_data):
    from simulst_tpu.cli.generate import decode_batch
    root, rows, vocab = tiny_data
    model = _model(vocab)
    params = model.init(jax.random.PRNGKey(0))
    bcfg = BatcherConfig(max_tokens=4000, shuffle=False, batch_multiple=1,
                         frame_buckets=(64,), token_buckets=(8,))
    ds = SpeechDataset(rows, vocab, bcfg)
    batch = next(make_batches(ds))
    for beam in (1, 3):
        tokens, lengths = decode_batch(model, params, batch,
                                       BeamConfig(beam_size=beam, max_len=8))
        assert tokens.shape[0] == batch["feats"].shape[0]
        assert np.asarray(lengths).min() >= 1


def test_resume_roundtrip(tiny_data, tmp_path):
    """Training N steps == training N/2, resuming, training N/2 more."""
    root, rows, vocab = tiny_data
    model = _model(vocab)
    params = model.init(jax.random.PRNGKey(0))
    lcfg = JointCTCConfig(ctc_factor=0.0)

    def loss_fn(p, batch, rng):
        logits, extra = model.forward(p, batch["feats"], batch["feat_lengths"],
                                      batch["prev_tokens"], rng=None,
                                      deterministic=True)
        return joint_ctc_loss(logits, extra, batch["target"], lcfg)

    bcfg = BatcherConfig(max_tokens=4000, shuffle=False, batch_multiple=1,
                         frame_buckets=(64,), token_buckets=(8,))
    ds = SpeechDataset(rows, vocab, bcfg)

    def batches(epoch):
        for b in make_batches(ds, epoch=epoch):
            b.pop("ids"); b.pop("n_real")
            yield {k: jnp.asarray(v) for k, v in b.items()}

    ocfg = OptimConfig(lr=1e-3, warmup_updates=4, clip_norm=1.0)
    mk = lambda n, d: Trainer(loss_fn, ocfg,
                              LoopConfig(max_updates=n, log_interval=1000,
                                         validate_interval_updates=10**6,
                                         save_dir=str(tmp_path / d)), params)
    tr_full = mk(8, "full")
    tr_full.fit(batches)

    tr_half = mk(4, "half")
    tr_half.fit(batches)
    tr_half.save_last()

    tr_res = mk(8, "res")
    tr_res.resume(str(tmp_path / "half" / "checkpoint_resume"))
    tr_res.fit(batches)

    for a, b in zip(jax.tree.leaves(tr_full.state.params),
                    jax.tree.leaves(tr_res.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_patience_counts_epoch_end_validations_only(tmp_path):
    """fairseq --patience N == N epoch-end validations without improvement
    (mid-epoch interval validations checkpoint but don't burn patience)."""
    from simulst_tpu.train.loop import LoopConfig, Trainer
    from simulst_tpu.train.optim import OptimConfig

    params = {"w": jnp.zeros((2, 2))}
    tr = Trainer(lambda p, b, r: (jnp.zeros(()), {}), OptimConfig(),
                 LoopConfig(save_dir=str(tmp_path), patience=2), params)
    tr._maybe_save_best({"loss": 1.0}, count_patience=True)   # best
    assert tr.bad_epochs == 0
    for _ in range(5):  # mid-epoch validations: no patience burn
        tr._maybe_save_best({"loss": 2.0}, count_patience=False)
    assert tr.bad_epochs == 0
    tr._maybe_save_best({"loss": 2.0}, count_patience=True)
    tr._maybe_save_best({"loss": 2.0}, count_patience=True)
    assert tr.bad_epochs == 2
    tr._maybe_save_best({"loss": 0.5}, count_patience=True)   # new best resets
    assert tr.bad_epochs == 0


def test_checkpoint_metadata_roundtrips_to_python_types(tmp_path):
    """Metadata scalars must come back as PLAIN python values: orbax
    restores every saved scalar as a numpy array, and a numpy 0-d int
    flowing from checkpoint metadata into a rebuilt model config reaches
    jaxpr parameters (e.g. conv feature_group_count) that reject
    non-hashable values — caught by the round-3 hardware smoke when
    stream_eval rebuilt a CIF config from a fresh checkpoint."""
    from simulst_tpu import config as cfglib
    from simulst_tpu.models.s2t_emformer import S2TEmformerConfig

    vocab = Vocabulary.build(["a b"], vocab_size=8)
    model = _model(vocab)
    p = model.init(jax.random.PRNGKey(0))
    meta_in = {"model": "s2t_emformer", "cmvn": "global",
               "config": {"conv_pos_groups": 16, "cif_beta": 1.0,
                          "ctc_layer": True}}
    save_checkpoint(str(tmp_path / "c"), p, metadata=meta_in)
    _, meta = load_checkpoint(str(tmp_path / "c"))
    cfgd = meta["config"]
    assert type(cfgd["conv_pos_groups"]) is int, type(cfgd["conv_pos_groups"])
    assert type(cfgd["cif_beta"]) is float
    assert type(cfgd["ctc_layer"]) is bool
    assert meta["model"] == "s2t_emformer" and isinstance(meta["model"], str)

    # and from_dict coerces even un-sanitized numpy scalars by annotation
    cfg = cfglib.from_dict(S2TEmformerConfig,
                           {"conv_pos_groups": np.int64(16),
                            "dropout": np.float32(0.1),
                            "vocab_size": np.asarray(40)})
    assert type(cfg.conv_pos_groups) is int
    assert type(cfg.dropout) is float
    assert type(cfg.vocab_size) is int
