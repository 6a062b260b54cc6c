"""Converter consistency: fabricate a fairseq-layout state dict from a
randomly-initialized torch-side view, convert, and check every targeted leaf
changed + forward still runs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simulst_tpu.compat import fairseq_converter as fc
from simulst_tpu.models.cif import CIFConfig, CIFModel
from simulst_tpu.models.mma import MMAConfig, MMAModel
from simulst_tpu.models.s2t_emformer import S2TEmformerConfig, S2TEmformerModel


def small_kwargs():
    return dict(vocab_size=20, input_feat=8, conv_channels=16, embed_dim=16,
                ffn_dim=32, encoder_layers=2, encoder_heads=2,
                decoder_layers=2, decoder_heads=2, decoder_ffn_dim=32,
                segment_length=16, left_context=32, right_context=8,
                max_memory=2, ctc_layer=True)


def fake_sd_for_encoder(cfg, rng):
    sd = {}
    d = cfg.embed_dim
    ks = cfg.conv_kernel_sizes
    chans = [(cfg.input_feat, cfg.conv_channels), (cfg.conv_channels // 2, d * 2)]
    for i, (cin, cout) in enumerate(chans):
        sd[f"encoder.subsample.conv_layers.{i}.weight"] = rng.randn(cout, cin, ks[i]).astype(np.float32)
        sd[f"encoder.subsample.conv_layers.{i}.bias"] = rng.randn(cout).astype(np.float32)
    k = (cfg.conv_pos + 1) // 2
    g = cfg.conv_pos_groups
    sd["encoder.embed_positions.conv.weight_g"] = rng.randn(1, 1, k).astype(np.float32)
    sd["encoder.embed_positions.conv.weight_v"] = rng.randn(d, d // g, k).astype(np.float32)
    sd["encoder.embed_positions.conv.bias"] = rng.randn(d).astype(np.float32)
    for i in range(cfg.encoder_layers):
        p = f"encoder.emformer_blocks.emformer_layers.{i}"
        sd[f"{p}.attention.emb_to_key_value.weight"] = rng.randn(2 * d, d).astype(np.float32)
        sd[f"{p}.attention.emb_to_key_value.bias"] = rng.randn(2 * d).astype(np.float32)
        sd[f"{p}.attention.emb_to_query.weight"] = rng.randn(d, d).astype(np.float32)
        sd[f"{p}.attention.emb_to_query.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.attention.out_proj.weight"] = rng.randn(d, d).astype(np.float32)
        sd[f"{p}.attention.out_proj.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.pos_ff.0.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.pos_ff.0.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.pos_ff.1.weight"] = rng.randn(cfg.ffn_dim, d).astype(np.float32)
        sd[f"{p}.pos_ff.1.bias"] = rng.randn(cfg.ffn_dim).astype(np.float32)
        sd[f"{p}.pos_ff.4.weight"] = rng.randn(d, cfg.ffn_dim).astype(np.float32)
        sd[f"{p}.pos_ff.4.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.layer_norm_input.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.layer_norm_input.bias"] = rng.randn(d).astype(np.float32)
    sd["encoder.emformer_blocks.final_layer_norm.weight"] = rng.randn(d).astype(np.float32)
    sd["encoder.emformer_blocks.final_layer_norm.bias"] = rng.randn(d).astype(np.float32)
    sd["encoder.ctc_layer.weight"] = rng.randn(cfg.vocab_size, d).astype(np.float32)
    return sd


def fake_sd_for_decoder(cfg, rng, cross="standard"):
    sd = {}
    d = cfg.embed_dim
    sd["decoder.embed_tokens.weight"] = rng.randn(cfg.vocab_size, d).astype(np.float32)
    for i in range(cfg.decoder_layers):
        p = f"decoder.layers.{i}"
        for mod in ["self_attn"]:
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[f"{p}.{mod}.{proj}.weight"] = rng.randn(d, d).astype(np.float32)
                sd[f"{p}.{mod}.{proj}.bias"] = rng.randn(d).astype(np.float32)
        if cross in ("standard", "mma"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[f"{p}.encoder_attn.{proj}.weight"] = rng.randn(d, d).astype(np.float32)
                sd[f"{p}.encoder_attn.{proj}.bias"] = rng.randn(d).astype(np.float32)
        if cross == "mma":
            for proj in ("q_proj_soft", "k_proj_soft"):
                sd[f"{p}.encoder_attn.{proj}.weight"] = rng.randn(d, d).astype(np.float32)
                sd[f"{p}.encoder_attn.{proj}.bias"] = rng.randn(d).astype(np.float32)
        if cross == "fake":
            sd[f"{p}.encoder_attn.q_proj.weight"] = rng.randn(d, d).astype(np.float32)
            sd[f"{p}.encoder_attn.k_proj.weight"] = rng.randn(d, d).astype(np.float32)
            sd[f"{p}.encoder_attn.k_proj.bias"] = rng.randn(d).astype(np.float32)
            sd[f"{p}.encoder_attn.out_proj.weight"] = rng.randn(d, d).astype(np.float32)
            sd[f"{p}.encoder_attn.out_proj.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.self_attn_layer_norm.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.self_attn_layer_norm.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.encoder_attn_layer_norm.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.encoder_attn_layer_norm.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.fc1.weight"] = rng.randn(cfg.decoder_ffn_dim, d).astype(np.float32)
        sd[f"{p}.fc1.bias"] = rng.randn(cfg.decoder_ffn_dim).astype(np.float32)
        sd[f"{p}.fc2.weight"] = rng.randn(d, cfg.decoder_ffn_dim).astype(np.float32)
        sd[f"{p}.fc2.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.final_layer_norm.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{p}.final_layer_norm.bias"] = rng.randn(d).astype(np.float32)
    sd["decoder.layer_norm.weight"] = rng.randn(d).astype(np.float32)
    sd["decoder.layer_norm.bias"] = rng.randn(d).astype(np.float32)
    return sd


def test_convert_s2t_emformer_overwrites_and_runs():
    cfg = S2TEmformerConfig(**small_kwargs())
    model = S2TEmformerModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    sd = {**fake_sd_for_encoder(cfg, rng), **fake_sd_for_decoder(cfg, rng)}
    before = jax.tree.leaves(params)
    params = fc.convert_s2t_emformer(params, sd)
    after = jax.tree.leaves(params)
    changed = sum(not np.allclose(a, b) for a, b in zip(before, after))
    assert changed >= len(before) - 1  # all leaves replaced (emb may tie)
    # the converted model still runs
    feats = jnp.zeros((1, 40, cfg.input_feat))
    logits, _ = model.forward(params, feats, jnp.array([40]),
                              jnp.array([[2, 5, 6]]))
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_cif_legacy_ctc_key():
    cfg = CIFConfig(**small_kwargs())
    model = CIFModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    sd = {**fake_sd_for_encoder(cfg, rng),
          **fake_sd_for_decoder(cfg, rng, cross="fake")}
    # legacy checkpoints put ctc under decoder (cif_transformer.py:100-108)
    sd["decoder.ctc_layer.weight"] = sd.pop("encoder.ctc_layer.weight")
    d = cfg.embed_dim
    sd["encoder.cif_layer.alpha_proj.0.weight"] = rng.randn(
        cfg.cif_conv_kernel, d, d).astype(np.float32)
    sd["encoder.cif_layer.alpha_proj.0.bias"] = rng.randn(d).astype(np.float32)
    sd["encoder.cif_layer.alpha_proj.1.weight"] = rng.randn(d).astype(np.float32)
    sd["encoder.cif_layer.alpha_proj.1.bias"] = rng.randn(d).astype(np.float32)
    sd["encoder.cif_layer.alpha_proj.4.weight"] = rng.randn(1, d).astype(np.float32)
    sd["encoder.cif_layer.alpha_proj.4.bias"] = rng.randn(1).astype(np.float32)
    legacy_ctc = sd["decoder.ctc_layer.weight"]
    params = fc.convert_cif(params, sd)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["ctc_layer"]["weight"]), legacy_ctc.T)


def test_convert_mma_waitk_ties_soft_projections():
    cfg = MMAConfig(**small_kwargs(), simul_attn_type="waitk_fixed_pre_decision",
                    waitk_lagging=3)
    model = MMAModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    sd = {**fake_sd_for_encoder(cfg, rng),
          **fake_sd_for_decoder(cfg, rng, cross="mma")}
    # waitk checkpoints may lack the soft projections entirely
    for k in list(sd):
        if "_soft" in k:
            del sd[k]
    params = fc.convert_mma(params, sd)
    attn0 = params["decoder"]["layers"][0]["encoder_attn"]
    if "q_proj_soft" in attn0:
        np.testing.assert_allclose(np.asarray(attn0["q_proj_soft"]["weight"]),
                                   np.asarray(attn0["q_proj"]["weight"]))
