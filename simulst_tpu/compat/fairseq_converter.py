"""fairseq (PyTorch) checkpoint -> simulst_tpu param pytree.

Converts reference checkpoints (format {"cfg": ..., "model": state_dict};
SURVEY.md §5.4) for parity evaluation.  Layout transforms:

  torch Linear (out, in)            -> ours (in, out)          [transpose]
  torch Conv1d (Cout, Cin/g, K)     -> ours (K, Cin/g, Cout)   [permute 2,1,0]
  fairseq ConvTBC (K, Cin, Cout)    -> ours (K, Cin, Cout)     [direct]
  weight-norm conv pos g (1,1,K)    -> ours (K,1,1)
  LayerNorm weight/bias             -> scale/bias

Surgical behaviors mirrored from the reference:
  * drop/ignore CTC & CIF projections when absent on either side
    (s2t_emformer.py:280-294, cif_transformer.py:323-337)
  * legacy decoder.ctc_layer -> encoder.ctc_layer (cif_transformer.py:100-108)
  * waitk ties soft projections to monotonic
    (monotonic_multihead_attention.py:523-529)
"""
from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

logger = logging.getLogger(__name__)


def load_fairseq_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["model"] if "model" in ckpt else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}, ckpt.get("cfg")


def _t(x):  # torch Linear -> (in, out)
    return np.ascontiguousarray(x.T)


def _conv(x):  # (Cout, Cin/g, K) -> (K, Cin/g, Cout)
    return np.ascontiguousarray(np.transpose(x, (2, 1, 0)))


def _set(tree, path, value, expect_shape=True):
    node = tree
    for p in path[:-1]:
        node = node[p]
    old = node[path[-1]]
    if expect_shape and tuple(old.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {path}: {old.shape} vs {value.shape}")
    import jax.numpy as jnp
    node[path[-1]] = jnp.asarray(value, old.dtype)


def _linear(tree, path, sd, name, bias=True):
    _set(tree, path + ["weight"], _t(sd[name + ".weight"]))
    if bias and name + ".bias" in sd:
        _set(tree, path + ["bias"], sd[name + ".bias"])


def _ln(tree, path, sd, name):
    _set(tree, path + ["scale"], sd[name + ".weight"])
    _set(tree, path + ["bias"], sd[name + ".bias"])


def _mha(tree, path, sd, name):
    for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _linear(tree, path + [p], sd, f"{name}.{p}")


def convert_encoder(params, sd, prefix="encoder."):
    """S2TEmformerEncoder weights (s2t_emformer.py:37-105)."""
    enc = params["encoder"]
    # subsampler
    for i in range(len(enc["subsample"]["layers"])):
        name = f"{prefix}subsample.conv_layers.{i}"
        _set(enc, ["subsample", "layers", i, "weight"], _conv(sd[name + ".weight"]))
        _set(enc, ["subsample", "layers", i, "bias"], sd[name + ".bias"])
    # conv positional embedding (weight-normed)
    g = sd[f"{prefix}embed_positions.conv.weight_g"]       # (1, 1, K)
    v = sd[f"{prefix}embed_positions.conv.weight_v"]       # (Cout, Cin/g, K)
    _set(enc, ["conv_pos", "g"], np.transpose(g, (2, 1, 0)))
    _set(enc, ["conv_pos", "v"], _conv(v))
    _set(enc, ["conv_pos", "bias"], sd[f"{prefix}embed_positions.conv.bias"])
    # emformer layers
    for i, layer in enumerate(enc["emformer"]["layers"]):
        name = f"{prefix}emformer_blocks.emformer_layers.{i}"
        _linear(enc, ["emformer", "layers", i, "attention", "emb_to_key_value"],
                sd, f"{name}.attention.emb_to_key_value")
        _linear(enc, ["emformer", "layers", i, "attention", "emb_to_query"],
                sd, f"{name}.attention.emb_to_query")
        _linear(enc, ["emformer", "layers", i, "attention", "out_proj"],
                sd, f"{name}.attention.out_proj")
        _ln(enc, ["emformer", "layers", i, "pos_ff", "ln"], sd, f"{name}.pos_ff.0")
        _linear(enc, ["emformer", "layers", i, "pos_ff", "fc1"], sd, f"{name}.pos_ff.1")
        _linear(enc, ["emformer", "layers", i, "pos_ff", "fc2"], sd, f"{name}.pos_ff.4")
        _ln(enc, ["emformer", "layers", i, "ln_input"], sd,
            f"{name}.layer_norm_input")
    _ln(enc, ["emformer", "final_ln"], sd,
        f"{prefix}emformer_blocks.final_layer_norm")
    # ctc head (optional on both sides; reference drops it when unused)
    ctc_name = f"{prefix}ctc_layer.weight"
    if "ctc_layer" in enc and ctc_name in sd:
        _set(enc, ["ctc_layer", "weight"], _t(sd[ctc_name]))
    elif "ctc_layer" in enc:
        logger.warning("checkpoint has no ctc_layer; keeping random init")
    elif ctc_name in sd:
        logger.warning("discarding checkpoint ctc_layer (model has none)")


def convert_decoder_layer(dec, i, sd, name, cross_attn="standard"):
    _mha(dec, ["layers", i, "self_attn"], sd, f"{name}.self_attn")
    _ln(dec, ["layers", i, "self_attn_ln"], sd, f"{name}.self_attn_layer_norm")
    if cross_attn == "standard":
        _mha(dec, ["layers", i, "encoder_attn"], sd, f"{name}.encoder_attn")
    elif cross_attn == "mma":
        _mha(dec, ["layers", i, "encoder_attn"], sd, f"{name}.encoder_attn")
        for p, src in (("q_proj_soft", "q_proj_soft"), ("k_proj_soft", "k_proj_soft")):
            full = f"{name}.encoder_attn.{src}.weight"
            if p in dec["layers"][i]["encoder_attn"]:
                if full in sd:
                    _linear(dec, ["layers", i, "encoder_attn", p], sd,
                            f"{name}.encoder_attn.{src}")
                else:  # waitk ties soft == monotonic
                    _linear(dec, ["layers", i, "encoder_attn", p], sd,
                            f"{name}.encoder_attn.{src.replace('_soft', '')}")
        eb = f"{name}.encoder_attn.energy_bias"
        if eb in sd and "energy_bias" in dec["layers"][i]["encoder_attn"]:
            _set(dec, ["layers", i, "encoder_attn", "energy_bias"], sd[eb])
    elif cross_attn == "fake":
        _linear(dec, ["layers", i, "encoder_attn", "q_proj"], sd,
                f"{name}.encoder_attn.q_proj", bias=False)
        _linear(dec, ["layers", i, "encoder_attn", "k_proj"], sd,
                f"{name}.encoder_attn.k_proj")
        _linear(dec, ["layers", i, "encoder_attn", "out_proj"], sd,
                f"{name}.encoder_attn.out_proj")
    if cross_attn != "none":
        _ln(dec, ["layers", i, "encoder_attn_ln"], sd,
            f"{name}.encoder_attn_layer_norm")
    _linear(dec, ["layers", i, "fc1"], sd, f"{name}.fc1")
    _linear(dec, ["layers", i, "fc2"], sd, f"{name}.fc2")
    _ln(dec, ["layers", i, "final_ln"], sd, f"{name}.final_layer_norm")


def convert_decoder(params, sd, cross_attn="standard", prefix="decoder."):
    dec = params["decoder"]
    _set(dec, ["embed_tokens", "weight"], sd[f"{prefix}embed_tokens.weight"])
    for i in range(len(dec["layers"])):
        convert_decoder_layer(dec, i, sd, f"{prefix}layers.{i}", cross_attn)
    _ln(dec, ["layer_norm"], sd, f"{prefix}layer_norm")
    op = f"{prefix}output_projection.weight"
    if "output_projection" in dec and op in sd:
        _set(dec, ["output_projection", "weight"], _t(sd[op]))


def convert_s2t_emformer(params, sd):
    convert_encoder(params, sd)
    convert_decoder(params, sd, cross_attn="standard")
    return params


def convert_mma(params, sd):
    convert_encoder(params, sd)
    convert_decoder(params, sd, cross_attn="mma")
    return params


def convert_cif(params, sd):
    # legacy: decoder.ctc_layer -> encoder.ctc_layer (cif_transformer:100-108)
    sd = dict(sd)
    for k in list(sd):
        if k.startswith("decoder.ctc_layer."):
            sd["encoder." + k[len("decoder."):]] = sd.pop(k)
    convert_encoder(params, sd)
    # cif layer: alpha_proj = [CausalConvTBC, LayerNorm, GELU, Dropout, Linear]
    cname = "encoder.cif_layer.alpha_proj"
    if f"{cname}.0.weight" in sd:
        _set(params, ["cif", "conv", "weight"], sd[f"{cname}.0.weight"])  # TBC
        _set(params, ["cif", "conv", "bias"], sd[f"{cname}.0.bias"])
        _ln(params, ["cif", "ln"], sd, f"{cname}.1")
        _linear(params, ["cif", "proj"], sd, f"{cname}.4")
    else:
        logger.warning("checkpoint has no cif_layer; keeping random init "
                       "(reference load_state_dict does the same)")
    cross = "fake"
    if any(k.startswith("decoder.layers.0.encoder_attn.v_proj") for k in sd):
        cross = "standard"  # cif_infinite_lookback variant
    convert_decoder(params, sd, cross_attn=cross)
    return params


def convert_transducer(params, sd):
    """transducer_model checkpoints: label encoder (decoder layers without
    cross-attention) + SimpleJoiner projections
    (transducer_model.py:28-122)."""
    convert_encoder(params, sd)
    convert_decoder(params, sd, cross_attn="none")
    dec = params["decoder"]
    _linear(dec, ["joiner", "source_projection"], sd,
            "decoder.joiner.source_projection")
    _linear(dec, ["joiner", "target_projection"], sd,
            "decoder.joiner.target_projection", bias=False)
    return params


CONVERTERS = {
    "s2t_emformer": convert_s2t_emformer,
    "mma": convert_mma,
    "cif": convert_cif,
    "transducer": convert_transducer,
}


def convert(model_name: str, params, checkpoint_path: str):
    sd, _ = load_fairseq_checkpoint(checkpoint_path)
    return CONVERTERS[model_name](params, sd)
