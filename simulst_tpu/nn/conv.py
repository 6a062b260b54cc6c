"""Causal convolutions with static-shape streaming caches.

Re-designs the reference's incremental causal convs
(/root/reference/codebase/modules/causal_conv.py:11-162) TPU-first:

* Offline: left-pad (k-1) zeros, single `lax.conv_general_dilated` call.
* Streaming: the cache is a FIXED-SIZE (B, k-1, C) buffer holding the last
  k-1 input frames (zero-initialized == the left pad), so each chunk step is
  a static-shape jittable function.  The reference instead concatenates the
  full unbounded history (causal_conv.py:64-69); only the last k-1 frames are
  ever read, so a ring of k-1 is semantically identical.

Stride alignment contract: for stride-s convs, streaming == offline requires
every chunk length to be a multiple of s (the reference relies on the same
property implicitly via its chunk geometry; see
/root/reference/codebase/agents/default_agent.py:163-169).

Conv weights are stored JAX-style (K, Cin/groups, Cout); the fairseq
converter transposes torch's (Cout, Cin/g, K).
"""
from __future__ import annotations

import functools
import math
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from simulst_tpu.nn.core import gelu, glu


def conv1d_init(key, in_channels: int, out_channels: int, kernel_size: int,
                groups: int = 1, bias: bool = True, dtype=jnp.float32):
    """torch.nn.Conv1d default init (kaiming_uniform a=sqrt(5))."""
    kw, kb = jax.random.split(key)
    fan_in = (in_channels // groups) * kernel_size
    bound = math.sqrt(1.0 / fan_in)
    w = jax.random.uniform(kw, (kernel_size, in_channels // groups, out_channels),
                           dtype, -bound, bound)
    p = {"weight": w}
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_channels,), dtype, -bound, bound)
    return p


def _conv1d(x, w, stride: int, groups: int = 1):
    """x: (B, T, Cin); w: (K, Cin/groups, Cout) -> (B, T', Cout). VALID padding."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )


def causal_conv1d(p, x, stride: int = 1, groups: int = 1):
    """Offline causal conv: left-pad k-1 zeros. x: (B, T, Cin)."""
    k = p["weight"].shape[0]
    x = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    y = _conv1d(x, p["weight"], stride, groups)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


class ConvCache(NamedTuple):
    """Last k-1 input frames (zeros == initial left pad)."""
    feat: jnp.ndarray  # (B, k-1, Cin)


def causal_conv1d_init_cache(p, batch: int, in_channels: int, dtype=jnp.float32) -> ConvCache:
    k = p["weight"].shape[0]
    return ConvCache(feat=jnp.zeros((batch, k - 1, in_channels), dtype))


def causal_conv1d_step(p, cache: ConvCache, x, stride: int = 1, groups: int = 1
                       ) -> Tuple[jnp.ndarray, ConvCache]:
    """Streaming causal conv on a new chunk. x: (B, c, Cin), c % stride == 0.

    Matches the reference's incremental path (causal_conv.py:57-74): conv over
    [cache(k-1), chunk], then cache <- last k-1 frames of that concatenation.
    """
    k = p["weight"].shape[0]
    full = jnp.concatenate([cache.feat, x], axis=1)  # (B, k-1+c, Cin)
    y = _conv1d(full, p["weight"], stride, groups)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    new_cache = ConvCache(feat=full[:, full.shape[1] - (k - 1):, :])
    return y, new_cache


def conv_out_length(length, kernel_size: int, stride: int):
    """Output length of the causal conv: floor((L + (k-1) - (k-1) - 1)/s) + 1.
    Mirrors CausalConv1dSubsampler.get_out_seq_lens_tensor (causal_conv.py:133-138)."""
    return jnp.floor((length.astype(jnp.float32) - 1) / stride).astype(jnp.int32) + 1


# ---------------------------------------------------------------------------
# CausalConv1dSubsampler: 2x (stride-2 causal conv + GLU), 4x subsampling
# (reference: causal_conv.py:101-162)
# ---------------------------------------------------------------------------

def subsampler_init(key, in_channels: int, mid_channels: int, out_channels: int,
                    kernel_sizes: Sequence[int] = (5, 5), dtype=jnp.float32):
    n = len(kernel_sizes)
    keys = jax.random.split(key, n)
    layers = []
    for i, k in enumerate(kernel_sizes):
        cin = in_channels if i == 0 else mid_channels // 2
        cout = mid_channels if i < n - 1 else out_channels * 2
        layers.append(conv1d_init(keys[i], cin, cout, k, dtype=dtype))
    return {"layers": layers}


def subsampler_out_lengths(p, lengths):
    out = lengths
    for layer in p["layers"]:
        out = conv_out_length(out, layer["weight"].shape[0], 2)
    return out


def subsampler_apply(p, x, lengths):
    """x: (B, T, F) -> (B, ceil(T/4), D), out_lengths."""
    for layer in p["layers"]:
        x = causal_conv1d(layer, x, stride=2)
        x = glu(x, axis=-1)
    return x, subsampler_out_lengths(p, lengths)


class SubsamplerCache(NamedTuple):
    caches: Tuple[ConvCache, ...]


def subsampler_init_cache(p, batch: int, dtype=jnp.float32) -> SubsamplerCache:
    caches = []
    for i, layer in enumerate(p["layers"]):
        k, cin_g, _ = layer["weight"].shape
        caches.append(ConvCache(feat=jnp.zeros((batch, k - 1, cin_g), dtype)))
    return SubsamplerCache(caches=tuple(caches))


def subsampler_step(p, cache: SubsamplerCache, x) -> Tuple[jnp.ndarray, SubsamplerCache]:
    """Streaming subsample of a NEW chunk (B, c, F), c % 4 == 0 for parity."""
    new_caches = []
    for layer, c in zip(p["layers"], cache.caches):
        x, nc = causal_conv1d_step(layer, c, x, stride=2)
        x = glu(x, axis=-1)
        new_caches.append(nc)
    return x, SubsamplerCache(caches=tuple(new_caches))


# ---------------------------------------------------------------------------
# Causal convolutional positional embedding (weight-normed grouped conv + GELU)
# (reference: codebase/models/s2t_transformer.py:114-153, causal variant)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# CausalVGGBlock: alternative ConvTransformer pre-net
# (reference causal_conv.py:165-228; unused by the shipped recipes but part
# of the module inventory)
# ---------------------------------------------------------------------------

def _conv2d(x, w, stride):
    """x: (B, T, F, Cin); w: (Kt, Kf, Cin, Cout)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def vgg_block_init(key, input_dim: int = 80, in_channels: int = 1,
                   mid_channels: int = 256, out_channels: int = 256,
                   kernel_sizes: Sequence[int] = (3, 3), dtype=jnp.float32):
    keys = jax.random.split(key, len(kernel_sizes) + 1)
    layers = []
    f = input_dim
    for i, k in enumerate(kernel_sizes):
        cin = in_channels if i == 0 else mid_channels
        fan_in = cin * k * k
        bound = math.sqrt(1.0 / fan_in)
        layers.append({
            "weight": jax.random.uniform(keys[i], (k, k, cin, mid_channels),
                                         dtype, -bound, bound),
            "bias": jax.random.uniform(keys[i], (mid_channels,), dtype,
                                       -bound, bound)})
        # freq dim: SAME pad k//2 both sides, stride 2
        f = (f + 2 * (k // 2) - k) // 2 + 1
    from simulst_tpu.nn.core import linear_init
    return {"layers": layers,
            "out": linear_init(keys[-1], f * mid_channels, out_channels,
                               dtype=dtype),
            "kernel_sizes": tuple(kernel_sizes)}


def vgg_block_apply(p, x, lengths):
    """x: (B, T, F) -> (B, T', D); causal in time (left pad k-1), SAME in
    frequency; stride 2 in both."""
    from simulst_tpu.nn.core import linear
    h = x[:, :, :, None]                                  # (B, T, F, 1)
    for layer, k in zip(p["layers"], p["kernel_sizes"]):
        h = jnp.pad(h, ((0, 0), (k - 1, 0), (k // 2, k // 2), (0, 0)))
        h = _conv2d(h, layer["weight"], 2) + layer["bias"].astype(h.dtype)
        h = jax.nn.relu(h)
        lengths = conv_out_length(lengths, k, 2)
    b, t, f, c = h.shape
    return linear(p["out"], h.reshape(b, t, f * c)), lengths


def conv_pos_init(key, embed_dim: int, conv_pos: int, groups: int, dtype=jnp.float32):
    """Causal conv-pos: kernel (conv_pos+1)//2, grouped, weight-norm over
    (Cin/g, Cout) per tap k (torch weight_norm dim=2 on (Cout,Cin/g,K))."""
    k = (conv_pos + 1) // 2
    std = math.sqrt(4.0 / (conv_pos * embed_dim))
    v = std * jax.random.normal(key, (k, embed_dim // groups, embed_dim), dtype)
    g = jnp.sqrt((v.astype(jnp.float32) ** 2).sum(axis=(1, 2), keepdims=True))
    return {"v": v, "g": g.astype(dtype), "bias": jnp.zeros((embed_dim,), dtype)}


def _conv_pos_weight(p):
    v = p["v"].astype(jnp.float32)
    norm = jnp.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True)) + 1e-12
    return (p["g"].astype(jnp.float32) * v / norm)


def _grouped_conv_valid(xp, w, groups: int):
    return _conv1d(xp, w, 1, groups)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _grouped_conv_fast_wgrad(xp, w, groups: int):
    """VALID grouped conv whose backward computes the WEIGHT grad with the
    tap-gridded Pallas kernel (ops/conv_pos_pallas.py) — XLA's grouped wgrad
    conv ran ~0.7 ms/step at the production geometry with (16,16) channel
    tiles; the kernel runs it as full-width MXU matmuls (~0.35 ms).  The
    forward and the data grad stay in XLA (already fine)."""
    return _grouped_conv_valid(xp, w, groups)


def _gcfw_fwd(xp, w, groups):
    return _grouped_conv_valid(xp, w, groups), (xp, w)


def _gcfw_bwd(groups, res, gy):
    from simulst_tpu.ops.conv_pos_pallas import convpos_wgrad_pallas
    xp, w = res
    k = w.shape[0]
    _, dx_vjp = jax.vjp(lambda x_: _grouped_conv_valid(x_, w, groups), xp)
    (dxp,) = dx_vjp(gy)
    dw = convpos_wgrad_pallas(xp, gy, k, groups).astype(w.dtype)
    return dxp, dw


_grouped_conv_fast_wgrad.defvjp(_gcfw_fwd, _gcfw_bwd)


def conv_pos_apply(p, x, groups: int):
    """x: (B, T, D) -> positional features (B, T, D) (GELU'd)."""
    from simulst_tpu.ops.conv_pos_pallas import convpos_wgrad_supported
    w = _conv_pos_weight(p).astype(x.dtype)
    k = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    if convpos_wgrad_supported(xp, x.shape[-1], groups):
        y = _grouped_conv_fast_wgrad(xp, w, groups)
    else:
        y = _conv1d(xp, w, 1, groups)
    y = y + p["bias"].astype(x.dtype)
    return gelu(y)


def conv_pos_init_cache(p, batch: int, embed_dim: int, dtype=jnp.float32) -> ConvCache:
    k = p["v"].shape[0]
    return ConvCache(feat=jnp.zeros((batch, k - 1, embed_dim), dtype))


def conv_pos_step(p, cache: ConvCache, x, groups: int) -> Tuple[jnp.ndarray, ConvCache]:
    w = _conv_pos_weight(p).astype(x.dtype)
    k = w.shape[0]
    full = jnp.concatenate([cache.feat, x], axis=1)
    y = _conv1d(full, w, 1, groups) + p["bias"].astype(x.dtype)
    new_cache = ConvCache(feat=full[:, full.shape[1] - (k - 1):, :])
    return gelu(y), new_cache
