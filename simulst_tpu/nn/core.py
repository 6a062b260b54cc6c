"""Core parameter-dict primitives.

Every module here is a pair of pure functions:
  ``*_init(key, ...) -> params``   (params = nested dict of jnp arrays)
  ``apply(params, x, ...) -> y``

This functional style (rather than a Module framework) is deliberate: the
streaming models thread explicit state pytrees through jitted step functions,
and checkpoint conversion from the PyTorch reference is a plain dict mapping.

Numerics parity notes vs the reference (fairseq/torch):
  * LayerNorm eps = 1e-5 (torch default).
  * GELU is the exact erf form (torch.nn.GELU default), NOT jax's default
    tanh approximation.
  * Softmax is computed in float32 regardless of activation dtype
    (reference: codebase/models/torchaudio_models/emformer.py:144-145).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# fp16/bf16-safe "minus infinity" used by the reference for masking
# (codebase/models/s2t_emformer.py:89): -1e4 under fp16 else -1e8.
NEG_INF_BF16 = -1e4
NEG_INF_F32 = -1e8


def neg_inf(dtype) -> float:
    return NEG_INF_F32 if dtype == jnp.float32 else NEG_INF_BF16


def gelu(x):
    """Exact (erf) GELU, matching torch.nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def glu(x, axis=-1):
    """Gated linear unit, matching torch.nn.functional.glu."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": gelu,
    "silu": jax.nn.silu,
    "tanh": jnp.tanh,
}


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32,
                   fan_in: Optional[int] = None, fan_out: Optional[int] = None):
    """torch.nn.init.xavier_uniform_ semantics for a 2D (in, out) weight."""
    if fan_in is None:
        fan_in = shape[0]
    if fan_out is None:
        fan_out = shape[-1]
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def kaiming_uniform_linear(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default weight init (kaiming_uniform, a=sqrt(5)) for an
    (in, out)-shaped JAX weight (fan_in = shape[0])."""
    fan_in = shape[0]
    bound = math.sqrt(1.0 / fan_in)  # gain(sqrt5)*sqrt(3/fan_in) = sqrt(1/fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal_init(key, shape, std: float, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                init: str = "torch", gain: float = 1.0, dtype=jnp.float32):
    """Weight stored as (in, out): y = x @ W + b."""
    kw, kb = jax.random.split(key)
    if init == "torch":
        w = kaiming_uniform_linear(kw, (in_dim, out_dim), dtype)
    elif init == "xavier":
        w = xavier_uniform(kw, (in_dim, out_dim), gain=gain, dtype=dtype)
    elif init == "normal":
        w = normal_init(kw, (in_dim, out_dim), std=gain, dtype=dtype)
    elif init == "zeros":
        w = jnp.zeros((in_dim, out_dim), dtype)
    else:
        raise ValueError(init)
    p = {"weight": w}
    if bias:
        bound = math.sqrt(1.0 / in_dim) if init == "torch" else 0.0
        p["bias"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound) \
            if init == "torch" else jnp.zeros((out_dim,), dtype)
    return p


def linear(p, x):
    y = x @ p["weight"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# layer norm
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-5):
    # Compute statistics in fp32 for stability under bf16 activations.
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# embedding
# ---------------------------------------------------------------------------

def embedding_init(key, num_embeddings: int, dim: int, padding_idx: Optional[int] = None,
                   dtype=jnp.float32):
    """fairseq Embedding: normal(0, d^-0.5), padding row zeroed
    (reference: fairseq.models.transformer.Embedding)."""
    w = normal_init(key, (num_embeddings, dim), std=dim ** -0.5, dtype=dtype)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"weight": w}


def embedding(p, ids, dtype=None):
    w = p["weight"]
    if dtype is not None:
        w = w.astype(dtype)
    return w[ids]


# ---------------------------------------------------------------------------
# dropout
# ---------------------------------------------------------------------------

def dropout(rng, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# masks / lengths
# ---------------------------------------------------------------------------

def lengths_to_padding_mask(lengths, max_len: int):
    """(B,) -> (B, T) bool mask, True on PAD positions (fairseq convention)."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def lengths_to_mask(lengths, max_len: int):
    """(B,) -> (B, T) bool mask, True on VALID positions."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]
