"""SpecAugment, applied in-model on device.

The reference applies fairseq's SpecAugmentTransform on the host per example
(config written by /root/reference/DATA/data_utils.py:136-209, policy "lb":
2 freq masks F=27, 2 time masks T=100 @ p=1.0, no time warp).  TPU-native:
batched masking with jax RNG inside the jitted train step — no host work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def spec_augment(rng, feats, lengths, *, freq_mask_n: int = 2,
                 freq_mask_f: int = 27, time_mask_n: int = 2,
                 time_mask_t: int = 100, time_mask_p: float = 1.0,
                 mask_value: float = 0.0):
    """feats: (B, T, F); lengths: (B,). Returns masked feats."""
    b, t, f = feats.shape
    out = feats

    def uniform_int(key, maxval, shape):
        # U[0, maxval) with per-example maxval (maxval >= 1)
        u = jax.random.uniform(key, shape)
        return jnp.floor(u * maxval).astype(jnp.int32)

    keys = jax.random.split(rng, 2 * (freq_mask_n + time_mask_n))
    ki = 0
    for _ in range(freq_mask_n):
        width = uniform_int(keys[ki], freq_mask_f + 1, (b, 1)); ki += 1
        start = uniform_int(keys[ki], jnp.maximum(f - width, 1), (b, 1)); ki += 1
        mask = (jnp.arange(f)[None, :] >= start) & \
               (jnp.arange(f)[None, :] < start + width)
        out = jnp.where(mask[:, None, :], mask_value, out)
    for _ in range(time_mask_n):
        max_t = jnp.minimum(time_mask_t,
                            (lengths.astype(jnp.float32) * time_mask_p)
                            .astype(jnp.int32))[:, None]
        width = uniform_int(keys[ki], jnp.maximum(max_t, 0) + 1, (b, 1)); ki += 1
        start = uniform_int(keys[ki],
                            jnp.maximum(lengths[:, None] - width, 1), (b, 1)); ki += 1
        mask = (jnp.arange(t)[None, :] >= start) & \
               (jnp.arange(t)[None, :] < start + width)
        out = jnp.where(mask[:, :, None], mask_value, out)
    return out
