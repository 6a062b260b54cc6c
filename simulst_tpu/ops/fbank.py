"""Kaldi-compliance 80-dim log-mel filterbank, NumPy + JAX twins.

Replaces the reference's native fbank frontends — pykaldi C++ and
torchaudio's kaldi-compliance implementation
(/root/reference/DATA/data_utils.py:73-98,
 /root/reference/codebase/agents/default_agent.py:28-72) — with one spec
implemented twice: a NumPy version for the offline data pipeline and a jnp
version for the online streaming agent (fusable with the conv subsampler).

Parameters pinned to the reference's usage: 16kHz, 25ms window / 10ms shift,
snip_edges, dither=0, remove_dc_offset, preemphasis 0.97, povey window,
round-to-pow2 FFT (512), 80 mel bins over [20Hz, Nyquist], log with the
float32-epsilon floor.  Input waveforms are scaled by 2**15 by callers
(data_utils.py:85-86) to match kaldi's int16 convention.
"""
from __future__ import annotations

import functools
import math

import numpy as np

EPSILON = 1.1920928955078125e-07   # torchaudio kaldi-compliance epsilon
MILLISECONDS_TO_SECONDS = 0.001


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@functools.lru_cache(maxsize=8)
def mel_banks(num_bins: int, window_length_padded: int, sample_freq: float,
              low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi MelBanks triangular weights: (num_bins, num_fft_bins)."""
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_freq / window_length_padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.arange(num_bins)[:, None]
    left = mel_low + bins * mel_delta
    center = mel_low + (bins + 1) * mel_delta
    right = mel_low + (bins + 2) * mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins)[None, :]
    mel = mel_scale(freqs)
    up = (mel - left) / (center - left)
    down = (right - mel) / (right - center)
    return np.maximum(0.0, np.minimum(up, down)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def povey_window(window_size: int) -> np.ndarray:
    n = np.arange(window_size)
    hann = 0.5 - 0.5 * np.cos(2.0 * math.pi * n / (window_size - 1))
    return (hann ** 0.85).astype(np.float32)


def frame_params(sample_rate: int = 16000, frame_length_ms: float = 25.0,
                 frame_shift_ms: float = 10.0):
    window_size = int(sample_rate * frame_length_ms * MILLISECONDS_TO_SECONDS)
    window_shift = int(sample_rate * frame_shift_ms * MILLISECONDS_TO_SECONDS)
    return window_size, window_shift, _next_pow2(window_size)


def num_frames(n_samples: int, sample_rate: int = 16000) -> int:
    window_size, window_shift, _ = frame_params(sample_rate)
    if n_samples < window_size:
        return 0
    return 1 + (n_samples - window_size) // window_shift


def _fbank_core(xp, frames, window_size, padded, n_mels, sample_rate,
                preemph=0.97, remove_dc=True):
    """Shared math; xp = np or jnp. frames: (..., N, window_size)."""
    x = frames.astype(xp.float32)
    if remove_dc:
        x = x - x.mean(axis=-1, keepdims=True)
    # kaldi preemphasis uses x[max(j-1, 0)]
    prev = xp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    x = x - preemph * prev
    x = x * xp.asarray(povey_window(window_size))
    pad = padded - window_size
    x = xp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    spec = xp.abs(xp.fft.rfft(x, axis=-1)) ** 2          # (..., padded/2+1)
    spec = spec[..., : padded // 2]                       # kaldi drops nyquist
    banks = xp.asarray(mel_banks(n_mels, padded, float(sample_rate)))
    mel = spec @ banks.T
    return xp.log(xp.maximum(mel, EPSILON))


def fbank_np(waveform: np.ndarray, sample_rate: int = 16000,
             n_mels: int = 80) -> np.ndarray:
    """waveform: (n_samples,) float (already x 2**15). Returns (T, n_mels)."""
    window_size, window_shift, padded = frame_params(sample_rate)
    n = num_frames(len(waveform), sample_rate)
    if n == 0:
        return np.zeros((0, n_mels), np.float32)
    idx = (np.arange(n)[:, None] * window_shift + np.arange(window_size)[None, :])
    frames = waveform[idx]
    return _fbank_core(np, frames, window_size, padded, n_mels,
                       sample_rate).astype(np.float32)


def fbank_jax(waveform, sample_rate: int = 16000, n_mels: int = 80):
    """JAX twin (jit-compatible for fixed sample counts)."""
    import jax.numpy as jnp
    window_size, window_shift, padded = frame_params(sample_rate)
    n = num_frames(waveform.shape[-1], sample_rate)
    if n == 0:
        return jnp.zeros((0, n_mels), jnp.float32)
    starts = jnp.arange(n) * window_shift
    idx = starts[:, None] + jnp.arange(window_size)[None, :]
    frames = waveform[idx]
    return _fbank_core(jnp, frames, window_size, padded, n_mels, sample_rate)


def fbank_batch_jax(waveforms, sample_rate: int = 16000, n_mels: int = 80):
    """Batched JAX fbank: (B, N) raw samples (already x 2**15) -> (B, T, M).

    One device call replaces B x n_chunks host OnlineFbank invocations in
    whole-session evaluation (the reference extracts fbank on HOST per READ,
    default_agent.py:28-73; host DSP was 40% of scanned-eval wall time).
    Framing is global-position-based (snip_edges), so slicing the output at
    `num_frames(cum_samples)` boundaries reproduces chunked extraction
    EXACTLY — see stream/agents.FusedBatchSession.process_session_wavs.
    Rows computed over a caller's zero-padding tail are garbage
    (log-epsilon floor, not zeros) and must be masked via per-example
    valid counts downstream."""
    import jax.numpy as jnp
    window_size, window_shift, padded = frame_params(sample_rate)
    n = num_frames(waveforms.shape[-1], sample_rate)
    if n == 0:
        return jnp.zeros((waveforms.shape[0], 0, n_mels), jnp.float32)
    starts = jnp.arange(n) * window_shift
    idx = starts[:, None] + jnp.arange(window_size)[None, :]
    frames = waveforms[:, idx]                       # (B, T, W)
    return _fbank_core(jnp, frames, window_size, padded, n_mels, sample_rate)


class OnlineFbank:
    """Incremental fbank for the streaming agent: buffers residual samples so
    that chunked extraction matches offline exactly
    (reference agents/default_agent.py:28-72 carryover logic)."""

    def __init__(self, sample_rate: int = 16000, n_mels: int = 80,
                 global_cmvn=None):
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.window_size, self.window_shift, _ = frame_params(sample_rate)
        self.previous_residual = np.zeros((0,), np.float32)
        self.global_cmvn = global_cmvn

    def reset(self):
        self.previous_residual = np.zeros((0,), np.float32)

    def __call__(self, new_samples: np.ndarray) -> np.ndarray:
        """new_samples: raw float waveform in [-1, 1], or int16 PCM (converted
        by the exact power-of-two scale); returns (t, n_mels)."""
        new_samples = np.asarray(new_samples)
        if new_samples.dtype == np.int16:
            new_samples = new_samples.astype(np.float32) / (2 ** 15)
        samples = np.concatenate([self.previous_residual,
                                  np.asarray(new_samples, np.float32)])
        n = num_frames(len(samples), self.sample_rate)
        if n == 0:
            self.previous_residual = samples
            return np.zeros((0, self.n_mels), np.float32)
        consumed = n * self.window_shift
        self.previous_residual = samples[consumed:]
        feats = fbank_np(samples[: consumed + self.window_size
                                 - self.window_shift] * (2 ** 15),
                         self.sample_rate, self.n_mels)
        if self.global_cmvn is not None:
            mean, std = self.global_cmvn
            feats = (feats - mean) / std
        return feats
