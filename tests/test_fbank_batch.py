"""Batched device fbank (ops/fbank.fbank_batch_jax) must reproduce the
offline NumPy fbank and, when sliced at num_frames(cum_samples) chunk
boundaries, the incremental OnlineFbank exactly — this is the guarantee
process_session_wavs relies on to move per-READ host DSP onto the device
(reference extracts fbank on host per READ, default_agent.py:28-73)."""
import numpy as np
import jax.numpy as jnp

from simulst_tpu.ops.fbank import (OnlineFbank, fbank_batch_jax, fbank_np,
                                   num_frames)


def test_batch_matches_np():
    rng = np.random.RandomState(0)
    wavs = (rng.randn(3, 16000) * 0.05).astype(np.float32)
    out = np.asarray(fbank_batch_jax(jnp.asarray(wavs * (2 ** 15))))
    for i in range(3):
        ref = fbank_np(wavs[i] * (2 ** 15))
        np.testing.assert_allclose(out[i], ref, rtol=2e-5, atol=2e-4)


def test_chunk_boundary_split_equals_online():
    """Slicing the whole-utterance fbank at num_frames(cum) boundaries must
    equal per-chunk OnlineFbank extraction (same chunk geometry as the
    streaming agents: long first chunk then steady chunks)."""
    rng = np.random.RandomState(1)
    n_first, n_steady, n_chunks = 15600, 10240, 5
    total = n_first + (n_chunks - 1) * n_steady - 3000   # short final chunk
    wav = (rng.randn(total) * 0.05).astype(np.float32)

    online = OnlineFbank()
    per_chunk = []
    pos = 0
    for k in range(n_chunks):
        n = n_first if k == 0 else n_steady
        per_chunk.append(online(wav[pos: pos + n]))
        pos = min(pos + n, total)

    full = np.asarray(fbank_batch_jax(jnp.asarray(wav[None] * (2 ** 15))))[0]
    cum = [min(n_first + k * n_steady, total) for k in range(n_chunks)]
    fcum = [num_frames(c) for c in cum]
    assert fcum[-1] == num_frames(total) == sum(f.shape[0] for f in per_chunk)
    lo = 0
    for k in range(n_chunks):
        hi = fcum[k]
        np.testing.assert_allclose(full[lo:hi], per_chunk[k],
                                   rtol=2e-5, atol=2e-4, err_msg=f"chunk {k}")
        lo = hi


def test_zero_pad_tail_produces_rows_past_valid():
    """Garbage rows past a zero-padded wav's valid region exist (log-eps
    floor, not zeros) — callers MUST mask via per-example valid counts."""
    rng = np.random.RandomState(2)
    wav = (rng.randn(8000) * 0.05).astype(np.float32)
    padded = np.zeros(16000, np.float32)
    padded[:8000] = wav
    full = np.asarray(fbank_batch_jax(jnp.asarray(padded[None] * (2 ** 15))))[0]
    nv = num_frames(8000)
    ref = fbank_np(wav * (2 ** 15))
    np.testing.assert_allclose(full[:nv], ref[:nv], rtol=2e-5, atol=2e-4)
    assert full.shape[0] > nv     # tail rows exist and are not trusted
