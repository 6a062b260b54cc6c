import numpy as np
import pytest

from simulst_tpu.data.native import fbank_native, native_available
from simulst_tpu.ops.fbank import OnlineFbank, fbank_jax, fbank_np


def test_fbank_np_shapes():
    wav = np.random.RandomState(0).randn(16000).astype(np.float32) * 1000
    f = fbank_np(wav)
    assert f.shape == (98, 80)  # 1 + (16000-400)//160
    assert np.isfinite(f).all()


def test_fbank_jax_matches_np():
    wav = np.random.RandomState(1).randn(4000).astype(np.float32) * 1000
    a = fbank_np(wav)
    b = np.asarray(fbank_jax(wav))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not native_available(), reason="no g++ toolchain")
def test_fbank_native_matches_np():
    wav = np.random.RandomState(2).randn(8000).astype(np.float32) * 1000
    a = fbank_np(wav)
    b = fbank_native(wav)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_online_fbank_matches_offline():
    rng = np.random.RandomState(3)
    wav = rng.randn(16000).astype(np.float32) * 0.1
    off = fbank_np(wav * 2 ** 15)
    online = OnlineFbank()
    outs = []
    for i in range(0, len(wav), 1537):  # awkward chunk size on purpose
        outs.append(online(wav[i:i + 1537]))
    got = np.concatenate(outs, axis=0)
    n = got.shape[0]
    assert n >= off.shape[0] - 2
    np.testing.assert_allclose(got, off[:n], rtol=1e-4, atol=1e-4)
