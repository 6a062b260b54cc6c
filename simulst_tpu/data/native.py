"""ctypes bridge to the native C++ feature extractor (native/fbank.cpp).

Builds libfbank.so on first use (g++ -O3) and exposes `fbank_native` with
the exact same contract as ops/fbank.fbank_np; falls back to the numpy twin
if the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "fbank.cpp")
_LIB = os.path.join(_ROOT, "native", "libfbank.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_LIB) or
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(["g++", "-O3", "-shared", "-fPIC",
                                "-o", _LIB, _SRC], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.fbank.restype = ctypes.c_int
            lib.fbank.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
            lib.fbank_num_frames.restype = ctypes.c_int
            lib.fbank_num_frames.argtypes = [ctypes.c_int, ctypes.c_int]
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def fbank_native(waveform: np.ndarray, sample_rate: int = 16000,
                 n_mels: int = 80) -> np.ndarray:
    """waveform: (n,) float32 already x 2**15. Returns (T, n_mels) float32.
    Falls back to the numpy implementation when the native lib is missing."""
    lib = _load()
    if lib is None:
        from simulst_tpu.ops.fbank import fbank_np
        return fbank_np(waveform, sample_rate, n_mels)
    wav = np.ascontiguousarray(waveform, np.float32)
    n = lib.fbank_num_frames(len(wav), sample_rate)
    out = np.zeros((max(n, 0), n_mels), np.float32)
    if n > 0:
        lib.fbank(wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                  len(wav), sample_rate, n_mels,
                  out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
