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


# ---------------------------------------------------------------------------
# native batched data loader (native/dataloader.cpp)
# ---------------------------------------------------------------------------

_DL_SRC = os.path.join(_ROOT, "native", "dataloader.cpp")
_DL_LIB = os.path.join(_ROOT, "native", "libdataloader.so")
_dl_lib = None
_dl_failed = False


def _load_dl():
    global _dl_lib, _dl_failed
    with _lock:
        if _dl_lib is not None or _dl_failed:
            return _dl_lib
        try:
            if (not os.path.exists(_DL_LIB) or
                    os.path.getmtime(_DL_LIB) < os.path.getmtime(_DL_SRC)):
                subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-pthread",
                                "-o", _DL_LIB, _DL_SRC], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_DL_LIB)
            fp = ctypes.POINTER(ctypes.c_float)
            ip = ctypes.POINTER(ctypes.c_int)
            lp = ctypes.POINTER(ctypes.c_long)
            lib.load_feature_batch.restype = ctypes.c_int
            lib.load_feature_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), lp, lp, ctypes.c_int,
                fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, fp, fp, ip,
                ctypes.c_int]
            _dl_lib = lib
        except Exception:
            _dl_failed = True
        return _dl_lib


def loader_available() -> bool:
    return _load_dl() is not None


_CMVN_MODE = {"none": 0, "utterance": 1, "global": 2}


def load_feature_batch(specs, out: np.ndarray, cmvn: str = "utterance",
                       global_stats=None, n_threads: int = 8):
    """Threaded native batch read of 'path:offset:length' zip-member .npy
    specs into the zeroed (B, T, F) buffer `out`; applies CMVN in C++.
    Returns per-item TRUE row counts (clip to T for lengths) or None when
    the native lib is unavailable or a spec isn't a zip member."""
    lib = _load_dl()
    if lib is None:
        return None
    n = len(specs)
    paths, offs, lens = [], [], []
    for spec in specs:
        parts = spec.rsplit(":", 2)
        if len(parts) != 3 or not parts[1].isdigit():
            return None
        paths.append(parts[0].encode())
        offs.append(int(parts[1]))
        lens.append(int(parts[2]))
    b, t, f = out.shape
    assert n <= b and out.dtype == np.float32 and out.flags.c_contiguous
    mode = _CMVN_MODE[cmvn]
    gm = gs = None
    fp = ctypes.POINTER(ctypes.c_float)
    if mode == 2:
        gm = np.ascontiguousarray(global_stats["mean"], np.float32)
        gs = np.ascontiguousarray(global_stats["std"], np.float32)
        assert gm.shape == (f,) and gs.shape == (f,)
    rows = np.full((n,), -1, np.int32)
    arr_p = (ctypes.c_char_p * n)(*paths)
    arr_o = (ctypes.c_long * n)(*offs)
    arr_l = (ctypes.c_long * n)(*lens)
    lib.load_feature_batch(
        arr_p, arr_o, arr_l, n,
        out.ctypes.data_as(fp), t, f, mode,
        gm.ctypes.data_as(fp) if gm is not None else None,
        gs.ctypes.data_as(fp) if gs is not None else None,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        min(n_threads, os.cpu_count() or 1))
    if (rows < 0).any():
        return None
    return rows
