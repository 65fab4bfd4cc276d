"""ctypes binding for the native audio module (libaptpu_audio.so).

Builds on demand with the bundled Makefile (g++ only); every entry point
degrades gracefully when the library is missing so pure-Python
environments still work (utils/wavio + ops/frontend.resample are the
fallbacks used by pipeline/ingest.py).
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libaptpu_audio.so")
_lib = None
_lock = threading.Lock()
_build_attempted = False


def _load():
    global _lib, _build_attempted
    # fast path without the lock (assignment is atomic; the value never
    # changes once set)
    if _lib is not None:
        return _lib
    # non-blocking for concurrent callers: the first-ever call may run a
    # `make` compile (up to 120 s) — other request threads must NOT queue
    # behind it (they fall back to the pure-Python decoder immediately and
    # pick up the .so on a later call)
    if not _lock.acquire(blocking=False):
        return None
    try:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", _DIR],
                    capture_output=True,
                    timeout=120,
                    check=True,
                )
                logger.info("built native audio library")
            except Exception as exc:  # noqa: BLE001 — optional component
                logger.info("native audio build unavailable: %s", exc)
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.aptpu_decode_wav.restype = ctypes.c_int64
        lib.aptpu_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        try:
            lib.aptpu_wav_out_size.restype = ctypes.c_int64
            lib.aptpu_wav_out_size.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ]
        except AttributeError:  # an older .so without the size query
            pass
        lib.aptpu_wav_info.restype = ctypes.c_int
        lib.aptpu_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.aptpu_resample.restype = ctypes.c_int64
        lib.aptpu_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.aptpu_dtw.restype = ctypes.c_int
        lib.aptpu_dtw.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib
    finally:
        _lock.release()


def available() -> bool:
    return _load() is not None


def decode(path: str, target_sr: int = 16_000) -> tuple[np.ndarray, int]:
    """WAV file -> (mono float32 at target_sr, target_sr)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library not available")
    with open(path, "rb") as f:
        data = f.read()
    if hasattr(lib, "aptpu_wav_out_size"):
        # header-only size query: the two-call protocol otherwise pays the
        # full decode+resample twice per file
        n = lib.aptpu_wav_out_size(data, len(data), target_sr)
    else:
        n = lib.aptpu_decode_wav(data, len(data), target_sr, None, 0)
    if n < 0:
        raise ValueError(f"native decode failed for {path!r}")
    out = np.empty(n, np.float32)
    got = lib.aptpu_decode_wav(
        data, len(data), target_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    if got != n:
        raise ValueError("native decode size mismatch")
    return out, target_sr


def wav_info(path: str) -> dict:
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library not available")
    with open(path, "rb") as f:
        data = f.read()
    sr = ctypes.c_int64()
    ch = ctypes.c_int()
    bits = ctypes.c_int()
    if lib.aptpu_wav_info(data, len(data), ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(bits)) != 0:
        raise ValueError(f"not a WAV file: {path!r}")
    return {"sample_rate": sr.value, "channels": ch.value, "bits": bits.value}


def dtw(cost: np.ndarray) -> np.ndarray:
    """DTW backtrace over a (t, ta) cost matrix -> per-row start columns."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library not available")
    c = np.ascontiguousarray(cost, np.float32)
    t, ta = c.shape
    out = np.zeros(t, np.int64)
    if lib.aptpu_dtw(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, ta,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    ) != 0:
        raise ValueError("dtw failed")
    return out


def resample(samples: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library not available")
    x = np.ascontiguousarray(samples, np.float32)
    n = lib.aptpu_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr_in, sr_out, None, 0
    )
    if n < 0:
        raise ValueError("native resample failed")
    out = np.empty(n, np.float32)
    got = lib.aptpu_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr_in, sr_out,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    if got != n:
        raise ValueError("native resample size mismatch")
    return out
