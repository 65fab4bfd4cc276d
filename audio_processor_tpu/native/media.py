"""ctypes binding for the native media module (libaptpu_media.so).

In-process compressed-audio decode (m4a/aac/mp3/ogg/flac/...) and AAC-LC
.m4a encode, linking the system codec libraries — replaces the reference's
per-job `ffmpeg` subprocess (reference: app/services/audio_processor.py:
912-923).  Builds on demand with the bundled Makefile; degrades gracefully
(available() -> False) when the codec dev libraries are absent, in which
case pipeline/ingest.py falls back to a host ffmpeg binary if one exists.
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
_LIB_PATH = os.path.join(_DIR, "libaptpu_media.so")
_lib = None
_lock = threading.Lock()
_build_attempted = False


def _load():
    global _lib, _build_attempted
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "media"],
                    capture_output=True,
                    timeout=120,
                    check=True,
                )
                logger.info("built native media library")
            except Exception as exc:  # noqa: BLE001 — optional component
                logger.info("native media build unavailable: %s", exc)
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as exc:  # codec runtime libs missing
            logger.info("native media library unloadable: %s", exc)
            return None
        lib.aptpu_decode_media.restype = ctypes.c_int64
        lib.aptpu_decode_media.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        if hasattr(lib, "aptpu_decode_media_prefix"):
            lib.aptpu_decode_media_prefix.restype = ctypes.c_int64
            lib.aptpu_decode_media_prefix.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
        lib.aptpu_media_free.restype = None
        lib.aptpu_media_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.aptpu_media_info.restype = ctypes.c_int
        lib.aptpu_media_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.aptpu_encode_m4a.restype = ctypes.c_int
        lib.aptpu_encode_m4a.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode(
    path: str, target_sr: int = 16_000, max_samples: int | None = None
) -> tuple[np.ndarray, int]:
    """Any supported container/codec -> (mono float32 @ target_sr, rate).

    max_samples bounds the decode: demuxing stops once that many output
    samples exist (a 30 s probe of a long recording decodes ~30 s, not
    the file).  A pre-prefix .so decodes fully and slices — same result.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native media library not available")
    buf = ctypes.POINTER(ctypes.c_float)()
    if max_samples is not None and hasattr(lib, "aptpu_decode_media_prefix"):
        n = lib.aptpu_decode_media_prefix(
            path.encode(), target_sr, int(max_samples), ctypes.byref(buf)
        )
    else:
        n = lib.aptpu_decode_media(path.encode(), target_sr, ctypes.byref(buf))
    if n < 0:
        raise ValueError(f"native media decode failed for {path!r}")
    try:
        out = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.aptpu_media_free(buf)
    if max_samples is not None:
        out = out[: int(max_samples)]
    return out, target_sr


def media_info(path: str) -> dict:
    lib = _load()
    if lib is None:
        raise RuntimeError("native media library not available")
    sr = ctypes.c_int64()
    ch = ctypes.c_int()
    dur = ctypes.c_int64()
    name = ctypes.create_string_buffer(64)
    rc = lib.aptpu_media_info(
        path.encode(), ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(dur),
        name, len(name),
    )
    if rc != 0:
        raise ValueError(f"no decodable audio stream in {path!r}")
    return {
        "sample_rate": sr.value,
        "channels": ch.value,
        "duration_ms": dur.value,
        "codec": name.value.decode(),
    }


def encode_m4a(
    samples: np.ndarray, sample_rate: int, path: str, bit_rate: int = 96_000
) -> None:
    """Mono float32 PCM -> AAC-LC .m4a (fixture generation / conversion)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native media library not available")
    x = np.ascontiguousarray(samples, np.float32)
    rc = lib.aptpu_encode_m4a(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        sample_rate, path.encode(), bit_rate,
    )
    if rc != 0:
        raise ValueError(f"m4a encode failed for {path!r}")
