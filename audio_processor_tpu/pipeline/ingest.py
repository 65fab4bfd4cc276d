"""Audio ingest: any container -> 16 kHz mono float32 numpy.

The reference unconditionally shells out to an ffmpeg BINARY for
`-ar 16000 -ac 1` conversion (reference: app/services/audio_processor.py:
901-930).  Here everything is in-process:

  * WAV       -> native C++ parser+resampler (native/audio_io.cc), pure-
                 Python wavio fallback;
  * m4a/aac/mp3/ogg/flac/... -> native C++ module linking the system codec
                 libraries (native/media_decode.cc) — the product's actual
                 input is .m4a Drive recordings, decoded with no subprocess
                 and no ffmpeg binary;
  * last resort: a host `ffmpeg` binary, if one exists.
"""
from __future__ import annotations

import logging
import os
import shutil
import subprocess
import tempfile

import numpy as np

from ..ops import frontend
from ..utils import wavio

logger = logging.getLogger(__name__)

TARGET_SR = 16_000


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def load_audio(path: str, target_sr: int = TARGET_SR) -> np.ndarray:
    """Decode any supported audio file to mono float32 at target_sr."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".wav", ".wave"):
        # fastest path: native C++ decode+resample in one pass
        try:
            from ..native import audio_io

            if audio_io.available():
                samples, _ = audio_io.decode(path, target_sr)
                return samples
        except Exception as exc:  # noqa: BLE001 — fall back to pure Python
            logger.debug("native decode unavailable (%s)", exc)
        try:
            return _load_wav(path, target_sr)
        except ValueError as exc:
            logger.warning("WAV decode failed (%s); trying media decoders", exc)
    # compressed containers: in-process codec-library decode first
    media_error: Exception | None = None
    try:
        from ..native import media

        if media.available():
            samples, _ = media.decode(path, target_sr)
            return samples
    except Exception as exc:  # noqa: BLE001 — keep falling back: the host
        # ffmpeg binary may carry codecs the linked libav build lacks
        # (the docstring's promised last resort)
        media_error = exc
        logger.debug("native media decode failed (%s)", exc)
    if ffmpeg_available():
        return _load_via_ffmpeg(path, target_sr)
    if media_error is not None:
        raise ValueError(
            f"cannot decode {path!r}: no decodable audio stream"
        ) from media_error
    raise ValueError(
        f"cannot decode {path!r}: not a WAV file and no ffmpeg on host"
    )


def _load_wav(path: str, target_sr: int) -> np.ndarray:
    samples, rate = wavio.read_wav_mono(path)
    return _resample_np(samples, rate, target_sr)


def _resample_np(samples: np.ndarray, rate: int, target_sr: int) -> np.ndarray:
    if rate == target_sr:
        return samples.astype(np.float32)
    import jax.numpy as jnp

    return np.asarray(frontend.resample(jnp.asarray(samples, jnp.float32), rate, target_sr))


def _load_via_ffmpeg(path: str, target_sr: int) -> np.ndarray:
    """ffmpeg -> s16le pipe -> numpy (no temp WAV round-trip)."""
    cmd = [
        "ffmpeg", "-nostdin", "-threads", "0", "-i", path,
        "-f", "s16le", "-ac", "1", "-acodec", "pcm_s16le",
        "-ar", str(target_sr), "-",
    ]
    proc = subprocess.run(cmd, capture_output=True, check=False)
    if proc.returncode != 0:
        raise ValueError(f"ffmpeg failed: {proc.stderr[-500:].decode(errors='ignore')}")
    return np.frombuffer(proc.stdout, np.int16).astype(np.float32) / 32768.0


def convert_to_wav(path: str, out_dir: str | None = None) -> str:
    """Materialise a 16 kHz mono 16-bit WAV next to (or in out_dir) —
    the reference's convert_to_wav contract (audio_processor.py:901-930)."""
    audio = load_audio(path)
    out_dir = out_dir or tempfile.mkdtemp(prefix="aptpu_audio_")
    out_path = os.path.join(
        out_dir, os.path.splitext(os.path.basename(path))[0] + ".wav"
    )
    wavio.write_wav(out_path, audio, TARGET_SR)
    return out_path
