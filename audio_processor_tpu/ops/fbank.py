"""Kaldi-style log-mel filterbank features for the speaker-embedding model.

WeSpeaker-family embedding checkpoints consume kaldi fbank (25 ms frames,
10 ms hop, povey window, HTK mel, snip-edges), which differs from the
Whisper mel contract in ops/frontend.py (hann, slaney, centered).  Same
TPU-first construction: framing by strided slicing, DFT as matmul.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
FRAME_LENGTH = 400  # 25 ms
FRAME_SHIFT = 160  # 10 ms
N_FFT = 512  # kaldi rounds frame length up to a power of two


def hz_to_htk_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def htk_mel_to_hz(m):
    return 700.0 * (np.exp(np.asarray(m, np.float64) / 1127.0) - 1.0)


@functools.lru_cache(maxsize=8)
def htk_mel_filterbank(
    n_mels: int = 80,
    n_fft: int = N_FFT,
    sample_rate: int = SAMPLE_RATE,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Triangular HTK-mel filters, (n_mels, n_fft//2+1).

    Kaldi's EXACT construction (torchaudio.compliance.kaldi.get_mel_banks,
    the code path WeSpeaker/pyannote checkpoints were trained against):
    triangle slopes are linear in the MEL domain evaluated at each fft
    bin (not Hz-linear interpolation), high_freq <= 0 means Nyquist +
    high_freq (kaldi's default 0.0 -> 8 kHz at 16 kHz audio), and the
    Nyquist bin itself carries zero weight (kaldi banks span
    n_fft//2 columns; the last column is padding).
    """
    if high_freq <= 0:
        high_freq = sample_rate / 2 + high_freq
    num_fft_bins = n_fft // 2
    fft_bin_width = sample_rate / n_fft
    mel_low = hz_to_htk_mel(low_freq)
    mel_high = hz_to_htk_mel(high_freq)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)
    left_mel = mel_low + np.arange(n_mels)[:, None] * mel_delta
    center_mel = left_mel + mel_delta
    right_mel = center_mel + mel_delta
    mel = hz_to_htk_mel(fft_bin_width * np.arange(num_fft_bins))[None, :]
    up = (mel - left_mel) / (center_mel - left_mel)
    down = (right_mel - mel) / (right_mel - center_mel)
    weights = np.maximum(0.0, np.minimum(up, down))
    return np.concatenate(
        [weights, np.zeros((n_mels, 1))], axis=1
    ).astype(np.float32)


@functools.lru_cache(maxsize=2)
def _povey_window(n: int = FRAME_LENGTH) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))) ** 0.85


@functools.lru_cache(maxsize=2)
def _fbank_bases(n_fft: int = N_FFT, frame_len: int = FRAME_LENGTH):
    """Real-DFT bases over a frame, window folded in: (frame_len, n_freqs)."""
    n_freqs = n_fft // 2 + 1
    window = _povey_window(frame_len)
    t = np.arange(frame_len)[:, None] * np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * t / n_fft
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


def num_frames(n_samples: int) -> int:
    """snip_edges=True frame count."""
    if n_samples < FRAME_LENGTH:
        return 0
    return 1 + (n_samples - FRAME_LENGTH) // FRAME_SHIFT


def fbank(
    audio: jnp.ndarray,
    n_mels: int = 80,
    *,
    preemphasis: float = 0.97,
    remove_dc: bool = True,
    mean_norm: bool = True,
) -> jnp.ndarray:
    """audio (..., n_samples) float32 @16 kHz -> (..., n_frames, n_mels).

    Kaldi-style: snip-edges framing, per-frame DC removal, pre-emphasis,
    povey window, power spectrum, HTK mel, log, optional utterance CMN.
    """
    n = audio.shape[-1]
    nf = num_frames(n)
    # frames (..., nf, 400): stride-2 trick needs hop | frame; 160 | 400 via
    # 80-sample blocks exactly as in ops.frontend.frame_signal
    from .frontend import frame_signal

    frames = frame_signal(audio, nf)[..., :nf, :]

    if remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis:
        shifted = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * shifted

    cos_b, sin_b = _fbank_bases()
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, jnp.asarray(cos_b), precision=hi)
    im = jnp.matmul(frames, jnp.asarray(sin_b), precision=hi)
    power = re * re + im * im

    mel = jnp.matmul(power, jnp.asarray(htk_mel_filterbank(n_mels)).T, precision=hi)
    logmel = jnp.log(jnp.maximum(mel, 1.1921e-07))
    if mean_norm:
        logmel = logmel - jnp.mean(logmel, axis=-2, keepdims=True)
    return logmel
