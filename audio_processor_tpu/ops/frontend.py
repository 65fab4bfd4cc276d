"""Audio frontend: resample -> silence trim -> STFT -> log-mel, TPU-first.

Replaces the reference's ffmpeg shell-out + Whisper-internal mel
(reference: app/services/audio_processor.py:912-923 and the openai-whisper
dependency at :863).  The log-mel here is numerically the contract Whisper
weights expect: hann(400), hop 160, 80/128 slaney-scale mel bins,
log10 -> dynamic-range clamp -> (x+4)/4 normalisation.

TPU-first design decision: the 400-point real DFT is computed as TWO MATMULS
against fixed cos/sin bases instead of an FFT.  At n_fft=400 the matmul
formulation runs on the MXU (systolic array), fuses with the mel projection
matmul, and avoids XLA's awkward small-FFT path entirely.  Framing is done
with stride-2 static slicing over 80-sample blocks (hop=160, win=400 =>
5 blocks of 80), which lowers to pure reshapes/slices — no gather.

A fused Pallas kernel for the same computation lives in
audio_processor_tpu.ops.pallas.mel_kernel; this module is the jnp reference
implementation and the golden-test target.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds per Whisper window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 mel frames per 30 s window


# ---------------------------------------------------------------------------
# Filterbank / basis construction (host-side numpy; constants baked at trace)
# ---------------------------------------------------------------------------

def hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney-scale Hz->mel (librosa default, what Whisper's filters use)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    safe = np.where(log_region, freq, min_log_hz)
    mels = np.where(log_region, min_log_mel + np.log(safe / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int = 80, n_fft: int = N_FFT, sample_rate: int = SAMPLE_RATE
) -> np.ndarray:
    """Slaney-normalised triangular mel filterbank, shape (n_mels, n_fft//2+1).

    Matches librosa.filters.mel(sr, n_fft, n_mels) defaults — the filters
    Whisper checkpoints were trained against.
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sample_rate / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalisation: each filter integrates to ~2/bandwidth
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=4)
def dft_bases(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin bases with the hann window folded in.

    Returns (cos_basis, sin_basis), each (n_fft, n_fft//2+1), such that for a
    raw frame x of n_fft samples, (x @ cos)**2 + (x @ sin)**2 equals
    |rfft(hann * x)|**2.  Folding the window into the basis saves one
    elementwise pass on device.
    """
    n_freqs = n_fft // 2 + 1
    # periodic hann, as torch.hann_window default used by Whisper
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    t = np.arange(n_fft)[:, None] * np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * t / n_fft
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


# ---------------------------------------------------------------------------
# Framing (gather-free)
# ---------------------------------------------------------------------------

def frame_signal(audio: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """Slice a reflect-padded signal into overlapping frames, gather-free.

    audio: (..., n_samples) already reflect-padded by n_fft//2 on both sides.
    Returns (..., n_frames, N_FFT).  With hop=160 and win=400 each frame is
    exactly 5 consecutive 80-sample blocks starting at an even block index,
    so framing reduces to 5 static stride-2 slices + a concat — XLA lowers
    this to cheap reshapes instead of a gather.
    """
    block = HOP_LENGTH // 2  # 80
    needed = (2 * n_frames + 3) * block  # last frame spans blocks [2f, 2f+5)
    pad = (-audio.shape[-1]) % block
    if pad or audio.shape[-1] < needed:
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, max(pad, needed - audio.shape[-1]))])
    blocks = audio[..., : (audio.shape[-1] // block) * block]
    blocks = blocks.reshape(*audio.shape[:-1], -1, block)
    parts = [blocks[..., k : k + 2 * n_frames : 2, :] for k in range(5)]
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# Log-mel spectrogram
# ---------------------------------------------------------------------------

def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = 80,
    *,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Whisper-contract log-mel of a fixed-length window.

    audio: (..., n_samples) float32 at 16 kHz (pad/trim to N_SAMPLES upstream
    for whole 30 s windows; any static length works).
    Returns (..., n_mels, n_samples // HOP_LENGTH).

    Equivalent to openai-whisper's ``log_mel_spectrogram`` (torch.stft with
    center=True reflect padding, magnitude**2, mel matmul, log10, max-8 clamp,
    (x+4)/4) — verified against transformers' WhisperFeatureExtractor in
    tests/test_frontend.py.
    """
    n_samples = audio.shape[-1]
    n_frames = n_samples // HOP_LENGTH
    half = N_FFT // 2

    padded = _reflect_pad_last(audio, half)
    frames = frame_signal(padded, n_frames)  # (..., n_frames, N_FFT)

    # precision=HIGHEST: on TPU, fp32 matmuls default to bf16 MXU passes,
    # which is catastrophic in log-space at quiet mel bins.  The frontend is
    # ~1 GFLOP per 30 s window, so full-precision passes are free.
    cos_b, sin_b = dft_bases(N_FFT)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, jnp.asarray(cos_b), precision=hi)  # (..., nf, n_freqs)
    im = jnp.matmul(frames, jnp.asarray(sin_b), precision=hi)
    power = re * re + im * im

    filters = jnp.asarray(mel_filterbank(n_mels))  # (n_mels, n_freqs)
    mel = jnp.matmul(power, filters.T, precision=hi)  # (..., n_frames, n_mels)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # dynamic-range clamp is per-window (over the last two axes)
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, -1, -2).astype(dtype)  # (..., n_mels, n_frames)


def _reflect_pad_last(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg, mode="reflect")


# ---------------------------------------------------------------------------
# Resampling (polyphase, conv-based => MXU/VPU friendly)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _resample_kernel(up: int, down: int, num_taps_per_phase: int = 16) -> np.ndarray:
    """Windowed-sinc anti-aliasing lowpass for rational resampling."""
    cutoff = 0.5 / max(up, down)
    half = num_taps_per_phase * max(up, down) // 2
    n = np.arange(-half, half + 1, dtype=np.float64)
    sinc = 2 * cutoff * np.sinc(2 * cutoff * n)
    window = np.kaiser(len(n), beta=8.555)
    kern = (sinc * window * up).astype(np.float32)
    return kern


def resample(audio: jnp.ndarray, orig_sr: int, target_sr: int = SAMPLE_RATE) -> jnp.ndarray:
    """Rational-rate polyphase resample via dilated convolution.

    audio: (n,) float32.  Returns (ceil(n * target/orig),) float32.
    Implemented as upsample-by-zero-stuffing (lhs_dilation) + FIR lowpass +
    stride (window_strides) in ONE lax.conv_general_dilated call, which XLA
    maps onto the TPU convolution path.
    """
    if orig_sr == target_sr:
        return audio
    g = math.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    kern = _resample_kernel(up, down)
    half = len(kern) // 2
    n_out = -(-audio.shape[-1] * up // down)  # ceil

    lhs = audio.reshape(1, 1, -1)
    rhs = jnp.asarray(kern[::-1].copy()).reshape(1, 1, -1)
    # right padding sized so the strided conv emits >= n_out samples even
    # when up > 2*down (a fixed half+down pad fell short there, silently
    # truncating sub-8 kHz inputs by a few samples)
    n_dil = (audio.shape[-1] - 1) * up + 1
    pad_r = max(0, (n_out - 1) * down + len(kern) - n_dil - half)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(down,),
        padding=[(half, pad_r)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "IOH", "NCH"),
    )
    return out[0, 0, :n_out]


# ---------------------------------------------------------------------------
# Silence removal (the feature the reference README advertises but never
# implemented — README.md:17 vs audio_processor.py:305-314)
# ---------------------------------------------------------------------------

def silence_mask(
    audio: jnp.ndarray,
    frame_length: int = 400,
    hop: int = 160,
    threshold_db: float = -40.0,
    pad_frames: int = 25,
) -> jnp.ndarray:
    """Per-hop boolean keep-mask: frame RMS above (peak_db + threshold_db).

    pad_frames dilates the speech region (0.25 s at default hop) so word
    onsets/offsets survive.  Pure jnp; static shapes.

    frame_length/hop are fixed at the Whisper STFT geometry (400/160):
    frame_signal's gather-free block slicing is built on exactly that
    ratio, so other values would silently frame at the wrong positions —
    refused loudly instead.
    """
    if (frame_length, hop) != (N_FFT, HOP_LENGTH):
        raise ValueError(
            f"silence_mask supports only the Whisper frame geometry "
            f"({N_FFT}/{HOP_LENGTH}); got {frame_length}/{hop}"
        )
    n_frames = max(audio.shape[-1] // hop, 1)
    half = frame_length // 2
    padded = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(half, half)])
    frames = frame_signal(padded, n_frames)
    rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1) + 1e-12)
    db = 20.0 * jnp.log10(rms + 1e-12)
    keep = db > (jnp.max(db, axis=-1, keepdims=True) + threshold_db)
    if pad_frames > 0:
        kernel = jnp.ones((1, 1, 2 * pad_frames + 1), dtype=jnp.float32)
        # one conv batch element PER leading-dim row: flattening everything
        # into the time axis would bleed the dilation across batch rows
        x = keep.astype(jnp.float32).reshape(-1, 1, keep.shape[-1])
        dil = jax.lax.conv_general_dilated(
            x, kernel, (1,), [(pad_frames, pad_frames)],
            dimension_numbers=("NCH", "IOH", "NCH"),
        )
        keep = dil.reshape(keep.shape) > 0.5
    return keep


def trim_silence_host(
    audio: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    threshold_db: float = -40.0,
    min_gap_s: float = 1.0,
    keep_pad_s: float = 0.25,
) -> tuple[np.ndarray, list[tuple[float, float]]]:
    """Host-side silence removal that preserves a time map.

    Cuts only gaps LONGER than min_gap_s so natural pauses stay intact, and
    returns (trimmed_audio, kept_intervals) where kept_intervals is a list of
    (orig_start_s, orig_end_s) in the original timeline, in order.  Use
    utils.timestamps.TimeMap to map trimmed-time segment boundaries back.

    Pure numpy on purpose: it runs per job on ARBITRARY-length audio, so a
    device version would recompile per length and round-trip the raw
    waveform; the cumsum-based RMS below is ~milliseconds for an hour.
    """
    hop = 160
    mask = _silence_keep_mask_np(
        np.asarray(audio, np.float32),
        frame_length=400,
        hop=hop,
        threshold_db=threshold_db,
        pad_frames=int(keep_pad_s * sample_rate / hop),
    )
    # collapse to kept intervals, merging gaps shorter than min_gap_s
    min_gap = int(min_gap_s * sample_rate / hop)
    bounds = mask_to_intervals(mask, len(audio), hop=hop, min_gap_frames=min_gap)
    if bounds is None:
        return audio, [(0.0, len(audio) / sample_rate)]
    pieces, intervals = [], []
    for s_smp, e_smp in bounds:
        pieces.append(audio[s_smp:e_smp])
        intervals.append((s_smp / sample_rate, e_smp / sample_rate))
    return np.concatenate(pieces) if pieces else audio, intervals


def mask_to_intervals(
    mask: np.ndarray,
    n_samples: int,
    hop: int = HOP_LENGTH,
    min_gap_frames: int = 100,
) -> list[tuple[int, int]] | None:
    """Per-hop keep mask -> kept (start, end) SAMPLE intervals, merging
    gaps shorter than min_gap_frames.  None when nothing is kept (caller
    keeps everything — an all-silent file stays intact).  Shared by the
    host trim path above and the on-device gather path below, so both
    cut identical regions."""
    idx = np.flatnonzero(np.asarray(mask))
    if idx.size == 0:
        return None
    splits = np.flatnonzero(np.diff(idx) > min_gap_frames)
    starts = np.concatenate([[idx[0]], idx[splits + 1]])
    ends = np.concatenate([idx[splits], [idx[-1]]]) + 1
    return [
        (int(s) * hop, min(int(e) * hop, n_samples))
        for s, e in zip(starts, ends)
    ]


def gather_kept_intervals(
    audio: jnp.ndarray,
    starts: jnp.ndarray,  # (K,) int32 original start sample per interval
    cum_ends: jnp.ndarray,  # (K,) int32 cumulative kept samples, cum_ends[-1] = total
    n_out: int,
) -> jnp.ndarray:
    """Concatenate kept intervals ON DEVICE into a zero-padded (n_out,)
    buffer — the device half of silence trimming (SURVEY §7.1's fused
    frontend): the big waveform never round-trips to the host; only the
    tiny per-hop mask does.  Intervals are padded to a static K by
    repeating the last entry with zero incremental length (cum_ends
    plateaus), which this gather treats as empty."""
    j = jnp.arange(n_out, dtype=jnp.int32)
    i = jnp.searchsorted(cum_ends, j, side="right")
    i = jnp.clip(i, 0, starts.shape[0] - 1)
    prev = jnp.where(i > 0, cum_ends[jnp.maximum(i - 1, 0)], 0)
    idx = starts[i] + (j - prev)
    valid = j < cum_ends[-1]
    picked = jnp.take(audio, jnp.clip(idx, 0, audio.shape[-1] - 1), axis=-1)
    return jnp.where(valid, picked, 0.0)


def _silence_keep_mask_np(
    audio: np.ndarray,
    frame_length: int = 400,
    hop: int = 160,
    threshold_db: float = -40.0,
    pad_frames: int = 25,
) -> np.ndarray:
    """numpy twin of silence_mask (per-hop keep flags via block-sum RMS).

    Deliberately avoids np.cumsum: its sequential scan runs ~160 ns/elem on
    this VM's single core (9 s for an hour of audio); the reshape-sum below
    is pure vectorised reductions (~50 ms).

    Same fixed-geometry contract as silence_mask: the 5-blocks-of-hop//2
    framing assumes frame_length == 2.5 * hop (the 400/160 Whisper STFT).
    """
    if (frame_length, hop) != (N_FFT, HOP_LENGTH):
        raise ValueError(
            f"_silence_keep_mask_np supports only the Whisper frame "
            f"geometry ({N_FFT}/{HOP_LENGTH}); got {frame_length}/{hop}"
        )
    n_frames = max(len(audio) // hop, 1)
    half = frame_length // 2
    block = hop // 2  # 80; frame f = blocks [2f, 2f+5) of the padded signal
    padded = np.pad(audio.astype(np.float32), (half, half))
    need = (2 * n_frames + 3) * block
    if len(padded) < need:
        padded = np.pad(padded, (0, need - len(padded)))
    x2 = padded[: (len(padded) // block) * block]
    x2 = x2 * x2  # stay f32: halves memory traffic; f64 accumulation below
    bsum = x2.reshape(-1, block).sum(axis=1, dtype=np.float64)
    energy = sum(bsum[k : k + 2 * n_frames : 2] for k in range(5))
    rms = np.sqrt(energy / frame_length + 1e-12)
    db = 20.0 * np.log10(rms + 1e-12)
    keep = db > (db.max() + threshold_db)
    if pad_frames > 0:
        kernel = np.ones(2 * pad_frames + 1)
        keep = np.convolve(keep.astype(np.float32), kernel, mode="same") > 0.5
    return keep


def pad_or_trim(audio: jnp.ndarray, length: int = N_SAMPLES) -> jnp.ndarray:
    """Pad with zeros / trim to a fixed window length (static shapes for jit)."""
    n = audio.shape[-1]
    if n == length:
        return audio
    if n > length:
        return audio[..., :length]
    return jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, length - n)])
