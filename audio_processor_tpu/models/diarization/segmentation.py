"""Sliding-window speaker segmentation network (pyannote-3.x architecture).

Replaces the reference's pyannote.audio dependency — the segmentation half
of `Pipeline.from_pretrained("pyannote/speaker-diarization-3.1")`
(reference: app/services/audio_processor.py:885,1105).

Architecture mirrors pyannote's published PyanNet/SincNet topology so
converted checkpoints are drop-in: parametric sinc filterbank (stride 10)
-> two conv blocks -> 4-layer bidirectional LSTM -> 2 linear layers ->
7-class powerset head (3 speakers, <=2 simultaneously active).  All convs
and matmuls batch over windows; the LSTM runs as lax.scan over ~589 frames
with the whole window batch in flight, so the TPU stays busy despite the
recurrence.

Powerset decoding (class id -> active-speaker set) is a fixed (7, 3)
matmul — no per-frame host logic.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclass(frozen=True)
class SegmentationConfig:
    sample_rate: int = 16_000
    window_s: float = 10.0
    sinc_filters: int = 80
    sinc_kernel: int = 251
    sinc_stride: int = 10
    conv_channels: int = 60
    conv_kernel: int = 5
    pool: int = 3
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_dim: int = 128
    num_speakers: int = 3
    max_simultaneous: int = 2

    @property
    def window_samples(self) -> int:
        return int(self.window_s * self.sample_rate)

    @property
    def num_classes(self) -> int:
        """Powerset size: empty + singles + pairs (3 spk, <=2 active) = 7."""
        n, k = self.num_speakers, self.max_simultaneous
        total = 0
        for r in range(0, k + 1):
            total += math.comb(n, r)
        return total

    @property
    def num_frames(self) -> int:
        n = (self.window_samples - self.sinc_kernel) // self.sinc_stride + 1
        n = n // self.pool
        n = (n - (self.conv_kernel - 1)) // self.pool
        n = (n - (self.conv_kernel - 1)) // self.pool
        return n

    @property
    def frame_step_s(self) -> float:
        return (self.sinc_stride * self.pool**3) / self.sample_rate


def powerset_matrix(cfg: SegmentationConfig) -> np.ndarray:
    """(num_classes, num_speakers) 0/1 matrix: class -> active speakers.

    Order matches pyannote's Powerset: by subset size, then lexicographic —
    [], [0], [1], [2], [01], [02], [12].
    """
    import itertools

    rows = []
    for size in range(cfg.max_simultaneous + 1):
        for combo in itertools.combinations(range(cfg.num_speakers), size):
            row = np.zeros(cfg.num_speakers, np.float32)
            row[list(combo)] = 1.0
            rows.append(row)
    return np.stack(rows)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def _mel_init_bands(n_filters: int, sr: int) -> tuple[np.ndarray, np.ndarray]:
    """Mel-spaced (low_hz, band_hz) init for the sinc filters."""
    low_hz, high_hz = 30.0, sr / 2 - 100.0

    def hz2mel(f):
        return 2595 * np.log10(1 + f / 700)

    def mel2hz(m):
        return 700 * (10 ** (m / 2595) - 1)

    mel = np.linspace(hz2mel(low_hz), hz2mel(high_hz), n_filters + 1)
    hz = mel2hz(mel)
    return hz[:-1].astype(np.float32), np.diff(hz).astype(np.float32)


def _lstm_init(key, d_in, d_hidden):
    k1, k2 = jax.random.split(key)
    s = 1.0 / math.sqrt(d_hidden)
    return {
        "wi": jax.random.uniform(k1, (d_in, 4 * d_hidden), jnp.float32, -s, s),
        "wh": jax.random.uniform(k2, (d_hidden, 4 * d_hidden), jnp.float32, -s, s),
        "bi": jnp.zeros((4 * d_hidden,), jnp.float32),
        "bh": jnp.zeros((4 * d_hidden,), jnp.float32),
    }


def init_params(cfg: SegmentationConfig, key: jax.Array) -> Params:
    keys = jax.random.split(key, 16)
    low, band = _mel_init_bands(cfg.sinc_filters, cfg.sample_rate)
    c = cfg.conv_channels
    p: Params = {
        "wav_norm": {"scale": jnp.ones((1,)), "bias": jnp.zeros((1,))},
        "sinc": {"low_hz": jnp.asarray(low), "band_hz": jnp.asarray(band)},
        "norm0": {"scale": jnp.ones((cfg.sinc_filters,)), "bias": jnp.zeros((cfg.sinc_filters,))},
        "conv1": {
            "w": jax.random.normal(keys[0], (cfg.conv_kernel, cfg.sinc_filters, c))
            * (1.0 / math.sqrt(cfg.conv_kernel * cfg.sinc_filters)),
            "b": jnp.zeros((c,)),
        },
        "norm1": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "conv2": {
            "w": jax.random.normal(keys[1], (cfg.conv_kernel, c, c))
            * (1.0 / math.sqrt(cfg.conv_kernel * c)),
            "b": jnp.zeros((c,)),
        },
        "norm2": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "lstm": [],
        "linear1": {
            "w": jax.random.normal(keys[2], (2 * cfg.lstm_hidden, cfg.linear_dim))
            * (1.0 / math.sqrt(2 * cfg.lstm_hidden)),
            "b": jnp.zeros((cfg.linear_dim,)),
        },
        "linear2": {
            "w": jax.random.normal(keys[3], (cfg.linear_dim, cfg.linear_dim))
            * (1.0 / math.sqrt(cfg.linear_dim)),
            "b": jnp.zeros((cfg.linear_dim,)),
        },
        "classifier": {
            "w": jax.random.normal(keys[4], (cfg.linear_dim, cfg.num_classes))
            * (1.0 / math.sqrt(cfg.linear_dim)),
            "b": jnp.zeros((cfg.num_classes,)),
        },
    }
    lstm = []
    d_in = c
    for i in range(cfg.lstm_layers):
        lstm.append(
            {
                "fwd": _lstm_init(keys[5 + 2 * i], d_in, cfg.lstm_hidden),
                "bwd": _lstm_init(keys[6 + 2 * i], d_in, cfg.lstm_hidden),
            }
        )
        d_in = 2 * cfg.lstm_hidden
    p["lstm"] = lstm
    return p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _instance_norm(p, x, eps=1e-5):
    """InstanceNorm1d over time, per (batch, channel): x (B, T, C)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def materialize_sinc_filters(p, cfg: SegmentationConfig) -> jnp.ndarray:
    """Parametric band-pass filters -> (kernel, 1, n_filters) conv weights.

    Each filter is a windowed ideal band-pass: (2 f2 sinc(2 f2 t) -
    2 f1 sinc(2 f1 t)) * hamming(kernel), built on-device from the learned
    (low_hz, band_hz) pair.
    """
    sr = cfg.sample_rate
    # SincNet parameterisation (min_low_hz = min_band_hz = 50, the published
    # defaults pyannote's SincConv uses) so converted checkpoints reproduce
    # the exact filterbank
    min_low_hz = min_band_hz = 50.0
    low = min_low_hz + jnp.abs(p["low_hz"])
    high = jnp.clip(low + min_band_hz + jnp.abs(p["band_hz"]), min_low_hz, sr / 2)
    band = high - low
    k = cfg.sinc_kernel
    half = (k - 1) // 2
    t = (jnp.arange(-half, half + 1) / sr)[:, None]  # (k, 1) seconds
    # SincNet's exact Hamming variant (SincConv_fast): the window is
    # computed on linspace(0, k/2-1, k//2) for the LEFT half, mirrored to
    # the right, and the CENTRE tap stays unwindowed — an arange(k)/k grid
    # over all taps deviates per-tap and breaks converted-checkpoint parity
    n_lin = jnp.linspace(0.0, (k / 2) - 1, k // 2)
    w_left = 0.54 - 0.46 * jnp.cos(2 * math.pi * n_lin / k)
    window = jnp.concatenate(
        [w_left, jnp.ones((1,), w_left.dtype), w_left[::-1]]
    )[:, None]

    # ideal band-pass: (sin(2π h t) - sin(2π l t)) / (π t); centre tap 2(h-l).
    # Safe divide at t=0 (the centre tap), then overwrite it exactly.
    t_safe = jnp.where(t == 0.0, 1.0, t)
    num = jnp.sin(2 * math.pi * high[None, :] * t) - jnp.sin(2 * math.pi * low[None, :] * t)
    filt = num / (math.pi * t_safe)
    filt = jnp.where(t == 0.0, 2.0 * band[None, :], filt)
    filt = filt * window / (2.0 * band[None, :])  # peak-normalised, windowed
    return filt[:, None, :]  # (k, in=1, out=n_filters)


def forward(
    params: Params, cfg: SegmentationConfig, audio: jnp.ndarray
) -> jnp.ndarray:
    """audio (B, window_samples) -> powerset logits (B, num_frames, 7)."""
    x = audio[:, :, None]  # (B, T, 1)
    x = _instance_norm(params["wav_norm"], x)

    # sinc conv, stride 10, |.|, maxpool 3, instance-norm, leaky-relu
    filters = materialize_sinc_filters(params["sinc"], cfg)
    x = jax.lax.conv_general_dilated(
        x, filters, (cfg.sinc_stride,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    x = jnp.abs(x)
    x = _maxpool_time(x, cfg.pool)
    x = jax.nn.leaky_relu(_instance_norm(params["norm0"], x))

    for conv, norm in (("conv1", "norm1"), ("conv2", "norm2")):
        x = jax.lax.conv_general_dilated(
            x, params[conv]["w"], (1,), "VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + params[conv]["b"]
        x = _maxpool_time(x, cfg.pool)
        x = jax.nn.leaky_relu(_instance_norm(params[norm], x))

    # 4-layer bidirectional LSTM over frames
    for layer in params["lstm"]:
        fwd = _lstm_scan(layer["fwd"], x, reverse=False)
        bwd = _lstm_scan(layer["bwd"], x, reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)

    x = jax.nn.leaky_relu(x @ params["linear1"]["w"] + params["linear1"]["b"])
    x = jax.nn.leaky_relu(x @ params["linear2"]["w"] + params["linear2"]["b"])
    return x @ params["classifier"]["w"] + params["classifier"]["b"]


def _maxpool_time(x, k):
    b, t, c = x.shape
    t2 = (t // k) * k
    return jnp.max(x[:, :t2].reshape(b, t2 // k, k, c), axis=2)


def _lstm_scan(p, x, reverse: bool):
    """Standard LSTM over axis 1 of x (B, T, D) via lax.scan."""
    b, t, d = x.shape
    h_dim = p["wh"].shape[0]
    xs = jnp.swapaxes(x, 0, 1)  # (T, B, D)

    # precompute input projections for all steps in one big matmul (MXU)
    gates_in = xs @ p["wi"] + p["bi"] + p["bh"]  # (T, B, 4H)

    def step(carry, g_in):
        h, c = carry
        gates = g_in + h @ p["wh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))
    _, hs = jax.lax.scan(step, init, gates_in, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


@partial(jax.jit, static_argnames=("cfg", "hard"))
def segment_windows(
    params: Params, cfg: SegmentationConfig, audio: jnp.ndarray,
    hard: bool = False,
):
    """Jitted batched forward + powerset -> per-speaker probabilities.

    Accepts float32 waveforms or int16 (dequantised on device — int16 is
    audio's native bit depth and halves the host->HBM transfer).

    Returns (B, num_frames, num_speakers) activation in [0, 1]: probability
    that each local speaker is active, obtained by summing softmaxed
    powerset classes through the fixed membership matrix.

    hard=True instead ARGMAX-decodes the powerset class per frame and maps
    it to binary multilabel rows — pyannote-3.1's ``to_multilabel`` hard
    decode, the parity path for converted checkpoints (a frame whose
    marginal P(spk) exceeds onset while the argmax class is 'no speech'
    diverges from pyannote under the soft decode).
    """
    if audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) / 32768.0
    logits = forward(params, cfg, audio)
    member = jnp.asarray(powerset_matrix(cfg))  # (7, 3)
    if hard:
        return member[jnp.argmax(logits, axis=-1)]
    probs = jax.nn.softmax(logits, axis=-1)
    return probs @ member
