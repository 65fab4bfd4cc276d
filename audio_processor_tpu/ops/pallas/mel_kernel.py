"""Fused Pallas TPU kernel: framing -> windowed DFT -> power -> mel -> log.

The jnp reference (ops/frontend.log_mel_spectrogram) materialises frames
(B,3000,400), re/im (B,3000,201) and power in HBM — ~5x more HBM traffic
than the math needs.  This kernel keeps the whole chain in VMEM per tile
and writes only the (600, n_mels) log-mel tile back.

Framing trick: a frame is 400 samples at hop 160, i.e. samples
[160f, 160f+400).  Three shifted contiguous views of the padded audio,

    P0 = audio[...,   0:480000] viewed (3000, 160)   -> [160f,     160f+160)
    P1 = audio[..., 160:480160] viewed (3000, 160)   -> [160f+160, 160f+320)
    P2 = audio[..., 320:480320] viewed (3000, 160)   -> [160f+320, 160f+480)

give frame f = concat(P0[f], P1[f], P2[f][:80]).  Each view is a plain
reshape XLA feeds through the normal BlockSpec pipeline (auto double-
buffered) — no gathers, no manual DMA, no strided slices (which Mosaic
cannot lower).  The windowed real-DFT then runs as TWO MXU matmuls
against cos/sin bases (hann folded in), with power and the mel projection
fused behind them.

The dynamic-range clamp needs the per-window max, so the final
(max-8, +4, /4) normalisation runs as a trivial XLA epilogue.

Grid: (B, 5) tiles of 600 frames (600 ≡ 0 mod 8 sublanes, divides 3000).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import frontend

FRAME_TILE = 600  # frames per grid step (multiple of 8, divides 3000)
N_FREQS = frontend.N_FFT // 2 + 1  # 201
HOP = frontend.HOP_LENGTH  # 160


def _kernel(p0_ref, p1_ref, p2_ref, cos_ref, sin_ref, mel_ref, out_ref):
    frames = jnp.concatenate(
        [p0_ref[0], p1_ref[0], p2_ref[0][:, :frontend.N_FFT - 2 * HOP]], axis=-1
    )  # (600, 400)
    # precision=HIGHEST: default MXU f32 uses bf16 passes, which is
    # catastrophic in log-space at quiet mel bins (same reasoning as the
    # jnp reference in ops/frontend.py)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im  # (600, 201)
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32, precision=hi)
    # log10 via ln; the (peak-8, +4)/4 normalisation happens in the epilogue
    out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / math.log(10.0))


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_pallas(
    audio: jnp.ndarray, n_mels: int = 80, *, interpret: bool = False
) -> jnp.ndarray:
    """audio (B, 480000) float32 @16 kHz -> log-mel (B, n_mels, 3000).

    Numerically equivalent to ops.frontend.log_mel_spectrogram (tested to
    ~2e-6); one fused kernel instead of five materialised intermediates.
    """
    if audio.ndim == 1:
        audio = audio[None]
    b, n_samples = audio.shape
    n_frames = n_samples // HOP
    assert n_frames % FRAME_TILE == 0, f"frame count {n_frames} % {FRAME_TILE} != 0"
    half = frontend.N_FFT // 2

    padded = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")
    # the k=2 view needs 2*HOP + n_frames*HOP samples; the reflect pad
    # (2*half = 400 > 320) always covers it since n_frames*HOP <= n_samples

    views = [
        padded[:, k * HOP : k * HOP + n_frames * HOP].reshape(b, n_frames, HOP)
        for k in range(3)
    ]

    cos_b, sin_b = frontend.dft_bases(frontend.N_FFT)
    filters = frontend.mel_filterbank(n_mels).T  # (201, n_mels)

    view_spec = pl.BlockSpec(
        (1, FRAME_TILE, HOP), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )

    log_mel = pl.pallas_call(
        _kernel,
        grid=(b, n_frames // FRAME_TILE),
        in_specs=[
            view_spec,
            view_spec,
            view_spec,
            const_spec((frontend.N_FFT, N_FREQS)),
            const_spec((frontend.N_FFT, N_FREQS)),
            const_spec((N_FREQS, n_mels)),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_TILE, n_mels), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_frames, n_mels), jnp.float32),
        interpret=interpret,
    )(*views, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(filters))

    # epilogue: per-window dynamic-range clamp + Whisper normalisation
    peak = jnp.max(log_mel, axis=(1, 2), keepdims=True)
    log_mel = jnp.maximum(log_mel, peak - 8.0)
    log_mel = (log_mel + 4.0) / 4.0
    return jnp.swapaxes(log_mel, 1, 2)  # (B, n_mels, n_frames)
