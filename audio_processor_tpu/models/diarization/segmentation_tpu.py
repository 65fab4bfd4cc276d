"""TPU-first segmentation network: conv frontend + attention encoder.

The pyannote-compatible model (segmentation.py) exists for checkpoint
parity, but its BiLSTM is recurrence — 4712 sequential steps per window.
This variant is the architecture we'd train from scratch ON TPU: log-mel
frontend (shared DFT-as-matmul machinery), a strided conv stem, and a
small pre-LN transformer encoder — fully parallel over the 10 s window,
everything on the MXU, same powerset head and (almost) the same frame
grid so it drops into pipeline/diarize.Diarizer unchanged.
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
class TpuSegmentationConfig:
    sample_rate: int = 16_000
    window_s: float = 10.0
    n_mels: int = 80
    d_model: int = 192
    n_head: int = 4
    n_layer: int = 4
    num_speakers: int = 3
    max_simultaneous: int = 2

    @property
    def window_samples(self) -> int:
        return int(self.window_s * self.sample_rate)

    @property
    def num_classes(self) -> int:
        n, k = self.num_speakers, self.max_simultaneous
        return sum(math.comb(n, r) for r in range(k + 1))

    @property
    def num_frames(self) -> int:
        # mel frames (10 ms) conv-subsampled x2 -> 20 ms segmentation frames
        return int(self.window_s * 100) // 2  # 500 per 10 s window

    @property
    def frame_step_s(self) -> float:
        return 0.02


def _ln_init(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _lin_init(key, din, dout):
    return {
        "w": jax.random.normal(key, (din, dout), jnp.float32) / math.sqrt(din),
        "b": jnp.zeros((dout,)),
    }


def init_params(cfg: TpuSegmentationConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 8 + 6 * cfg.n_layer))
    d = cfg.d_model
    p: Params = {
        "conv1": {
            "w": jax.random.normal(next(keys), (3, cfg.n_mels, d), jnp.float32)
            / math.sqrt(3 * cfg.n_mels),
            "b": jnp.zeros((d,)),
        },
        "conv2": {
            "w": jax.random.normal(next(keys), (3, d, d), jnp.float32)
            / math.sqrt(3 * d),
            "b": jnp.zeros((d,)),
        },
        "blocks": [],
        "ln_out": _ln_init(d),
        "classifier": _lin_init(next(keys), d, cfg.num_classes),
    }
    for _ in range(cfg.n_layer):
        p["blocks"].append(
            {
                "ln1": _ln_init(d),
                "q": _lin_init(next(keys), d, d),
                "k": _lin_init(next(keys), d, d),
                "v": _lin_init(next(keys), d, d),
                "o": _lin_init(next(keys), d, d),
                "ln2": _ln_init(d),
                "fc1": _lin_init(next(keys), d, 4 * d),
                "fc2": _lin_init(next(keys), 4 * d, d),
            }
        )
    return p


# ONE definition of the transformer primitives: the whisper module's
# layer_norm/linear/sinusoids (identical math for the f32 params this net
# uses; keeping private twins here let the numerics silently drift)
from ..whisper.model import layer_norm as _ln  # noqa: E402
from ..whisper.model import linear as _lin  # noqa: E402
from ..whisper.model import sinusoids as _sinusoid  # noqa: E402


def forward(params: Params, cfg: TpuSegmentationConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """audio (B, window_samples) -> powerset logits (B, num_frames, C)."""
    from ...ops import frontend

    # log-mel at the Whisper contract (10 ms hop) -> (B, T_mel, n_mels)
    mel = frontend.log_mel_spectrogram(audio, n_mels=cfg.n_mels)
    x = jnp.swapaxes(mel, -1, -2)

    x = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            x, params["conv1"]["w"], (1,), [(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        + params["conv1"]["b"]
    )
    x = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            x, params["conv2"]["w"], (2,), [(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        + params["conv2"]["b"]
    )  # (B, T/2, d)
    x = x[:, : cfg.num_frames]
    x = x + jnp.asarray(_sinusoid(cfg.num_frames, cfg.d_model))

    h = cfg.n_head
    dh = cfg.d_model // h
    for bp in params["blocks"]:
        xn = _ln(bp["ln1"], x)
        b, t, _ = xn.shape
        q = _lin(bp["q"], xn).reshape(b, t, h, dh)
        k = _lin(bp["k"], xn).reshape(b, t, h, dh)
        v = _lin(bp["v"], xn).reshape(b, t, h, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dh)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, t, cfg.d_model)
        x = x + _lin(bp["o"], o)
        x = x + _lin(bp["fc2"], jax.nn.gelu(_lin(bp["fc1"], _ln(bp["ln2"], x))))

    x = _ln(params["ln_out"], x)
    return _lin(params["classifier"], x)


@partial(jax.jit, static_argnames=("cfg", "hard"))
def segment_windows(
    params: Params, cfg: TpuSegmentationConfig, audio: jnp.ndarray,
    hard: bool = False,
):
    """Same contract as segmentation.segment_windows: (B, F, n_speakers);
    hard=True argmax-decodes the powerset (pyannote's to_multilabel)."""
    from .segmentation import powerset_matrix

    if audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) / 32768.0
    logits = forward(params, cfg, audio)
    member = jnp.asarray(powerset_matrix(cfg))  # duck-typed cfg fields
    if hard:
        return member[jnp.argmax(logits, axis=-1)]
    probs = jax.nn.softmax(logits, axis=-1)
    return probs @ member
