"""Speaker-embedding extractor: ResNet34 + temporal statistics pooling.

The embedding half of the reference's pyannote-3.1 pipeline (reference:
app/services/audio_processor.py:885) — pyannote 3.1 uses a WeSpeaker
ResNet34 operating on 80-bin kaldi fbanks.  Same topology here (2D convs
over (time, mel), channels 32/64/128/256, blocks 3/4/6/3, stats pooling,
linear to 256-d) so converted WeSpeaker checkpoints drop in; convs are
exactly the MXU-friendly shape XLA loves, and the whole extractor is one
jit over a batch of fixed-length crops.

BatchNorm runs in inference mode (running stats are parameters); training
from scratch would swap in a flax BatchNorm — out of scope for serving.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclass(frozen=True)
class EmbeddingConfig:
    n_mels: int = 80
    base_channels: int = 32
    blocks: tuple[int, ...] = (3, 4, 6, 3)
    embed_dim: int = 256
    crop_s: float = 3.0  # embedding window length
    sample_rate: int = 16_000

    @property
    def crop_samples(self) -> int:
        return int(self.crop_s * self.sample_rate)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    scale = 1.0 / math.sqrt(kh * kw * cin)
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * scale


def _bn_init(c):
    return {
        "scale": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
    }


def _basic_block_init(key, cin, cout, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(k1, 3, 3, cin, cout),
        "bn1": _bn_init(cout),
        "conv2": _conv_init(k2, 3, 3, cout, cout),
        "bn2": _bn_init(cout),
    }
    if stride != 1 or cin != cout:
        p["down_conv"] = _conv_init(k3, 1, 1, cin, cout)
        p["down_bn"] = _bn_init(cout)
    return p


def init_params(cfg: EmbeddingConfig, key: jax.Array) -> Params:
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    c = cfg.base_channels
    p: Params = {
        "stem_conv": _conv_init(next(ki), 3, 3, 1, c),
        "stem_bn": _bn_init(c),
        "stages": [],
    }
    cin = c
    for si, n_blocks in enumerate(cfg.blocks):
        cout = c * (2**si)
        stage = []
        for bi in range(n_blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            stage.append(_basic_block_init(next(ki), cin, cout, stride))
            cin = cout
        p["stages"].append(stage)
    # stats pooling output: 2 * cout * ceil(n_mels / 8)
    feat = 2 * cin * (-(-cfg.n_mels // 8))  # SAME-pad stride-2 x3 = ceil
    p["fc"] = {
        "w": jax.random.normal(next(ki), (feat, cfg.embed_dim), jnp.float32)
        * (1.0 / math.sqrt(feat)),
        "b": jnp.zeros((cfg.embed_dim,)),
    }
    return p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _bn(p, x, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]


def _conv2d(w, x, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _basic_block(p, x, stride):
    out = jax.nn.relu(_bn(p["bn1"], _conv2d(p["conv1"], x, stride)))
    out = _bn(p["bn2"], _conv2d(p["conv2"], out, 1))
    if "down_conv" in p:
        x = _bn(p["down_bn"], _conv2d(p["down_conv"], x, stride))
    return jax.nn.relu(out + x)


def forward(
    params: Params,
    cfg: EmbeddingConfig,
    feats: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """feats (B, T, n_mels) kaldi fbank -> L2-normalised embeddings (B, D).

    Convs run in compute_dtype (bf16 on TPU: ~4x the f32 conv throughput;
    cosine similarities are insensitive at this precision); statistics
    pooling and the final projection stay in f32.
    """
    cast = jax.tree.map(
        lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a, params
    )
    x = feats.astype(compute_dtype)[..., None]  # (B, T, M, 1)
    x = jax.nn.relu(_bn(cast["stem_bn"], _conv2d(cast["stem_conv"], x, 1)))
    for si, stage in enumerate(cast["stages"]):
        for bi, block in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = _basic_block(block, x, stride)
    # temporal statistics pooling over time, per (mel-band, channel) — f32
    b, t, m, c = x.shape
    flat = x.reshape(b, t, m * c).astype(jnp.float32)
    mean = jnp.mean(flat, axis=1)
    std = jnp.sqrt(jnp.var(flat, axis=1) + 1e-7)
    stats = jnp.concatenate([mean, std], axis=-1)
    emb = stats @ params["fc"]["w"] + params["fc"]["b"]
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)


@partial(jax.jit, static_argnames=("cfg",))
def embed_crops(params: Params, cfg: EmbeddingConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """audio (B, crop_samples) -> (B, embed_dim), fbank fused in the jit.

    int16 input is dequantised on device (halves host->HBM transfer)."""
    from ...ops import fbank as fbank_lib

    if audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) / 32768.0
    feats = fbank_lib.fbank(audio, n_mels=cfg.n_mels)
    return forward(params, cfg, feats)
