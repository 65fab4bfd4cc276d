"""First-party JAX Whisper encoder-decoder.

Replaces the openai-whisper dependency the reference delegates all STT to
(reference: app/services/audio_processor.py:863,1076).  Pure functional:
parameters are pytrees of jnp arrays, every entry point is jit/pjit-able,
and the decoder is written around an explicit KV cache updated with
dynamic_update_slice so autoregressive decode stays on-device inside
lax.scan (no per-token host sync — SURVEY.md §7 'hard parts' #1).

Layout conventions (TPU-first):
  * Linear weights are stored (d_in, d_out) so forward is  x @ W + b  —
    feeds the MXU directly, no transposes in the hot path.
  * Attention tensors are (batch, time, heads, head_dim); einsums keep the
    contraction on the last axis for MXU-friendly layouts.
  * Compute dtype is a parameter: bfloat16 on TPU for the matmul path,
    float32 accumulation via preferred_element_type.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import WhisperConfig

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter initialisation (random weights; checkpoints via convert.py)
# ---------------------------------------------------------------------------

def _linear_init(key, d_in, d_out, bias=True, scale=None):
    w_key, _ = jax.random.split(key)
    scale = scale if scale is not None else 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.normal(w_key, (d_in, d_out), jnp.float32) * scale}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _attn_init(key, d):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": _linear_init(kq, d, d),
        "k": _linear_init(kk, d, d, bias=False),  # Whisper: no bias on K
        "v": _linear_init(kv, d, d),
        "out": _linear_init(ko, d, d),
    }


def _block_init(key, d, cross: bool):
    keys = jax.random.split(key, 5)
    p = {
        "attn_ln": _ln_init(d),
        "attn": _attn_init(keys[0], d),
        "mlp_ln": _ln_init(d),
        "fc1": _linear_init(keys[1], d, 4 * d),
        "fc2": _linear_init(keys[2], 4 * d, d),
    }
    if cross:
        p["cross_attn_ln"] = _ln_init(d)
        p["cross_attn"] = _attn_init(keys[3], d)
    return p


def init_params(cfg: WhisperConfig, key: jax.Array) -> Params:
    ke, kd, kc1, kc2, kt = jax.random.split(key, 5)
    d = cfg.n_audio_state
    enc_blocks = [
        _block_init(k, d, cross=False)
        for k in jax.random.split(ke, cfg.n_audio_layer)
    ]
    dec_blocks = [
        _block_init(k, cfg.n_text_state, cross=True)
        for k in jax.random.split(kd, cfg.n_text_layer)
    ]
    return {
        "encoder": {
            # conv weights: (width, in_ch, out_ch) for lax.conv dim numbers below
            "conv1": {
                "w": jax.random.normal(kc1, (3, cfg.n_mels, d), jnp.float32)
                * (1.0 / math.sqrt(3 * cfg.n_mels)),
                "b": jnp.zeros((d,), jnp.float32),
            },
            "conv2": {
                "w": jax.random.normal(kc2, (3, d, d), jnp.float32)
                * (1.0 / math.sqrt(3 * d)),
                "b": jnp.zeros((d,), jnp.float32),
            },
            "blocks": _stack_pytrees(enc_blocks),
            "ln_post": _ln_init(d),
            # fixed sinusoidal positions, stored as a param so converted
            # checkpoints (which ship them) drop in bit-exact
            "pos_emb": jnp.asarray(sinusoids(cfg.n_audio_ctx, d)),
        },
        "decoder": {
            "token_emb": jax.random.normal(
                kt, (cfg.n_vocab, cfg.n_text_state), jnp.float32
            )
            * 0.02,
            "pos_emb": jnp.zeros((cfg.n_text_ctx, cfg.n_text_state), jnp.float32),
            "blocks": _stack_pytrees(dec_blocks),
            "ln": _ln_init(cfg.n_text_state),
        },
    }


def _stack_pytrees(trees: list):
    """Stack per-layer param trees along a leading layer axis.

    Stacked layers + lax.scan over the layer axis keeps compile time flat in
    depth (one block is traced once, not n_layer times) — important for
    medium/large (24/32 layers).
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def layer_norm(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def linear(p, x):
    if "w8" in p:  # int8 weights (models/whisper/quantize.py): the MXU
        # consumes int8 directly; per-channel scale folds after the matmul
        y = jnp.dot(x, p["w8"].astype(x.dtype), preferred_element_type=jnp.float32)
        y = y * p["scale"]
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal positions for the encoder (sin||cos)."""
    assert channels % 2 == 0
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def _merge_heads(x):
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def attention(q, k, v, mask=None):
    """softmax(q k^T / sqrt(dh)) v with (B,T,H,Dh) layouts, fp32 softmax."""
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(dh))
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def self_attention(p, x, n_head, mask=None, fused=False):
    q = _split_heads(linear(p["q"], x), n_head)
    k = _split_heads(linear(p["k"], x), n_head)
    v = _split_heads(linear(p["v"], x), n_head)
    if fused and mask is None:
        # serving-only Pallas kernel (no VJP — training uses the einsum)
        from ...ops.pallas.encoder_attention import fused_self_attention

        o = fused_self_attention(q, k, v)
    else:
        o = attention(q, k, v, mask)
    return linear(p["out"], _merge_heads(o))


def mlp(p, x):
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _conv1d(p, x, stride):
    # x: (B, T, C_in); w: (width, C_in, C_out)
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(stride,),
            padding=[(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + p["b"].astype(x.dtype)  # an f32 bias would silently promote the
        # whole encoder back to f32 under bf16 compute
    )


def encode(
    params: Params,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
    fused_attn: bool = False,
) -> jnp.ndarray:
    """mel (B, n_mels, 3000) -> encoder states (B, 1500, d).

    fused_attn selects the Pallas fused self-attention
    (ops/pallas/encoder_attention) — SERVING ONLY: the kernel has no VJP,
    so gradient paths (training/train_step) must keep the default einsum.
    """
    p = params["encoder"]
    x = jnp.swapaxes(mel, -1, -2).astype(compute_dtype)  # (B, T, n_mels)
    x = gelu(_conv1d(p["conv1"], x, stride=1))
    x = gelu(_conv1d(p["conv2"], x, stride=2))  # (B, 1500, d)
    x = x + p["pos_emb"].astype(x.dtype)

    def block_fn(x, bp):
        x = x + self_attention(
            bp["attn"], layer_norm(bp["attn_ln"], x), cfg.n_audio_head,
            fused=fused_attn,
        )
        x = x + mlp(bp, layer_norm(bp["mlp_ln"], x))
        return x, None

    x, _ = jax.lax.scan(block_fn, x, p["blocks"])
    return layer_norm(p["ln_post"], x)


# ---------------------------------------------------------------------------
# Decoder (teacher-forced full-sequence; the cached step is in decode.py)
# ---------------------------------------------------------------------------

def decode_logits(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,
    audio_states: jnp.ndarray,
    *,
    pos_offset: int = 0,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Teacher-forced decoder: tokens (B,T), audio (B,1500,d) -> logits (B,T,V)."""
    p = params["decoder"]
    b, t = tokens.shape
    x = p["token_emb"][tokens].astype(compute_dtype)
    x = x + p["pos_emb"][pos_offset : pos_offset + t].astype(compute_dtype)

    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    audio_states = audio_states.astype(compute_dtype)

    def block_fn(x, bp):
        x = x + self_attention(
            bp["attn"], layer_norm(bp["attn_ln"], x), cfg.n_text_head, causal
        )
        xa = layer_norm(bp["cross_attn_ln"], x)
        q = _split_heads(linear(bp["cross_attn"]["q"], xa), cfg.n_text_head)
        k = _split_heads(linear(bp["cross_attn"]["k"], audio_states), cfg.n_text_head)
        v = _split_heads(linear(bp["cross_attn"]["v"], audio_states), cfg.n_text_head)
        x = x + linear(bp["cross_attn"]["out"], _merge_heads(attention(q, k, v)))
        x = x + mlp(bp, layer_norm(bp["mlp_ln"], x))
        return x, None

    x, _ = jax.lax.scan(block_fn, x, p["blocks"])
    x = layer_norm(p["ln"], x)
    return jnp.dot(
        x, p["token_emb"].T.astype(x.dtype), preferred_element_type=jnp.float32
    )


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def forward(
    params: Params,
    cfg: WhisperConfig,
    mel: jnp.ndarray,
    tokens: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Full forward pass: mel + teacher-forced tokens -> logits."""
    audio = encode(params, cfg, mel, compute_dtype=compute_dtype)
    return decode_logits(params, cfg, tokens, audio, compute_dtype=compute_dtype)
