"""Fused non-causal self-attention for the Whisper encoder (Pallas TPU).

MEASURED AND REJECTED AS THE DEFAULT (round 4): 684 ms vs XLA's 501 ms
per 128-chunk whisper-small encode slab on v5e.  XLA:TPU already fuses
the dot->softmax->dot chain well at this shape, and this kernel's Dh=64
contraction runs the 128-wide MXU at half occupancy while adding
layout transposes (see below).  Kept fully tested as an A/B lever
(Transcriber.use_pallas_encoder_attn / bench.py --fused-encoder) and as
the starting point for shapes where XLA's fusion breaks down (longer
contexts, head dims >= 128).  Same verdict pattern as the int8-MXU "v4
probe" in docs/performance.md.

Original motivation: the einsum path nominally materialises the score
tensor (B, H, T, T) in HBM — ~4.3 GB of f32 per layer at the serving
shape (whisper-small, T=1500, batch 128, 12 heads).  This kernel keeps
one (block_q, T) score tile in VMEM per grid step and writes only the
(block_q, Dh) output.  The measurement above implies XLA is NOT paying
that round-trip at this shape.

Layout/grid design:
- inputs stay in the model's natural (B, T, H, Dh) layout — no transposes;
  BlockSpecs carve (1, block, 1, Dh) tiles straight out of it;
- grid is (B, H, n_q_blocks) with the q index INNERMOST, so the full-length
  K and V tiles for a (batch, head) pair stay resident in VMEM across all
  of its query blocks (their index_map ignores the q coordinate — Pallas
  skips the re-fetch when consecutive blocks match);
- the encoder is non-causal and every position attends to every other
  (Whisper pads audio to 30 s BEFORE the mel, so all 1500 positions are
  real keys) — the only masking is the compile-time tail pad up to the
  sublane grid, handled with a static iota mask;
- scores/softmax run in f32 (matches the einsum path bit-for-bit in f32,
  ~1e-2 in bf16), the probabilities drop back to the compute dtype for the
  MXU contraction with V, accumulating in f32.

VMEM at the whisper-small serving shape (block_q=512, T=1536, Dh=64,
bf16): K+V resident 2x192 KB (x2 double-buffered), q/out tiles 64 KB, the
f32 score tile 3 MB — ~4 MB total, a quarter of the ~16 MB budget.

No custom VJP: this is a SERVING kernel.  Training (training/train_step)
differentiates through the einsum path — model.encode only selects the
fused path when explicitly asked (fused_attn=True), and the Transcriber
only asks on a TPU backend.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, t_valid: int):
    q = q_ref[0, 0]  # (block_q, dh)
    k = k_ref[0, 0]  # (t_pad, dh)
    v = v_ref[0, 0]  # (t_pad, dh)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, t_pad) f32
    t_pad = k.shape[0]
    if t_valid < t_pad:  # static: mask the sublane-grid tail pad
        kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kidx < t_valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def fused_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(dh)) v over (B, T, H, Dh) tensors, non-causal.

    Drop-in equivalent of models/whisper/model.attention(q, k, v) with no
    mask; all T positions are valid keys (Whisper's fixed 30 s windows).
    """
    b, t, h, dh = q.shape
    scale = 1.0 / math.sqrt(dh)

    # Mosaic requires the last two block dims to divide (8, 128) or equal
    # the array dims — a head dim blocked to 1 in (B, T, H, Dh) layout is
    # neither, so the kernel runs in (B, H, T, Dh).  The transposes are
    # plain HBM copies (~2.4 GB/layer at the serving shape) vs the
    # (B, H, T, T) score round-trip they replace — net strongly positive.
    q = jnp.swapaxes(q, 1, 2)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)

    bq = min(block_q, _round_up(t, 8))
    t_pad = _round_up(t, bq)
    if t_pad != t:
        pad = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    kv_spec = pl.BlockSpec(
        (1, 1, t_pad, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    q_spec = pl.BlockSpec(
        (1, 1, bq, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, t_valid=t),
        grid=(b, h, t_pad // bq),  # q innermost: K/V stay VMEM-resident
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, dh), q.dtype),
        interpret=interpret,
    )(q, k, v)
    out = out[:, :, :t] if t_pad != t else out
    return jnp.swapaxes(out, 1, 2)
