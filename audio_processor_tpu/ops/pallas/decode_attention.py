"""Fused Pallas cross-attention kernel for the decode loop (int8 KV).

The KV-cache decode loop's dominant HBM stream is the per-chunk encoder
K/V: layers x batch x 1500 positions x d_model, re-read EVERY token step
(SURVEY.md §7 'hard parts' #1).  XLA's lowering of the jnp path keeps
effective bandwidth around ~200 GB/s on the tunnelled v5e; this kernel
streams the int8 cache HBM->VMEM via the standard BlockSpec pipeline
(auto double-buffered across the batch grid), dequantises in registers,
and runs the two matvec-ish matmuls on the MXU:

    scores[h] = q[h] (1xDh)  @  K[h] (Dh x Tpad)     (K stored transposed
                                                      so the long axis is
                                                      the 128-lane dim)
    out[h]    = softmax(scores[h]) @ V[h] (Tpad x Dh)

K's dequant scale is folded into q by the caller; V's is applied after.
Padding positions (Ta -> multiple of 128) are masked to -inf before the
softmax.

Status: numerically verified against the jnp twin (interpret mode exact;
compiled-on-TPU agrees to bf16-MXU tolerance, same as the standard bf16
attention path).  After the fori-over-layers cache restructure, XLA's own
lowering of the int8 path reaches the same step time (~12 ms at batch 64,
whisper-small), so this kernel is OPT-IN (use_pallas_kernel=True) — kept
as the vehicle for future decode-attention work (head-pair lane packing,
f32-scores variant).

Layouts:

    q   (B, Tq, H, Dh)   bf16/f32, Tq is the (small) query length
    k8t (B, H, Dh, Tpad) int8
    v8  (B, H, Tpad, Dh) int8
    out (B, Tq, H, Dh)   f32

Grid is (B,): one batch row per step; per-step VMEM is
H*Dh*Tpad*2 bytes of int8 (~2.4 MB for whisper-small) plus tiles.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, out_ref, *, valid_len: int, n_head: int):
    tq = q_ref.shape[1]
    dh = q_ref.shape[3]
    tpad = k_ref.shape[3]
    scale = 1.0 / math.sqrt(dh)

    pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tpad), 1)
    neg = jnp.float32(-1e30)

    for h in range(n_head):  # static unroll: H independent small matmuls
        q_h = q_ref[0, :, h, :].astype(jnp.float32)  # (Tq, Dh)
        k_h = k_ref[0, h].astype(jnp.float32)  # (Dh, Tpad)
        v_h = v_ref[0, h].astype(jnp.float32)  # (Tpad, Dh)
        scores = jnp.dot(q_h, k_h, preferred_element_type=jnp.float32) * scale
        scores = jnp.where(pos < valid_len, scores, neg)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p, v_h, preferred_element_type=jnp.float32) / denom
        out_ref[0, :, h, :] = o


@functools.partial(
    jax.jit, static_argnames=("valid_len", "interpret")
)
def cross_attention_int8(
    q: jnp.ndarray,  # (B, Tq, H, Dh) — K-scale already folded in
    k8t: jnp.ndarray,  # (B, H, Dh, Tpad) int8
    v8: jnp.ndarray,  # (B, H, Tpad, Dh) int8
    *,
    valid_len: int,
    interpret: bool = False,
) -> jnp.ndarray:
    b, tq, h, dh = q.shape
    tpad = k8t.shape[3]
    kernel = functools.partial(_kernel, valid_len=valid_len, n_head=h)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tq, h, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dh, tpad), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, tpad, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, h, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, tq, h, dh), jnp.float32),
        interpret=interpret,
    )(q, k8t, v8)


def cross_attention_int8_reference(
    q: jnp.ndarray, k8t: jnp.ndarray, v8: jnp.ndarray, *, valid_len: int
) -> jnp.ndarray:
    """jnp twin of the kernel (CPU tests / non-TPU fallback)."""
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bqhd,bhdt->bhqt", q.astype(jnp.float32), k8t.astype(jnp.float32)
    ) / math.sqrt(dh)
    tpad = k8t.shape[3]
    mask = jnp.arange(tpad) < valid_len
    scores = jnp.where(mask[None, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqt,bhtd->bqhd", probs, v8.astype(jnp.float32))
