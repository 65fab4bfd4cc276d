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

Status (v2): the int8 kernel matches XLA's own int8 lowering (~12.4-12.6
ms/step at batch 64 whisper-small) and stays OPT-IN; the int4 NIBBLE-
PACKED variant below is the one that pays — 8.68 ms/step on the same
config (30% faster than the XLA int8 path) by halving the dominant HBM
stream, and is the production DEFAULT via Transcriber(cross_kv_bits=4).
Measured on the v5e, median of 3 x 64-step runs, 2026-08-16.

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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interpret_requested() -> bool:
    """True when APTPU_KERNEL_INTERPRET=1: off-TPU callers (the driver's
    CPU-mesh multichip dryrun) run the REAL kernels through the Pallas
    interpreter instead of the jnp reference twins, so the production
    kernel path — including the shard_map TP variant — is what gets
    certified."""
    return os.environ.get("APTPU_KERNEL_INTERPRET", "") == "1"


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


# ---------------------------------------------------------------------------
# int4 variant: nibble-packed KV, HALF the HBM bytes of the int8 stream
# ---------------------------------------------------------------------------
#
# The decode loop is bandwidth-bound on the cross-KV stream, so int4 cuts
# the dominant term ~2x.  jnp.int4 hits a jax bug on this platform
# (RecursionError in astype), so two int4 values ride one int8 byte and the
# kernel unpacks with shifts.
#
# Packing layout trick: attention is permutation-invariant over the time
# axis (softmax + weighted sum), so instead of re-INTERLEAVING nibbles
# after unpack (an expensive lane shuffle), time is stored DE-INTERLEAVED:
# the unpacked low nibbles are times [0,2,4,...] and the high nibbles times
# [1,3,5,...].  Only the validity mask needs to know the split.
#
# v3.1 (offset-binary + split matmuls): values are stored as UNSIGNED
# nibbles u = x + 8 (x in [-7,7] -> u in [1,15]), which shrinks the VPU
# unpack from four sign-extension shifts per byte to AND/shift/AND, and
# the two halves feed SEPARATE matmuls (joint softmax over both) instead
# of being concatenated back into one (Dh, Tpad) array — the concat was a
# full extra VMEM copy of K and V every step.  The +8 offset folds out in
# closed form: q.(u-8) = q.u - 8*sum(q) per score row, and because softmax
# probabilities sum to 1, out = p.(u_v-8) = p.u_v - 8 (a constant shift,
# applied before the caller's V-scale multiply).  The kernel was measured
# VPU-bound on the unpack (~340 GB/s effective vs the ~900 GB/s HBM
# stream), so fewer unpack ops is step time.


def pack_int4_time(
    k8: jnp.ndarray,  # (..., Dh, Tpad) int4-valued int8 (K, time = lanes)
    v8: jnp.ndarray,  # (..., Tpad, Dh) int4-valued int8 (V, time = sublanes)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nibble-pack K along lanes and V along sublanes (time pairs).

    Values in [-7, 7] are stored offset-binary (u = x + 8 in [1, 15]).
    """
    lo_k = k8[..., 0::2].astype(jnp.int32) + 8
    hi_k = k8[..., 1::2].astype(jnp.int32) + 8
    k4 = (lo_k | (hi_k << 4)).astype(jnp.int8)
    lo_v = v8[..., 0::2, :].astype(jnp.int32) + 8
    hi_v = v8[..., 1::2, :].astype(jnp.int32) + 8
    v4 = (lo_v | (hi_v << 4)).astype(jnp.int8)
    return k4, v4


def _unpack_nibbles_u(p8: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """int8 -> (low nibble, high nibble), both unsigned-offset int32 in
    [1, 15] (subtract 8 for the signed value)."""
    x = p8.astype(jnp.int32)
    lo = x & 0xF
    hi = (x >> 4) & 0xF
    return lo, hi


def _unpack_nibbles_u_fast(p8: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """v3.2 unpack: mask/shift in the PACKED int32 domain (4 bytes per
    vector lane, via pltpu.bitcast) BEFORE the expanding convert, instead
    of after it.

    The v3.1 chain runs convert(int8->int32) first, so every mask/shift
    touches one EXPANDED byte per lane (~6 lane-ops/byte).  Here the AND /
    shift / AND run on int32 views (0.75 lane-ops/byte) and only the two
    int8->f32 converts remain per-byte (~2.75 total) — the kernel is
    VPU-bound on exactly these ops (docs/performance.md), so this is step
    time.  Correct for ANY byte order inside the int32 lane: `& 0x0F0F0F0F`
    is per-byte-symmetric, a 4-bit shift only leaks the neighbouring
    byte's LOW nibble into masked-off bits, and the bitcast back to int8
    restores original byte positions.  Returns f32 (the MXU operand type)
    rather than v3.1's int32, saving the separate converts at the call
    sites."""
    x32 = pltpu.bitcast(p8, jnp.int32)
    lo = pltpu.bitcast(x32 & 0x0F0F0F0F, jnp.int8).astype(jnp.float32)
    hi = pltpu.bitcast(
        jax.lax.shift_right_logical(x32, 4) & 0x0F0F0F0F, jnp.int8
    ).astype(jnp.float32)
    return lo, hi


def _deinterleaved_valid_mask(tq: int, tpad: int, valid_len: int):
    """(Tq, Tpad) bool mask for the pi=[evens, odds] time order."""
    half = tpad // 2
    j = jax.lax.broadcasted_iota(jnp.int32, (tq, tpad), 1)
    orig = jnp.where(j < half, 2 * j, 2 * (j - half) + 1)
    return orig < valid_len


def _int4_head_attention(
    q_h, k4_h, v4_h, *, valid_len: int, scale: float, fast_unpack: bool = False
):
    """One head's offset-binary split-matmul attention.

    q_h (Tq, Dh) f32; k4_h (Dh, Tpad/2) packed; v4_h (Tpad/2, Dh) packed.
    Returns (Tq, Dh) f32 in integer units (caller applies the V scale).
    fast_unpack selects the packed-domain v3.2 unpack (TPU Mosaic only —
    interpret mode keeps the portable v3.1 chain).
    """
    tq = q_h.shape[0]
    half = k4_h.shape[1]
    n_even = (valid_len + 1) // 2  # low nibbles hold times 0,2,4,...
    n_odd = valid_len // 2  # high nibbles hold times 1,3,5,...
    neg = jnp.float32(-1e30)

    def unpack_f32(p8):
        # int8->int32 bitcast packs 4 values along the sublane (second-
        # minor) dim; toy shapes that don't divide keep the v3.1 chain
        if fast_unpack and p8.shape[-2] % 4 == 0:
            return _unpack_nibbles_u_fast(p8)
        lo, hi = _unpack_nibbles_u(p8)
        return lo.astype(jnp.float32), hi.astype(jnp.float32)

    lo_k, hi_k = unpack_f32(k4_h)
    # q.(u-8) = q.u - 8*sum(q): the offset folds into one scalar per row
    corr = 8.0 * jnp.sum(q_h, axis=1, keepdims=True)  # (Tq, 1)
    s_lo = (
        jnp.dot(q_h, lo_k, preferred_element_type=jnp.float32) - corr
    ) * scale
    s_hi = (
        jnp.dot(q_h, hi_k, preferred_element_type=jnp.float32) - corr
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, half), 1)
    s_lo = jnp.where(col < n_even, s_lo, neg)
    s_hi = jnp.where(col < n_odd, s_hi, neg)
    m = jnp.maximum(
        jnp.max(s_lo, axis=-1, keepdims=True),
        jnp.max(s_hi, axis=-1, keepdims=True),
    )
    p_lo = jnp.exp(s_lo - m)
    p_hi = jnp.exp(s_hi - m)
    denom = jnp.sum(p_lo, axis=-1, keepdims=True) + jnp.sum(
        p_hi, axis=-1, keepdims=True
    )
    lo_v, hi_v = unpack_f32(v4_h)
    acc = jnp.dot(
        p_lo, lo_v, preferred_element_type=jnp.float32
    ) + jnp.dot(p_hi, hi_v, preferred_element_type=jnp.float32)
    # p.(u-8) = p.u - 8*denom, and probs sum to denom -> a constant -8 shift
    return acc / denom - 8.0


def _kernel_int4(q_ref, k4_ref, v4_ref, out_ref, *, valid_len: int,
                 n_head: int, fast_unpack: bool):
    dh = q_ref.shape[3]
    scale = 1.0 / math.sqrt(dh)
    for h in range(n_head):
        q_h = q_ref[0, :, h, :].astype(jnp.float32)  # (Tq, Dh)
        out_ref[0, :, h, :] = _int4_head_attention(
            q_h, k4_ref[0, h], v4_ref[0, h], valid_len=valid_len, scale=scale,
            fast_unpack=fast_unpack,
        )


@functools.partial(jax.jit, static_argnames=("valid_len", "interpret"))
def cross_attention_int4(
    q: jnp.ndarray,  # (B, Tq, H, Dh) — int4 K-scale already folded in
    k4: jnp.ndarray,  # (B, H, Dh, Tpad//2) nibble-packed int8
    v4: jnp.ndarray,  # (B, H, Tpad//2, Dh) nibble-packed int8
    *,
    valid_len: int,
    interpret: bool = False,
) -> jnp.ndarray:
    b, tq, h, dh = q.shape
    thalf = k4.shape[3]
    kernel = functools.partial(
        _kernel_int4, valid_len=valid_len, n_head=h,
        fast_unpack=not interpret,  # packed-domain unpack needs Mosaic
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tq, h, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dh, thalf), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, thalf, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, h, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, tq, h, dh), jnp.float32),
        interpret=interpret,
    )(q, k4, v4)


def _batched_softmax_halves(s_lo, s_hi, n_even, n_odd):
    """Joint softmax over the two de-interleaved halves, rows batched.

    s_lo/s_hi (R, half) f32 -> (p_lo, p_hi, denom).  Identical math (and
    op order per row) to the per-row chain in _int4_head_attention, so
    batching rows is bit-exact — but the (R, half) elementwise chain runs
    at full sublane occupancy instead of (1, half)'s 1/8."""
    rows, half = s_lo.shape
    neg = jnp.float32(-1e30)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, half), 1)
    s_lo = jnp.where(col < n_even, s_lo, neg)
    s_hi = jnp.where(col < n_odd, s_hi, neg)
    m = jnp.maximum(
        jnp.max(s_lo, axis=-1, keepdims=True),
        jnp.max(s_hi, axis=-1, keepdims=True),
    )
    p_lo = jnp.exp(s_lo - m)
    p_hi = jnp.exp(s_hi - m)
    denom = jnp.sum(p_lo, axis=-1, keepdims=True) + jnp.sum(
        p_hi, axis=-1, keepdims=True
    )
    return p_lo, p_hi, denom


def _unpack_f32(p8, fast_unpack: bool):
    """The kernel-side nibble unpack: packed-domain (v3.2, Mosaic only)
    when fast_unpack and the sublane dim divides the int32 bitcast; the
    portable v3.1 chain otherwise (interpret mode / toy shapes)."""
    if fast_unpack and p8.shape[-2] % 4 == 0:
        return _unpack_nibbles_u_fast(p8)
    lo, hi = _unpack_nibbles_u(p8)
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def _kernel_int4_stacked(
    layer_ref, q_ref, k4_ref, v4_ref, out_ref, *, valid_len: int,
    n_head: int, fast_unpack: bool, bb: int = 1,
):
    """k4/v4 blocks carry (1, BB, H, ...) leading dims because the LAYER is
    selected by the BlockSpec index_map from the scalar-prefetched layer id
    (layer_ref is otherwise unused here).  bb is the batch-block size.

    v3.4b (round 5): with bb rows per grid step and Tq == 1 (the decode
    loop), each head runs its bb rows' mask/max/exp/sum chain as ONE
    (bb, half) batched block instead of bb (1, half) chains — the (B,)
    grid ran every softmax op at 1/8 sublane occupancy, which v3.2's
    measurements showed was the residual VPU bound.  The per-row matvecs
    and op order are unchanged, so the result is bit-exact vs bb=1
    (verified on-chip by benchmarks/kernel_v34_probe.py: 3.04 -> 2.52
    ms/12-layer step at batch 64, x1.205).  Prefill (Tq > 1) and odd
    batches keep the per-row path."""
    tq = q_ref.shape[1]
    dh = q_ref.shape[3]
    scale = 1.0 / math.sqrt(dh)
    if bb == 1 or tq != 1:
        for b in range(bb):
            for h in range(n_head):
                q_h = q_ref[b, :, h, :].astype(jnp.float32)  # (Tq, Dh)
                out_ref[b, :, h, :] = _int4_head_attention(
                    q_h, k4_ref[0, b, h], v4_ref[0, b, h],
                    valid_len=valid_len, scale=scale,
                    fast_unpack=fast_unpack,
                )
        return
    n_even = (valid_len + 1) // 2  # low nibbles hold times 0,2,4,...
    n_odd = valid_len // 2  # high nibbles hold times 1,3,5,...
    scale = jnp.float32(scale)
    for h in range(n_head):
        q_h = q_ref[:, 0, h, :].astype(jnp.float32)  # (bb, Dh)
        corr = 8.0 * jnp.sum(q_h, axis=1, keepdims=True)  # (bb, 1)
        lo_k, hi_k = _unpack_f32(k4_ref[0, :, h], fast_unpack)  # (bb,Dh,half)
        # keep operands 2-D: Mosaic's dot lowering rejects rank-1 lhs
        s_lo = jnp.concatenate(
            [jnp.dot(q_h[b: b + 1], lo_k[b], preferred_element_type=jnp.float32)
             for b in range(bb)], axis=0,
        )
        s_hi = jnp.concatenate(
            [jnp.dot(q_h[b: b + 1], hi_k[b], preferred_element_type=jnp.float32)
             for b in range(bb)], axis=0,
        )
        s_lo = (s_lo - corr) * scale
        s_hi = (s_hi - corr) * scale
        p_lo, p_hi, denom = _batched_softmax_halves(s_lo, s_hi, n_even, n_odd)
        lo_v, hi_v = _unpack_f32(v4_ref[0, :, h], fast_unpack)  # (bb,half,Dh)
        for b in range(bb):
            acc = jnp.dot(
                p_lo[b: b + 1], lo_v[b], preferred_element_type=jnp.float32
            ) + jnp.dot(
                p_hi[b: b + 1], hi_v[b], preferred_element_type=jnp.float32
            )
            # p.(u-8) = p.u - 8*denom, probs sum to denom -> constant -8
            out_ref[b, :, h, :] = acc / denom[b] - 8.0


def _pick_bb(b: int) -> int:
    """Largest batch-block in {8,4,2,1} dividing b (production batches are
    pow2; odd leftovers just run unblocked)."""
    for bb in (8, 4, 2):
        if b % bb == 0:
            return bb
    return 1


@functools.partial(jax.jit, static_argnames=("valid_len", "interpret"))
def cross_attention_int4_stacked(
    q: jnp.ndarray,  # (B, Tq, H, Dh) — int4 K-scale already folded in
    k4_all: jnp.ndarray,  # (L, B, H, Dh, Tpad//2) nibble-packed int8
    v4_all: jnp.ndarray,  # (L, B, H, Tpad//2, Dh) nibble-packed int8
    layer: jnp.ndarray,  # scalar int32: which layer's cache to read
    *,
    valid_len: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """int4 decode cross-attention reading ONE layer of the STACKED cache.

    The layer id rides scalar prefetch and selects the block in the
    index_map, so the kernel DMAs straight out of the (L, B, ...) arrays —
    the XLA alternative (dynamic_index_in_dim then kernel) materialises a
    full 75 MB copy of the layer's K and V every decode step per layer
    (measured 1.8 ms/step of pure copying at batch 64 whisper-small,
    ~31% of the step).

    v3.4b (round 5): the grid is (B/BB,) with BB batch rows per grid step
    instead of (B,), and each head's BB softmax chains run as one
    (BB, half) batched block (see _kernel_int4_stacked) — bit-exact,
    measured x1.205 on-chip (benchmarks/kernel_v34_probe.py; pure
    batch-blocking without the batched softmax, v3.4a, measured 0.98x —
    the win is sublane occupancy, not DMA block size).  Interpret mode
    (CPU tests/dryrun) uses the same blocking, so the bb>1 kernel body
    gets hermetic coverage too."""
    b, tq, h, dh = q.shape
    thalf = k4_all.shape[4]
    bb = _pick_bb(b)
    kernel = functools.partial(
        _kernel_int4_stacked, valid_len=valid_len, n_head=h,
        fast_unpack=not interpret,  # packed-domain unpack needs Mosaic
        bb=bb,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, tq, h, dh), lambda i, l: (i, 0, 0, 0)),
            pl.BlockSpec((1, bb, h, dh, thalf), lambda i, l: (l[0], i, 0, 0, 0)),
            pl.BlockSpec((1, bb, h, thalf, dh), lambda i, l: (l[0], i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, tq, h, dh), lambda i, l: (i, 0, 0, 0)),
    )
    # bb-row KV blocks double-buffer past the default 16 MB scoped-VMEM
    # limit (v5e VMEM is 128 MB)
    params = {}
    if bb > 1:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, tq, h, dh), jnp.float32),
        interpret=interpret,
        **params,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), q, k4_all, v4_all)


def cross_attention_int4_stacked_tp(
    mesh,
    q: jnp.ndarray,  # (B, Tq, H, Dh) — int4 K-scale already folded in
    k4_all: jnp.ndarray,  # (L, B, H, Dh, Tpad//2) nibble-packed int8
    v4_all: jnp.ndarray,  # (L, B, H, Tpad//2, Dh) nibble-packed int8
    layer: jnp.ndarray,
    *,
    valid_len: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """The stacked int4 kernel under a (data, model) mesh via shard_map.

    Megatron-style TP shards attention HEADS across the model axis (the
    qkv projections are column-parallel, so q arrives head-sharded); the
    batch rides the data axis.  Heads are independent in this kernel, so
    each device runs the ordinary kernel on its local (B/dp, H/tp) slice —
    no collective is needed here (the row-parallel output projection's
    psum happens outside, inserted by XLA).  Requires H % tp == 0.
    """
    from ...parallel.mesh import DATA_AXIS, MODEL_AXIS

    P = jax.sharding.PartitionSpec
    n_head = q.shape[2]
    tp = dict(mesh.shape).get(MODEL_AXIS, 1)
    if n_head % tp:
        raise ValueError(f"{n_head} heads do not shard over tp={tp}")
    qspec = P(DATA_AXIS, None, MODEL_AXIS, None)
    cspec = P(None, DATA_AXIS, MODEL_AXIS, None, None)

    def body(q_l, k_l, v_l, layer_l):
        return cross_attention_int4_stacked(
            q_l, k_l, v_l, layer_l, valid_len=valid_len, interpret=interpret
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(qspec, cspec, cspec, P()),
        out_specs=qspec,
        check_vma=False,
    )(q, k4_all, v4_all, layer)


def cross_attention_int4_reference(
    q: jnp.ndarray, k4: jnp.ndarray, v4: jnp.ndarray, *, valid_len: int
) -> jnp.ndarray:
    """jnp twin operating on the packed (offset-binary) arrays."""
    dh = q.shape[-1]
    tq = q.shape[1]
    # the ONE nibble-unpack definition (shared with the kernel) — the
    # reference must decode the exact format the kernel reads
    lo_k, hi_k = _unpack_nibbles_u(k4)
    k_full = (
        jnp.concatenate([lo_k, hi_k], axis=3) - 8
    ).astype(jnp.float32)  # (B, H, Dh, Tpad) in [evens, odds] order
    lo_v, hi_v = _unpack_nibbles_u(v4)
    v_full = (
        jnp.concatenate([lo_v, hi_v], axis=2) - 8
    ).astype(jnp.float32)  # (B, H, Tpad, Dh) in [evens, odds] order
    scores = jnp.einsum("bqhd,bhdt->bhqt", q.astype(jnp.float32), k_full) / math.sqrt(dh)
    tpad = k_full.shape[3]
    valid = _deinterleaved_valid_mask(tq, tpad, valid_len)  # (Tq, Tpad)
    scores = jnp.where(valid[None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqt,bhtd->bqhd", probs, v_full)
