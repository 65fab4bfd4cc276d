"""Kernel v3.2 probe: packed-domain nibble unpack (pltpu.bitcast) A/B.

The v3.1 stacked int4 kernel is VPU-bound on the unpack chain (~8.5 us of
compute per grid step vs ~1.5 us of DMA; benchmarks/RESULTS.md round-3
table).  v3.2 moves the AND/shift/AND into the PACKED int32 domain via
pltpu.bitcast — 4 bytes per lane-op instead of one expanded byte — cutting
~6 lane-ops/byte to ~2.75 (the two int8->f32 converts remain).  Verified
bit-exact against v3.1 on this chip before timing (2026-08-19).

Times the production shape: stacked cache, fori over 12 layers inside a
fori over N steps, one jit, sync via np.asarray (the axon tunnel's
block_until_ready is a no-op and single dispatches have a ~29 ms floor).

Usage:  python benchmarks/kernel_v32_probe.py [--batch 128] [--steps 64]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_processor_tpu.ops.pallas import decode_attention as da

L, H, DH, TA = 12, 12, 64, 1500
TPAD = 1536


def _unpack_nibbles_i8(p8):
    """Packed-domain unpack STOPPING at int8 (no float converts): the
    masked lo/hi ARE the int8 MXU operands.  ~0.75 lane-ops/byte total."""
    x32 = pltpu.bitcast(p8, jnp.int32)
    lo = pltpu.bitcast(x32 & 0x0F0F0F0F, jnp.int8)
    hi = pltpu.bitcast(
        jax.lax.shift_right_logical(x32, 4) & 0x0F0F0F0F, jnp.int8
    )
    return lo, hi


def _quant_q(q_h):
    """(Tq, Dh) f32 -> int8 with one scale per row."""
    amax = jnp.max(jnp.abs(q_h), axis=-1, keepdims=True)
    sq = jnp.maximum(amax, 1e-8) / 127.0
    q8 = jnp.round(q_h / sq).astype(jnp.int8)
    return q8, sq


def _kernel_int4_stacked_mxu(
    layer_ref, q_ref, k4_ref, v4_ref, out_ref, *, valid_len, n_head
):
    """v3.3 candidate: packed-domain unpack to int8 + BOTH matmuls on the
    MXU (int8 x int8 -> int32 exact).  q is row-quantized to int8; probs
    are quantized at the static scale 127 (max prob is exactly 1 after the
    max subtraction).  Error band ~ the bf16 MXU passes the f32 dots
    already take under DEFAULT precision."""
    import math as _math
    dh = q_ref.shape[3]
    scale = 1.0 / _math.sqrt(dh)
    tq = q_ref.shape[1]
    half = k4_ref.shape[4]
    n_even = (valid_len + 1) // 2
    n_odd = valid_len // 2
    neg = jnp.float32(-1e30)
    for h in range(n_head):
        q_h = q_ref[0, :, h, :].astype(jnp.float32)
        q8, sq = _quant_q(q_h)
        lo_k, hi_k = _unpack_nibbles_i8(k4_ref[0, 0, h])
        corr = 8 * jnp.sum(q8.astype(jnp.int32), axis=1, keepdims=True)
        s_lo32 = jax.lax.dot_general(
            q8, lo_k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ) - corr
        s_hi32 = jax.lax.dot_general(
            q8, hi_k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ) - corr
        s_lo = s_lo32.astype(jnp.float32) * (sq * scale)
        s_hi = s_hi32.astype(jnp.float32) * (sq * scale)
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
        p8_lo = jnp.round(p_lo * 127.0).astype(jnp.int8)
        p8_hi = jnp.round(p_hi * 127.0).astype(jnp.int8)
        lo_v, hi_v = _unpack_nibbles_i8(v4_ref[0, 0, h])
        psum = jnp.sum(p8_lo.astype(jnp.int32), axis=1, keepdims=True) + jnp.sum(
            p8_hi.astype(jnp.int32), axis=1, keepdims=True
        )
        o32 = (
            jax.lax.dot_general(
                p8_lo, lo_v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            + jax.lax.dot_general(
                p8_hi, hi_v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            - 8 * psum
        )
        out_ref[0, :, h, :] = o32.astype(jnp.float32) / (denom * 127.0)


def _stacked_call(q, k_all, v_all, layer, *, valid_len, fast_unpack):
    b, tq, h, dh = q.shape
    if fast_unpack == "mxu":
        kernel = functools.partial(
            _kernel_int4_stacked_mxu, valid_len=valid_len, n_head=h,
        )
    else:
        kernel = functools.partial(
            da._kernel_int4_stacked, valid_len=valid_len, n_head=h,
            fast_unpack=fast_unpack,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tq, h, dh), lambda i, l: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1) + k_all.shape[2:], lambda i, l: (l[0], i, 0, 0, 0)),
            pl.BlockSpec((1, 1) + v_all.shape[2:], lambda i, l: (l[0], i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, h, dh), lambda i, l: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, tq, h, dh), jnp.float32),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), q, k_all, v_all)


def _time_variant(name, q0, kc, vc, steps, *, fast_unpack):
    @jax.jit
    def run(q, kc, vc):
        def step(i, q):
            acc = jax.lax.fori_loop(
                0, L,
                lambda l, a: a + _stacked_call(
                    q, kc, vc, l, valid_len=TA, fast_unpack=fast_unpack),
                jnp.zeros_like(q),
            )
            return q * 0.999 + acc * 1e-6  # data dependence across steps

        return jax.lax.fori_loop(0, steps, step, q)

    t0 = time.perf_counter()
    out = np.asarray(run(q0, kc, vc))  # compile + warm
    print(f"{name}: compile+first run {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = np.asarray(run(q0, kc, vc))
        best = min(best, time.perf_counter() - t0)
    ms = best / steps * 1e3
    print(f"{name:10s} {ms:7.2f} ms / {L}-layer step   checksum "
          f"{float(np.sum(out)):.6e}", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()
    b = args.batch

    rng = np.random.default_rng(0)
    k8 = rng.integers(-7, 8, size=(L, b, H, DH, TPAD)).astype(np.int8)
    v8 = rng.integers(-7, 8, size=(L, b, H, TPAD, DH)).astype(np.int8)
    k4, v4 = da.pack_int4_time(jnp.asarray(k8), jnp.asarray(v8))
    k4, v4 = jax.device_put(k4), jax.device_put(v4)
    q0 = jnp.asarray(rng.normal(size=(b, 1, H, DH)).astype(np.float32))

    t_slow = _time_variant("v3.1", q0, k4, v4, args.steps, fast_unpack=False)
    t_fast = _time_variant("v3.2", q0, k4, v4, args.steps, fast_unpack=True)
    t_mxu = _time_variant("v3.3mxu", q0, k4, v4, args.steps, fast_unpack="mxu")
    print(f"v3.2 speedup: {t_slow / t_fast:.3f}x   "
          f"v3.3 speedup: {t_slow / t_mxu:.3f}x")

    # accuracy of the lossy v3.3 (q/probs quantization) vs the exact v3.1,
    # on ONE layer/step
    a = np.asarray(_stacked_call(
        q0, k4, v4, jnp.int32(0), valid_len=TA, fast_unpack=False))
    c = np.asarray(_stacked_call(
        q0, k4, v4, jnp.int32(0), valid_len=TA, fast_unpack="mxu"))
    denom = np.maximum(np.abs(a), 1e-6)
    print(f"v3.3 vs exact: max abs err {np.abs(c - a).max():.4e}   "
          f"max rel err {(np.abs(c - a) / denom).max():.4e}")


if __name__ == "__main__":
    main()
