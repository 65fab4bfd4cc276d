"""Kernel v3.4 probe: batch-blocked grid + sublane-batched softmax A/B.

After v3.2 (packed-domain unpack) the stacked int4 kernel's residual is
the per-head softmax/convert/layout chain plus the DMA floor
(benchmarks/RESULTS.md round-4 table).  Structural observation: the grid
is (B,) — ONE batch row per grid step — so every (1, Tpad/2) score /
mask / max / exp / sum op runs at 1/8 sublane occupancy, and each step
DMAs a smallish ~0.8 MB KV block.  v3.4 blocks BB batch rows per grid
step:

  v3.4a  same per-(row, head) math, bigger DMA blocks — isolates the
         DMA-block-size + per-grid-step overhead effect.
  v3.4b  per head, the BB rows' scores/softmax run as ONE (BB, Tpad/2)
         batched chain (full sublane occupancy for the exp-dominated
         part); the matvecs stay per-row (different K/V per row, so the
         MXU can't batch them anyway).
  v3.4c  v3.4b + batched dot_general for the score and V matvecs
         (batch dims in-kernel) — whether Mosaic lowers this well is
         exactly what the probe measures.

Variants a/b keep v3.2's per-row op order (expected bit-exact); v3.4c's
batched dot_general may legally reorder f32 reductions, so the probe
gates all variants on numerical equivalence (max abs err < 1e-4 in int
units, far below the int4 cache's ~0.5/element quantisation noise) on
layers 0 and L-1 on-chip before timing — the nonzero layer exercises the
scalar-prefetch layer index_map.

Usage:  python benchmarks/kernel_v34_probe.py [--batch 64] [--steps 64]
        [--bb 8] [--variants v32,a,b,c]
"""
from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_processor_tpu.ops.pallas import decode_attention as da

L, H, DH, TA = 12, 12, 64, 1500
TPAD = 1536


# ---------------------------------------------------------------------------
# v3.4 kernels
# ---------------------------------------------------------------------------

def _kernel_v34a(layer_ref, q_ref, k4_ref, v4_ref, out_ref, *, valid_len,
                 n_head, bb):
    """Batch-blocked DMA, unchanged per-(row, head) math."""
    dh = q_ref.shape[3]
    scale = 1.0 / math.sqrt(dh)
    for b in range(bb):
        for h in range(n_head):
            q_h = q_ref[b, :, h, :].astype(jnp.float32)  # (Tq, Dh)
            out_ref[b, :, h, :] = da._int4_head_attention(
                q_h, k4_ref[0, b, h], v4_ref[0, b, h], valid_len=valid_len,
                scale=scale, fast_unpack=True,
            )


def _batched_softmax_halves(s_lo, s_hi, n_even, n_odd):
    """Joint softmax over the two de-interleaved halves, rows batched.

    s_lo/s_hi (BB, half) f32 -> (p_lo, p_hi, denom)."""
    bbn, half = s_lo.shape
    neg = jnp.float32(-1e30)
    col = jax.lax.broadcasted_iota(jnp.int32, (bbn, half), 1)
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


def _kernel_v34b(layer_ref, q_ref, k4_ref, v4_ref, out_ref, *, valid_len,
                 n_head, bb):
    """Per head: per-row matvecs, BATCHED (BB, half) softmax chain."""
    dh = q_ref.shape[3]
    scale = jnp.float32(1.0 / math.sqrt(dh))
    n_even = (valid_len + 1) // 2
    n_odd = valid_len // 2
    for h in range(n_head):
        q_h = q_ref[:, 0, h, :].astype(jnp.float32)  # (BB, Dh)
        corr = 8.0 * jnp.sum(q_h, axis=1, keepdims=True)  # (BB, 1)
        lo_k, hi_k = da._unpack_nibbles_u_fast(k4_ref[0, :, h])  # (BB,Dh,half)
        # keep operands 2-D: Mosaic's dot lowering rejects rank-1 lhs
        # (empty non-contracting dims fail TPU_DotDimensionNumbersAttr)
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
        lo_v, hi_v = da._unpack_nibbles_u_fast(v4_ref[0, :, h])  # (BB,half,Dh)
        for b in range(bb):
            acc = jnp.dot(
                p_lo[b : b + 1], lo_v[b], preferred_element_type=jnp.float32
            ) + jnp.dot(
                p_hi[b : b + 1], hi_v[b], preferred_element_type=jnp.float32
            )
            out_ref[b, :, h, :] = acc / denom[b] - 8.0


def _kernel_v34c(layer_ref, q_ref, k4_ref, v4_ref, out_ref, *, valid_len,
                 n_head, bb):
    """Per head: BATCHED dot_general matvecs + batched softmax chain."""
    dh = q_ref.shape[3]
    scale = jnp.float32(1.0 / math.sqrt(dh))
    n_even = (valid_len + 1) // 2
    n_odd = valid_len // 2
    bdims = (((1,), (1,)), ((0,), (0,)))  # (BB,Dh) x (BB,Dh,half) -> (BB,half)
    vdims = (((1,), (1,)), ((0,), (0,)))  # (BB,half) x (BB,half,Dh) -> (BB,Dh)
    for h in range(n_head):
        q_h = q_ref[:, 0, h, :].astype(jnp.float32)  # (BB, Dh)
        corr = 8.0 * jnp.sum(q_h, axis=1, keepdims=True)
        lo_k, hi_k = da._unpack_nibbles_u_fast(k4_ref[0, :, h])
        s_lo = jax.lax.dot_general(
            q_h, lo_k, bdims, preferred_element_type=jnp.float32
        )
        s_hi = jax.lax.dot_general(
            q_h, hi_k, bdims, preferred_element_type=jnp.float32
        )
        s_lo = (s_lo - corr) * scale
        s_hi = (s_hi - corr) * scale
        p_lo, p_hi, denom = _batched_softmax_halves(s_lo, s_hi, n_even, n_odd)
        lo_v, hi_v = da._unpack_nibbles_u_fast(v4_ref[0, :, h])
        acc = jax.lax.dot_general(
            p_lo, lo_v, vdims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            p_hi, hi_v, vdims, preferred_element_type=jnp.float32
        )
        out_ref[:, 0, h, :] = acc / denom - 8.0


def _block_diag(x, width):
    """(bb, W) -> (bb, bb*W) with row r's values in columns [r*W, (r+1)*W)
    and exact zeros elsewhere (tile + iota mask; bb*bb*W elements)."""
    bb = x.shape[0]
    tiled = jnp.tile(x, (1, bb))  # [r, c] = x[r, c % W]
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, bb * width), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (bb, bb * width), 0)
    return jnp.where(col // width == row, tiled, 0.0)


def _kernel_v34d(layer_ref, q_ref, k4_ref, v4_ref, out_ref, *, valid_len,
                 n_head, bb):
    """v3.4b + BLOCK-DIAGONAL q for the score matvecs: the bb per-row
    (1, Dh) @ (Dh, half) dots collapse into ONE
    (bb, bb*Dh) @ (bb*Dh, half) matmul per half (zeros kill the cross
    terms; the MXU is idle so the 8x FLOP padding is free) — 32 dot ops
    per head become 4 + 2.  V matvecs stay per-row."""
    dh = q_ref.shape[3]
    scale = jnp.float32(1.0 / math.sqrt(dh))
    n_even = (valid_len + 1) // 2
    n_odd = valid_len // 2
    for h in range(n_head):
        q_h = q_ref[:, 0, h, :].astype(jnp.float32)  # (bb, Dh)
        corr = 8.0 * jnp.sum(q_h, axis=1, keepdims=True)
        q_bd = _block_diag(q_h, dh)  # (bb, bb*Dh)
        lo_k, hi_k = da._unpack_nibbles_u_fast(k4_ref[0, :, h])  # (bb,Dh,half)
        half = lo_k.shape[-1]
        lo_ks = lo_k.reshape(bb * dh, half)
        hi_ks = hi_k.reshape(bb * dh, half)
        s_lo = (jnp.dot(q_bd, lo_ks, preferred_element_type=jnp.float32)
                - corr) * scale
        s_hi = (jnp.dot(q_bd, hi_ks, preferred_element_type=jnp.float32)
                - corr) * scale
        p_lo, p_hi, denom = _batched_softmax_halves(s_lo, s_hi, n_even, n_odd)
        lo_v, hi_v = da._unpack_nibbles_u_fast(v4_ref[0, :, h])  # (bb,half,Dh)
        for b in range(bb):
            acc = jnp.dot(
                p_lo[b: b + 1], lo_v[b], preferred_element_type=jnp.float32
            ) + jnp.dot(
                p_hi[b: b + 1], hi_v[b], preferred_element_type=jnp.float32
            )
            out_ref[b, :, h, :] = acc / denom[b] - 8.0


def _kernel_v34e(layer_ref, q_ref, k4_ref, v4_ref, out_ref, *, valid_len,
                 n_head, bb):
    """v3.4d + block-diagonal PROBS for the V matvecs too: the bb
    (1, half) @ (half, Dh) dots per half collapse into one
    (bb, bb*half) @ (bb*half, Dh) matmul.  The (bb, bb*half) scatter is
    2 x 98K VPU elements per head — the probe measures whether that
    costs more than the 32 dot issues it saves."""
    dh = q_ref.shape[3]
    scale = jnp.float32(1.0 / math.sqrt(dh))
    n_even = (valid_len + 1) // 2
    n_odd = valid_len // 2
    for h in range(n_head):
        q_h = q_ref[:, 0, h, :].astype(jnp.float32)  # (bb, Dh)
        corr = 8.0 * jnp.sum(q_h, axis=1, keepdims=True)
        q_bd = _block_diag(q_h, dh)
        lo_k, hi_k = da._unpack_nibbles_u_fast(k4_ref[0, :, h])
        half = lo_k.shape[-1]
        s_lo = (jnp.dot(q_bd, lo_k.reshape(bb * dh, half),
                        preferred_element_type=jnp.float32) - corr) * scale
        s_hi = (jnp.dot(q_bd, hi_k.reshape(bb * dh, half),
                        preferred_element_type=jnp.float32) - corr) * scale
        p_lo, p_hi, denom = _batched_softmax_halves(s_lo, s_hi, n_even, n_odd)
        lo_v, hi_v = da._unpack_nibbles_u_fast(v4_ref[0, :, h])  # (bb,half,Dh)
        acc = jnp.dot(
            _block_diag(p_lo, half), lo_v.reshape(bb * half, dh),
            preferred_element_type=jnp.float32,
        ) + jnp.dot(
            _block_diag(p_hi, half), hi_v.reshape(bb * half, dh),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, 0, h, :] = acc / denom - 8.0


def _kernel_v34s(layer_ref, q_ref, k4_ref, v4_ref, out_ref, *, valid_len,
                 n_head, bb):
    """STREAM-ONLY floor: identical grid/BlockSpecs (so the same KV bytes
    move HBM->VMEM through the same pipeline) but near-zero compute —
    the packed blocks are bitcast to int32 and reduced, no unpack, no
    matmuls, no softmax.  Times the achievable-DMA ceiling for this
    access pattern; full-kernel time / this time = how close the real
    kernel runs to its own memory bound (the roofline evidence the
    round-4 verdict asked for, measured rather than inferred from the
    819 GB/s paper number)."""
    dh = q_ref.shape[3]
    # keep every value >=2-D: Mosaic's layout pass asserts on 1-D vectors
    acc = jnp.zeros((bb, 1), jnp.float32)
    for h in range(n_head):
        k32 = pltpu.bitcast(k4_ref[0, :, h], jnp.int32)  # (bb, Dh/4, half)
        v32 = pltpu.bitcast(v4_ref[0, :, h], jnp.int32)  # (bb, half/4, Dh)
        acc = acc + (
            jnp.sum(jnp.sum(k32, axis=2), axis=1, keepdims=True)
            + jnp.sum(jnp.sum(v32, axis=2), axis=1, keepdims=True)
        ).astype(jnp.float32)
    out_ref[:, 0, :, :] = jnp.broadcast_to(
        acc[:, :, None], (bb, n_head, dh)
    )


_V34_KERNELS = {"a": _kernel_v34a, "b": _kernel_v34b, "c": _kernel_v34c,
                "d": _kernel_v34d, "e": _kernel_v34e, "s": _kernel_v34s}


def _stacked_call_v34(q, k_all, v_all, layer, *, valid_len, variant, bb):
    b, tq, h, dh = q.shape
    assert tq == 1 and b % bb == 0
    kernel = functools.partial(
        _V34_KERNELS[variant], valid_len=valid_len, n_head=h, bb=bb
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, tq, h, dh), lambda i, l: (i, 0, 0, 0)),
            pl.BlockSpec((1, bb) + k_all.shape[2:], lambda i, l: (l[0], i, 0, 0, 0)),
            pl.BlockSpec((1, bb) + v_all.shape[2:], lambda i, l: (l[0], i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, tq, h, dh), lambda i, l: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, tq, h, dh), jnp.float32),
        # bb-row KV blocks double-buffer past the default 16 MB scoped-VMEM
        # limit (v5e VMEM is 128 MB); lift it for the blocked variants
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), q, k_all, v_all)


def _stacked_call_v32(q, k_all, v_all, layer, *, valid_len):
    b, tq, h, dh = q.shape
    kernel = functools.partial(
        da._kernel_int4_stacked, valid_len=valid_len, n_head=h,
        fast_unpack=True,
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


def _time_variant(name, call, q0, kc, vc, steps):
    @jax.jit
    def run(q, kc, vc):
        def step(i, q):
            acc = jax.lax.fori_loop(
                0, L,
                lambda l, a: a + call(q, kc, vc, l),
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--bb", type=int, default=8)
    ap.add_argument("--variants", default="v32,a,b,c")
    ap.add_argument("--prod", action="store_true",
                    help="validate + time the PRODUCTION "
                    "cross_attention_int4_stacked (post-v3.4b integration) "
                    "against the jnp reference on-chip, then exit")
    args = ap.parse_args()
    b, bb = args.batch, args.bb

    if args.prod:
        rng = np.random.default_rng(0)
        k8 = rng.integers(-7, 8, size=(L, b, H, DH, TPAD)).astype(np.int8)
        v8 = rng.integers(-7, 8, size=(L, b, H, TPAD, DH)).astype(np.int8)
        k4, v4 = da.pack_int4_time(jnp.asarray(k8), jnp.asarray(v8))
        k4, v4 = jax.device_put(k4), jax.device_put(v4)
        q0 = jnp.asarray(rng.normal(size=(b, 1, H, DH)).astype(np.float32))
        for l in (0, L - 1):
            # baseline = the audited bb=1 v3.2 kernel ON-CHIP, expected
            # bit-exact (same per-row op order).  NOT the jnp reference:
            # on-TPU its f32 einsums run as bf16 MXU passes (~7e-2 err),
            # so it can only gate interpret-mode runs.
            ref = np.asarray(
                _stacked_call_v32(q0, k4, v4, jnp.int32(l), valid_len=TA)
            )
            got = np.asarray(
                da.cross_attention_int4_stacked(
                    q0, k4, v4, jnp.int32(l), valid_len=TA
                )
            )
            err = np.abs(got - ref).max()
            print(f"prod stacked (B={b}) layer {l} max abs err vs on-chip "
                  f"v3.2: {err:.3e}", flush=True)
            assert err == 0.0, f"production kernel diverges on layer {l}"
        call = functools.partial(
            lambda qq, kk, vv, ll: da.cross_attention_int4_stacked(
                qq, kk, vv, ll, valid_len=TA
            )
        )
        _time_variant(f"prod/B{b}", call, q0, k4, v4, args.steps)
        return

    rng = np.random.default_rng(0)
    k8 = rng.integers(-7, 8, size=(L, b, H, DH, TPAD)).astype(np.int8)
    v8 = rng.integers(-7, 8, size=(L, b, H, TPAD, DH)).astype(np.int8)
    k4, v4 = da.pack_int4_time(jnp.asarray(k8), jnp.asarray(v8))
    k4, v4 = jax.device_put(k4), jax.device_put(v4)
    q0 = jnp.asarray(rng.normal(size=(b, 1, H, DH)).astype(np.float32))

    # exactness first: every variant must match v3.2 on layer 0 AND a
    # nonzero layer (validates the scalar-prefetch layer index_map)
    check_layers = (0, L - 1)
    refs = {
        l: np.asarray(
            _stacked_call_v32(q0, k4, v4, jnp.int32(l), valid_len=TA)
        )
        for l in check_layers
    }
    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    calls = {}
    for v in variants:
        if v == "v32":
            calls[v] = functools.partial(_stacked_call_v32, valid_len=TA)
            continue
        calls[v] = functools.partial(
            _stacked_call_v34, valid_len=TA, variant=v, bb=bb
        )
        if v == "s":  # stream-only floor computes garbage by design
            continue
        for l in check_layers:
            got = np.asarray(calls[v](q0, k4, v4, jnp.int32(l)))
            err = np.abs(got - refs[l]).max()
            print(f"v3.4{v} (bb={bb}) layer {l} max abs err vs v3.2: "
                  f"{err:.3e}", flush=True)
            assert err < 1e-4, f"variant {v} diverges on layer {l}"

    times = {}
    for v, call in calls.items():
        label = v if v == "v32" else f"v3.4{v}/bb{bb}"
        times[v] = _time_variant(label, call, q0, k4, v4, args.steps)
    base = times.get("v32")
    if base:
        for v, t in times.items():
            if v != "v32":
                print(f"v3.4{v}: {base / t:.3f}x vs v3.2")


if __name__ == "__main__":
    main()
