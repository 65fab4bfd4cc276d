"""Driver benchmark: all five BASELINE.json configs, one JSON line each.

Configs 1/2/4/5 run first as bounded subprocesses (benchmarks/
run_configs.py); the HEADLINE — config #3, Whisper-small batched KV-cache
decode over 30 s chunks of 1 hour of audio — runs in-process and prints
LAST, so a driver that parses only the final line still records the
headline RTFx.  Pass --headline-only to skip the subsidiary configs.

Headline workload: weights are random (no checkpoints in the image) but
the compute is identical to a converted checkpoint; to keep the decode
workload honest EOT is suppressed so every chunk decodes the full token
budget (real meetings average ~60-100 tokens/30 s — we force 96).

Each line is {"metric", "value", "unit", "vs_baseline"?}.  vs_baseline for
the headline is measured against the BASELINE.md target of 30x real-time
(the reference itself implies ~5.5x: 660 s for a ~1 h meeting, app.js:25-34).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="small")
    ap.add_argument("--audio-minutes", type=float, default=60.0)
    ap.add_argument("--batch", type=int, default=128, help="chunks per device batch (128 = measured v5e sweet spot for small; 192 exceeds HBM)")
    ap.add_argument("--tokens-per-chunk", type=int, default=96)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no-int8-kv", action="store_true",
                    help="disable the quantized cross-attention cache")
    ap.add_argument("--kv-bits", type=int, default=4, choices=(4, 8),
                    help="cross-KV precision: 4 = nibble-packed Pallas "
                    "kernel (production default, ~30%% faster step), 8 = "
                    "plain int8")
    ap.add_argument("--self-kv-int8", action="store_true",
                    help="per-token int8 self-attention cache")
    ap.add_argument("--int8-weights", action="store_true",
                    help="int8 decoder weights (models/whisper/quantize)")
    ap.add_argument("--f32-weights", action="store_true",
                    help="keep params in f32 storage (default stores them in "
                    "the compute dtype — the compute casts per use anyway, "
                    "so f32 storage only doubles the weight stream; "
                    "+2.4%% RTFx measured, mirrors Transcriber weights_dtype"
                    "='auto')")
    ap.add_argument("--beam", type=int, default=0,
                    help="beam size (0 = greedy). Beams multiply the cache "
                    "rows, so pair with a smaller --batch (e.g. 24 x beam 5)")
    ap.add_argument("--profile", metavar="DIR",
                    help="write a jax.profiler trace of the timed region")
    ap.add_argument("--fused-encoder", action="store_true",
                    help="use the Pallas fused encoder self-attention "
                    "(measured SLOWER than the XLA einsum path on v5e — "
                    "kept as an A/B lever; see docs/performance.md)")
    ap.add_argument("--headline-only", action="store_true",
                    help="skip BASELINE configs 1/2/4/5, run only the "
                    "headline config-3 measurement")
    ap.add_argument("--config-timeout", type=float, default=1200.0,
                    help="per-subsidiary-config wall deadline (seconds)")
    args = ap.parse_args()

    import os as _os

    import jax

    # honour an explicit platform request (the axon sitecustomize otherwise
    # force-selects the TPU backend via jax.config) — lets CI smoke-test
    # this script on CPU
    if _os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    cache_dir = _os.environ.get("JAX_CACHE_DIR", _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))
    try:
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    # Liveness watchdog: a dead axon relay makes every device op hang
    # FOREVER (no error) — probe under a deadline (shared implementation:
    # runtime/device_check.py) and fail fast with a diagnostic JSON line
    # rather than hanging the driver.  A cold TPU worker can take 1-3 min
    # to initialise, so the default deadline is generous.
    from audio_processor_tpu.runtime.device_check import probe_device

    probe_s = float(_os.environ.get("APTPU_BENCH_PROBE_TIMEOUT", "600"))
    try:
        probe_device(timeout_s=probe_s)
    except Exception as e:  # noqa: BLE001 — any probe failure is terminal
        print(json.dumps({
            "metric": "transcribe_rtfx",
            "value": 0.0,
            "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": f"device probe failed: {e}",
        }), flush=True)
        _os._exit(1)  # a hung probe thread blocks a normal exit

    if not args.headline_only:
        # BASELINE configs 1/2/4/5 first, each in a fresh bounded process
        # (isolates compile caches + HBM residue and caps the damage of a
        # hang); the headline prints LAST for last-line drivers.
        import subprocess

        script = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)),
            "benchmarks", "run_configs.py",
        )
        for c in ("1", "2", "4", "5"):
            try:
                r = subprocess.run(
                    [sys.executable, script, c],
                    capture_output=True, text=True,
                    timeout=args.config_timeout,
                )
                emitted = False
                for ln in r.stdout.splitlines():
                    if ln.startswith("{"):
                        print(ln, flush=True)
                        emitted = True
                if r.returncode != 0 or not emitted:
                    tail = (r.stderr or r.stdout or "")[-300:]
                    print(json.dumps({
                        "metric": f"config{c}", "value": 0.0,
                        "unit": "error", "error": tail,
                    }), flush=True)
            except subprocess.TimeoutExpired:
                print(json.dumps({
                    "metric": f"config{c}", "value": 0.0, "unit": "error",
                    "error": f"timeout after {args.config_timeout:.0f}s",
                }), flush=True)

    from audio_processor_tpu.models.whisper import decode as decode_lib
    from audio_processor_tpu.models.whisper import model as model_lib
    from audio_processor_tpu.models.whisper.config import get_config
    from audio_processor_tpu.ops import frontend

    cfg = get_config(args.model)
    st = decode_lib.SpecialTokens.for_config(cfg)
    params = model_lib.init_params(cfg, jax.random.PRNGKey(0))
    # compute-dtype storage cast BEFORE int8 quantization so the int8
    # dequant scales (deliberately f32, models/whisper/quantize.py) are
    # never downcast
    if not args.f32_weights and jnp.dtype(args.dtype) != jnp.float32:
        target = jnp.dtype(args.dtype)
        params = jax.tree.map(
            lambda x: x.astype(target)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params,
        )
    if args.int8_weights:
        from audio_processor_tpu.models.whisper import quantize

        params = quantize.quantize_decoder(params)

    total_chunks = int(args.audio_minutes * 2)  # 30 s chunks
    bs = args.batch
    n_batches = -(-total_chunks // bs)

    # synthetic "meeting": tones + noise, deterministic
    rng = np.random.default_rng(0)
    t = np.arange(frontend.N_SAMPLES) / frontend.SAMPLE_RATE
    base = (
        0.3 * np.sin(2 * np.pi * 150 * t) * (np.sin(2 * np.pi * 1.1 * t) > -0.3)
    ).astype(np.float32)
    chunk_batch = np.stack(
        [base + rng.normal(0, 0.01, frontend.N_SAMPLES).astype(np.float32) for _ in range(bs)]
    )

    # suppress EOT so decode runs the full budget (conservative workload)
    suppress = np.zeros((cfg.n_vocab,), bool)
    suppress[st.eot] = True
    suppress_mask = jnp.asarray(suppress)
    sot_seq = tuple(st.sot_sequence())

    fused_attn = args.fused_encoder and jax.default_backend() == "tpu"

    @jax.jit
    def encode_batch(params, audio_i16):
        # audio ships as int16 (native bit depth): halves host->HBM bytes
        audio = audio_i16.astype(jnp.float32) / 32768.0
        mel = frontend.log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        return model_lib.encode(
            params, cfg, mel, compute_dtype=jnp.dtype(args.dtype),
            fused_attn=fused_attn,
        )

    def run_batch(audio):
        states = encode_batch(params, audio)
        if args.beam > 0:
            res = decode_lib.beam_decode(
                params,
                cfg,
                states,
                sot_sequence=sot_seq,
                beam_size=args.beam,
                max_new_tokens=args.tokens_per_chunk,
                use_timestamps=True,
                suppress_mask=suppress_mask,
                dtype_name=args.dtype,
                quantize_cross_kv=not args.no_int8_kv,
                kv_bits=args.kv_bits,
            )
        else:
            res = decode_lib.greedy_decode(
                params,
                cfg,
                states,
                sot_sequence=sot_seq,
                max_new_tokens=args.tokens_per_chunk,
                use_timestamps=True,
                suppress_mask=suppress_mask,
                dtype_name=args.dtype,
                quantize_cross_kv=not args.no_int8_kv,
                kv_bits=args.kv_bits,
                quantize_self_kv=args.self_kv_int8,
            )
        return res.tokens

    audio_dev = jnp.asarray(
        np.clip(chunk_batch * 32768.0, -32768, 32767).astype(np.int16)
    )

    # warmup / compile.  NOTE: block_until_ready does not actually block on
    # the tunnelled axon platform — sync via host transfer instead.
    np.asarray(run_batch(audio_dev))

    import contextlib

    trace_cm = (
        jax.profiler.trace(args.profile) if args.profile else contextlib.nullcontext()
    )
    with trace_cm:
        t0 = time.perf_counter()
        for _ in range(n_batches):
            toks = np.asarray(run_batch(audio_dev))
        elapsed = time.perf_counter() - t0

    audio_seconds = total_chunks * 30.0
    rtfx = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": f"RTFx whisper-{args.model} e2e (log-mel+encode+{args.tokens_per_chunk}-token KV decode, batch {bs}, {args.dtype}, cross-KV {'off' if args.no_int8_kv else f'int{args.kv_bits}'}{', fused-enc' if fused_attn else ''}{f', beam {args.beam}' if args.beam else ''}{', self-KV int8' if args.self_kv_int8 else ''}{', int8 weights' if args.int8_weights else ''}{', f32 weights' if args.f32_weights else ''})",
                "value": round(rtfx, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtfx / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
