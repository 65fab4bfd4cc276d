"""BASELINE.json benchmark configs 1-5, each printing one JSON line.

    python benchmarks/run_configs.py 1     # whisper-tiny greedy, 60s WAV
    python benchmarks/run_configs.py 2     # fused preprocessing, 10 min
    python benchmarks/run_configs.py 3     # whisper-small batched decode, 1 h
    python benchmarks/run_configs.py 4     # diarization, 4-speaker meeting
    python benchmarks/run_configs.py 5     # 8 concurrent jobs, p50 latency

The repo-root bench.py runs config 3 (the headline RTFx metric).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _compile_cache():
    try:
        import jax

        d = os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_compile_cache()


def _emit(metric, value, unit, baseline=None):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        **({"vs_baseline": round(value / baseline, 3)} if baseline else {}),
    }))


def _speech(seconds: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    f0 = 140 + 40 * np.sin(2 * np.pi * 0.3 * t)
    sig = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in (1, 2, 3))
    gate = (np.sin(2 * np.pi * 0.9 * t + rng.uniform(0, 6)) > -0.4)
    return (sig * gate * 0.3 + rng.normal(0, 0.01, len(t))).astype(np.float32)


def config_1():
    """Whisper-tiny greedy transcription of one 60 s WAV."""
    from audio_processor_tpu.pipeline.transcribe import Transcriber

    t = Transcriber.random_init("tiny", enable_fallback=False)
    audio = _speech(60)
    t.transcribe(audio, remove_silence=False)  # warm/compile
    t0 = time.perf_counter()
    out = t.transcribe(audio, remove_silence=False)
    rtfx = 60.0 / (time.perf_counter() - t0)
    _emit("config1 whisper-tiny greedy 60s WAV", rtfx, "x_realtime", 1.0)


def config_2():
    """Fused preprocessing (resample + silence-trim + log-mel) on 10 min."""
    import jax.numpy as jnp

    from audio_processor_tpu.ops import frontend
    from audio_processor_tpu.ops.pallas.mel_kernel import log_mel_pallas

    # synthesise at 44.1 kHz so the resample stage is actually exercised;
    # resampling uses the production ingest path (native C++ polyphase)
    rng = np.random.default_rng(0)
    sr44 = 44100
    tt = np.arange(600 * sr44) / sr44
    audio44 = (np.sin(2 * np.pi * 160 * tt) * (np.sin(2 * np.pi * 0.9 * tt) > -0.4)
               * 0.3 + rng.normal(0, 0.01, len(tt))).astype(np.float32)

    def _resample(x):
        try:
            from audio_processor_tpu.native import audio_io

            if audio_io.available():
                return audio_io.resample(x, sr44, 16000)
        except Exception:
            pass
        from scipy.signal import resample_poly

        return resample_poly(x.astype(np.float64), 160, 441).astype(np.float32)

    def preprocess():
        x = _resample(audio44)
        trimmed, _ = frontend.trim_silence_host(x)
        n = len(trimmed)
        n_chunks = max(1, -(-n // frontend.N_SAMPLES))
        b = 1 << max(0, n_chunks - 1).bit_length()  # pow2 bucket (stable jit)
        chunks = np.zeros((b, frontend.N_SAMPLES), np.float32)
        for i in range(n_chunks):
            piece = trimmed[i * frontend.N_SAMPLES : (i + 1) * frontend.N_SAMPLES]
            chunks[i, : len(piece)] = piece
        return np.asarray(log_mel_pallas(jnp.asarray(chunks)))

    preprocess()  # warm/compile
    # median of 3: the first post-warm trial on this 1-vCPU VM routinely
    # runs 2-3x slower than steady state (page faults / allocator warm-up)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        preprocess()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    _emit("config2 preprocessing 10min (resample+trim+fused log-mel)", 600.0 / dt, "x_realtime")


def config_3():
    # --headline-only: bench.py otherwise re-runs configs 1/2/4/5 itself
    os.system(
        f"{sys.executable} "
        f"{os.path.join(os.path.dirname(__file__), '..', 'bench.py')} "
        "--headline-only"
    )


def config_4():
    """Diarization of a 10-min 4-speaker meeting."""
    from audio_processor_tpu.pipeline.diarize import Diarizer

    d = Diarizer.random_init(window_step_s=5.0)
    audio = _speech(600)
    d.diarize(audio)  # warm/compile at the measured batch shape
    # median of 3 (first post-warm trial is 2-3x slower on this VM —
    # measured 162x then 418-525x steady-state in one process)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        d.diarize(audio)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    _emit("config4 diarization 10min meeting", 600.0 / dt, "x_realtime")


def config_5():
    """Full async pipeline: 8 concurrent jobs, p50 job latency."""
    import tempfile

    from audio_processor_tpu.pipeline.meeting import MeetingProcessor, build_failure_result
    from audio_processor_tpu.pipeline.transcribe import Transcriber
    from audio_processor_tpu.runtime.job_engine import JobEngine
    from audio_processor_tpu.utils import wavio

    t = Transcriber.random_init("tiny", enable_fallback=False)
    proc = MeetingProcessor(transcriber=t, diarizer=None)
    engine = JobEngine(max_workers=3)

    with tempfile.TemporaryDirectory() as tmp:
        paths = []
        for i in range(8):
            p = os.path.join(tmp, f"m{i}.wav")
            wavio.write_wav(p, _speech(120, seed=i), 16000)
            paths.append(p)
        # warm compile
        t.transcribe(_speech(120), remove_silence=True)

        t0 = time.perf_counter()
        done_at = {}
        for i, p in enumerate(paths):
            engine.create_job(str(i), file_id=p)
            engine.submit(str(i), lambda ctx, p=p: proc.process(ctx, p),
                          failure_result=build_failure_result)
        while len(done_at) < 8:
            for i in range(8):
                k = str(i)
                if k not in done_at:
                    st = engine.get_job_status(k)
                    if st["status"] in ("completed", "failed"):
                        done_at[k] = time.perf_counter() - t0
            time.sleep(0.05)
        engine.shutdown(wait=False)
    lat = sorted(done_at.values())
    _emit("config5 p50 job latency, 8 concurrent 2-min jobs", lat[4], "seconds")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    configs = {"1": config_1, "2": config_2, "3": config_3, "4": config_4, "5": config_5}
    if which == "all":
        for fn in configs.values():
            fn()
    else:
        configs[which]()
