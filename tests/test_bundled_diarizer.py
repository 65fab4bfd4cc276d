"""The bundled synthetic-pretrained diarizer (the serving default when no
APTPU_DIARIZER_PATH is configured).

The reference always serves trained pyannote weights
(/root/reference/app/services/audio_processor.py:885); our equivalent of
"works out of the box" is the in-repo checkpoint pair trained by
tools/make_bundled_diarizer.py.  These tests gate that the committed
assets actually separate UNSEEN speakers, that their provenance is loud
in job results, and that build_services prefers them over random weights.
"""
import os

import numpy as np
import pytest

from audio_processor_tpu.pipeline.diarize import Diarizer
from audio_processor_tpu.training import diarization_trainer as dt
from audio_processor_tpu.utils.metrics import diarization_error_rate

ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "audio_processor_tpu", "assets",
)
HAVE_ASSETS = os.path.exists(os.path.join(ASSETS, Diarizer.BUNDLED_SEG)) and (
    os.path.exists(os.path.join(ASSETS, Diarizer.BUNDLED_EMB))
)

pytestmark = pytest.mark.skipif(
    not HAVE_ASSETS,
    reason="bundled diarizer assets not built (tools/make_bundled_diarizer.py)",
)


def make_meeting(rng, f0s, duration_s=20.0, sr=16_000):
    """Held-out meeting with speaker pitches the bundled nets never saw
    as fixed classes (training resampled pitches every batch)."""
    audio = rng.normal(0, 0.003, int(duration_s * sr)).astype(np.float32)
    ref = []
    t, i = 0.3, 0
    while t < duration_s - 2.0:
        spk = i % len(f0s)
        dur = float(rng.uniform(1.2, 2.0))
        a, b = int(t * sr), int(min(t + dur, duration_s) * sr)
        audio[a:b] += dt.synth_voice(rng, f0s[spk], b - a, sr)
        ref.append({"start": round(t, 3), "end": round(t + dur, 3),
                    "speaker": f"REF_{spk}"})
        t += dur + float(rng.uniform(0.3, 0.6))
        i += 1
    return audio, ref


@pytest.fixture(scope="module")
def bundled():
    d = Diarizer.bundled(window_step_s=2.0)
    assert d is not None
    return d


def test_bundled_metadata(bundled):
    assert bundled.provenance == "bundled-synthetic"
    assert bundled.seg_trained and bundled.emb_trained
    assert bundled.untrained_parts == []
    # the calibrated onset rode the checkpoint (not the 0.5 default
    # unless calibration landed there exactly)
    onset = dt.load_onset(os.path.join(ASSETS, Diarizer.BUNDLED_SEG))
    assert onset is not None
    assert bundled.onset == pytest.approx(onset)
    # the AHC cut calibrated against this embedding space rode the
    # embedding checkpoint
    from audio_processor_tpu.training import embedding_trainer as et

    thr = et.load_cluster_threshold(os.path.join(ASSETS, Diarizer.BUNDLED_EMB))
    assert thr is not None
    assert bundled.cluster_threshold == pytest.approx(thr)


def test_bundled_separates_unseen_speakers(bundled):
    rng = np.random.default_rng(13579)  # disjoint from trainer/validator rngs
    ders = []
    for _ in range(2):
        f0s = (float(rng.uniform(95, 120)), float(rng.uniform(190, 240)),
               float(rng.uniform(320, 378)))
        audio, ref = make_meeting(rng, f0s)
        turns = bundled.diarize(audio)
        assert turns, "bundled diarizer produced no turns"
        ders.append(diarization_error_rate(ref, turns, collar_s=0.25))
    # generous vs the build gate (median 0.15 over its own validator):
    # this is a different rng and meeting generator
    assert min(ders) <= 0.30, f"held-out DERs {ders}"


def test_bundled_many_speakers_and_counts(bundled):
    """Round-4 verdict #5: gates beyond 2-4 speakers.  A 5-speaker 60 s
    held-out meeting must stay under a loose wrapper of the build tool's
    many-speakers gate (median 0.35 over five 5-8-speaker trials there;
    single meeting + different rng here, so 0.45), and the NIST
    decomposition + speaker count must be sane: predicted speakers
    within +-1 of truth."""
    from audio_processor_tpu.utils.metrics import diarization_error_rate_detailed

    rng = np.random.default_rng(24680)  # disjoint from trainer/validator rngs
    f0s = tuple(
        float(f) for f in np.exp(np.linspace(np.log(100), np.log(360), 5))
    )
    audio, ref = make_meeting(rng, f0s, duration_s=60.0)
    turns = bundled.diarize(audio)
    assert turns, "bundled diarizer produced no turns"
    det = diarization_error_rate_detailed(ref, turns, collar_s=0.25)
    assert det["der"] <= 0.45, det
    assert abs(det["hyp_speakers"] - det["ref_speakers"]) <= 1, det
    # decomposition invariant: der == miss + fa + confusion
    assert det["der"] == pytest.approx(
        det["miss"] + det["false_alarm"] + det["confusion"], abs=1e-9
    )


def test_build_services_serves_bundled_by_default(tmp_path, monkeypatch):
    """No APTPU_DIARIZER_PATH -> the bundled checkpoints, not random."""
    from audio_processor_tpu.runtime.services import build_services

    for var in ("APTPU_DIARIZER_PATH", "APTPU_EMBEDDING_PATH",
                "APTPU_MODEL_PATH", "APTPU_TOKENIZER_PATH"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("APTPU_JOB_STORE", "memory")
    services = build_services(with_drive=False, with_llm=False)
    d = services.processor.diarizer
    assert d.provenance == "bundled-synthetic"
    assert d.untrained_parts == []


def test_meeting_result_carries_bundled_provenance(bundled, tmp_path):
    """A real job run surfaces the synthetic provenance in the result
    (round-2 review: serving non-production diarizer weights must be loud
    in the job record, not just a log line)."""
    import time

    from audio_processor_tpu.pipeline.transcribe import Transcriber
    from audio_processor_tpu.pipeline.meeting import (
        MeetingProcessor, build_failure_result,
    )
    from audio_processor_tpu.runtime.job_engine import JobEngine
    from audio_processor_tpu.utils import wavio

    rng = np.random.default_rng(0)
    sr = 16_000
    audio = rng.normal(0, 0.01, 6 * sr).astype(np.float32)
    wav = tmp_path / "m.wav"
    wavio.write_wav(str(wav), audio, sr)

    proc = MeetingProcessor(
        transcriber=Transcriber.random_init(
            "test", compute_dtype="float32", max_new_tokens=4),
        diarizer=bundled, drive=None, gemini=None, notion=None,
    )
    engine = JobEngine(max_workers=1)
    try:
        engine.create_job("b1", file_id=str(wav))
        engine.submit("b1", lambda ctx: proc.process(ctx, str(wav)),
                      failure_result=build_failure_result)
        for _ in range(600):
            st = engine.get_job_status("b1")
            if st["status"] in ("completed", "failed"):
                break
            time.sleep(0.1)
        assert st["status"] == "completed", st.get("error")
        assert st["result"]["diarizer"] == "bundled-synthetic"
    finally:
        engine.shutdown(wait=False)
