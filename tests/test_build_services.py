"""build_services + create_app integration (hermetic, no external config)."""
import os

import pytest

from tests.test_runtime_server import call_app


def test_build_services_degrades_gracefully(tmp_path, monkeypatch):
    for var in (
        "GEMINI_API_KEY", "NOTION_TOKEN", "NOTION_DATABASE_ID",
        "GOOGLE_SA_JSON_PATH", "REDIS_HOST",
    ):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("CREDENTIAL_STORE_URL", "memory://")

    from audio_processor_tpu.runtime.services import build_services

    services = build_services(
        model="test",
        store_url=f"sqlite://{tmp_path}/jobs.db",
        max_workers=1,
        diarization=False,
    )
    try:
        assert services.processor.gemini is None
        assert services.processor.notion is None
        assert services.processor.drive is None
        assert services.credential_store is not None

        from audio_processor_tpu.server.app import create_app

        app = create_app(services, secret_key="t")
        status, data, _ = call_app(app, "GET", "/api/health")
        assert status == 200 and data["status"] == "healthy"
        status, data, _ = call_app(app, "GET", "/api/metrics")
        assert data["metrics"]["jobs_total"] == 0
        # clear_credentials exists and is callable (reference defect fixed)
        services.set_oauth_credentials.__call__  # attribute exists
        services.clear_credentials()
    finally:
        services.engine.shutdown(wait=False)


def test_build_services_fails_fast_on_missing_checkpoint(tmp_path):
    """A configured-but-missing model path must raise, not silently serve
    random weights (advisor finding: unmounted model volume -> garbage
    transcripts reported as completed)."""
    from audio_processor_tpu.runtime.services import build_services

    with pytest.raises(FileNotFoundError, match="refusing"):
        build_services(
            model="test",
            model_path=str(tmp_path / "nope" / "whisper.npz"),
            diarization=False,
            with_drive=False,
            with_llm=False,
        )


def test_build_services_fails_fast_on_missing_diarizer(tmp_path, monkeypatch):
    from audio_processor_tpu.runtime.services import build_services

    monkeypatch.setenv("APTPU_DIARIZER_PATH", str(tmp_path / "missing.npz"))
    with pytest.raises(FileNotFoundError, match="APTPU_DIARIZER_PATH"):
        build_services(
            model="test", diarization=True, with_drive=False, with_llm=False
        )


def test_build_services_fails_fast_on_missing_embedding(tmp_path, monkeypatch):
    from audio_processor_tpu.runtime.services import build_services

    monkeypatch.delenv("APTPU_DIARIZER_PATH", raising=False)
    monkeypatch.setenv("APTPU_EMBEDDING_PATH", str(tmp_path / "missing.npz"))
    with pytest.raises(FileNotFoundError, match="APTPU_EMBEDDING_PATH"):
        build_services(
            model="test", diarization=True, with_drive=False, with_llm=False
        )


def test_build_services_serves_trained_embedding(tmp_path, monkeypatch):
    """APTPU_EMBEDDING_PATH loads a cli-train-embedding checkpoint into the
    served Diarizer (composes with random segmentation)."""
    import jax

    from audio_processor_tpu.models.diarization import embedding as emb
    from audio_processor_tpu.training import embedding_trainer as et

    cfg = emb.EmbeddingConfig(
        n_mels=24, base_channels=8, blocks=(1, 1, 1, 1), embed_dim=32,
        crop_s=1.0,
    )
    path = str(tmp_path / "emb.npz")
    et.save_params(path, emb.init_params(cfg, jax.random.PRNGKey(0)), cfg)
    monkeypatch.delenv("APTPU_DIARIZER_PATH", raising=False)
    monkeypatch.setenv("APTPU_EMBEDDING_PATH", path)

    from audio_processor_tpu.runtime.services import build_services

    services = build_services(
        model="test", diarization=True, with_drive=False, with_llm=False,
        max_workers=1,
    )
    try:
        d = services.processor.diarizer
        assert d.emb_cfg == cfg  # the trained config was actually wired in
    finally:
        services.engine.shutdown(wait=False)


def test_env_speaker_constraints_reach_diarizer(monkeypatch):
    """APTPU_NUM_SPEAKERS pins the served diarizer's speaker count
    (pyannote's num_speakers, fixed by deployment env here)."""
    from audio_processor_tpu.runtime.services import build_services

    monkeypatch.delenv("APTPU_DIARIZER_PATH", raising=False)
    monkeypatch.delenv("APTPU_EMBEDDING_PATH", raising=False)
    monkeypatch.setenv("APTPU_NUM_SPEAKERS", "4")
    services = build_services(
        model="test", diarization=True, with_drive=False, with_llm=False,
        max_workers=1,
    )
    try:
        d = services.processor.diarizer
        assert d.min_speakers == 4 and d.max_speakers == 4
    finally:
        services.engine.shutdown(wait=False)

    monkeypatch.delenv("APTPU_NUM_SPEAKERS", raising=False)
    monkeypatch.setenv("APTPU_MIN_SPEAKERS", "2")
    monkeypatch.setenv("APTPU_MAX_SPEAKERS", "6")
    services = build_services(
        model="test", diarization=True, with_drive=False, with_llm=False,
        max_workers=1,
    )
    try:
        d = services.processor.diarizer
        assert d.min_speakers == 2 and d.max_speakers == 6
    finally:
        services.engine.shutdown(wait=False)


def test_env_decode_options_reach_transcriber(monkeypatch):
    """Service-wide decode knobs (APTPU_BEAM_SIZE etc.) configure the
    served Transcriber — whisper.transcribe's per-call options, pinned by
    environment in this deployment model."""
    from audio_processor_tpu.runtime.services import build_services

    monkeypatch.setenv("APTPU_BEAM_SIZE", "3")
    monkeypatch.setenv("APTPU_PATIENCE", "2.0")
    monkeypatch.setenv("APTPU_BEST_OF", "2")
    monkeypatch.setenv("APTPU_CONDITION", "1")
    # 'zh' = index 1: in range for the toy test config's 2-language
    # vocabulary (an out-of-range code must fail loudly instead — below)
    monkeypatch.setenv("APTPU_LANGUAGE", "zh")
    monkeypatch.setenv("APTPU_TASK", "translate")
    svc = build_services(
        model="test", with_drive=False, with_llm=False, diarization=False
    )
    try:
        t = svc.processor.transcriber
        assert t.beam_size == 3 and t.patience == 2.0 and t.best_of == 2
        assert t.condition_on_previous_text is True
        assert t.task == "translate"
        from audio_processor_tpu.models.whisper.tokenizer import language_index

        assert t.language == language_index("zh")
    finally:
        svc.engine.shutdown(wait=False)

    # a configured language the served model cannot encode fails at
    # startup, not as silent garbage decodes (Transcriber range check)
    monkeypatch.setenv("APTPU_LANGUAGE", "de")  # index 2 >= toy's 2 langs
    import pytest as _pytest

    with _pytest.raises(ValueError, match="out of range"):
        build_services(
            model="test", with_drive=False, with_llm=False, diarization=False
        )


def test_model_path_serves_embedded_tokenizer(monkeypatch, tmp_path):
    """The flagship path: APTPU_MODEL_PATH -> build_services -> the served
    Transcriber uses the BPE vocab embedded at convert time, zero extra
    flags (VERDICT r2 item 1 'done' criterion; the reference gets this
    from whisper.load_model, app/services/audio_processor.py:863)."""
    import base64
    import dataclasses

    import jax

    from audio_processor_tpu.models.whisper import convert, model as wmodel
    from audio_processor_tpu.models.whisper.config import get_config
    from audio_processor_tpu.models.whisper.tokenizer import BPETokenizer
    from audio_processor_tpu.runtime.services import build_services

    content = b"\n".join(
        base64.b64encode(bytes([b])) + b" " + str(b).encode()
        for b in range(256)
    )
    tok = BPETokenizer.from_tiktoken_bytes(content)
    cfg = dataclasses.replace(
        get_config("tiny"), n_audio_ctx=32, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_text_ctx=48, n_text_state=64, n_text_head=2,
        n_text_layer=1,
    )
    path = str(tmp_path / "model.npz")
    convert.save_params(
        path, wmodel.init_params(cfg, jax.random.PRNGKey(0)), cfg,
        tokenizer=tok,
    )
    monkeypatch.delenv("APTPU_TOKENIZER_PATH", raising=False)
    svc = build_services(
        model_path=path, with_drive=False, with_llm=False, diarization=False
    )
    try:
        served = svc.processor.transcriber.tokenizer
        assert isinstance(served, BPETokenizer)
        assert served.decode(served.encode("hello world")) == "hello world"
    finally:
        svc.engine.shutdown(wait=False)


def test_warmup_env_precompiles_decode(monkeypatch):
    """APTPU_WARMUP=<n_chunks> compiles the decode programs at startup
    instead of on the first request's thread (gunicorn --timeout would
    kill a cold-TPU compile mid-request)."""
    from audio_processor_tpu.runtime.services import build_services

    calls = {}
    from audio_processor_tpu.pipeline.transcribe import Transcriber

    real = Transcriber.warmup

    def spy(self, n_chunks=None):
        calls["n"] = n_chunks
        return real(self, n_chunks)

    monkeypatch.setattr(Transcriber, "warmup", spy)
    monkeypatch.setenv("APTPU_WARMUP", "2")  # 2 chunks ("1" = full slab)
    services = build_services(
        model="test", diarization=False, with_drive=False, with_llm=False,
        max_workers=1,
    )
    try:
        assert calls == {"n": 2}
    finally:
        services.engine.shutdown(wait=False)


def test_warmup_compiles_and_decodes(monkeypatch):
    from audio_processor_tpu.pipeline.transcribe import Transcriber

    t = Transcriber.random_init(
        "test", compute_dtype="float32", max_new_tokens=4, max_chunk_batch=2,
    )
    took = t.warmup(2)
    assert took > 0
    # the warmed program serves a real transcribe without recompiling:
    # same bucket, much faster second pass
    import numpy as np
    import time as _time

    sr = 16_000
    audio = (0.1 * np.sin(2 * np.pi * 440.0 * np.arange(40 * sr) / sr)).astype(
        np.float32
    )
    t0 = _time.monotonic()
    t.transcribe(audio, remove_silence=False)
    assert _time.monotonic() - t0 < took + 5


def test_env_fallback_model_wires_processor(monkeypatch):
    """APTPU_FALLBACK_MODEL configures the smaller-model retry target (the
    reference's medium->small fallback, audio_processor.py:1056-1098)."""
    from audio_processor_tpu.runtime.services import build_services

    monkeypatch.setenv("APTPU_FALLBACK_MODEL", "test")
    svc = build_services(
        model="test", with_drive=False, with_llm=False, diarization=False
    )
    try:
        assert svc.processor.fallback_transcriber is not None
        assert svc.processor.fallback_transcriber is not svc.processor.transcriber
    finally:
        svc.engine.shutdown(wait=False)

    # configured-but-missing fallback path refuses to start
    monkeypatch.delenv("APTPU_FALLBACK_MODEL")
    monkeypatch.setenv("APTPU_FALLBACK_MODEL_PATH", "/missing/fb.npz")
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        build_services(
            model="test", with_drive=False, with_llm=False, diarization=False
        )
