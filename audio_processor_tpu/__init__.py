"""audio_processor_tpu — a TPU-native (JAX/XLA/Pallas/pjit) meeting-transcription framework.

A ground-up rebuild of the capabilities of the ``dong881/audio-processor``
reference service (see SURVEY.md): audio ingest -> fused log-mel frontend ->
first-party JAX Whisper encoder-decoder with batched KV-cache decode ->
pyannote-style diarization (segmentation + embedding + clustering) ->
speaker-attributed transcript -> LLM summarization -> Notion page, behind an
async job-queue HTTP API that is byte-compatible with the reference
(reference: app/services/audio_processor.py, app/routes/api_routes.py).

Subpackages
-----------
ops          Pure compute ops: STFT/mel frontend, resampling, silence trim,
             plus Pallas TPU kernels for the hot paths.
models       Whisper encoder-decoder and the diarization model family.
parallel     Mesh construction, sharding rules, collective helpers.
pipeline     End-to-end transcribe/diarize/fuse orchestration.
runtime      Job engine: persistent job store, worker pool, cancellation.
server       Stdlib-WSGI HTTP layer mirroring the reference /api surface.
integrations Google Drive, Gemini, Notion, Redis-or-sqlite credential store.
training     Fine-tuning: loss, optimizer, sharded train step.
utils        WAV I/O, timestamps, constants, logging.
"""

__version__ = "0.1.0"

_LAZY = {
    "Transcriber": ("audio_processor_tpu.pipeline.transcribe", "Transcriber"),
    "StreamingTranscriber": ("audio_processor_tpu.pipeline.streaming", "StreamingTranscriber"),
    "Diarizer": ("audio_processor_tpu.pipeline.diarize", "Diarizer"),
    "MeetingProcessor": ("audio_processor_tpu.pipeline.meeting", "MeetingProcessor"),
    "fuse_segments": ("audio_processor_tpu.pipeline.fuse", "fuse_segments"),
    "JobEngine": ("audio_processor_tpu.runtime.job_engine", "JobEngine"),
    "build_services": ("audio_processor_tpu.runtime.services", "build_services"),
    "create_app": ("audio_processor_tpu.server.app", "create_app"),
    "word_error_rate": ("audio_processor_tpu.utils.metrics", "word_error_rate"),
    "diarization_error_rate": ("audio_processor_tpu.utils.metrics", "diarization_error_rate"),
}


def __getattr__(name):  # lazy top-level API: import jax only when needed
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
