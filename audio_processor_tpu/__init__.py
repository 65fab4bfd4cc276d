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
