# Deployment image (reference: Dockerfile — python:3.9-slim + ffmpeg +
# gunicorn).  Rebuilt for the TPU stack: a JAX TPU base, the native C++
# audio module compiled at build time, and a WSGI server with a long
# request timeout for job submission bursts.
FROM python:3.12-slim

WORKDIR /app

# ffmpeg: only used as a container-format decoder fallback for m4a/ogg;
# WAV decoding is first-party (audio_processor_tpu/pipeline/ingest.py)
RUN apt-get update \
    && apt-get install -y --no-install-recommends \
        g++ make libavformat-dev libavcodec-dev libavutil-dev \
        libswresample-dev \
    && rm -rf /var/lib/apt/lists/*

COPY requirements.txt ./
# jax[tpu] pulls libtpu on TPU VMs; harmless elsewhere (falls back to CPU)
RUN pip install --no-cache-dir -r requirements.txt

COPY . .

# build the native audio decode/resample library
RUN make -C audio_processor_tpu/native || echo "native build skipped"

# model weight cache volumes (converted .npz checkpoints)
ENV APTPU_MODEL=small \
    APTPU_MODEL_PATH=/models/whisper-small.npz \
    JOB_STORE_URL=sqlite:////data/jobs.db \
    CREDENTIAL_STORE_URL=sqlite:////data/credentials.db \
    PORT=5000

VOLUME ["/models", "/data"]
EXPOSE 5000

# gunicorn with ONE worker process (the TPU runtime and jit cache are
# per-process; the job queue in sqlite is shared regardless) and a bounded
# thread pool — a poll burst queues instead of growing threads.  The long
# timeout covers first-compile latency on a cold jit cache.  serve.py's
# stdlib server remains the no-deps dev fallback (also thread-capped).
CMD ["gunicorn", "--workers", "1", "--threads", "16", \
     "--worker-class", "gthread", "--timeout", "600", \
     "--bind", "0.0.0.0:5000", "serve:application"]
