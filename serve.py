"""Service entry point (reference: main.py:6-39).

Builds the service stack (models on TPU, job engine on a shared sqlite
store so multiple processes share one queue) and runs the WSGI app.

    python serve.py                 # dev server on :5000
    APTPU_MODEL=small python serve.py --port 8080
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s: %(message)s"
)


def _enable_compile_cache():
    """Persistent XLA compilation cache: restarts reuse compiled programs
    instead of paying multi-minute recompiles per process."""
    try:
        import jax

        cache_dir = os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # noqa: BLE001 — cache is best-effort
        logging.getLogger(__name__).info("compilation cache unavailable: %s", exc)


def _select_platform():
    """Honor JAX_PLATFORMS=cpu (same escape hatch as bench.py).

    On axon-tunnelled boxes a sitecustomize force-selects the TPU backend
    via jax.config, which silently overrides the env var — so a CPU-only
    deployment (or a box whose TPU relay is down) needs the config set
    again in-process, before the first jax call initialises the backend.
    """
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001 — jax absent is its own error later
            pass


def build_app():
    _select_platform()
    _enable_compile_cache()
    from audio_processor_tpu.runtime.services import build_services
    from audio_processor_tpu.server.app import create_app

    services = build_services(
        model=os.environ.get("APTPU_MODEL", "tiny"),
        store_url=os.environ.get("JOB_STORE_URL", "sqlite://jobs.db"),
        max_workers=int(os.environ.get("MAX_WORKERS", "3")),
        model_path=os.environ.get("APTPU_MODEL_PATH"),
    )
    return create_app(services)


# WSGI callable for production containers (`<server> serve:application`):
# builds the service stack lazily on the first request-serving worker.
# LOCKED double-check: gunicorn gthread (the Dockerfile entrypoint) fires
# many first requests concurrently, and build_app() takes minutes (TPU
# init + jit compile) — without the lock each of them would build its own
# Transcriber (HBM exhaustion) and JobEngine (duplicate worker pools).
_wsgi_app = None
_wsgi_lock = threading.Lock()


def application(environ, start_response):
    global _wsgi_app
    if _wsgi_app is None:
        with _wsgi_lock:
            if _wsgi_app is None:
                _wsgi_app = build_app()
    return _wsgi_app(environ, start_response)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=int(os.environ.get("PORT", 5000)))
    args = ap.parse_args()
    app = build_app()
    app.run(host=args.host, port=args.port)


if __name__ == "__main__":
    main()
