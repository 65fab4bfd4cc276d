"""OpenAI-compatible /v1/audio endpoints (multipart upload -> transcript).

The reference wraps the same engine the OpenAI transcription API does
(whisper.transcribe via app/services/audio_processor.py:1076) but never
exposes the standard API; this surface makes the framework a drop-in for
OpenAI/whisper-server clients.  Hermetic: tiny random-weight model, WAV
bytes built in-memory, WSGI called in-process.
"""
import io
import json

import numpy as np
import pytest

from audio_processor_tpu.pipeline.transcribe import Transcriber
from audio_processor_tpu.runtime.job_engine import JobEngine
from audio_processor_tpu.runtime.services import Services
from audio_processor_tpu.server import openai_api
from audio_processor_tpu.server.web import App
from audio_processor_tpu.utils import wavio


class _Processor:
    def __init__(self, transcriber):
        self.transcriber = transcriber


@pytest.fixture(scope="module")
def app():
    t = Transcriber.random_init(
        "test", language=0, no_speech_threshold=None, enable_fallback=False,
        compute_dtype="float32", max_new_tokens=8,
    )
    engine = JobEngine(max_workers=1)
    services = Services(engine=engine, processor=_Processor(t))
    app = App(secret_key="k")
    app.register_blueprint(openai_api.make_openai_blueprint(services))
    yield app
    engine.shutdown(wait=False)


def wav_bytes(seconds: float = 2.0) -> bytes:
    sr = 16_000
    x = (0.3 * np.sin(2 * np.pi * 330 * np.arange(int(seconds * sr)) / sr))
    buf = io.BytesIO()
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    try:
        wavio.write_wav(path, x.astype(np.float32), sr)
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def multipart(fields: dict[str, list[str] | str], file: tuple | None):
    """(body, content_type) for a multipart/form-data POST."""
    boundary = "testboundary42"
    out = io.BytesIO()
    for name, vals in fields.items():
        for v in [vals] if isinstance(vals, str) else vals:
            out.write(f"--{boundary}\r\n".encode())
            out.write(
                f'Content-Disposition: form-data; name="{name}"\r\n\r\n'.encode()
            )
            out.write(v.encode() + b"\r\n")
    if file is not None:
        fname, payload = file
        out.write(f"--{boundary}\r\n".encode())
        out.write(
            b'Content-Disposition: form-data; name="file"; '
            + f'filename="{fname}"\r\n'.encode()
        )
        out.write(b"Content-Type: application/octet-stream\r\n\r\n")
        out.write(payload + b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


def post(app, path, body: bytes, ctype: str):
    environ = {
        "REQUEST_METHOD": "POST",
        "PATH_INFO": path,
        "QUERY_STRING": "",
        "CONTENT_LENGTH": str(len(body)),
        "CONTENT_TYPE": ctype,
        "wsgi.input": io.BytesIO(body),
    }
    captured = {}

    def start_response(status, hdrs):
        captured["status"] = int(status.split()[0])
        captured["headers"] = dict(hdrs)

    payload = b"".join(app(environ, start_response))
    try:
        data = json.loads(payload)
    except ValueError:
        data = payload
    return captured["status"], data, captured["headers"]


URL = "/v1/audio/transcriptions"


def test_json_default(app):
    body, ct = multipart({}, ("a.wav", wav_bytes()))
    status, data, _ = post(app, URL, body, ct)
    assert status == 200
    assert set(data) == {"text"}
    assert isinstance(data["text"], str)


def test_text_format(app):
    body, ct = multipart({"response_format": "text"}, ("a.wav", wav_bytes()))
    status, data, headers = post(app, URL, body, ct)
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")
    assert isinstance(data, bytes)


def test_verbose_json_segments(app):
    body, ct = multipart(
        {"response_format": "verbose_json", "temperature": "0.0"},
        ("a.wav", wav_bytes()),
    )
    status, data, _ = post(app, URL, body, ct)
    assert status == 200
    assert data["task"] == "transcribe"
    assert data["language"] == "english"
    assert data["duration"] == pytest.approx(2.0, abs=0.1)
    for seg in data["segments"]:
        assert set(seg) == {
            "id", "seek", "start", "end", "text", "tokens", "temperature",
            "avg_logprob", "compression_ratio", "no_speech_prob",
        }


def test_word_granularity(app):
    body, ct = multipart(
        {
            "response_format": "verbose_json",
            "timestamp_granularities[]": ["word"],
        },
        ("a.wav", wav_bytes()),
    )
    status, data, _ = post(app, URL, body, ct)
    assert status == 200
    assert "words" in data and "segments" not in data
    for w in data["words"]:
        assert set(w) == {"word", "start", "end"}
    # both granularities -> words AND segments
    body, ct = multipart(
        {
            "response_format": "verbose_json",
            "timestamp_granularities[]": ["word", "segment"],
        },
        ("a.wav", wav_bytes()),
    )
    status, data, _ = post(app, URL, body, ct)
    assert status == 200
    assert "words" in data and "segments" in data


def test_translations_sets_task(app):
    body, ct = multipart(
        {"response_format": "verbose_json"}, ("a.wav", wav_bytes())
    )
    status, data, _ = post(app, "/v1/audio/translations", body, ct)
    assert status == 200
    assert data["task"] == "translate"
    # language is rejected on translations, as OpenAI does
    body, ct = multipart({"language": "de"}, ("a.wav", wav_bytes()))
    status, data, _ = post(app, "/v1/audio/translations", body, ct)
    assert status == 400
    assert data["error"]["param"] == "language"


def test_srt_format(app):
    body, ct = multipart({"response_format": "srt"}, ("a.wav", wav_bytes()))
    status, data, headers = post(app, URL, body, ct)
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")


def test_error_envelopes(app):
    # no file part
    body, ct = multipart({"response_format": "json"}, None)
    status, data, _ = post(app, URL, body, ct)
    assert status == 400
    assert data["error"]["type"] == "invalid_request_error"
    assert data["error"]["param"] == "file"
    # bad response_format
    body, ct = multipart({"response_format": "yaml"}, ("a.wav", wav_bytes()))
    status, data, _ = post(app, URL, body, ct)
    assert status == 400 and data["error"]["param"] == "response_format"
    # granularities without verbose_json
    body, ct = multipart(
        {"timestamp_granularities[]": ["word"]}, ("a.wav", wav_bytes())
    )
    status, data, _ = post(app, URL, body, ct)
    assert status == 400
    assert data["error"]["param"] == "timestamp_granularities"
    # out-of-range temperature
    body, ct = multipart({"temperature": "1.5"}, ("a.wav", wav_bytes()))
    status, data, _ = post(app, URL, body, ct)
    assert status == 400 and data["error"]["param"] == "temperature"
    # unsupported language
    body, ct = multipart({"language": "xx"}, ("a.wav", wav_bytes()))
    status, data, _ = post(app, URL, body, ct)
    assert status == 400 and data["error"]["param"] == "language"
    # undecodable payload
    body, ct = multipart({}, ("a.mp3", b"\x00\x01notaudio"))
    status, data, _ = post(app, URL, body, ct)
    assert status == 400 and data["error"]["param"] == "file"
    # not multipart at all
    status, data, _ = post(app, URL, b"{}", "application/json")
    assert status == 400


def test_prompt_and_language_accepted(app):
    body, ct = multipart(
        {"language": "en", "prompt": "Hello there.", "temperature": "0.3"},
        ("a.wav", wav_bytes()),
    )
    status, data, _ = post(app, URL, body, ct)
    assert status == 200 and "text" in data


def test_streaming_sse(app):
    """stream=true emits transcript.text.delta events then a
    transcript.text.done with the full text (OpenAI's streaming form)."""
    body, ct = multipart({"stream": "true"}, ("a.wav", wav_bytes()))
    status, data, headers = post(app, URL, body, ct)
    assert status == 200
    assert headers["Content-Type"].startswith("text/event-stream")
    frames = [f for f in data.decode().split("\n\n") if f.strip()]
    events = []
    for frame in frames:
        lines = dict(
            l.split(": ", 1) for l in frame.split("\n") if ": " in l
        )
        events.append((lines["event"], json.loads(lines["data"])))
    kinds = [e[0] for e in events]
    assert kinds[-1] == "transcript.text.done"
    assert all(k == "transcript.text.delta" for k in kinds[:-1])
    done = events[-1][1]
    assert done["type"] == "transcript.text.done"
    joined = "".join(e[1]["delta"] for e in events[:-1]).strip()
    assert done["text"] == joined.strip() or done["text"] in joined


def test_streaming_rejects_non_json_formats(app):
    body, ct = multipart(
        {"stream": "true", "response_format": "srt"}, ("a.wav", wav_bytes())
    )
    status, data, _ = post(app, URL, body, ct)
    assert status == 400 and data["error"]["param"] == "stream"


def test_streaming_slot_cap(app, monkeypatch):
    monkeypatch.setenv("APTPU_MAX_TRANSCRIBE_STREAMS", "0")
    body, ct = multipart({"stream": "true"}, ("a.wav", wav_bytes()))
    status, data, _ = post(app, URL, body, ct)
    assert status == 503 and data["error"]["type"] == "server_error"


def _get(app, path):
    environ = {
        "REQUEST_METHOD": "GET",
        "PATH_INFO": path,
        "QUERY_STRING": "",
        "wsgi.input": io.BytesIO(b""),
    }
    captured = {}

    def start_response(status, hdrs):
        captured["status"] = int(status.split()[0])

    payload = b"".join(app(environ, start_response))
    return captured["status"], json.loads(payload)


def test_models_list_and_get(app):
    """OpenAI clients probe /v1/models for discovery; both the whisper-1
    alias and the configured variant resolve, unknown ids 404 with the
    standard envelope."""
    status, data = _get(app, "/v1/models")
    assert status == 200 and data["object"] == "list"
    ids = [m["id"] for m in data["data"]]
    assert "whisper-1" in ids and "test" in ids
    for m in data["data"]:
        assert m["object"] == "model" and m["owned_by"]

    status, data = _get(app, "/v1/models/whisper-1")
    assert status == 200 and data["id"] == "whisper-1"
    status, data = _get(app, "/v1/models/gpt-4o")
    assert status == 404 and data["error"]["param"] == "model"


def test_decode_concurrency_gate(app, monkeypatch):
    """EVERY /v1 decode holds a device slot (HBM is budgeted for a bounded
    number of slab decodes); excess requests 503 after the queue timeout
    instead of piling onto the chip."""
    monkeypatch.setenv("APTPU_MAX_CONCURRENT_DECODES", "0")
    monkeypatch.setenv("APTPU_DECODE_QUEUE_TIMEOUT_S", "0.1")
    body, ct = multipart({}, ("a.wav", wav_bytes()))
    status, data, _ = post(app, URL, body, ct)
    assert status == 503
    assert "concurrent" in data["error"]["message"]


def test_decode_slot_waits_then_proceeds(monkeypatch):
    """A request queued behind a running decode proceeds when the slot
    frees within the timeout (gate blocks, not rejects, under brief
    contention)."""
    import threading
    import time as _time

    monkeypatch.setenv("APTPU_MAX_CONCURRENT_DECODES", "1")
    monkeypatch.setenv("APTPU_DECODE_QUEUE_TIMEOUT_S", "5")
    assert openai_api._acquire_decode_slot()
    t = threading.Timer(0.2, openai_api._release_decode_slot)
    t.start()
    start = _time.monotonic()
    try:
        assert openai_api._acquire_decode_slot()  # blocks ~0.2 s, not 5
        assert _time.monotonic() - start < 3
    finally:
        openai_api._release_decode_slot()
        t.join()


def test_quoted_boundary_with_comma(app):
    """RFC 2046 bchars include ','; a quoted boundary containing one must
    parse (the delimiter is the full quoted value, not the prefix)."""
    body, ct = multipart({}, ("a.wav", wav_bytes()))
    boundary = ct.split("boundary=")[1]
    new_boundary = boundary + ",x"
    body = body.replace(boundary.encode(), new_boundary.encode())
    ct = f'multipart/form-data; boundary="{new_boundary}"'
    status, data, _ = post(app, URL, body, ct)
    assert status == 200 and "text" in data


def test_api_key_auth(app, monkeypatch):
    """APTPU_API_KEYS gates the whole /v1 surface with OpenAI's Bearer
    scheme; unset keeps it open (the reference's LAN deployment)."""
    monkeypatch.setenv("APTPU_API_KEYS", "sk-one, sk-two")
    body, ct = multipart({}, ("a.wav", wav_bytes()))
    status, data, _ = post(app, URL, body, ct)
    assert status == 401 and "API key" in data["error"]["message"]
    status, _ = _get(app, "/v1/models")
    assert status == 401

    def post_auth(key):
        environ = {
            "REQUEST_METHOD": "GET", "PATH_INFO": "/v1/models",
            "QUERY_STRING": "", "HTTP_AUTHORIZATION": f"Bearer {key}",
            "wsgi.input": io.BytesIO(b""), "CONTENT_LENGTH": "0",
        }
        captured = {}

        def sr(status, hdrs):
            captured["status"] = int(status.split()[0])
        json.loads(b"".join(app(environ, sr)) or b"{}")
        return captured["status"]

    assert post_auth("sk-two") == 200
    assert post_auth("sk-wrong") == 401
    monkeypatch.delenv("APTPU_API_KEYS")
    status, _ = _get(app, "/v1/models")
    assert status == 200


def test_dynamic_batching_coalesces(app, monkeypatch):
    """APTPU_DYNAMIC_BATCH_WAIT_MS > 0: concurrent uploads with identical
    option sets coalesce into ONE shared-slab transcribe_batch call; each
    request still gets its own transcript."""
    import threading

    from audio_processor_tpu.pipeline.transcribe import Transcriber

    monkeypatch.setenv("APTPU_DYNAMIC_BATCH_WAIT_MS", "1000")
    calls: list[int] = []
    orig = Transcriber.transcribe_batch

    def spy(self, audios, **kw):
        calls.append(len(audios))
        return orig(self, audios, **kw)

    monkeypatch.setattr(Transcriber, "transcribe_batch", spy)
    bodies = [
        multipart({}, ("a.wav", wav_bytes(1.0))),
        multipart({}, ("b.wav", wav_bytes(2.0))),
    ]
    results: dict[int, tuple] = {}

    def go(i):
        body, ct = bodies[i]
        results[i] = post(app, URL, body, ct)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert results[0][0] == 200 and results[1][0] == 200
    assert isinstance(results[0][1]["text"], str)
    assert isinstance(results[1][1]["text"], str)
    # one decode for both uploads (the 1 s window is generous vs the ~ms
    # it takes the second thread to enqueue)
    assert calls == [2]


def test_dynamic_batching_keeps_option_sets_apart(app, monkeypatch):
    """Different decode options must NOT share a batch (different compiled
    programs/semantics) — two keys, two transcribe_batch calls."""
    import threading

    from audio_processor_tpu.pipeline.transcribe import Transcriber

    monkeypatch.setenv("APTPU_DYNAMIC_BATCH_WAIT_MS", "300")
    calls: list[int] = []
    orig = Transcriber.transcribe_batch

    def spy(self, audios, **kw):
        calls.append(len(audios))
        return orig(self, audios, **kw)

    monkeypatch.setattr(Transcriber, "transcribe_batch", spy)
    bodies = [
        multipart({}, ("a.wav", wav_bytes(1.0))),
        multipart({"temperature": "0.4"}, ("b.wav", wav_bytes(1.0))),
    ]
    results: dict[int, tuple] = {}

    def go(i):
        body, ct = bodies[i]
        results[i] = post(app, URL, body, ct)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert results[0][0] == 200 and results[1][0] == 200
    assert sorted(calls) == [1, 1]


def test_dynamic_batching_full_batch_closes_early(app, monkeypatch):
    """A batch that reaches APTPU_DYNAMIC_BATCH_MAX_FILES decodes
    immediately instead of sleeping out the rest of the collection
    window."""
    import threading
    import time

    monkeypatch.setenv("APTPU_DYNAMIC_BATCH_WAIT_MS", "30000")
    monkeypatch.setenv("APTPU_DYNAMIC_BATCH_MAX_FILES", "2")
    bodies = [
        multipart({}, ("a.wav", wav_bytes(1.0))),
        multipart({}, ("b.wav", wav_bytes(1.0))),
    ]
    results: dict[int, tuple] = {}

    def go(i):
        body, ct = bodies[i]
        results[i] = post(app, URL, body, ct)

    t0 = time.monotonic()
    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    elapsed = time.monotonic() - t0
    assert results[0][0] == 200 and results[1][0] == 200
    # well under the 30 s window: the second upload filled the batch
    assert elapsed < 20.0
