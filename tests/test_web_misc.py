"""Odds and ends: template rendering, cookies, redirects, 24-bit WAV."""
import numpy as np

from audio_processor_tpu.server.web import App, Response, redirect
from audio_processor_tpu.utils import wavio
from tests.test_runtime_server import call_app


def test_render_template_with_context(tmp_path):
    (tmp_path / "page.html").write_text("<h1>{{ title }}</h1><p>{{ body }}</p>")
    app = App(template_dir=str(tmp_path))

    @app.route("/page")
    def page(request):
        return app.render_template("page.html", title="Hello", body="World")

    status, data, _ = call_app(app, "GET", "/page")
    assert status == 200 and data == b"<h1>Hello</h1><p>World</p>"


def test_redirect_and_cookie_attributes():
    app = App()

    @app.route("/go")
    def go(request):
        resp = redirect("/elsewhere")
        resp.set_cookie("k", "v", max_age=60)
        return resp

    status, _, headers = call_app(app, "GET", "/go")
    assert status == 302
    assert headers["Location"] == ["/elsewhere"]
    cookie = headers["Set-Cookie"][0]
    assert "k=v" in cookie and "HttpOnly" in cookie and "Max-Age=60" in cookie


def test_response_tuple_and_dict_returns():
    app = App()

    @app.route("/d")
    def d(request):
        return {"x": 1}

    @app.route("/t")
    def t(request):
        return {"y": 2}, 201

    status, data, _ = call_app(app, "GET", "/d")
    assert (status, data) == (200, {"x": 1})
    status, data, _ = call_app(app, "GET", "/t")
    assert (status, data) == (201, {"y": 2})


def test_wav_24bit_read(tmp_path):
    import struct

    rng = np.random.default_rng(0)
    x = (rng.uniform(-1, 1, 500) * 0.5).astype(np.float64)
    as24 = np.clip(np.round(x * 8388607), -8388608, 8388607).astype(np.int64)
    payload = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in as24
    )
    header = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    header += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 48000, 3, 24)
    header += b"data" + struct.pack("<I", len(payload))
    p = str(tmp_path / "x24.wav")
    with open(p, "wb") as f:
        f.write(header + payload)
    y, rate = wavio.read_wav_mono(p)
    assert rate == 16000
    np.testing.assert_allclose(y, x, atol=2e-7)


def test_streaming_resamples_input():
    from audio_processor_tpu.pipeline.streaming import StreamingTranscriber
    from audio_processor_tpu.pipeline.transcribe import Transcriber

    st = StreamingTranscriber(
        Transcriber.random_init("test", compute_dtype="float32", max_new_tokens=4),
        sample_rate=8000,
    )
    rng = np.random.default_rng(0)
    list(st.feed(rng.normal(0, 0.1, 8000 * 3).astype(np.float32)))
    # the buffer holds SOURCE-rate samples (3 s at 8 kHz): windows are
    # cut in the raw timeline and resampled whole at decode time, so mic
    # blocks never pass through the resampler individually
    assert len(st._buffer) == 8000 * 3
    assert st._chunk_src == 8000 * 30
    # the decode path sees 16 kHz audio
    out = st._to_16k(st._buffer)
    assert abs(len(out) - 48000) < 2


def test_dev_server_thread_pool_is_bounded():
    """A burst of concurrent requests must be served by the FIXED worker
    pool, not one thread per connection (round-2 review weak #6: 100
    status polls spawned 100 threads; production also fronts with
    gunicorn — this pins the dev/fallback server)."""
    import socket
    import threading
    import time
    import urllib.request

    app = App()

    @app.route("/slow")
    def slow(request):
        time.sleep(0.05)
        return {"ok": True}

    with socket.socket() as s:  # grab a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    threading.Thread(
        target=lambda: app.run(host="127.0.0.1", port=port, max_threads=4),
        daemon=True,
    ).start()
    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/slow", timeout=2
            ).read()
            break
        except OSError:
            time.sleep(0.05)
    else:
        raise AssertionError("dev server did not come up")

    peak = 0
    lock = threading.Lock()

    def hit():
        nonlocal peak
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/slow", timeout=30
            ).read()
        finally:
            n = sum(
                1 for t in threading.enumerate()
                if t.name.startswith("http")
            )
            with lock:
                peak = max(peak, n)

    try:
        clients = [threading.Thread(target=hit) for _ in range(40)]
        for c in clients:
            c.start()
        for c in clients:
            c.join(timeout=60)
    finally:
        # stop the server loop: a leaked serve_forever thread (plus its
        # selector fd) otherwise lives for the REST of the suite
        app.shutdown()
    # the semaphore bounds CONCURRENT handlers at 4; a finished handler
    # may linger microseconds between releasing its slot and thread exit,
    # so allow a small transient margin — the point is "bounded", not 40
    assert peak <= 6, f"{peak} http worker threads for a 4-slot bound"


def test_oversize_body_rejected_413(monkeypatch):
    """A Content-Length beyond APTPU_MAX_BODY_MB is refused up front —
    the body is never buffered (wsgi.input stays unread)."""
    import io

    monkeypatch.setenv("APTPU_MAX_BODY_MB", "1")
    app = App()

    @app.route("/echo", methods=("POST",))
    def echo(request):
        return {"n": len(request.body)}

    class Exploding(io.BytesIO):
        def read(self, *a):
            raise AssertionError("oversize body must not be read")

    environ = {
        "REQUEST_METHOD": "POST",
        "PATH_INFO": "/echo",
        "QUERY_STRING": "",
        "CONTENT_LENGTH": str(2 * 1024 * 1024),
        "CONTENT_TYPE": "application/octet-stream",
        "wsgi.input": Exploding(),
    }
    captured = {}

    def start_response(status, hdrs):
        captured["status"] = int(status.split()[0])

    body = b"".join(app(environ, start_response))
    assert captured["status"] == 413
    assert b"APTPU_MAX_BODY_MB" in body
    # an in-cap body on the same app still flows
    status, data, _ = call_app(app, "POST", "/echo", body={"a": 1})
    assert status == 200 and data["n"] > 0


def test_multipart_parser_survives_hostile_bodies():
    """Fuzz the stdlib-only multipart parser: arbitrary bytes must parse or
    raise ValueError — never crash the worker thread with anything else."""
    import io
    import numpy as np

    from audio_processor_tpu.server.web import Request

    rng = np.random.default_rng(7)
    boundary = "bnd"
    hostile = [
        b"",
        b"--bnd",
        b"--bnd--",
        b"--bnd\r\nContent-Disposition: form-data\r\n\r\n",
        b"--bnd\r\nContent-Disposition: form-data; name=\"a\"\r\nbroken",
        b"--bnd\r\n\xff\xfe\x00garbage\r\n\r\n--bnd--",
        bytes(rng.integers(0, 256, 512, dtype=np.uint8)),
        b"--bnd\r\nContent-Disposition: form-data; name=\"f\"; filename=\"x\"\r\n\r\n"
        + bytes(rng.integers(0, 256, 256, dtype=np.uint8)),
    ]
    for body in hostile:
        environ = {
            "REQUEST_METHOD": "POST",
            "CONTENT_TYPE": f"multipart/form-data; boundary={boundary}",
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
        }
        req = Request(environ)
        try:
            fields, files = req.form()
            assert isinstance(fields, dict) and isinstance(files, dict)
        except ValueError:
            pass  # a 400 at the route layer — acceptable

    # missing/garbled content types raise ValueError, not anything else
    for ctype in ("", "multipart/form-data", "text/plain"):
        environ = {
            "REQUEST_METHOD": "POST",
            "CONTENT_TYPE": ctype,
            "CONTENT_LENGTH": "4",
            "wsgi.input": io.BytesIO(b"abcd"),
        }
        try:
            Request(environ).form()
        except ValueError:
            pass


def test_head_answered_by_get_handler():
    """HEAD must be served by the GET route with an empty body (Flask's
    auto-HEAD rule) — load balancers probe HEAD /health and used to get
    405, marking a healthy service down."""
    app = App()

    @app.route("/health")
    def health(request):
        return {"status": "healthy"}

    status, data, headers = call_app(app, "HEAD", "/health")
    assert status == 200
    assert data == b""
    # GET is untouched
    status, data, _ = call_app(app, "GET", "/health")
    assert status == 200 and data == {"status": "healthy"}
    # non-GET routes still 405 for wrong methods
    @app.route("/only-post", methods=("POST",))
    def only_post(request):
        return {"ok": True}

    status, _, _ = call_app(app, "HEAD", "/only-post")
    assert status == 405


def test_head_on_streaming_route_releases_and_strips():
    """HEAD to an SSE route must answer headers-only — streaming a body on
    HEAD is a protocol violation, and the generator would pin a worker
    thread + SSE slot for the stream's lifetime.  The slot-release hook
    and the generator's finally both run."""
    from audio_processor_tpu.server.web import StreamingResponse

    app = App()
    events = []

    @app.route("/events")
    def stream(request):
        def gen():
            try:
                yield b"data: 1\n\n"
                yield b"data: 2\n\n"
            finally:
                events.append("gen-finally")
        return StreamingResponse(gen(), on_close=lambda: events.append("slot"))

    status, data, headers = call_app(app, "HEAD", "/events")
    assert status == 200
    assert data == b""
    # on_close (the slot release) fires; the generator's finally does not
    # because close() on a never-started generator skips the body —
    # which is exactly why slot releases ride on_close, not finally
    assert events == ["slot"]
    # GET still streams
    status, data, _ = call_app(app, "GET", "/events")
    assert b"data: 1" in data and b"data: 2" in data


def test_session_tracks_all_mutation_forms():
    """del / update / setdefault / popitem write back to the cookie like
    __setitem__ does — an untracked mutation silently evaporates."""
    from audio_processor_tpu.server.web import Session

    for mutate in (
        lambda s: s.__delitem__("a"),
        lambda s: s.update(b=2),
        lambda s: s.setdefault("c", 3),
        lambda s: s.popitem(),
    ):
        s = Session({"a": 1})
        assert not s.modified
        mutate(s)
        assert s.modified, mutate
    # setdefault on an EXISTING key changes nothing -> no spurious write
    s = Session({"a": 1})
    s.setdefault("a", 9)
    assert not s.modified


def test_host_url_ignores_forwarded_headers_unless_trusted(monkeypatch):
    """X-Forwarded-Proto/Host are client-supplied: they feed the OAuth
    redirect_uri, so they are honored only behind a declared proxy."""
    import io as _io

    from audio_processor_tpu.server.web import Request

    environ = {
        "REQUEST_METHOD": "GET", "PATH_INFO": "/", "QUERY_STRING": "",
        "wsgi.url_scheme": "http", "wsgi.input": _io.BytesIO(b""),
        "HTTP_HOST": "real.example",
        "HTTP_X_FORWARDED_PROTO": "https",
        "HTTP_X_FORWARDED_HOST": "evil.example, hop2",
    }
    monkeypatch.delenv("APTPU_TRUST_PROXY_HEADERS", raising=False)
    assert Request(environ).host_url == "http://real.example/"
    monkeypatch.setenv("APTPU_TRUST_PROXY_HEADERS", "1")
    # trusted: first hop only of a comma-joined multi-proxy header
    assert Request(environ).host_url == "https://evil.example/"


def test_session_cookie_secure_follows_deployment(monkeypatch):
    """The 30-day authenticated session cookie carries Secure whenever the
    deployment is HTTPS-facing (EXTERNAL_URL) or forced via env."""
    app = App(secret_key="s")

    @app.route("/login")
    def login(request):
        request.session["user"] = "u"
        return Response(b"ok")

    monkeypatch.delenv("APTPU_COOKIE_SECURE", raising=False)
    monkeypatch.setenv("EXTERNAL_URL", "https://meet.example")
    _, _, headers = call_app(app, "GET", "/login")
    assert "Secure" in headers["Set-Cookie"][0]
    monkeypatch.setenv("EXTERNAL_URL", "http://lan-box:5000")
    _, _, headers = call_app(app, "GET", "/login")
    assert "Secure" not in headers["Set-Cookie"][0]
    monkeypatch.setenv("APTPU_COOKIE_SECURE", "1")
    _, _, headers = call_app(app, "GET", "/login")
    assert "Secure" in headers["Set-Cookie"][0]
