"""Job engine, job stores, WSGI framework, and API contract tests."""
import io
import json
import threading
import time

import numpy as np
import pytest

from audio_processor_tpu.runtime.job_engine import JobCancelled, JobEngine
from audio_processor_tpu.runtime.job_store import MemoryJobStore, SqliteJobStore, make_store
from audio_processor_tpu.server import api as api_mod
from audio_processor_tpu.server.web import App, Blueprint, jsonify


# ---------------------------------------------------------------------------
# job stores
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("backend", ["memory", "sqlite"])
def test_job_store_crud(backend, tmp_path):
    store = (
        MemoryJobStore()
        if backend == "memory"
        else SqliteJobStore(str(tmp_path / "jobs.db"))
    )
    store.create("j1", {"id": "j1", "status": "pending", "progress": 0})
    assert store.get("j1")["status"] == "pending"
    store.update("j1", status="processing", progress=50)
    assert store.get("j1")["progress"] == 50
    assert len(store.list()) == 1

    assert not store.is_cancel_requested("j1")
    store.request_cancel("j1")
    assert store.is_cancel_requested("j1")
    store.clear_cancel("j1")
    assert not store.is_cancel_requested("j1")
    store.delete("j1")
    assert store.get("j1") is None


def test_sqlite_store_cross_instance(tmp_path):
    """Two store instances on the same file see each other's jobs —
    the property the reference's in-process dict lacks."""
    path = str(tmp_path / "jobs.db")
    a, b = SqliteJobStore(path), SqliteJobStore(path)
    a.create("j1", {"id": "j1", "status": "pending"})
    assert b.get("j1")["status"] == "pending"
    b.update("j1", status="completed")
    assert a.get("j1")["status"] == "completed"


def test_sqlite_store_cross_process(tmp_path):
    """The literal gunicorn-split-brain scenario: a job created by another
    PROCESS is visible (and updatable) here — the property whose absence is
    a reference defect (SURVEY.md appendix)."""
    import os
    import subprocess
    import sys

    path = str(tmp_path / "jobs.db")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        f"import sys; sys.path.insert(0, {repo!r});"
        "from audio_processor_tpu.runtime.job_store import SqliteJobStore;"
        f"s = SqliteJobStore({path!r});"
        "s.create('xp', {'id': 'xp', 'status': 'pending', 'progress': 0});"
        "s.request_cancel('xp')"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=60)

    store = SqliteJobStore(path)
    rec = store.get("xp")
    assert rec and rec["status"] == "pending"
    assert store.is_cancel_requested("xp")
    store.update("xp", status="cancelled")
    assert store.get("xp")["status"] == "cancelled"


def test_make_store_urls(tmp_path):
    assert isinstance(make_store(None), MemoryJobStore)
    assert isinstance(make_store("memory://"), MemoryJobStore)
    assert isinstance(make_store(f"sqlite:///{tmp_path}/x.db"), SqliteJobStore)


# ---------------------------------------------------------------------------
# job engine
# ---------------------------------------------------------------------------

@pytest.fixture
def engine():
    e = JobEngine(max_workers=2)
    yield e
    e.shutdown(wait=False)


def _wait_status(engine, job_id, statuses, timeout=10.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        st = engine.get_job_status(job_id)
        if st and st["status"] in statuses:
            return st
        time.sleep(0.02)
    raise TimeoutError(f"job {job_id} never reached {statuses}")


def test_job_success_lifecycle(engine):
    engine.create_job("j1", file_id="f1")

    def work(ctx):
        ctx.stage(30, "working")
        return {"success": True, "answer": 42}

    engine.submit("j1", work)
    st = _wait_status(engine, "j1", ["completed"])
    assert st["progress"] == 100
    assert st["result"]["answer"] == 42
    assert st["id"] == "j1"
    assert st["file_id"] == "f1"


def test_job_failure_salvages_partial(engine):
    engine.create_job("j2")

    def work(ctx):
        ctx.partial["title"] = "salvaged"
        raise RuntimeError("boom")

    engine.submit(
        "j2", work, failure_result=lambda exc, p: {"success": False, "title": p["title"]}
    )
    st = _wait_status(engine, "j2", ["failed"])
    assert "boom" in st["error"]
    assert st["partial_result"]["title"] == "salvaged"
    rec = engine.store.get("j2")
    assert rec["result"]["title"] == "salvaged"


def test_job_cancellation_mid_flight(engine):
    engine.create_job("j3")
    started = threading.Event()

    def work(ctx):
        started.set()
        for _ in range(200):
            ctx.check_cancelled()
            time.sleep(0.02)
        return {}

    engine.submit("j3", work)
    started.wait(5)
    out = engine.cancel_job("j3")
    assert out["success"]
    st = _wait_status(engine, "j3", ["cancelled"])
    assert st["status"] == "cancelled"
    # cancelling again reports already-cancelled
    again = engine.cancel_job("j3")
    assert not again["success"]


def test_cancel_missing_job(engine):
    assert engine.cancel_job("ghost")["success"] is False


def test_list_jobs_filters(engine):
    engine.create_job("a")
    engine.create_job("b")

    def ok(ctx):
        return {}

    def bad(ctx):
        raise ValueError("x")

    engine.submit("a", ok)
    engine.submit("b", bad)
    _wait_status(engine, "a", ["completed"])
    _wait_status(engine, "b", ["failed"])
    assert {j["id"] for j in engine.list_jobs("completed")} == {"a"}
    assert {j["id"] for j in engine.list_jobs("failed")} == {"b"}
    assert len(engine.list_jobs("all")) == 2
    assert engine.active_count() == 0


def test_concurrent_submit_cancel_stress(tmp_path):
    """Race hygiene: many threads submitting/cancelling against the sqlite
    store must leave every job in a consistent terminal state (SURVEY.md
    §5.2 — the reference's cancelled_jobs set has a known unlocked race)."""
    import random

    engine = JobEngine(
        max_workers=4, store_url=f"sqlite://{tmp_path}/stress.db"
    )
    try:
        n = 24
        for i in range(n):
            engine.create_job(f"s{i}")

        def work(ctx):
            for _ in range(20):
                ctx.check_cancelled()
                time.sleep(0.005)
            return {"ok": True}

        def submitter(i):
            engine.submit(f"s{i}", work)

        def canceller(i):
            time.sleep(random.random() * 0.05)
            engine.cancel_job(f"s{i}")

        threads = []
        for i in range(n):
            threads.append(threading.Thread(target=submitter, args=(i,)))
            if i % 3 == 0:
                threads.append(threading.Thread(target=canceller, args=(i,)))
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        deadline = time.time() + 30
        while time.time() < deadline:
            statuses = [engine.get_job_status(f"s{i}")["status"] for i in range(n)]
            if all(s in ("completed", "cancelled", "failed") for s in statuses):
                break
            time.sleep(0.05)
        assert all(s in ("completed", "cancelled") for s in statuses), statuses
        # every completed job carries its result; every cancelled one doesn't
        for i in range(n):
            st = engine.get_job_status(f"s{i}")
            if st["status"] == "completed":
                assert st["result"] == {"ok": True}
    finally:
        engine.shutdown(wait=False)


# ---------------------------------------------------------------------------
# WSGI framework
# ---------------------------------------------------------------------------

def call_app(app, method, path, body=None, headers=None, query=""):
    """Minimal WSGI test client."""
    raw = json.dumps(body).encode() if isinstance(body, (dict, list)) else (body or b"")
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "CONTENT_LENGTH": str(len(raw)),
        "CONTENT_TYPE": "application/json",
        "wsgi.input": io.BytesIO(raw),
    }
    for k, v in (headers or {}).items():
        environ["HTTP_" + k.upper().replace("-", "_")] = v
    status_headers = {}

    def start_response(status, hdrs):
        status_headers["status"] = int(status.split()[0])
        status_headers["headers"] = dict()
        for k, v in hdrs:
            status_headers["headers"].setdefault(k, []).append(v)

    chunks = app(environ, start_response)
    payload = b"".join(chunks)
    try:
        data = json.loads(payload)
    except ValueError:
        data = payload
    return status_headers["status"], data, status_headers["headers"]


def test_web_routing_and_params():
    app = App()
    bp = Blueprint("t", url_prefix="/api")

    @bp.route("/echo/<name>")
    def echo(request, name):
        return {"name": name, "q": request.query.get("x")}

    @bp.route("/post", methods=("POST",))
    def post(request):
        return {"got": request.get_json()}, 201

    app.register_blueprint(bp)
    status, data, _ = call_app(app, "GET", "/api/echo/zed", query="x=1")
    assert status == 200 and data == {"name": "zed", "q": "1"}
    status, data, _ = call_app(app, "POST", "/api/post", body={"a": 1})
    assert status == 201 and data == {"got": {"a": 1}}
    status, data, _ = call_app(app, "GET", "/api/missing")
    assert status == 404
    status, data, _ = call_app(app, "DELETE", "/api/post")
    assert status == 405


def test_web_session_cookie_roundtrip():
    app = App(secret_key="s3cret")

    @app.route("/login", methods=("POST",))
    def login(request):
        request.session["user_id"] = "u1"
        return {"ok": True}

    @app.route("/whoami")
    def whoami(request):
        return {"user": request.session.get("user_id")}

    status, _, headers = call_app(app, "POST", "/login")
    cookie = headers["Set-Cookie"][0].split(";")[0]
    status, data, _ = call_app(app, "GET", "/whoami", headers={"Cookie": cookie})
    assert data == {"user": "u1"}
    # tampered cookie -> fresh session
    name, _, value = cookie.partition("=")
    bad = f"{name}={value[:-4]}XXXX"
    status, data, _ = call_app(app, "GET", "/whoami", headers={"Cookie": bad})
    assert data == {"user": None}


# ---------------------------------------------------------------------------
# API contract (hermetic services: no drive/llm, local processing)
# ---------------------------------------------------------------------------

class _InstantProcessor:
    def process(self, ctx, file_id, attachment_file_ids=None, user_id=None, oauth_drive=None):
        ctx.stage(30, "working")
        return {"success": True, "title": f"done:{file_id}"}


@pytest.fixture
def api_app():
    from audio_processor_tpu.runtime.services import Services

    engine = JobEngine(max_workers=2)
    services = Services(engine=engine, processor=_InstantProcessor())
    app = App(secret_key="k")
    app.register_blueprint(api_mod.make_api_blueprint(services))
    yield app, engine
    engine.shutdown(wait=False)


def test_api_health(api_app):
    app, _ = api_app
    status, data, _ = call_app(app, "GET", "/api/health")
    assert status == 200
    assert data["status"] == "healthy"
    assert set(data) == {"status", "timestamp", "active_jobs"}


def test_api_process_validation(api_app):
    app, _ = api_app
    status, data, _ = call_app(app, "POST", "/api/process", body=None)
    assert status == 400 and data["success"] is False
    status, data, _ = call_app(app, "POST", "/api/process", body={})
    assert status == 400
    status, data, _ = call_app(
        app, "POST", "/api/process", body={"file_id": "x", "attachment_file_ids": "nope"}
    )
    assert status == 400
    status, data, _ = call_app(
        app, "POST", "/api/process", body={"file_id": "x", "attachment_file_ids": [1]}
    )
    assert status == 400


def test_api_process_and_poll_lifecycle(api_app):
    app, engine = api_app
    status, data, _ = call_app(app, "POST", "/api/process", body={"file_id": "f9"})
    assert status == 200 and data["success"] is True
    job_id = data["job_id"]
    assert data["job_status"] == "pending"

    # poll until completed via the single-job endpoint
    for _ in range(200):
        status, jd, _ = call_app(app, "GET", f"/api/job/{job_id}")
        assert status == 200 and jd["success"]
        if jd["job"]["status"] == "completed":
            break
        time.sleep(0.02)
    assert jd["job"]["result"]["title"] == "done:f9"

    # batch endpoint
    status, bd, _ = call_app(
        app, "POST", "/api/jobs/status/batch", body={"job_ids": [job_id, "ghost"]}
    )
    assert status == 200
    assert job_id in bd["jobs"] and "ghost" not in bd["jobs"]

    # result endpoint
    status, rd, _ = call_app(app, "GET", f"/api/jobs/{job_id}/result")
    assert status == 200 and rd["result"]["title"] == "done:f9"

    # jobs listing
    status, ld, _ = call_app(app, "GET", "/api/jobs", query="filter=all")
    assert ld["count"] == 1 and job_id in ld["active_jobs"]
    status, ld, _ = call_app(app, "GET", "/api/jobs", query="filter=bogus")
    assert status == 400

    # debug endpoint
    status, dd, _ = call_app(app, "GET", "/api/jobs/debug")
    assert dd["total_jobs"] == 1


def test_api_job_not_found(api_app):
    app, _ = api_app
    status, data, _ = call_app(app, "GET", "/api/job/nope")
    assert status == 404 and data["success"] is False
    status, data, _ = call_app(app, "GET", "/api/jobs/nope/result")
    assert status == 404
    status, data, _ = call_app(app, "POST", "/api/job/nope/cancel")
    assert status == 404


def test_api_result_before_completion(api_app):
    app, engine = api_app
    engine.create_job("slow")
    status, data, _ = call_app(app, "GET", "/api/jobs/slow/result")
    assert status == 400


def test_api_sse_events(api_app):
    app, engine = api_app
    status, data, _ = call_app(app, "POST", "/api/process", body={"file_id": "sse"})
    job_id = data["job_id"]

    environ = {
        "REQUEST_METHOD": "GET",
        "PATH_INFO": f"/api/job/{job_id}/events",
        "QUERY_STRING": "",
        "wsgi.input": io.BytesIO(b""),
    }
    captured = {}

    def start_response(st, hdrs):
        captured["status"] = st
        captured["headers"] = dict(hdrs)

    chunks = []
    for chunk in app(environ, start_response):
        chunks.append(chunk)
        if b"event: end" in chunk:
            break
    assert captured["status"].startswith("200")
    assert captured["headers"]["Content-Type"].startswith("text/event-stream")
    payload = b"".join(chunks).decode()
    assert '"status": "completed"' in payload
    assert payload.rstrip().endswith("data: {}")

    status, _, _ = call_app(app, "GET", "/api/job/ghost/events")
    assert status == 404


def test_api_metrics(api_app):
    app, engine = api_app
    status, data, _ = call_app(app, "POST", "/api/process", body={"file_id": "m"})
    job_id = data["job_id"]
    for _ in range(200):
        st = engine.get_job_status(job_id)
        if st["status"] == "completed":
            break
        time.sleep(0.02)
    status, data, _ = call_app(app, "GET", "/api/metrics")
    assert status == 200
    m = data["metrics"]
    assert m["jobs_total"] == 1
    assert m["jobs_by_status"].get("completed") == 1
    assert "stage_seconds_mean" in m


def test_api_drive_files_requires_auth(api_app):
    app, _ = api_app
    status, data, _ = call_app(app, "GET", "/api/drive/files")
    assert status == 401


def test_api_sse_subscriber_cap(monkeypatch):
    """Above the cap, /events degrades to 503 so clients fall back to
    polling instead of pinning server threads (round-1 review weak #5)."""
    from audio_processor_tpu.runtime.services import Services

    monkeypatch.setenv("APTPU_SSE_MAX_SUBSCRIBERS", "0")
    engine = JobEngine(max_workers=1)
    try:
        services = Services(engine=engine, processor=_InstantProcessor())
        app = App(secret_key="k")
        app.register_blueprint(api_mod.make_api_blueprint(services))
        engine.create_job("capped")
        status, data, _ = call_app(app, "GET", "/api/job/capped/events")
        assert status == 503
        assert "polling" in data["error"]
    finally:
        engine.shutdown(wait=False)


# ---------------------------------------------------------------------------
# redis job store (against the in-repo fake; no daemon in this image)
# ---------------------------------------------------------------------------

def _redis_store():
    from audio_processor_tpu.runtime.job_store import RedisJobStore
    from tests.fake_redis import FakeRedis

    return RedisJobStore(client=FakeRedis())


def test_redis_store_crud():
    store = _redis_store()
    store.create("j1", {"id": "j1", "status": "pending", "progress": 0})
    assert store.get("j1")["status"] == "pending"
    store.update("j1", status="processing", progress=50)
    assert store.get("j1")["progress"] == 50
    assert len(store.list()) == 1
    assert not store.is_cancel_requested("j1")
    store.request_cancel("j1")
    assert store.is_cancel_requested("j1")
    store.clear_cancel("j1")
    assert not store.is_cancel_requested("j1")
    store.delete("j1")
    assert store.get("j1") is None
    assert store.list() == []


def test_redis_store_ordered_listing():
    store = _redis_store()
    for i in range(5):
        store.create(f"j{i}", {"id": f"j{i}", "status": "pending"})
    assert [r["id"] for r in store.list()] == [f"j{i}" for i in range(5)]


def test_redis_store_update_retries_on_watch_conflict():
    """A concurrent write between WATCH and EXEC must retry, not lose
    fields (the optimistic-transaction contract)."""
    from tests.fake_redis import FakeRedis

    r = FakeRedis()
    from audio_processor_tpu.runtime.job_store import RedisJobStore

    store = RedisJobStore(client=r)
    store.create("j1", {"id": "j1", "status": "pending", "progress": 0})

    real_multi = FakePipelineClass = type(r.pipeline())
    conflicted = {"done": False}
    orig_multi = FakePipelineClass.multi

    def sneaky_multi(self):
        # first attempt: simulate another worker bumping progress between
        # our WATCH/read and MULTI/EXEC
        if not conflicted["done"]:
            conflicted["done"] = True
            rec = json.loads(r.get("aptpu:job:j1"))
            rec["progress"] = 77
            r.set("aptpu:job:j1", json.dumps(rec))
        return orig_multi(self)

    FakePipelineClass.multi = sneaky_multi
    try:
        store.update("j1", status="processing")
    finally:
        FakePipelineClass.multi = orig_multi

    rec = store.get("j1")
    # the retry re-read the record, so the concurrent progress=77 survives
    assert rec["status"] == "processing"
    assert rec["progress"] == 77


def test_redis_store_with_engine():
    """Full JobEngine lifecycle on the redis backend."""
    from audio_processor_tpu.runtime.job_store import RedisJobStore
    from tests.fake_redis import FakeRedis

    engine = JobEngine(max_workers=1, store=RedisJobStore(client=FakeRedis()))
    try:
        engine.create_job("r1")
        done = threading.Event()

        def work(ctx):
            ctx.stage(50, "halfway")
            done.set()
            return {"ok": True}

        engine.submit("r1", work)
        assert done.wait(10)
        for _ in range(100):
            if engine.get_job_status("r1")["status"] == "completed":
                break
            time.sleep(0.05)
        status = engine.get_job_status("r1")
        assert status["status"] == "completed"
        assert status["result"] == {"ok": True}
    finally:
        engine.shutdown(wait=False)


def test_unprefixed_api_aliases():
    """The reference README documents UN-prefixed endpoints (/process,
    /job/<id>, /jobs, /health — reference README.md:114,152) while its
    code serves /api/*; create_app answers both forms identically."""
    from audio_processor_tpu.runtime.services import Services
    from audio_processor_tpu.server.app import create_app

    engine = JobEngine(max_workers=1)
    try:
        services = Services(engine=engine, processor=_InstantProcessor())
        app = create_app(services, secret_key="k")
        for path in ("/health", "/api/health"):
            status, data, _ = call_app(app, "GET", path)
            assert status == 200 and data["status"] == "healthy", path
        status, data, _ = call_app(
            app, "POST", "/process", body={"file_id": "f1"}
        )
        assert status in (200, 202) and data["job_id"]
        jid = data["job_id"]
        deadline = time.time() + 10
        while time.time() < deadline:
            status, data, _ = call_app(app, "GET", f"/job/{jid}")
            if data["job"]["status"] == "completed":
                break
            time.sleep(0.05)
        assert data["job"]["status"] == "completed"
        status, data, _ = call_app(app, "GET", "/jobs", query="filter=all")
        assert status == 200 and jid in data["active_jobs"]
    finally:
        engine.shutdown(wait=False)


def test_metrics_prometheus_format():
    """?format=prometheus emits the text exposition format (scrapable)."""
    from audio_processor_tpu.runtime.services import Services
    from audio_processor_tpu.server.app import create_app

    engine = JobEngine(max_workers=1)
    try:
        services = Services(engine=engine, processor=_InstantProcessor())
        app = create_app(services, secret_key="k")
        status, data, _ = call_app(app, "POST", "/api/process",
                                   body={"file_id": "f1"})
        jid = data["job_id"]
        deadline = time.time() + 10
        while time.time() < deadline:
            status, data, _ = call_app(app, "GET", f"/api/job/{jid}")
            if data["job"]["status"] == "completed":
                break
            time.sleep(0.05)
        status, body, headers = call_app(
            app, "GET", "/api/metrics", query="format=prometheus"
        )
        assert status == 200
        text = body.decode()
        assert "aptpu_jobs_total 1" in text
        assert 'aptpu_jobs{status="completed"} 1' in text
        assert headers["Content-Type"][0].startswith("text/plain")
        # JSON default unchanged
        status, data, _ = call_app(app, "GET", "/api/metrics")
        assert status == 200 and data["metrics"]["jobs_total"] == 1
    finally:
        engine.shutdown(wait=False)


def test_api_keys_gate_job_api_too():
    """APTPU_API_KEYS must gate the job API (both prefixes), not just /v1
    — otherwise transcripts stay readable one path over.  Bearer keys and
    authenticated sessions both pass; /health stays open for probes."""
    import os

    from audio_processor_tpu.runtime.services import Services
    from audio_processor_tpu.server.app import create_app

    engine = JobEngine(max_workers=1)
    os.environ["APTPU_API_KEYS"] = "sk-j"
    try:
        services = Services(engine=engine, processor=_InstantProcessor())
        app = create_app(services, secret_key="k")
        for path in ("/api/jobs", "/jobs", "/api/jobs/debug", "/api/metrics"):
            status, data, _ = call_app(app, "GET", path)
            assert status == 401, path
        status, _, _ = call_app(app, "GET", "/health")
        assert status == 200
        status, data, _ = call_app(
            app, "GET", "/api/jobs",
            headers={"Authorization": "bearer sk-j"},  # scheme case-insensitive
        )
        assert status == 200 and data["success"]
        # malformed non-ASCII header -> clean 401, not a 500
        status, _, _ = call_app(
            app, "GET", "/api/jobs", headers={"Authorization": "Bearer k\xe9"}
        )
        assert status == 401
    finally:
        del os.environ["APTPU_API_KEYS"]
        engine.shutdown(wait=False)


def test_stream_body_on_close_fires_once_even_unstarted():
    """_StreamBody guarantees the cleanup callback runs exactly once —
    including when the server close()s the body before first iteration
    (a bare generator's finally is skipped there, leaking slots)."""
    from audio_processor_tpu.server.web import _StreamBody

    calls = []

    def gen():
        yield "a"
        yield "b"

    # closed before iteration: generator finally would be skipped
    body = _StreamBody(gen(), on_close=lambda: calls.append(1))
    body.close()
    body.close()  # idempotent
    assert calls == [1]

    # normal exhaustion + close
    calls.clear()
    body = _StreamBody(gen(), on_close=lambda: calls.append(1))
    assert list(body) == [b"a", b"b"]
    body.close()
    assert calls == [1]


def test_prune_old_jobs_and_metrics_cache(tmp_path):
    engine = JobEngine(max_workers=1, store_url=f"sqlite://{tmp_path}/p.db")
    try:
        engine.create_job("old")
        engine.create_job("new")
        engine.store.update("old", status="completed",
                            updated_at="2020-01-01T00:00:00+00:00")
        engine.store.update("new", status="completed")
        removed = engine.prune_old_jobs(30)
        assert removed == 1
        assert engine.store.get("old") is None
        assert engine.store.get("new") is not None
        # active jobs are never pruned regardless of age
        engine.create_job("pending-old")
        engine.store.update("pending-old",
                            updated_at="2020-01-01T00:00:00+00:00")
        assert engine.prune_old_jobs(30) == 0
        # metrics cache: calls within the TTL agree but hand out COPIES —
        # /api/metrics annotates the returned dict, and a shared cached
        # object would be poisoned by one caller and race another's
        # json.dumps
        m1 = engine.metrics()
        m2 = engine.metrics()
        assert m1 == m2
        assert m1 is not m2
        m1["v1_dynamic_batching"] = {"batches": 1}
        m1["jobs_by_status"]["injected"] = 99
        m3 = engine.metrics()
        assert "v1_dynamic_batching" not in m3
        assert "injected" not in m3["jobs_by_status"]
    finally:
        engine.shutdown(wait=False)


def test_saturated_pool_marks_jobs_queued():
    """With every worker slot occupied, a submitted job surfaces as
    'queued' (the reference defines the status but never uses it), flips
    to processing on pickup, and stays cancellable."""
    import threading
    import time as _t

    from audio_processor_tpu.runtime.job_engine import JobEngine

    engine = JobEngine(max_workers=1)
    release = threading.Event()
    try:
        engine.create_job("busy")
        engine.submit("busy", lambda ctx: release.wait(10) or {"ok": True})
        _t.sleep(0.1)  # let the worker pick it up
        engine.create_job("waiting")
        engine.submit("waiting", lambda ctx: {"ok": True})
        st = engine.get_job_status("waiting")
        assert st["status"] == "queued", st
        # queued jobs are active (health count, orphan sweep) + cancellable
        assert any(j["id"] == "waiting" for j in engine.list_jobs("active"))
        out = engine.cancel_job("waiting")
        assert out["success"]
        deadline = _t.time() + 5
        while _t.time() < deadline:
            if engine.get_job_status("waiting")["status"] == "cancelled":
                break
            _t.sleep(0.02)
        assert engine.get_job_status("waiting")["status"] == "cancelled"
    finally:
        release.set()
        engine.shutdown(wait=True)
