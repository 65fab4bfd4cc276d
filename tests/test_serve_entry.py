"""serve.py WSGI entry: lazy init must be single-flight under concurrency
(gunicorn gthread fires many first requests at once — round-3 review)."""
import threading


def test_application_builds_exactly_once(monkeypatch, tmp_path):
    import serve  # repo root is on sys.path via conftest

    builds = []
    barrier = threading.Barrier(8)

    class FakeApp:
        def __call__(self, environ, start_response):
            start_response("200 OK", [])
            return [b"ok"]

    def fake_build_app():
        builds.append(1)
        import time

        time.sleep(0.1)  # widen the race window
        return FakeApp()

    monkeypatch.setattr(serve, "build_app", fake_build_app)
    monkeypatch.setattr(serve, "_wsgi_app", None)

    results = []

    def hit():
        barrier.wait()
        out = serve.application({}, lambda *a: None)
        results.append(out)

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(builds) == 1, f"built {len(builds)} service stacks"
    assert len(results) == 8
