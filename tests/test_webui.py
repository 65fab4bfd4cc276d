"""Static webui consistency: every DOM id the JS touches exists in the
templates, and the templates reference only shipped assets."""
import os
import re

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "audio_processor_tpu", "webui",
)


def _read(*parts):
    with open(os.path.join(BASE, *parts), encoding="utf-8") as f:
        return f.read()


def test_js_dom_ids_exist_in_index():
    index = _read("templates", "index.html")
    ids_in_html = set(re.findall(r'id="([^"]+)"', index))
    for js in ("app.js", "auth.js"):
        src = _read("static", "js", js)
        for dom_id in re.findall(r'getElementById\("([^"]+)"\)', src):
            assert dom_id in ids_in_html, f"{js} references missing #{dom_id}"


def test_templates_reference_shipped_assets():
    for page in ("index.html", "login.html", "callback.html"):
        html = _read("templates", page)
        for asset in re.findall(r'(?:src|href)="/static/([^"]+)"', html):
            path = os.path.join(BASE, "static", asset)
            assert os.path.isfile(path), f"{page} references missing {asset}"


def test_js_api_endpoints_are_served():
    """Every /api path the frontend calls has a matching registered route."""
    from audio_processor_tpu.runtime.job_engine import JobEngine
    from audio_processor_tpu.runtime.services import Services
    from audio_processor_tpu.server.app import create_app

    engine = JobEngine(max_workers=1)
    try:
        app = create_app(Services(engine=engine, processor=None))
        patterns = [p.pattern for p, _, _ in app.routes]

        def served(path):
            return any(re.match(pat, path) for pat in patterns)

        js = _read("static", "js", "app.js") + _read("static", "js", "auth.js")
        for call in set(re.findall(r'fetch\("(/api/[^"?`]+)"', js)):
            assert served(call), f"frontend calls unserved {call}"
        # template-literal endpoints
        assert served("/api/job/xyz")
        assert served("/api/job/xyz/cancel")
        assert served("/api/job/xyz/events")
        assert served("/api/jobs/xyz/result")
        assert served("/api/drive/files")
    finally:
        engine.shutdown(wait=False)
