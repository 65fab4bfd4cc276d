"""Full app factory + auth flow tests (hermetic OAuth transport)."""
import json

import pytest

from audio_processor_tpu.integrations.credentials import CredentialStore, MemoryKV
from audio_processor_tpu.runtime.job_engine import JobEngine
from audio_processor_tpu.runtime.services import Services
from audio_processor_tpu.server import auth as auth_mod
from audio_processor_tpu.server.app import create_app
from tests.test_runtime_server import call_app


class _NullProcessor:
    def process(self, ctx, *a, **k):
        return {"success": True}


@pytest.fixture
def oauth_env(monkeypatch):
    monkeypatch.setenv("GOOGLE_CLIENT_ID", "client-123")
    monkeypatch.setenv("GOOGLE_CLIENT_SECRET", "secret-xyz")
    monkeypatch.delenv("EXTERNAL_URL", raising=False)


@pytest.fixture
def app_and_services(oauth_env):
    engine = JobEngine(max_workers=1)
    services = Services(
        engine=engine,
        processor=_NullProcessor(),
        credential_store=CredentialStore(kv=MemoryKV()),
    )

    def fake_post(url, data, timeout=30.0):
        assert url == auth_mod.TOKEN_ENDPOINT
        assert data["code"] == "good-code"
        assert data["client_id"] == "client-123"
        return 200, {
            "access_token": "at-1",
            "refresh_token": "rt-1",
            "expires_in": 3600,
        }

    def fake_get(url, headers, timeout=30.0):
        assert headers["Authorization"] == "Bearer at-1"
        return 200, {
            "id": "u-77", "email": "alice@example.com",
            "name": "Alice", "picture": "https://p/x.png",
        }

    # build app but swap in the hermetic auth blueprint
    app = create_app(services, secret_key="test")
    app.routes = [r for r in app.routes]  # routes already registered
    # rebuild with fake transports: simplest is to register a fresh app
    from audio_processor_tpu.server.web import App, Blueprint
    from audio_processor_tpu.server.api import make_api_blueprint
    from audio_processor_tpu.server.app import STATIC_DIR, TEMPLATE_DIR, render

    app2 = App(secret_key="test", static_dir=STATIC_DIR, template_dir=TEMPLATE_DIR)
    app2.register_blueprint(
        auth_mod.make_auth_blueprint(services, post=fake_post, get=fake_get)
    )
    main_bp = Blueprint("main")

    @main_bp.route("/")
    def index(request):
        return render("index.html")

    app2.register_blueprint(main_bp)
    app2.register_blueprint(make_api_blueprint(services))
    yield app2, services
    engine.shutdown(wait=False)


def _cookie_of(headers):
    return headers.get("Set-Cookie", [""])[0].split(";")[0]


def test_index_login_callback_pages(app_and_services):
    app, _ = app_and_services
    status, body, _ = call_app(app, "GET", "/")
    assert status == 200 and b"Audio Processor" in body
    status, body, _ = call_app(app, "GET", "/login")
    assert status == 200 and b"Sign in with Google" in body
    status, body, _ = call_app(app, "GET", "/callback")
    assert status == 200 and b"Completing sign-in" in body


def test_static_serving_and_traversal_guard(app_and_services):
    app, _ = app_and_services
    status, body, headers = call_app(app, "GET", "/static/css/style.css")
    assert status == 200 and b"--accent" in body
    assert "text/css" in headers["Content-Type"][0]
    status, _, _ = call_app(app, "GET", "/static/../__init__.py")
    assert status in (403, 404)


def test_auth_google_redirects_with_state(app_and_services):
    app, _ = app_and_services
    status, _, headers = call_app(
        app, "GET", "/api/auth/google", headers={"Host": "example.com"}
    )
    assert status == 302
    loc = headers["Location"][0]
    assert loc.startswith(auth_mod.AUTH_ENDPOINT)
    assert "client_id=client-123" in loc
    assert "state=" in loc
    assert "redirect_uri=http%3A%2F%2Fexample.com%2Fcallback" in loc


def test_full_token_login_flow(app_and_services):
    import urllib.parse as up

    app, services = app_and_services
    # start the flow: the session records flow_state + redirect_uri
    status, _, h0 = call_app(
        app, "GET", "/api/auth/google", headers={"Host": "example.com"}
    )
    assert status == 302
    state = up.parse_qs(up.urlsplit(h0["Location"][0]).query)["state"][0]
    flow_cookie = _cookie_of(h0)

    # login-CSRF hardening: the exchange REQUIRES the flow's state — a
    # missing or wrong state (or a session that never started a flow)
    # must be rejected, not silently accepted
    status, data, _ = call_app(
        app, "POST", "/api/auth/token", body={"code": "good-code"},
        headers={"Cookie": flow_cookie},
    )
    assert status == 400
    status, data, _ = call_app(
        app, "POST", "/api/auth/token",
        body={"code": "good-code", "state": state},
    )
    assert status == 400  # no session -> no flow_state -> rejected

    # JS-driven exchange (callback.html path) with the proper state
    status, data, headers = call_app(
        app, "POST", "/api/auth/token",
        body={"code": "good-code", "state": state},
        headers={"Cookie": flow_cookie, "Host": "example.com"},
    )
    assert status == 200 and data["success"]
    assert data["user"]["email"] == "alice@example.com"
    cookie = _cookie_of(headers)

    # credentials persisted with the reference's key scheme
    stored = services.credential_store.load_credentials_dict("u-77")
    assert stored["token"] == "at-1" and stored["refresh_token"] == "rt-1"

    # status + userinfo with the session cookie
    status, data, _ = call_app(app, "GET", "/api/auth/status", headers={"Cookie": cookie})
    assert data["authenticated"] is True
    status, data, _ = call_app(app, "GET", "/api/auth/userinfo", headers={"Cookie": cookie})
    assert data["user"]["name"] == "Alice"

    # logout clears the store + THIS user's drive client (per-user model)
    services.oauth_drives["u-77"] = object()
    status, data, headers2 = call_app(
        app, "POST", "/api/auth/logout", headers={"Cookie": cookie}
    )
    assert data["success"]
    assert services.credential_store.load_credentials_dict("u-77") is None
    assert services.drive_for("u-77") is None


def test_token_endpoint_validation(app_and_services):
    app, _ = app_and_services
    status, data, _ = call_app(app, "POST", "/api/auth/token", body={})
    assert status == 400
    status, data, _ = call_app(
        app, "POST", "/api/auth/token", body={"code": "bad"},
    )
    assert status == 400  # fake_post asserts 'good-code'; failure surfaces as 400


def test_userinfo_requires_auth(app_and_services):
    app, _ = app_and_services
    status, data, _ = call_app(app, "GET", "/api/auth/userinfo")
    assert status == 401


def test_external_url_rewrite(app_and_services, monkeypatch):
    app, _ = app_and_services
    monkeypatch.setenv("EXTERNAL_URL", "https://meet.example.org")
    status, _, headers = call_app(
        app, "GET", "/api/auth/google", headers={"Host": "localhost:5000"}
    )
    loc = headers["Location"][0]
    assert "redirect_uri=https%3A%2F%2Fmeet.example.org%2Fcallback" in loc


def test_callback_error_param_cannot_split_headers(app_and_services):
    """A crafted ?error= with URL-encoded CRLF must not inject headers into
    the redirect (parse_qs decodes %0d%0a to raw CRLF; wsgiref writes header
    values verbatim) and must ride the Location re-encoded."""
    app, _ = app_and_services
    status, _, headers = call_app(
        app, "GET", "/api/auth/callback",
        query="error=denied%0d%0aSet-Cookie:%20evil%3D1",
    )
    assert status == 302
    assert "evil" not in str(headers.get("Set-Cookie", ""))
    loc = headers["Location"][0]
    assert "\r" not in loc and "\n" not in loc
    assert loc.startswith("/login?error=denied")


def test_callback_rejects_missing_state(app_and_services):
    """Login CSRF: a fresh session has no flow_state, and an attacker-
    initiated code with NO state param must not pass the state check
    (None == None used to compare equal — the same hard check
    /api/auth/token already had)."""
    app, _ = app_and_services
    status, data, _ = call_app(
        app, "GET", "/api/auth/callback", query="code=good-code"
    )
    assert status == 400
    assert "State" in data["error"]


def test_logout_is_post_only(app_and_services):
    """Logout deletes stored refresh tokens; SameSite=Lax cookies ride
    top-level GET navigations, so GET logout = cross-site forced logout."""
    app, _ = app_and_services
    status, _, _ = call_app(app, "GET", "/api/auth/logout")
    assert status == 405
    status, _, _ = call_app(app, "POST", "/api/auth/logout")
    assert status == 200


def test_job_api_scoped_to_owner(app_and_services):
    """Another user's session must not read a job's transcript/result —
    jobs carry user_id, and foreign jobs 404 across every read surface
    (the reference leaks all jobs to all callers)."""
    app, services = app_and_services
    engine = services.engine
    engine.create_job("owned", user_id="u-77", file_name="secret.m4a")
    engine.store.update("owned", status="completed",
                        result={"segments": ["private"]})
    engine.create_job("ownerless")

    # anonymous caller: ownerless visible, owned invisible
    status, data, _ = call_app(app, "GET", "/api/job/owned")
    assert status == 404
    status, data, _ = call_app(app, "GET", "/api/jobs/owned/result")
    assert status == 404
    status, data, _ = call_app(app, "POST", "/api/job/owned/cancel")
    assert status == 404
    status, data, _ = call_app(app, "GET", "/api/jobs", query="filter=all")
    assert set(data["active_jobs"]) == {"ownerless"}
    status, data, _ = call_app(
        app, "POST", "/api/jobs/status/batch",
        body={"job_ids": ["owned", "ownerless"]},
    )
    assert set(data["jobs"]) == {"ownerless"}

    # the owner's session sees it (log in as u-77 via the token flow)
    status, _, h = call_app(app, "GET", "/api/auth/google")
    cookie = _cookie_of(h)
    import urllib.parse as up

    state = up.parse_qs(up.urlsplit(h["Location"][0]).query)["state"][0]
    status, data, h2 = call_app(
        app, "POST", "/api/auth/token",
        body={"code": "good-code", "state": state},
        headers={"Cookie": cookie},
    )
    assert status == 200 and data["success"]
    cookie = _cookie_of(h2) or cookie
    status, data, _ = call_app(
        app, "GET", "/api/job/owned", headers={"Cookie": cookie}
    )
    assert status == 200 and data["job"]["id"] == "owned"
    status, data, _ = call_app(
        app, "GET", "/api/jobs/owned/result", headers={"Cookie": cookie}
    )
    assert status == 200 and data["result"]["segments"] == ["private"]


def test_job_scoping_env_escape(app_and_services, monkeypatch):
    """APTPU_SCOPE_JOBS_TO_USER=0 restores the reference posture."""
    app, services = app_and_services
    services.engine.create_job("owned2", user_id="someone-else")
    monkeypatch.setenv("APTPU_SCOPE_JOBS_TO_USER", "0")
    status, data, _ = call_app(app, "GET", "/api/job/owned2")
    assert status == 200


def test_process_rejects_non_string_file_id(app_and_services):
    app, _ = app_and_services
    status, data, _ = call_app(
        app, "POST", "/api/process", body={"file_id": {"a": 1}}
    )
    assert status == 400
    assert "string" in data["error"]


def test_batch_status_rejects_non_string_ids(app_and_services):
    app, _ = app_and_services
    status, data, _ = call_app(
        app, "POST", "/api/jobs/status/batch", body={"job_ids": [["x"]]}
    )
    assert status == 400


def test_jobs_filter_accepts_cancelled(app_and_services):
    app, services = app_and_services
    services.engine.create_job("c1")
    services.engine.store.update("c1", status="cancelled")
    status, data, _ = call_app(app, "GET", "/api/jobs", query="filter=cancelled")
    assert status == 200
    assert set(data["active_jobs"]) == {"c1"}
