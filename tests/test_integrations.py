"""Integration-layer tests with fake transports (hermetic, no network)."""
import json
import zlib

import numpy as np
import pytest

from audio_processor_tpu.integrations import (
    credentials as cred_lib,
    drive as drive_lib,
    gemini as gemini_lib,
    notion as notion_lib,
    notion_formatter as nf,
    pdf as pdf_lib,
)


# --- gemini ----------------------------------------------------------------

def _gemini_response(text):
    return {"candidates": [{"content": {"parts": [{"text": text}]}}]}


def test_gemini_ladder_skips_quota():
    calls = []

    def http(url, headers, payload, timeout):
        calls.append(url)
        assert headers["x-goog-api-key"] == "k"  # key in the HEADER,
        assert "key=" not in url  # never the URL (it leaks into logs)
        if "gemini-2.5-pro" in url:
            return 429, {"error": {"message": "Resource exhausted"}}
        return 200, _gemini_response("ok!")

    c = gemini_lib.GeminiClient(
        api_key="k", models=gemini_lib.REFERENCE_MODELS, http=http
    )
    assert c.generate("hi") == "ok!"
    assert len(calls) == 2  # first model skipped on quota


def test_gemini_models_env_override(monkeypatch):
    monkeypatch.setenv("GEMINI_MODELS", "my-model-a, my-model-b")
    c = gemini_lib.GeminiClient(api_key="k", http=lambda *a: (200, {}))
    assert c.models == ("my-model-a", "my-model-b")


def test_gemini_hard_error_raises():
    def http(url, headers, payload, timeout):
        return 400, {"error": {"message": "Invalid request"}}

    c = gemini_lib.GeminiClient(api_key="k", http=http)
    with pytest.raises(gemini_lib.GeminiError):
        c.generate("hi")


def test_gemini_all_exhausted():
    def http(url, headers, payload, timeout):
        return 429, {"error": {"message": "quota"}}

    c = gemini_lib.GeminiClient(api_key="k", http=http)
    with pytest.raises(gemini_lib.QuotaExhausted):
        c.generate("hi")


def test_extract_json_object_nested_and_fenced():
    text = 'Sure! ```json\n{"a": {"b": [1, 2]}, "c": "x}y"}\n``` done'
    assert gemini_lib.extract_json_object(text) == {"a": {"b": [1, 2]}, "c": "x}y"}
    # the reference's non-greedy regex would truncate this nested object
    assert gemini_lib.extract_json_object('noise {"k": {"n": 1}} tail') == {"k": {"n": 1}}
    assert gemini_lib.extract_json_object("no json here") is None


def test_identify_speakers_full_flow():
    def http(url, headers, payload, timeout):
        return 200, _gemini_response('{"SPEAKER_00": "Alice", "SPEAKER_01": ""}')

    c = gemini_lib.GeminiClient(api_key="k", http=http)
    segs = [
        {"speaker": "SPEAKER_00", "text": "hi I am Alice"},
        {"speaker": "SPEAKER_01", "text": "hello"},
    ]
    out = c.identify_speakers(segs)
    assert out == {"SPEAKER_00": "Alice", "SPEAKER_01": "SPEAKER_01"}


def test_identify_speakers_failure_returns_identity():
    def http(url, headers, payload, timeout):
        raise ConnectionError("down")

    c = gemini_lib.GeminiClient(api_key="k", http=http)
    out = c.identify_speakers([{"speaker": "SPEAKER_00", "text": "x"}])
    assert out == {"SPEAKER_00": "SPEAKER_00"}


def test_generate_summary_defaults_without_key():
    c = gemini_lib.GeminiClient(api_key="", http=lambda *a: (_ for _ in ()).throw(RuntimeError))
    out = c.generate_summary("transcript")
    assert out["title"] == "Meeting Notes"
    assert out["todos"] == []


# --- notion formatter ------------------------------------------------------

def test_markdown_blocks_full_surface():
    md = "\n".join(
        [
            "# Big title",
            "#### Deep heading",
            "Some **bold** and *italic* and `code` and [link](https://x.com).",
            "- [ ] open task",
            "- [x] done task",
            "- bullet",
            "1. first",
            "2) second",
            "> quoted",
            "> more quote",
            "---",
            "```python",
            "print('hi')",
            "```",
            "| A | B |",
            "|---|---|",
            "| 1 | 2 |",
        ]
    )
    blocks = nf.markdown_to_blocks(md)
    types = [b["type"] for b in blocks]
    assert types == [
        "heading_1", "heading_3", "paragraph", "to_do", "to_do",
        "bulleted_list_item", "numbered_list_item", "numbered_list_item",
        "quote", "divider", "code", "table",
    ]
    assert blocks[3]["to_do"]["checked"] is False
    assert blocks[4]["to_do"]["checked"] is True
    assert blocks[10]["code"]["language"] == "python"
    table = blocks[11]["table"]
    assert table["table_width"] == 2 and table["has_column_header"] is True


def test_inline_formatting_annotations():
    rt = nf.rich_text("a **b** *c* ~~d~~ `e` [f](https://g)")
    kinds = [
        (o["text"]["content"], o.get("annotations"), o["text"].get("link"))
        for o in rt
    ]
    assert ("b", {"bold": True}, None) in kinds
    assert ("c", {"italic": True}, None) in kinds
    assert ("d", {"strikethrough": True}, None) in kinds
    assert ("e", {"code": True}, None) in kinds
    assert ("f", None, {"url": "https://g"}) in kinds


def test_transcript_split_respects_limit():
    transcript = "\n".join(f"line {i} " + "x" * 50 for i in range(200))
    blocks = nf.split_transcript_into_blocks(transcript)
    assert len(blocks) > 1
    for b in blocks:
        assert len(b["paragraph"]["rich_text"][0]["text"]["content"]) <= nf.MAX_TEXT_LEN
    # content is preserved
    joined = "\n".join(
        b["paragraph"]["rich_text"][0]["text"]["content"] for b in blocks
    )
    assert joined.replace("\n", "") == transcript.replace("\n", "")


def test_batch_blocks():
    blocks = [{"i": i} for i in range(200)]
    batches = nf.batch_blocks(blocks)
    assert [len(b) for b in batches] == [90, 90, 20]


def test_markdown_unclosed_fence_does_not_crash():
    blocks = nf.markdown_to_blocks("```python\nprint('x')\n# no closing fence")
    assert blocks[0]["type"] == "code"
    assert "print" in blocks[0]["code"]["rich_text"][0]["text"]["content"]


def test_gemini_summary_includes_attachment_context():
    seen = {}

    def http(url, headers, payload, timeout):
        seen["prompt"] = payload["contents"][0]["parts"][0]["text"]
        return 200, _gemini_response('{"title": "T", "summary": "S", "todos": []}')

    c = gemini_lib.GeminiClient(api_key="k", http=http)
    c.generate_summary("the transcript", attachment_text="SPEC-42 design doc")
    assert "SPEC-42 design doc" in seen["prompt"]
    assert "the transcript" in seen["prompt"]


# --- notion client ---------------------------------------------------------

def test_notion_create_page_batches():
    requests_seen = []

    def http(method, url, headers, payload, timeout):
        requests_seen.append((method, url, payload))
        if method == "POST":
            assert len(payload["children"]) <= 100
            return 200, {"id": "page-1", "url": "https://notion.so/page-1"}
        assert len(payload["children"]) <= 90
        return 200, {}

    c = notion_lib.NotionClient(
        token="t", database_id="db", http=http, batch_pause_s=0.0
    )
    segments = [
        {"speaker": "SPEAKER_00", "start": float(i), "end": i + 1.0, "text": "word " * 40}
        for i in range(300)
    ]
    page_id, url = c.create_meeting_page(
        "Weekly sync", "A summary", ["do x"], segments, {"SPEAKER_00": "Alice"},
        comprehensive_notes="# Notes\n- a\n- b",
        date_str="2025-06-17",
    )
    assert page_id == "page-1"
    post = requests_seen[0]
    assert post[2]["properties"]["title"]["title"][0]["text"]["content"] == "[2025-06-17] Weekly sync"
    assert len(requests_seen) > 1  # transcript forced PATCH batches


def test_notion_auth_error_short_circuits():
    calls = []

    def http(method, url, headers, payload, timeout):
        calls.append(1)
        return 401, {"message": "unauthorized"}

    c = notion_lib.NotionClient(token="t", database_id="db", http=http, batch_pause_s=0)
    with pytest.raises(notion_lib.NotionAuthError):
        c.create_meeting_page("t", "s", [], [], {})
    assert len(calls) == 1  # no retries on 401


def test_notion_retries_then_succeeds():
    state = {"n": 0}

    def http(method, url, headers, payload, timeout):
        state["n"] += 1
        if state["n"] < 3:
            return 500, {"message": "boom"}
        return 200, {"id": "p", "url": "u"}

    c = notion_lib.NotionClient(token="t", database_id="db", http=http, batch_pause_s=0)
    body = c._request("POST", "x", {})
    assert body["id"] == "p" and state["n"] == 3


# --- drive -----------------------------------------------------------------

class FakeDriveTransport:
    def __init__(self):
        self.files = {
            "f1": {"id": "f1", "name": "REC_20250617_090000.m4a", "mimeType": "audio/mp4",
                   "size": "1234", "parents": ["folder1"]},
            "folder1": {"id": "folder1", "name": "WearNote_Recordings",
                        "mimeType": "application/vnd.google-apps.folder", "parents": []},
        }
        self.content = {"f1": b"AUDForDriveBytes" * 100}
        self.renames = []

    def __call__(self, method, url, headers, params=None, body=None, timeout=120.0):
        params = params or {}
        if method == "GET" and url.endswith("/files"):
            q = params.get("q", "")
            if "mimeType = 'application/vnd.google-apps.folder'" in q:
                name = q.split("name = '")[1].split("'")[0]
                found = [f for f in self.files.values() if f["name"] == name]
            elif "audio/" in q:
                found = [f for f in self.files.values() if "audio" in f["mimeType"]]
            else:
                found = []
            return 200, {}, json.dumps({"files": found}).encode()
        if method == "GET" and "/files/" in url:
            fid = url.rsplit("/", 1)[1]
            if params.get("alt") == "media":
                data = self.content[fid]
                rng = headers.get("Range", "")
                if rng:
                    lo, hi = rng.split("=")[1].split("-")
                    piece = data[int(lo) : int(hi) + 1]
                    return 206, {"Content-Range": f"bytes {lo}-{hi}/{len(data)}"}, piece
                return 200, {}, data
            return 200, {}, json.dumps(self.files[fid]).encode()
        if method == "PATCH":
            fid = url.rsplit("/", 1)[1]
            self.renames.append((fid, body["name"]))
            self.files[fid]["name"] = body["name"]
            return 200, {}, json.dumps(self.files[fid]).encode()
        return 404, {}, b"{}"


def test_drive_list_metadata_download_rename(tmp_path):
    transport = FakeDriveTransport()
    d = drive_lib.DriveClient(token_provider=lambda: "tok", transport=transport)
    files = d.list_files("trashed = false and mimeType contains 'audio/'")
    assert files[0]["id"] == "f1"
    meta = d.get_metadata("f1")
    assert meta["name"].startswith("REC_")
    dest = str(tmp_path / "out.bin")
    d.download("f1", dest)
    with open(dest, "rb") as f:
        assert f.read() == transport.content["f1"]
    d.rename("f1", "[2025-06-17] Standup.m4a")
    assert transport.renames == [("f1", "[2025-06-17] Standup.m4a")]
    assert d.find_folder_id_by_path("WearNote_Recordings") == "folder1"
    assert d.find_folder_id_by_path("Nope") is None


def test_sanitize_filename():
    assert drive_lib.sanitize_filename('a/b\\c:d*e?f"g<h>i|j') == "a_b_c_d_e_f_g_h_i_j"
    assert drive_lib.sanitize_filename("  ") == "untitled"


# --- pdf -------------------------------------------------------------------

def _make_pdf(text: str) -> bytes:
    content = f"BT /F1 12 Tf 72 700 Td ({text}) Tj ET".encode()
    compressed = zlib.compress(content)
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(compressed)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + compressed
        + b"\nendstream\nendobj\ntrailer\n<<>>\n%%EOF"
    )


def test_pdf_extracts_flate_text():
    pdf = _make_pdf("Hello PDF world")
    assert "Hello PDF world" in pdf_lib.extract_text(pdf)


def test_pdf_tj_array_and_escapes():
    content = b"BT [(Part) -250 (one\\(escaped\\))] TJ ET"
    pdf = (
        b"%PDF-1.4\nstream\n" + content + b"\nendstream\ntrailer"
    )
    text = pdf_lib.extract_text(pdf)
    assert "Part" in text and "one(escaped)" in text


def test_pdf_garbage_is_empty():
    assert pdf_lib.extract_text(b"not a pdf") == ""


# --- credentials -----------------------------------------------------------

def test_credential_roundtrip_and_ttl():
    store = cred_lib.CredentialStore(kv=cred_lib.MemoryKV(), ttl_s=3600)
    data = {
        "token": "tok",
        "refresh_token": "ref",
        "token_uri": "https://oauth2.googleapis.com/token",
        "client_id": "cid",
        "client_secret": "sec",
        "scopes": ["email"],
        "expiry": "2099-01-01T00:00:00",
    }
    store.save_credentials("user1", data)
    creds = store.load_credentials("user1")
    assert creds.token == "tok" and creds.refresh_token == "ref"
    assert creds.expiry.year == 2099
    assert store.get_valid_credentials("user1") is not None

    store.delete_credentials("user1")
    assert store.load_credentials("user1") is None
    assert store.load_credentials("ghost") is None


def test_credential_sqlite_backend(tmp_path):
    kv = cred_lib.SqliteKV(str(tmp_path / "kv.db"))
    kv.set("k", "v", 3600)
    assert kv.get("k") == "v"
    kv.expire("k", 7200)
    kv.delete("k")
    assert kv.get("k") is None


def test_gemini_ladder_skips_retired_model():
    """A RETIRED preview model (HTTP 404) must not kill the whole ladder
    — stable fallbacks lower down still serve (deliberate divergence from
    the reference's raise-on-other-errors, which died the day Google
    retired its experimental endpoint)."""
    calls = []

    def http(url, headers, payload, timeout):
        calls.append(url)
        if "gemini-2.5" in url:
            return 404, {"error": {"message": "model not found"}}
        return 200, _gemini_response("alive")

    c = gemini_lib.GeminiClient(
        api_key="k", models=gemini_lib.REFERENCE_MODELS, http=http
    )
    assert c.generate("hi") == "alive"
    assert len(calls) >= 2
    # genuinely invalid requests still raise immediately
    c2 = gemini_lib.GeminiClient(
        api_key="k", http=lambda u, h, p, t: (400, {"error": {"message": "bad"}})
    )
    with pytest.raises(gemini_lib.GeminiError):
        c2.generate("hi")


def test_identify_speakers_samples_whole_meeting():
    """Ceiling-division stride: 31..59 segments must still sample the
    BACK half of the meeting (floor gave stride 1 = first 30 only —
    the exact reference defect this module documents fixing)."""
    seen = {}

    def http(url, headers, payload, timeout):
        seen["prompt"] = payload["contents"][0]["parts"][0]["text"]
        return 200, _gemini_response('{"SPEAKER_01": "Zed"}')

    c = gemini_lib.GeminiClient(api_key="k", http=http)
    segments = [
        {"speaker": "SPEAKER_00", "text": f"early {i}"} for i in range(40)
    ] + [{"speaker": "SPEAKER_01", "text": f"late {i}"} for i in range(19)]
    out = c.identify_speakers(segments, max_samples=30)
    assert "late" in seen["prompt"], "late speakers never reached the prompt"
    assert out["SPEAKER_01"] == "Zed"


def test_notion_header_overflow_spills_to_batches():
    """A todo-heavy meeting whose header alone nears the per-request cap
    must spill into PATCH batches instead of overstuffing the page-create
    call (head_room used to go negative and put everything in one 400)."""
    posts = []

    def http(method, url, headers, payload, timeout):
        if method == "POST":
            posts.append(payload)
            assert len(payload["children"]) <= 100
            return 200, {"id": "p", "url": "u"}
        assert len(payload["children"]) <= 90
        return 200, {}

    c = notion_lib.NotionClient(
        token="t", database_id="db", http=http, batch_pause_s=0.0
    )
    c.create_meeting_page(
        "T", "s", [f"todo {i}" for i in range(120)], [], {},
        comprehensive_notes="\n".join(f"- note {i}" for i in range(50)),
        date_str="2025-06-17",
    )
    assert posts, "page never created"


def test_drive_download_retries_transient_errors(tmp_path):
    """One 429 mid-download must not abort a multi-chunk file; headers are
    re-minted per attempt so token refresh mid-download keeps working."""
    inner = FakeDriveTransport()
    state = {"fails": 1, "tokens": []}

    def flaky(method, url, headers, params=None, body=None, timeout=120.0):
        if params and params.get("alt") == "media":
            state["tokens"].append(headers["Authorization"])
            if state["fails"]:
                state["fails"] -= 1
                return 429, {}, b""
        return inner(method, url, headers, params, body, timeout)

    counter = {"n": 0}

    def token():
        counter["n"] += 1
        return f"tok{counter['n']}"

    import time as _t
    d = drive_lib.DriveClient(token_provider=token, transport=flaky)
    orig_sleep = _t.sleep
    _t.sleep = lambda s: None  # no real backoff waits in tests
    try:
        dest = str(tmp_path / "o.bin")
        d.download("f1", dest)
    finally:
        _t.sleep = orig_sleep
    with open(dest, "rb") as f:
        assert f.read() == inner.content["f1"]
    # the retried attempt minted a FRESH Authorization header
    assert len(set(state["tokens"])) >= 2


def test_identify_speakers_honors_model_override():
    """identify_speakers must use the flash subset of the CONFIGURED
    ladder — the module-level FLASH_MODELS default ignored a
    GEMINI_MODELS / constructor override, so a user whose default models
    were retired silently lost all speaker names."""
    calls = []

    def http(url, headers, payload, timeout):
        calls.append(url)
        return 200, _gemini_response('{"SPEAKER_00": "Alice"}')

    c = gemini_lib.GeminiClient(
        api_key="k", models=("custom-flash-x", "custom-pro-y"), http=http
    )
    segs = [{"speaker": "SPEAKER_00", "text": "hi"}]
    out = c.identify_speakers(segs)
    assert out == {"SPEAKER_00": "Alice"}
    assert "custom-flash-x" in calls[0]
    # no flash model configured -> full configured ladder, never defaults
    calls.clear()
    c2 = gemini_lib.GeminiClient(api_key="k", models=("only-pro",), http=http)
    c2.identify_speakers(segs)
    assert "only-pro" in calls[0]


def test_underscore_emphasis_skips_snake_case():
    """CommonMark's no-intraword-underscore rule: snake_case identifiers
    survive; flanked _italics_ still annotate."""
    objs = nf.rich_text("rename speaker_map to file_id now")
    assert len(objs) == 1  # untouched plain run
    assert objs[0]["text"]["content"] == "rename speaker_map to file_id now"
    objs = nf.rich_text("really _important_ point")
    kinds = [(o["text"]["content"], o.get("annotations")) for o in objs]
    assert ("important", {"italic": True}) in kinds


def test_code_fence_splits_long_content():
    """>2000-char fenced code splits into multiple <=2000-char text
    objects instead of silently truncating."""
    code = "x = 1\n" * 600  # 3600 chars
    blocks = nf.markdown_to_blocks(f"```python\n{code}```")
    cb = [b for b in blocks if b["type"] == "code"][0]
    texts = [t["text"]["content"] for t in cb["code"]["rich_text"]]
    assert all(len(t) <= 2000 for t in texts)
    assert "".join(texts) == code.rstrip("\n") or "".join(texts) == code


def test_batch_blocks_weighs_nested_children():
    """A transcript toggle carries up to 90 children: batches bound the
    TOTAL carried blocks, and an oversized single block ships alone."""
    light = [{"object": "block", "type": "paragraph",
              "paragraph": {"rich_text": []}} for _ in range(4)]
    heavy = {
        "object": "block", "type": "toggle",
        "toggle": {"rich_text": [], "children": [
            {"object": "block", "type": "paragraph",
             "paragraph": {"rich_text": []}} for _ in range(89)
        ]},
    }
    batches = nf.batch_blocks(light[:2] + [heavy] + light[2:], batch_size=90)
    # the toggle (weight 90) cannot share a batch with anything
    assert [len(b) for b in batches] == [2, 1, 2]
    assert batches[1][0]["type"] == "toggle"
    # pure-light lists still pack densely
    assert [len(b) for b in nf.batch_blocks(light, batch_size=90)] == [4]


def test_drive_zero_byte_file_downloads_empty(tmp_path):
    """A 0-byte Drive file answers 416 to the first Range request; that is
    a valid empty file, not an error."""
    transport = FakeDriveTransport()
    transport.files["empty"] = {"id": "empty", "name": "empty.m4a",
                                "mimeType": "audio/mp4", "size": "0"}
    transport.content["empty"] = b""
    orig = transport.__call__

    def call(method, url, headers, params=None, body=None, timeout=120.0):
        if "empty" in url and (params or {}).get("alt") == "media" \
                and headers.get("Range"):
            return 416, {}, b""
        return orig(method, url, headers, params, body, timeout)

    transport.__call__ = call  # instance attr shadows for our use
    d = drive_lib.DriveClient(token_provider=lambda: "tok", transport=call)
    dest = str(tmp_path / "empty.m4a")
    assert d.download("empty", dest) == dest
    assert open(dest, "rb").read() == b""


def test_drive_query_escapes_backslashes():
    seen = []

    def call(method, url, headers, params=None, body=None, timeout=120.0):
        seen.append((params or {}).get("q", ""))
        return 200, {}, json.dumps({"files": [{"id": "x"}]}).encode()

    d = drive_lib.DriveClient(token_provider=lambda: "tok", transport=call)
    d.find_folder_id_by_path("Q3\\Reports'2026")
    assert "Q3\\\\Reports\\'2026" in seen[0]


def test_expired_unrefreshable_credentials_return_none(tmp_path):
    """Expired credentials with no refresh_token are dead: returning them
    marked sessions authenticated and 401'd every Drive call."""
    from datetime import datetime, timedelta

    from google.oauth2.credentials import Credentials

    store = cred_lib.CredentialStore(kv=cred_lib.MemoryKV())
    creds = Credentials(
        token="t", refresh_token=None, token_uri="u",
        client_id="c", client_secret="s", scopes=["x"],
    )
    creds.expiry = datetime.utcnow() - timedelta(hours=1)
    store.save_credentials("u1", creds)
    assert store.get_valid_credentials("u1") is None
    # still-valid-but-inside-OUR-margin unrefreshable creds remain usable
    # (past our 300 s refresh margin but before google-auth's own ~210 s
    # expiry skew threshold)
    creds.expiry = datetime.utcnow() + timedelta(seconds=280)
    store.save_credentials("u2", creds)
    got = store.get_valid_credentials("u2")
    assert got is not None and got.token == "t"


def test_make_kv_parses_redis_auth_url(monkeypatch):
    """redis://:password@host:port/db must parse (it used to crash on
    int('secret@host:6379')); connection failure falls through to the
    caller as a redis error, not a ValueError."""
    from audio_processor_tpu.integrations import credentials as cred_lib

    captured = {}

    class FakeRedis:
        def __init__(self, **kw):
            captured.update(kw)

        def ping(self):
            return True

    import sys
    import types

    fake_mod = types.SimpleNamespace(Redis=lambda **kw: FakeRedis(**kw))
    monkeypatch.setitem(sys.modules, "redis", fake_mod)
    kv = cred_lib.make_kv("redis://:sekrit@redis-host:6380/2")
    assert kv is not None
    assert captured["host"] == "redis-host"
    assert captured["port"] == 6380
    assert captured["db"] == 2
    assert captured["password"] == "sekrit"
