"""Round-11 advice fixes, each pinned by a test:

1. the substring-window fingerprint's second xxhash64 pass puts its
   constant FIRST (seed-prefix position): Spark folds multi-arg
   xxhash64 left-to-right with the running hash as the next seed, so
   the r11 form ``xxhash64(s, C)`` made b a deterministic function of
   a (64-bit, not 128-bit, collision resistance);
2. the WebUI connector POST endpoints (connect / finalize / test) are
   sid-gated like the rule mutations — the reference gates every
   data.py route with cache_oauth_connection;
3. ``serve_webui`` binds loopback by default and raises on a requested
   connector module that doesn't look like a connector, instead of
   silently dropping it from the UI;
4. the SPA attaches list-item navigation via data attributes +
   addEventListener — no rule/connector name ever lands inside an
   inline onclick JS string (encodeURIComponent leaves ' ( )
   unescaped);
5. ``_gif_frames`` raises ValueError (the decoder-wide malformed-input
   contract) on truncated streams, not bare IndexError.
"""

from __future__ import annotations

import inspect
import io
import json
import re

import numpy as np
import pytest

import snowalert_spark.functions.multimodal as M
from snowalert_spark.rules import RuleRegistry
from snowalert_spark.webui import WebApi
from test_gif import build_gif


# ---- 1. fingerprint second hash is seed-prefixed ----------------------

def test_window_fingerprint_constant_is_seed_prefix():
    import snowalert_spark.functions.dedup as D

    src = inspect.getsource(D._window_fingerprints)
    assert "xxhash64(1065353216L, p.s)" in src, (
        "second fingerprint pass must put the constant first — "
        "xxhash64(s, C) is XXH64(C, seed=xxhash64(s)), a function of "
        "the first pass"
    )
    assert "xxhash64(p.s, 1065353216L)" not in src


def test_window_fingerprint_b_not_old_chained_form(spark):
    """The new b differs from the r11 chained form on real data, and
    a/b still agree across duplicate windows (grouping still works)."""
    row = spark.sql(
        "SELECT xxhash64(1065353216L, 'boilerplate') AS new_b, "
        "       xxhash64('boilerplate', 1065353216L) AS old_b, "
        "       xxhash64('boilerplate') AS a"
    ).collect()[0]
    assert row.new_b != row.old_b
    assert row.new_b != row.a


# ---- 2. connector endpoints sid-gated ---------------------------------

SECRET = "s3cret"


class _RecordingConnector:
    """fake connector module recording every entry point hit"""

    CONNECTION_OPTIONS = [{"name": "subdomain", "required": True}]
    calls: list = []

    @staticmethod
    def connect(name, options):
        _RecordingConnector.calls.append(("connect", name))
        return {"newStage": "finalized"}

    @staticmethod
    def finalize(name):
        _RecordingConnector.calls.append(("finalize", name))
        return {}

    @staticmethod
    def test(name):
        _RecordingConnector.calls.append(("test", name))
        yield {"ok": True}


def _call(app, method, path, body=None, sid=SECRET):
    raw = json.dumps(body).encode() if body is not None else b""
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": "",
        "CONTENT_LENGTH": str(len(raw)),
        "HTTP_COOKIE": f"sid={sid}" if sid is not None else "",
        "wsgi.input": io.BytesIO(raw),
    }
    status = {}
    out = b"".join(app(environ, lambda s, h: status.update(code=s)))
    return json.loads(out)


@pytest.mark.parametrize("sid", [None, "", "wrong"])
def test_connector_endpoints_reject_bad_sid(sid):
    _RecordingConnector.calls = []
    app = WebApi(RuleRegistry(), secret=SECRET,
                 connectors={"rec": _RecordingConnector})
    for method, path, body in [
        ("POST", "/api/sa/data/connectors/rec/default",
         {"subdomain": "acme"}),
        ("POST", "/api/sa/data/connectors/rec/default/finalize", {}),
        ("POST", "/api/sa/data/connectors/rec/default/test", {}),
    ]:
        out = _call(app, method, path, body, sid=sid)
        assert out["success"] is False, (method, path, out)
    assert _RecordingConnector.calls == [], (
        "a bad sid must not reach the connector module at all"
    )


def test_connector_endpoints_work_with_good_sid():
    _RecordingConnector.calls = []
    app = WebApi(RuleRegistry(), secret=SECRET,
                 connectors={"rec": _RecordingConnector})
    out = _call(app, "POST", "/api/sa/data/connectors/rec/default",
                {"subdomain": "acme"})
    assert out["success"] is True
    out = _call(app, "POST",
                "/api/sa/data/connectors/rec/default/finalize", {})
    assert out["success"] is True
    out = _call(app, "POST", "/api/sa/data/connectors/rec/default/test", {})
    assert out["success"] is True and out["results"] == [{"ok": True}]
    assert [c[0] for c in _RecordingConnector.calls] == [
        "connect", "finalize", "test"]


# ---- 3. serve_webui defaults + connector shape check ------------------

def test_serve_webui_binds_loopback_by_default():
    from snowalert_spark.run import serve_webui

    assert inspect.signature(serve_webui).parameters["host"].default == \
        "127.0.0.1"
    # the CLI flag mirrors the function default
    import snowalert_spark.run as R

    assert '"--host", default="127.0.0.1"' in inspect.getsource(R.main)


def test_serve_webui_raises_on_non_connector_module():
    from snowalert_spark.run import serve_webui

    with pytest.raises(ValueError, match="not a connector module"):
        serve_webui(None, RuleRegistry(), serve=False, port=0,
                    connector_modules=["json"])  # real module, wrong shape


# ---- 4. SPA list navigation uses data attributes ----------------------

def test_spa_no_names_in_inline_onclick():
    from snowalert_spark.webui_spa import _SHELL as SPA_JS

    for line in SPA_JS.splitlines():
        if "onclick" in line and "encodeURIComponent" in line:
            raise AssertionError(
                f"encoded name inside an inline onclick JS string "
                f"(encodeURIComponent leaves ' ( ) unescaped): {line!r}"
            )
    assert "data-nav" in SPA_JS
    assert re.search(r"addEventListener\(.click.", SPA_JS)


# ---- 5. truncated GIF raises ValueError -------------------------------

def test_truncated_gif_raises_value_error():
    full = build_gif([np.arange(64, dtype=np.uint8).reshape(8, 8)], 8, 8)
    # cut at many depths: inside header, palette, image descriptor,
    # LZW sub-blocks — every truncation must surface as ValueError
    for cut in (8, 12, 40, len(full) // 2, len(full) - 3):
        with pytest.raises(ValueError):
            M._gif_frames(full[:cut])


def test_truncated_gif_extension_raises_value_error():
    # graphic-control extension present, stream cut inside it
    full = build_gif([np.zeros((4, 4), dtype=np.uint8)], 4, 4,
                     transparent={0: 1})
    ext = full.find(b"\x21\xf9")
    assert ext > 0
    with pytest.raises(ValueError):
        M._gif_frames(full[: ext + 3])


def test_intact_gif_still_decodes():
    w, h, frames = M._gif_frames(
        build_gif([np.full((4, 4), 7, dtype=np.uint8)], 4, 4))
    assert (w, h, len(frames)) == (4, 4, 1)
