"""WebUI HTML page tests (reference surface: the React SPA routes in
src/webui/frontend/src/App.tsx:17-31 — alerts/violations rule editors,
policies pass/fail tables, baselines, connectors, login). The pages
layer renders server-side from the same WebApi methods the SPA calls
over JSON, so these tests drive the full WSGI stack: login cookie,
rule CRUD round-trips through forms (PRG redirects), policy and
connector listings, and the /api/ passthrough."""

from __future__ import annotations

import io
import json
from urllib.parse import urlencode

from snowalert_spark.rules import RuleRegistry
from snowalert_spark.webui import WebApi
from snowalert_spark.webui_pages import WebPages

SECRET = "s3cret"


def call(app, method, path, form=None, sid=SECRET, query=""):
    raw = urlencode(form).encode() if form is not None else b""
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "CONTENT_LENGTH": str(len(raw)),
        "HTTP_COOKIE": f"sid={sid}" if sid is not None else "",
        "wsgi.input": io.BytesIO(raw),
    }
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    body = b"".join(app(environ, start_response))
    return captured["status"], captured["headers"], body.decode()


def _pages(**kw):
    return WebPages(WebApi(RuleRegistry(), secret=SECRET, **kw))


def test_root_redirects_to_alerts():
    status, headers, _ = call(_pages(), "GET", "/")
    assert status.startswith("303")
    assert headers["Location"] == "/dashboard/alerts"


def test_login_sets_sid_cookie():
    status, headers, _ = call(
        _pages(), "POST", "/login", {"sid": SECRET}, sid=None
    )
    assert status.startswith("303")
    assert "sid=s3cret" in headers["Set-Cookie"]


def test_rule_save_edit_delete_roundtrip():
    app = _pages()
    status, headers, _ = call(app, "POST", "/rules/save", {
        "title": "NIGHT_LOGIN", "target": "ALERT", "type": "QUERY",
        "body": "SELECT 'u1' AS actor",
    })
    assert status.startswith("303") and "m=rule+saved" in headers["Location"]
    assert "NIGHT_LOGIN_ALERT_QUERY" in app.api.registry.rules

    _, _, html = call(app, "GET", "/dashboard/alerts")
    assert "NIGHT_LOGIN" in html and "SELECT &#x27;u1&#x27; AS actor" in html

    # selecting a rule pre-fills the editor with delete/rename forms
    _, _, html = call(app, "GET", "/dashboard/alerts",
                      query="selected=NIGHT_LOGIN")
    assert "/rules/delete" in html and "/rules/rename" in html

    status, headers, _ = call(app, "POST", "/rules/rename", {
        "title": "NIGHT_LOGIN", "newTitle": "LATE_LOGIN",
        "target": "ALERT", "type": "QUERY",
    })
    assert status.startswith("303")
    assert "LATE_LOGIN_ALERT_QUERY" in app.api.registry.rules

    status, headers, _ = call(app, "POST", "/rules/delete", {
        "title": "LATE_LOGIN", "target": "ALERT", "type": "QUERY",
    })
    assert status.startswith("303")
    assert "LATE_LOGIN_ALERT_QUERY" not in app.api.registry.rules


def test_unauthenticated_rules_page_is_empty_and_save_flashes_error():
    app = _pages()
    _, _, html = call(app, "GET", "/dashboard/alerts", sid="wrong")
    assert "no rules" in html
    status, headers, _ = call(app, "POST", "/rules/save", {
        "title": "X", "target": "ALERT", "type": "QUERY", "body": "SELECT 1",
    }, sid="wrong")
    assert status.startswith("303") and "m=%21" in headers["Location"]
    assert not app.api.registry.rules


def test_violations_page_filters_by_target():
    app = _pages()
    call(app, "POST", "/rules/save", {
        "title": "BULK_V", "target": "VIOLATION", "type": "QUERY",
        "body": "SELECT 1 AS x",
    })
    _, _, alerts = call(app, "GET", "/dashboard/alerts")
    _, _, violations = call(app, "GET", "/dashboard/violations")
    assert "BULK_V" not in alerts
    assert "BULK_V" in violations


def test_policies_page_lists_definitions():
    app = _pages()
    app.api.registry.create(
        "MFA_POLICY_DEFINITION", sql="SELECT true AS passing",
        comment="MFA required\n@id p1",
    )
    _, _, html = call(app, "GET", "/dashboard/policies")
    assert "MFA" in html and "passing" in html


def test_baselines_and_connectors_pages():
    class FakeConnector:
        CONNECTION_OPTIONS = [
            {"name": "subscription_id", "required": True, "prompt": "sub id"},
        ]
        calls = []

        @classmethod
        def connect(cls, name, options):
            cls.calls.append(("connect", name, options))
            return {"newStage": "finalized"}

        @classmethod
        def test(cls, name):
            yield {"ok": True}

    app = _pages(
        connectors={"azure_log": FakeConnector},
        baselines={"temporal_by_day": {"module": "baselines"}},
    )
    _, _, html = call(app, "GET", "/dashboard/baselines")
    assert "temporal_by_day" in html
    _, _, html = call(app, "GET", "/dashboard/connectors")
    assert "azure_log" in html and "subscription_id" in html

    status, headers, _ = call(app, "POST", "/connectors/azure_log/default",
                              {"subscription_id": "s-1"})
    assert status.startswith("303") and "m=connected" in headers["Location"]

    status, headers, _ = call(
        app, "POST", "/connectors/azure_log/default/test", {}
    )
    assert status.startswith("303")
    assert "ok" in headers["Location"]


def test_api_passthrough_still_json():
    app = _pages()
    status, headers, body = call(app, "GET", "/api/sa/data")
    assert status == "200 OK"
    assert json.loads(body)["success"] is True


def test_error_renders_500_not_crash():
    app = _pages()
    status, _, html = call(app, "POST", "/connectors/nope/default", {})
    # unknown connector surfaces as a flash-redirect or rendered error,
    # never an unhandled exception
    assert status.startswith(("303", "500"))
