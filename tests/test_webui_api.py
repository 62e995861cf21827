"""WebUI HTTP API endpoint tests (reference request/response shapes
from src/webui/backend/webui/api/rules.py and api/data.py): auth
gate, rule CRUD (create with DDL-envelope peeling, LIKE-filtered
listing, rename, soft-delete), policy-definition results, and the
connector configure/finalize/test lifecycle."""

from __future__ import annotations

import io
import json

from snowalert_spark.rules import RuleRegistry
from snowalert_spark.webui import WebApi

SECRET = "s3cret"


def call(app, method, path, body=None, sid=SECRET, query=""):
    raw = json.dumps(body).encode() if body is not None else b""
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

    out = b"".join(app(environ, start_response))
    return captured["status"], json.loads(out)


NIGHT_DDL = (
    "CREATE OR REPLACE VIEW rules.NIGHT_LOGIN_ALERT_QUERY COPY GRANTS\n"
    "  COMMENT='Night logins\n  @id nl1\n  @tags auth, odd-hours'\nAS\n"
    "SELECT 'u1' AS actor, 'login' AS action"
)


def _app(spark=None, **kw):
    return WebApi(RuleRegistry(), secret=SECRET, spark=spark, **kw)


def test_auth_fails_closed_with_empty_secret():
    """Round-6 advice: an unconfigured (empty) secret must NOT mean an
    absent/empty sid cookie authenticates mutation endpoints."""
    app = WebApi(RuleRegistry(), secret="")
    for sid in (None, ""):
        _, out = call(app, "POST", "/api/sa/rules",
                      {"title": "X", "target": "ALERT", "type": "QUERY",
                       "body": "SELECT 1"}, sid=sid)
        assert out["success"] is False


def test_auth_gate():
    app = _app()
    _, out = call(app, "GET", "/api/sa/rules", sid="wrong")
    assert out == {"rules": []}
    _, out = call(app, "POST", "/api/sa/rules",
                  {"title": "X", "target": "ALERT", "type": "QUERY",
                   "body": "SELECT 1"}, sid="wrong")
    assert out["success"] is False and out["message"] == "bad sid"
    _, out = call(app, "POST", "/api/sa/rules/delete",
                  {"title": "X", "target": "ALERT", "type": "QUERY"}, sid=None)
    assert out["success"] is False


def test_create_list_roundtrip(spark):
    app = _app(spark)
    _, out = call(app, "POST", "/api/sa/rules",
                  {"title": "NIGHT_LOGIN", "target": "ALERT",
                   "type": "QUERY", "body": NIGHT_DDL})
    assert out["success"] is True
    rule = app.registry.rules["NIGHT_LOGIN_ALERT_QUERY"]
    assert rule.rule_id == "nl1" and rule.tags == ["auth", "odd-hours"]

    _, out = call(app, "GET", "/api/sa/rules",
                  query="type=QUERY&target=ALERT")
    (listed,) = out["rules"]
    assert listed["title"] == "NIGHT_LOGIN"
    assert listed["target"] == "ALERT" and listed["type"] == "QUERY"
    assert listed["body"].startswith("SELECT 'u1'")
    assert listed["results"] is None  # results only for policies

    # LIKE filter excludes non-matching types
    _, out = call(app, "GET", "/api/sa/rules", query="type=SUPPRESSION")
    assert out["rules"] == []


def test_create_invalid_sql_reports_error(spark):
    app = _app(spark)
    _, out = call(app, "POST", "/api/sa/rules",
                  {"title": "BROKEN", "target": "ALERT", "type": "QUERY",
                   "body": "SELECT FROM nothing WHERE"})
    assert out["success"] is False and out["message"]
    assert "BROKEN_ALERT_QUERY" not in app.registry.rules


def test_policy_definition_results(spark):
    app = _app(spark)
    _, out = call(app, "POST", "/api/sa/rules",
                  {"title": "MFA", "target": "POLICY", "type": "DEFINITION",
                   "body": "SELECT 'all users use MFA' AS title, "
                           "1=1 AS passing"})
    assert out["success"] is True
    assert out["rule"]["results"] == [
        {"title": "all users use MFA", "passing": True}]
    _, out = call(app, "GET", "/api/sa/rules",
                  query="type=DEFINITION&target=POLICY")
    assert out["rules"][0]["results"][0]["passing"] is True


def test_rename_and_soft_delete(spark):
    app = _app(spark)
    call(app, "POST", "/api/sa/rules",
         {"title": "OLD", "target": "ALERT", "type": "QUERY",
          "body": "SELECT 1 AS x"})
    _, out = call(app, "POST", "/api/sa/rules/rename",
                  {"title": "OLD", "target": "ALERT", "type": "QUERY",
                   "newTitle": "NEW"})
    assert out["success"] is True
    assert "NEW_ALERT_QUERY" in app.registry.rules
    assert "OLD_ALERT_QUERY" not in app.registry.rules

    _, out = call(app, "POST", "/api/sa/rules/delete",
                  {"title": "NEW", "target": "ALERT", "type": "QUERY"})
    assert out["success"] is True and out["view_name"] == "NEW_ALERT_QUERY"
    # soft delete: body preserved under _DELETED, hidden from listings
    assert "NEW_ALERT_QUERY_DELETED" in app.registry.rules
    _, out = call(app, "GET", "/api/sa/rules")
    assert out["rules"] == []


class FakeConnector:
    CONNECTION_OPTIONS = [
        {"name": "subdomain", "title": "Okta Subdomain", "required": True},
        {"name": "api_key", "title": "API Token", "secret": True,
         "required": True},
        {"name": "accounts", "type": "list"},
        {"name": "timeout", "type": "int"},
    ]

    def __init__(self):
        self.connected = {}
        self.finalized = []

    def connect(self, name, options):
        self.connected[name] = options
        return {"newStage": "finalized", "newMessage": "created"}

    def finalize(self, name):
        self.finalized.append(name)
        return {"newStage": "finalized"}

    def test(self, name):
        yield {"check": "ping", "ok": True}


def test_connector_lifecycle():
    fake = FakeConnector()
    app = _app(connectors={"okta": fake}, encrypt=lambda s: f"enc({s})")

    _, out = call(app, "GET", "/api/sa/data/")
    assert out["connectors"]["okta"][0]["name"] == "subdomain"

    # missing required option → the reference's bulleted message
    _, out = call(app, "POST", "/api/sa/data/connectors/okta/default",
                  {"subdomain": "acme"})
    assert out["success"] is False
    assert "Missing required configuration options" in out["errorMessage"]
    assert "API Token" in out["errorMessage"]

    # full options: list split, int coerced, secret encrypted
    _, out = call(app, "POST", "/api/sa/data/connectors/okta/default",
                  {"subdomain": "acme", "api_key": "k1",
                   "accounts": "a,b", "timeout": "30"})
    assert out["success"] is True and out["newStage"] == "finalized"
    opts = fake.connected["default"]
    assert opts["accounts"] == ["a", "b"] and opts["timeout"] == 30
    assert opts["api_key"] == "enc(k1)"

    _, out = call(app, "POST", "/api/sa/data/connectors/okta/default/finalize")
    assert out["success"] is True and fake.finalized == ["default"]

    _, out = call(app, "POST", "/api/sa/data/connectors/okta/default/test")
    assert out["results"] == [{"check": "ping", "ok": True}]

    # unknown connector → jsonified error, not a 500
    status, out = call(app, "POST", "/api/sa/data/connectors/nope/x", {})
    assert status == "200 OK" and out["success"] is False


def test_unknown_route_404():
    status, out = call(_app(), "GET", "/api/sa/nothing")
    assert status == "404 Not Found" and out["success"] is False


def test_serves_over_real_http(spark):
    """The app is genuinely WSGI: serve one request through wsgiref."""
    import threading
    import urllib.request
    from wsgiref.simple_server import make_server

    app = _app(spark)
    call(app, "POST", "/api/sa/rules",
         {"title": "HTTPCHECK", "target": "ALERT", "type": "QUERY",
          "body": "SELECT 1 AS one"})
    srv = make_server("127.0.0.1", 0, app)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/sa/rules?type=QUERY",
        headers={"Cookie": f"sid={SECRET}"})
    with urllib.request.urlopen(req, timeout=10) as resp:
        out = json.loads(resp.read())
    t.join(timeout=10)
    assert out["rules"][0]["title"] == "HTTPCHECK"

def test_oauth_broker_flow():
    from snowalert_spark.webui import OAuthBroker

    posts = []

    def post(url, auth, form):
        posts.append((url, auth, form))
        return {"access_token": "at1", "refresh_token": "rt1"}

    broker = OAuthBroker(
        clients={"ACME": ("cid1", "sec1")},
        authorize_url="https://auth.example/{account}/authorize",
        token_url="https://auth.example/{account}/token",
        post=post,
    )
    app = _app(oauth=broker)

    _, out = call(app, "POST", "/api/oauth/redirect",
                  {"account": "acme.eu-west-1", "role": "sec_ops",
                   "returnHref": "https://ui.example/return"})
    url = out["url"]
    assert url.startswith("https://auth.example/acme.eu-west-1/authorize?")
    assert "client_id=cid1" in url and "response_type=code" in url
    assert "session%3Arole%3ASEC_OPS" in url

    _, out = call(app, "POST", "/api/oauth/return",
                  {"account": "acme.eu-west-1", "code": "authcode9",
                   "redirectUri": "https://ui.example/return"})
    assert out["tokens"]["access_token"] == "at1"
    (url, auth, form), = posts
    assert auth == ("cid1", "sec1") and form["code"] == "authcode9"
    assert form["grant_type"] == "authorization_code"

    # unconfigured oauth → jsonified error, not a 500
    status, out = call(_app(), "POST", "/api/oauth/redirect", {"account": "x"})
    assert status == "200 OK" and out["success"] is False
