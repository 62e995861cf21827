"""WebUI HTML layer: server-rendered pages over the ``WebApi`` WSGI
endpoints (reference: src/webui/frontend — a React SPA whose routes are
dashboard/alerts, dashboard/violations, dashboard/policies,
dashboard/baselines, dashboard/connectors and login, see
frontend/src/App.tsx:17-31 and common/router.ts:43-58; the components
are RulesTree/RawEditor for rule CRUD, Policies.tsx for pass/fail
tables, Connectors.tsx for the connect→finalize→test flow).

This is the same surface re-expressed without a build toolchain:
plain HTML rendered server-side from the very ``WebApi`` methods the
SPA calls over JSON, so every page reflects exactly what the API
serves — there is no second data path. Forms post urlencoded and
redirect back (PRG); auth is the same ``sid`` cookie the API checks,
set by the login form. No dependencies beyond the stdlib.

Serve with::

    from wsgiref.simple_server import make_server
    api = WebApi(registry, secret="...", spark=spark, connectors=...)
    make_server("", 8000, WebPages(api)).serve_forever()

``WebPages`` also mounts the JSON API itself under ``/api/`` so one
server exposes both representations.
"""

from __future__ import annotations

import json
from html import escape
from urllib.parse import parse_qs, quote, urlencode

from snowalert_spark.webui import WebApi

_STYLE = """
body{font-family:sans-serif;margin:0;background:#f4f5f7;color:#222}
nav{background:#1d2733;padding:0 16px}
nav a{color:#cfd8e3;display:inline-block;padding:12px 14px;
     text-decoration:none}
nav a.active{color:#fff;border-bottom:2px solid #4a9eda}
main{max-width:1100px;margin:20px auto;padding:0 16px}
table{border-collapse:collapse;width:100%;background:#fff}
th,td{border:1px solid #dde2e8;padding:6px 10px;text-align:left;
     vertical-align:top;font-size:14px}
th{background:#eef1f5}
pre{white-space:pre-wrap;margin:0;font-size:12px}
form.inline{display:inline}
textarea{width:100%;font-family:monospace;font-size:13px}
.flash{background:#e7f4e4;border:1px solid #9fd18e;padding:8px 12px;
      margin-bottom:12px}
.flash.err{background:#fae7e7;border-color:#d89f9f}
.card{background:#fff;border:1px solid #dde2e8;padding:12px 16px;
     margin-bottom:12px}
button{cursor:pointer}
"""

_NAV = (
    ("/dashboard/alerts", "Alerts"),
    ("/dashboard/violations", "Violations"),
    ("/dashboard/policies", "Policies"),
    ("/dashboard/baselines", "Baselines"),
    ("/dashboard/connectors", "Connectors"),
    ("/login", "Login"),
)


def _page(title: str, body: str, active: str = "", flash: str = "") -> str:
    nav = "".join(
        f'<a href="{p}"{" class=active" if p == active else ""}>{t}</a>'
        for p, t in _NAV
    )
    fl = ""
    if flash:
        cls = "flash err" if flash.startswith("!") else "flash"
        fl = f'<div class="{cls}">{escape(flash.lstrip("!"))}</div>'
    return (
        "<!doctype html><html><head><meta charset=utf-8>"
        f"<title>{escape(title)} — SnowAlert</title>"
        f"<style>{_STYLE}</style></head><body>"
        f"<nav>{nav}</nav><main><h2>{escape(title)}</h2>{fl}{body}"
        "</main></body></html>"
    )


class WebPages:
    """WSGI app: HTML pages + the JSON API mounted under ``/api/``."""

    def __init__(self, api: WebApi):
        self.api = api

    # ---- WSGI ------------------------------------------------------------
    def __call__(self, environ, start_response):
        path = environ.get("PATH_INFO", "") or "/"
        if path.startswith("/api/"):
            return self.api(environ, start_response)
        method = environ["REQUEST_METHOD"].upper()
        try:
            out = self._route(method, path, environ)
        except Exception as e:  # noqa: BLE001 — render, don't crash
            out = (
                "500 Internal Server Error",
                _page("Error", f"<pre>{escape(f'{type(e).__name__}: {e}')}</pre>"),
                [],
            )
        status, body, extra = out
        if status.startswith("303"):
            start_response(status, [("Location", body)] + extra)
            return [b""]
        data = body.encode()
        start_response(
            status,
            [("Content-Type", "text/html; charset=utf-8"),
             ("Content-Length", str(len(data)))] + extra,
        )
        return [data]

    def _route(self, method, path, environ):
        qs = parse_qs(environ.get("QUERY_STRING", ""))
        flash = qs.get("m", [""])[0]
        if path == "/":
            return "303 See Other", "/dashboard/alerts", []
        if path == "/login":
            if method == "POST":
                form = self._form(environ)
                sid = form.get("sid", "")
                return ("303 See Other", "/dashboard/alerts",
                        [("Set-Cookie", f"sid={quote(sid)}; Path=/; HttpOnly")])
            return "200 OK", self._login_page(flash), []
        if path in ("/dashboard/alerts", "/dashboard/violations"):
            target = "ALERT" if path.endswith("alerts") else "VIOLATION"
            return "200 OK", self._rules_page(
                environ, target, qs.get("selected", [""])[0], flash
            ), []
        if path == "/dashboard/policies":
            return "200 OK", self._policies_page(environ, flash), []
        if path == "/dashboard/baselines":
            return "200 OK", self._baselines_page(environ, flash), []
        if path == "/dashboard/connectors":
            return "200 OK", self._connectors_page(environ, flash), []
        if path == "/rules/save" and method == "POST":
            form = self._form(environ)
            res = self.api.create_rule(environ, {
                "title": form.get("title", ""),
                "target": form.get("target", ""),
                "type": form.get("type", ""),
                "body": form.get("body", ""),
            })
            return self._back(form.get("target", "ALERT"), res,
                              "rule saved", selected=form.get("title", ""))
        if path == "/rules/delete" and method == "POST":
            form = self._form(environ)
            res = self.api.delete_rule(environ, {
                "title": form.get("title", ""),
                "target": form.get("target", ""),
                "type": form.get("type", ""),
            })
            return self._back(form.get("target", "ALERT"), res, "rule deleted")
        if path == "/rules/rename" and method == "POST":
            form = self._form(environ)
            res = self.api.rename_rule(environ, {
                "title": form.get("title", ""),
                "newTitle": form.get("newTitle", ""),
                "target": form.get("target", ""),
                "type": form.get("type", ""),
            })
            return self._back(form.get("target", "ALERT"), res, "rule renamed",
                              selected=form.get("newTitle", ""))
        parts = path.strip("/").split("/")
        if len(parts) in (3, 4) and parts[0] == "connectors" and method == "POST":
            connector, name = parts[1], parts[2]
            action = parts[3] if len(parts) == 4 else ""
            form = self._form(environ)
            if action == "test":
                res = self.api.connector_test(environ, connector, name)
                msg = f"test: {json.dumps(res.get('results'))[:500]}"
            elif action == "finalize":
                res = self.api.connector_finalize(environ, connector, name)
                msg = "finalized"
            else:
                res = self.api.connector_connect(environ, connector, name, form)
                msg = "connected"
            ok = res.get("success", True)
            m = msg if ok else "!" + str(res.get("message", res))[:300]
            return ("303 See Other",
                    f"/dashboard/connectors?{urlencode({'m': m})}", [])
        return "404 Not Found", _page("Not found",
                                      f"<p>no page at {escape(path)}</p>"), []

    # ---- helpers ---------------------------------------------------------
    def _form(self, environ) -> dict:
        try:
            n = int(environ.get("CONTENT_LENGTH") or 0)
        except ValueError:
            n = 0
        raw = environ["wsgi.input"].read(n).decode() if n else ""
        return {k: v[0] for k, v in parse_qs(raw).items()}

    def _back(self, target, res, ok_msg, selected=""):
        ok = res.get("success", True)
        m = ok_msg if ok else "!" + str(res.get("message", ""))[:300]
        page = "violations" if target.upper() == "VIOLATION" else "alerts"
        q = {"m": m}
        if selected and ok:
            q["selected"] = selected
        return "303 See Other", f"/dashboard/{page}?{urlencode(q)}", []

    # ---- pages -----------------------------------------------------------
    def _login_page(self, flash):
        return _page("Login", (
            '<form method=post action="/login" class=card>'
            "<p>Paste the configured secret to start a session "
            "(sets the <code>sid</code> cookie the API checks):</p>"
            '<input type=password name=sid size=40> '
            "<button>Log in</button></form>"
        ), "/login", flash)

    def _rules_page(self, environ, target, selected, flash):
        listing = self.api.get_rules(environ, rule_target=target)
        rules = listing["rules"]
        rows = "".join(
            f"<tr><td><a href=\"?selected={quote(r['title'])}\">"
            f"{escape(r['title'])}</a></td>"
            f"<td>{escape(r['type'])}</td>"
            f"<td><pre>{escape(r['body'][:200])}</pre></td></tr>"
            for r in rules
        ) or '<tr><td colspan=3><i>no rules (or not logged in)</i></td></tr>'
        sel = next((r for r in rules if r["title"] == selected), None)
        editor = self._editor(target, sel)
        title = "Alerts" if target == "ALERT" else "Violations"
        return _page(title, (
            f"<table><tr><th>rule</th><th>type</th><th>body</th></tr>{rows}"
            f"</table><h3>{'Edit' if sel else 'New'} rule</h3>{editor}"
        ), f"/dashboard/{'alerts' if target == 'ALERT' else 'violations'}",
            flash)

    def _editor(self, target, sel):
        title = escape(sel["title"]) if sel else ""
        body = escape(sel["body"]) if sel else "SELECT ..."
        typ = sel["type"] if sel else "QUERY"
        opts = "".join(
            f"<option{' selected' if t == typ else ''}>{t}</option>"
            for t in ("QUERY", "SUPPRESSION")
        )
        extra = ""
        if sel:
            extra = (
                '<form method=post action="/rules/delete" class=inline>'
                f'<input type=hidden name=title value="{title}">'
                f'<input type=hidden name=target value="{target}">'
                f'<input type=hidden name=type value="{typ}">'
                "<button>Delete</button></form> "
                '<form method=post action="/rules/rename" class=inline>'
                f'<input type=hidden name=title value="{title}">'
                f'<input type=hidden name=target value="{target}">'
                f'<input type=hidden name=type value="{typ}">'
                '<input name=newTitle placeholder="new title">'
                "<button>Rename</button></form>"
            )
        return (
            '<form method=post action="/rules/save" class=card>'
            f'<p>title <input name=title value="{title}" required> '
            f'target <input name=target value="{target}" readonly> '
            f"type <select name=type>{opts}</select></p>"
            f"<textarea name=body rows=10>{body}</textarea>"
            "<p><button>Save</button></p></form>" + extra
        )

    def _policies_page(self, environ, flash):
        listing = self.api.get_rules(environ, rule_target="POLICY")
        rows = []
        for r in listing["rules"]:
            results = r.get("results") or []
            passing = sum(1 for row in results if row.get("passing"))
            rows.append(
                f"<tr><td>{escape(r['title'])}</td>"
                f"<td>{passing}/{len(results)} passing</td>"
                f"<td><pre>{escape(r['body'][:300])}</pre></td></tr>"
            )
        body = "".join(rows) or "<tr><td colspan=3><i>no policies</i></td></tr>"
        return _page("Policies", (
            "<table><tr><th>policy</th><th>status</th><th>definition</th>"
            f"</tr>{body}</table>"
        ), "/dashboard/policies", flash)

    def _baselines_page(self, environ, flash):
        data = self.api.get_data(environ)
        rows = "".join(
            f"<tr><td>{escape(str(name))}</td>"
            f"<td><pre>{escape(json.dumps(info, default=str)[:400])}</pre></td></tr>"
            for name, info in (data.get("baselines") or {}).items()
        ) or "<tr><td colspan=2><i>no baselines</i></td></tr>"
        return _page("Baselines", (
            f"<table><tr><th>baseline</th><th>spec</th></tr>{rows}</table>"
        ), "/dashboard/baselines", flash)

    def _connectors_page(self, environ, flash):
        data = self.api.get_data(environ)
        cards = []
        for name, options in (data.get("connectors") or {}).items():
            fields = "".join(
                f"<p>{escape(o.get('name', ''))}"
                f"{' *' if o.get('required') else ''} "
                f"<input name=\"{escape(o.get('name', ''))}\" "
                f"value=\"{escape(str(o.get('default', '')))}\" "
                f"placeholder=\"{escape(str(o.get('prompt', '')))}\"></p>"
                for o in options
                if isinstance(o, dict)
            )
            cards.append(
                f"<div class=card><h3>{escape(name)}</h3>"
                f'<form method=post action="/connectors/{quote(name)}/default">'
                f"{fields}<button>Connect</button></form> "
                f'<form method=post action="/connectors/{quote(name)}/default/test" '
                'class=inline><button>Test</button></form> '
                f'<form method=post action="/connectors/{quote(name)}/default/finalize" '
                "class=inline><button>Finalize</button></form></div>"
            )
        return _page("Connectors",
                     "".join(cards) or "<p><i>no connectors registered</i></p>",
                     "/dashboard/connectors", flash)
