"""HTTP-shaped Jira/Slack handler tests (reference behaviors from
src/runners/handlers/jira.py:217-281 and slack.py:52-160, driven by
fake clients): create, append-to-correlated-ticket, body truncation,
custom-field merging, status fallback, and the failure→retry
interaction with the dispatcher gate."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from snowalert_spark import handlers as H
from snowalert_spark.handlers.jira import (
    BODY_CAP,
    JiraHandler,
    jira_ticket_body,
    parse_custom_fields,
)
from snowalert_spark.handlers.slack import SlackHandler


class FakeJira:
    def __init__(self, fail_create: int = 0):
        self.issues: dict[str, dict] = {}
        self.fail_create = fail_create
        self._seq = 0
        self.calls = []

    def create_issue(self, **params):
        self.calls.append(("create", params))
        if self.fail_create > 0:
            self.fail_create -= 1
            raise ConnectionError("jira down")
        self._seq += 1
        tid = f"SA-{self._seq}"
        self.issues[tid] = {"status": "To Do", **params}
        return tid

    def issue_status(self, tid):
        return self.issues[tid]["status"]

    def issue_description(self, tid):
        return self.issues[tid]["description"]

    def update_description(self, tid, desc):
        self.calls.append(("update", tid))
        self.issues[tid]["description"] = desc

    def assign(self, tid, assignee):
        self.issues[tid]["assignee"] = assignee


def _alert(aid="a1", **kw):
    return {
        "ALERT_ID": aid, "QUERY_ID": "q1", "QUERY_NAME": "rule_1_ALERT_QUERY",
        "ENVIRONMENT": {"account": "acme"}, "SOURCES": ["cloudtrail"],
        "ACTOR": "root", "OBJECT": "host-1", "ACTION": "login",
        "TITLE": "Root login", "EVENT_TIME": "2024-05-01 10:00:00",
        "ALERT_TIME": "2024-05-01 10:05:00", "DESCRIPTION": "root logged in",
        "DETECTOR": "SnowAlert", "EVENT_DATA": {"ip": "1.2.3.4"},
        "SEVERITY": "High", **kw,
    }


def test_body_format_escapes_and_defaults():
    body = jira_ticket_body(_alert(TITLE="breach {5} [x]"))
    assert "Title: breach \\{5} \\[x]" in body
    assert "Sources: cloudtrail" in body
    assert "{quote}\nroot logged in\n{quote}" in body
    body2 = jira_ticket_body({"ALERT_ID": "a", "QUERY_ID": "q", "SOURCES": "s",
                              "ACTOR": "x", "OBJECT": "o", "ACTION": "a",
                              "EVENT_TIME": "t", "ALERT_TIME": "t",
                              "EVENT_DATA": "{}"})
    assert "Title: Untitled Query" in body2
    assert "Severity: Severity Unspecified" in body2


def test_body_truncates_at_99000():
    body = jira_ticket_body(_alert(DESCRIPTION="x" * 200_000))
    assert len(body) == BODY_CAP


def test_body_links_query_id_and_name():
    body = jira_ticket_body(
        _alert(), webui_link="https://ui/{0}", triage_link="https://triage/{0}")
    assert "[q1|https://ui/q1]" in body
    assert "[rule_1_ALERT_QUERY|https://triage/rule_1_ALERT_QUERY]" in body


def test_custom_fields_merge_and_key_prefix():
    fields = parse_custom_fields("10008=key:SAD-11493;10009=Low", "10009=Critical")
    assert fields == {
        "customfield_10008": "SAD-11493",
        "customfield_10009": {"value": "Critical"},  # alert overrides config
    }


def test_create_when_uncorrelated():
    jira = FakeJira()
    recorded = []
    h = JiraHandler(client=jira, project="SA",
                    record_ticket=lambda t, a: recorded.append((t, a)))
    out = h.handle(_alert(), correlation_id=None)
    assert out == {"success": True, "ticket": "SA-1", "appended": False}
    assert recorded == [("SA-1", "a1")]
    assert jira.issues["SA-1"]["summary"] == "Root login"
    assert jira.issues["SA-1"]["issuetype"] == {"name": "Story"}


def test_append_to_correlated_ticket_in_starting_status():
    jira = FakeJira()
    tickets = {}
    h = JiraHandler(client=jira, project="SA",
                    lookup_correlated=tickets.get,
                    record_ticket=lambda t, a: tickets.__setitem__("corr-7", t))
    h.handle(_alert("a1"), correlation_id="corr-7")
    out = h.handle(_alert("a2"), correlation_id="corr-7")
    assert out == {"success": True, "ticket": "SA-1", "appended": True}
    desc = jira.issues["SA-1"]["description"]
    assert desc.count("Alert ID:") == 2 and "~~~~~~" in desc


def test_correlated_ticket_past_starting_status_gets_new_ticket():
    jira = FakeJira()
    h = JiraHandler(client=jira, project="SA", lookup_correlated=lambda c: "SA-1")
    jira.issues["SA-1"] = {"status": "Done", "description": "old"}
    jira._seq = 1
    out = h.handle(_alert("a2"), correlation_id="corr-7")
    assert out["ticket"] == "SA-2" and out["appended"] is False
    assert jira.issues["SA-1"]["description"] == "old"  # untouched


def test_no_project_configured():
    out = JiraHandler(client=FakeJira(), project="").handle(_alert())
    assert out["success"] is False


def test_dispatcher_retry_after_jira_failure(spark, tmp_path):
    """jira down → dispatch failure recorded, ticket stays NULL; the
    next run retries the same alert and succeeds (the round-2
    dispatcher gate: HANDLERS IS NULL → retry while ticket IS NULL)."""
    from snowalert_spark.runners import alert_dispatcher
    from snowalert_spark.store import ResultsStore

    store = ResultsStore(spark, str(tmp_path))
    doc = _alert("rt1")
    doc.update(
        ENVIRONMENT=json.dumps(doc["ENVIRONMENT"]),
        EVENT_DATA=json.dumps(doc["EVENT_DATA"]),
        EVENT_TIME=dt.datetime(2024, 5, 1, 10, 0),
        ALERT_TIME=dt.datetime(2024, 5, 1, 10, 5),
        HANDLERS=None,
    )
    alert_row = {
        "alert": doc,
        "alert_time": dt.datetime(2024, 5, 1, 10, 5),
        "event_time": dt.datetime(2024, 5, 1, 10, 0),
        "ticket": None, "suppressed": False, "suppression_rule": None,
        "counter": 1, "correlation_id": None, "handled": None,
    }
    from snowalert_spark.schema import ALERTS

    store.append("alerts", spark.createDataFrame([alert_row], ALERTS))

    jira = FakeJira(fail_create=1)
    H.register("jira", JiraHandler(client=jira, project="SA").handle)
    try:
        n = alert_dispatcher.main(spark, store)
        assert n == 1
        row = store.read("alerts").collect()[0]
        assert row.ticket is None
        assert json.loads(row.handled)[0]["success"] is False

        n = alert_dispatcher.main(spark, store)  # retry run
        assert n == 1
        row = store.read("alerts").collect()[0]
        assert row.ticket == "SA-1"
        assert json.loads(row.handled)[0]["success"] is True
    finally:
        H.register("jira", H.MemoryTicketHandler().handle)


# ---------------------------------------------------------------------------
# Slack
# ---------------------------------------------------------------------------
class FakeSlack:
    def __init__(self, users=None):
        self.users = users or {}
        self.calls = []

    def api_call(self, method, **kw):
        self.calls.append((method, kw))
        if method == "users.lookupByEmail":
            u = self.users.get(kw["email"])
            return {"ok": True, "user": {"id": u}} if u else {"ok": False,
                                                              "error": "users_not_found"}
        return {"ok": True}


def test_slack_simple_message():
    sc = FakeSlack()
    out = SlackHandler(client=sc).handle(_alert(), channel="#sec", message="hi")
    assert out["success"] and out["channel"] == "#sec"
    (method, kw), = sc.calls
    assert method == "chat.postMessage" and kw["text"] == "hi"


def test_slack_template_renders_blocks():
    sc = FakeSlack()
    h = SlackHandler(client=sc, templates={
        "default": lambda vars: {
            "text": vars["alert"]["TITLE"],
            "blocks": [{"type": "section"}],
        }})
    h.handle(_alert(), channel="#sec", template="default")
    (method, kw), = sc.calls
    assert kw["text"] == "Root login"
    assert json.loads(kw["blocks"]) == [{"type": "section"}]


def test_slack_template_strips_handlers_key():
    seen = {}
    h = SlackHandler(client=FakeSlack(), templates={
        "t": lambda vars: seen.update(vars) or {"text": "x"}})
    h.handle(_alert(HANDLERS=["slack"]), channel="#sec", template="t")
    assert "HANDLERS" not in seen["alert"]


def test_slack_email_lookup_sets_channel():
    sc = FakeSlack(users={"kim@x.io": "U123"})
    out = SlackHandler(client=sc).handle(_alert(), recipient_email="kim@x.io")
    assert out["channel"] == "U123"
    assert sc.calls[0][0] == "users.lookupByEmail"
    assert sc.calls[1][1]["channel"] == "U123"


def test_slack_unknown_email_returns_none():
    sc = FakeSlack()
    out = SlackHandler(client=sc).handle(_alert(), recipient_email="who@x.io")
    assert out is None
    assert [m for m, _ in sc.calls] == ["users.lookupByEmail"]


def test_slack_file_upload_with_template_posts_then_uploads():
    sc = FakeSlack()
    h = SlackHandler(client=sc, templates={"t": lambda v: {"text": "report"}})
    h.handle(_alert(), channel="#sec", template="t",
             file_content="csv,data", file_type="csv", file_name="r.csv")
    assert [m for m, _ in sc.calls] == ["chat.postMessage", "files.upload"]
    assert sc.calls[1][1]["filename"] == "r.csv"


def test_slack_no_channel_no_email_returns_none():
    assert SlackHandler(client=FakeSlack()).handle(_alert(), message="hi") is None
