"""Jira dispatch handler (reference: src/runners/handlers/jira.py).

HTTP-transport shape with an injectable client so the full reference
behavior is testable without a Jira server:

- ticket body: fixed field template with defaults, Jira-markup
  escaping of ``{`` and ``[``, optional WebUI/triage links, and the
  99,000-char body cap (jira.py:30-86);
- create: project/issuetype/summary/description plus custom fields
  merged from config and the alert's handler entry, ``key:`` prefix
  selecting raw-key fields (jira.py:125-190);
- correlation reuse: a correlated alert's existing ticket is appended
  to while it still sits in the starting status; any other status (or
  an append/status failure) falls back to creating a fresh ticket
  (jira.py:217-281);
- the resulting ticket id is recorded back onto the alert row
  (jira.py:208-215) via an injected recorder, and failures propagate
  so the dispatcher's retry gate sees them.

The client contract (five methods) is the minimal surface the
reference exercises through the jira SDK.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass, field

JIRA_TICKET_BODY_DEFAULTS = {
    "DETECTOR": "No detector identified",
    "QUERY_NAME": "Query Name unspecified",
    "ENVIRONMENT": "No Environment described",
    "TITLE": "Untitled Query",
    "DESCRIPTION": "No Description provided",
    "SEVERITY": "Severity Unspecified",
}

JIRA_TICKET_BODY_FMT = """
Alert ID: {ALERT_ID}
Query ID: {QUERY_ID}
Query Name: {QUERY_NAME}
Environment: {ENVIRONMENT}
Sources: {SOURCES}
Actor: {ACTOR}
Object: {OBJECT}
Action: {ACTION}
Title: {TITLE}
Event Time: {EVENT_TIME}
Alert Time: {ALERT_TIME}
Description: {{quote}}
{DESCRIPTION}
{{quote}}
Detector: {DETECTOR}
Event Data: {{code}}{EVENT_DATA}{{code}}
Severity: {SEVERITY}
"""

BODY_CAP = 99_000  # jira.py:86
APPEND_SEPARATOR = "\n~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~\n"  # jira.py:103


def escape_jira_strings(v):
    """``{`` and ``[`` are Jira-markup specials (jira.py:89-95)."""
    if type(v) is str:
        return v.replace("{", "\\{").replace("[", "\\[")
    if type(v) is list:
        return [escape_jira_strings(x) for x in v]
    return escape_jira_strings(str(v))


def jira_ticket_body(
    alert: dict,
    webui_link: str = "",
    triage_link: str = "",
) -> str:
    """jira.py:63-86: escape, linkify, format, cap at 99,000 chars."""
    alert = dict(alert)
    sources = alert.get("SOURCES")
    alert["SOURCES"] = ", ".join(sources) if isinstance(sources, list) else sources
    escaped = {k: escape_jira_strings(v) for k, v in alert.items()}
    if webui_link and "QUERY_ID" in alert:
        qid = alert["QUERY_ID"]
        escaped["QUERY_ID"] = f"[{qid}|{webui_link.format(qid)}]"
    if triage_link and "QUERY_NAME" in alert:
        qn = alert["QUERY_NAME"]
        escaped["QUERY_NAME"] = f"[{qn}|{triage_link.format(qn)}]"
    body = JIRA_TICKET_BODY_FMT.format(**{**JIRA_TICKET_BODY_DEFAULTS, **escaped})
    return body[:BODY_CAP]


def parse_custom_fields(config_fields: str, alert_fields: str) -> dict:
    """jira.py:160-175: ``'10008=key:SAD-1;10009=Low'`` — later (alert)
    entries override config; ``key:`` values pass raw, others wrap in
    ``{'value': …}``."""
    fields = ";".join(
        (config_fields or "").split(";") + (alert_fields or "").split(";")
    ).split(";")
    out = {}
    for f in fields:
        if not f:
            continue
        field_id, field_value = f.split("=")
        if field_value.startswith("key:"):
            out[f"customfield_{field_id}"] = field_value[4:]
        else:
            out[f"customfield_{field_id}"] = {"value": field_value}
    return out


@dataclass
class JiraHandler:
    """``handle(alert, correlation_id)`` with correlation ticket reuse.

    ``lookup_correlated(correlation_id) -> ticket_id | None`` is the
    results-store query the reference runs inline (jira.py:226-240);
    ``record_ticket(ticket_id, alert_id)`` the write-back
    (jira.py:208-215). Both injectable — the dispatcher wires them to
    the alerts store."""

    client: object
    project: str
    issue_type: str = "Story"
    starting_status: str = "To Do"
    webui_link: str = ""
    triage_link: str = ""
    config_custom_fields: str = ""
    lookup_correlated: Callable[[str], str | None] | None = None
    record_ticket: Callable[[str, str], None] | None = None
    log: list = field(default_factory=list)

    def create_ticket(self, alert, assignee=None, custom_fields=None) -> str:
        alert = dict(alert)
        ev = alert.get("EVENT_DATA")
        if not isinstance(ev, str):
            alert["EVENT_DATA"] = json.dumps(ev, indent=4, default=str, sort_keys=True)
        params = {
            "project": self.project,
            "issuetype": {"name": self.issue_type},
            "summary": alert.get("TITLE", "Untitled Query"),
            "description": jira_ticket_body(
                alert, self.webui_link, self.triage_link
            ),
        }
        params.update(
            parse_custom_fields(self.config_custom_fields, custom_fields or "")
        )
        issue_id = self.client.create_issue(**params)
        if assignee:
            self.client.assign(issue_id, assignee)
        return issue_id

    def append_to_body(self, ticket_id: str, alert: dict) -> None:
        alert = dict(alert)
        ev = alert.get("EVENT_DATA")
        if not isinstance(ev, str):
            alert["EVENT_DATA"] = json.dumps(ev, indent=4, default=str, sort_keys=True)
        desc = self.client.issue_description(ticket_id) or ""
        desc = desc + APPEND_SEPARATOR + jira_ticket_body(
            alert, self.webui_link, self.triage_link
        )
        self.client.update_description(ticket_id, desc)

    def handle(
        self,
        alert: dict,
        correlation_id: str | None = None,
        assignee: str | None = None,
        custom_fields: str | None = None,
    ) -> dict:
        if not self.project:
            return {"success": False, "error": "No Jira Project defined"}
        ticket_id = None
        if correlation_id and self.lookup_correlated is not None:
            ticket_id = self.lookup_correlated(correlation_id)
        appended = False
        if ticket_id:
            try:
                status = self.client.issue_status(ticket_id)
            except Exception:
                status = None
                ticket_id = None
            if ticket_id and status == self.starting_status:
                try:
                    self.append_to_body(ticket_id, alert)
                    appended = True
                except Exception:
                    ticket_id = None
            else:
                ticket_id = None
        if ticket_id is None:
            # create failures raise (jira.py:271-276): the dispatcher
            # records the failure and retries the alert next run
            ticket_id = self.create_ticket(alert, assignee, custom_fields)
        if self.record_ticket is not None:
            self.record_ticket(ticket_id, alert.get("ALERT_ID"))
        return {"success": True, "ticket": ticket_id, "appended": appended}
