"""Alert dispatch handlers (reference: src/runners/handlers/*).

Handlers are driver-side plug-ins invoked per alert with the subset of
kwargs their signature accepts (utils.apply_some analog). External
services (Jira/Slack/PagerDuty/…) are stubbed behind the same
``handle`` contract; the test/demo handler records tickets locally.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

_REGISTRY: dict[str, Callable] = {}


def register(name: str, handle: Callable) -> None:
    _REGISTRY[name] = handle


def get(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f"no handler {name!r}")
    return _REGISTRY[name]


def apply_some(fn: Callable, **kwargs):
    """Call fn with only the kwargs it accepts (utils.py:72-77)."""
    sig = inspect.signature(fn)
    if any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values()):
        return fn(**kwargs)
    return fn(**{k: v for k, v in kwargs.items() if k in sig.parameters})


def slack_blocks_template(alert: dict) -> dict:
    """Default Slack message template (handlers/slack.py:30-49 shape):
    alert document → blocks payload. Registered templates can override
    per-rule via HANDLERS entries like 'slack:my_template'."""
    return {
        "channel": "#alerts",
        "blocks": [
            {
                "type": "section",
                "text": {
                    "type": "mrkdwn",
                    "text": f"*{alert.get('TITLE') or 'Alert'}*\n"
                    f"{alert.get('DESCRIPTION') or ''}",
                },
            },
            {
                "type": "context",
                "elements": [
                    {
                        "type": "mrkdwn",
                        "text": f"severity {alert.get('SEVERITY')}"
                        f" · actor {alert.get('ACTOR')}"
                        f" · {alert.get('QUERY_NAME')}",
                    }
                ],
            },
        ],
    }


class MemorySlackHandler:
    """Slack sink stub: renders the blocks template and records the
    payload instead of POSTing (the webhook client is environment-
    gated exactly like the reference's SLACK_API_TOKEN)."""

    def __init__(self, template=slack_blocks_template):
        self.template = template
        self.sent: list[dict] = []

    def handle(self, alert: dict):
        payload = self.template(alert)
        self.sent.append(payload)
        return {"success": True, "channel": payload["channel"]}


class MemoryTicketHandler:
    """Jira-shaped stub: creates 'tickets' in memory; appends to an
    existing ticket when the alert is correlated to one already
    ticketed (handlers/jira.py:232-263 behavior)."""

    def __init__(self):
        self.tickets: dict[str, list[dict]] = {}
        self.by_correlation: dict[str, str] = {}
        self._seq = 0

    def handle(self, alert: dict, correlation_id: str | None = None):
        if correlation_id and correlation_id in self.by_correlation:
            tid = self.by_correlation[correlation_id]
            self.tickets[tid].append(alert)
            return {"success": True, "ticket": tid, "appended": True}
        self._seq += 1
        tid = f"SA-{self._seq}"
        self.tickets[tid] = [alert]
        if correlation_id:
            self.by_correlation[correlation_id] = tid
        return {"success": True, "ticket": tid, "appended": False}
