"""Slack dispatch handler (reference: src/runners/handlers/slack.py).

The reference resolves a message payload three ways — direct
message/blocks, a named template (a Snowflake JS UDF there, a
registered Python callable here), or a user lookup by email whose id
becomes the channel — then posts via ``chat.postMessage`` and
optionally ``files.upload`` (slack.py:52-160). The client is
injectable with the SlackClient ``api_call(method, **kwargs)``
surface so every path is testable offline.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class SlackHandler:
    client: object  # api_call(method, **kwargs) -> dict
    templates: dict[str, Callable[[dict], dict]] = field(default_factory=dict)

    def handle(
        self,
        alert: dict,
        recipient_email: str | None = None,
        channel: str | None = None,
        template: str | None = None,
        message: str | None = None,
        file_content: str | None = None,
        file_type: str | None = None,
        file_name: str | None = None,
        blocks=None,
        attachments=None,
    ) -> dict | None:
        title = alert.get("TITLE")
        userid = None

        if recipient_email is not None:
            # slack.py:76-87: identify the Slack user by email
            result = self.client.api_call(
                "users.lookupByEmail", email=recipient_email
            )
            if result.get("ok") is True and "error" not in result:
                userid = result["user"]["id"]
            else:
                return None

        if channel is None:
            if userid is None:
                return None  # slack.py:97-102: no channel, no user
            channel = userid

        text = title
        if template is not None:
            # slack.py:103-120: template renders the payload structure
            tpl = self.templates.get(template)
            if tpl is None:
                raise KeyError(f"no slack template {template!r}")
            payload = tpl(
                {
                    "alert": {k: v for k, v in alert.items() if k != "HANDLERS"},
                    "properties": {"channel": channel, "message": message},
                }
            )
            if payload is None:
                return None
            if "blocks" in payload:
                blocks = json.dumps(payload["blocks"])
            if "attachments" in payload:
                attachments = json.dumps(payload["attachments"])
            if "text" in payload:
                text = payload["text"]
        elif message is not None:
            text = message  # slack.py:121-124

        response = None
        if file_content is not None:
            # slack.py:128-152: message first (when templated), then file
            if template is not None:
                response = self.client.api_call(
                    "chat.postMessage",
                    channel=channel,
                    text=text,
                    blocks=blocks,
                    attachments=attachments,
                )
            self.client.api_call(
                "files.upload",
                content=file_content,
                title=text,
                channels=channel,
                filetype=file_type,
                filename=file_name,
            )
        else:
            response = self.client.api_call(
                "chat.postMessage",
                channel=channel,
                text=text,
                blocks=blocks,
                attachments=attachments,
            )
        return {"success": True, "channel": channel, "response": response}
