"""Notification dispatch handlers (reference: src/runners/handlers/
{pd,sms,sns,ses,smtp,service_now,sp}.py) — the remaining seven plug-ins
of the reference's handler surface, each with its external client
injected so every decision path is testable offline.

Contract notes carried from the reference:
- pd.py:28-68: severity outside the allowed list falls back to the
  *last* entry ('unknown'); custom details default to the whole alert.
- sms.py:9-38: recipient phone and message are both required.
- sns.py:9-64: at least one of topic/target/phone required;
  MessageStructure='json' serializes the message.
- ses.py:7-79: recipient and text required; cc/bcc/reply_to are
  comma-split; optional Html part.
- smtp.py:20-99: MIME multipart ('alternative' when html present),
  recipients = to + cc + bcc, reply-to header.
- service_now.py:37-108: oauth refresh-token exchange when a client id
  is configured (failed exchange raises), else basic auth, else skip;
  default field-prefixed incident payload; non-201 raises.
- sp.py:5-54: positional-parameter procedure call returning the first
  cell of the first row.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

PD_SEVERITIES = ["critical", "error", "warning", "info", "unknown"]


@dataclass
class PagerDutyHandler:
    client: object  # trigger(summary, source, dedup_key, severity, custom_details)

    def handle(self, alert, summary=None, source=None, dedup_key=None,
               severity=None, custom_details=None):
        summary = summary or alert["DESCRIPTION"]
        source = source or alert["DETECTOR"]
        severity = severity or alert["SEVERITY"]
        if severity not in PD_SEVERITIES:
            severity = PD_SEVERITIES[-1]
        return self.client.trigger(
            summary, source, dedup_key, severity,
            custom_details=custom_details or alert,
        )


@dataclass
class SmsHandler:
    client: object  # create(body, from_, to)

    def handle(self, alert, recipient_phone=None, sender_phone=None,
               message=None):
        if recipient_phone is None or message is None:
            return None
        return self.client.create(
            body=message, from_=sender_phone, to=recipient_phone
        )


@dataclass
class SnsHandler:
    client: object  # publish(**params)

    def handle(self, alert, topic=None, target=None, recipient_phone=None,
               subject=None, message_structure=None, message=None):
        if recipient_phone is None and topic is None and target is None:
            return None
        if message is None:
            return None
        params = {}
        if message_structure is not None:
            params["MessageStructure"] = message_structure
            if message_structure == "json":
                message = json.dumps(message)
        if topic is not None:
            params["TopicArn"] = topic
        if target is not None:
            params["TargetArn"] = target
        if recipient_phone is not None:
            params["PhoneNumber"] = recipient_phone
        if subject is not None:
            params["Subject"] = subject
        params["Message"] = message
        return self.client.publish(**params)


@dataclass
class SesHandler:
    client: object  # send_email(Destination, Message, Source, ReplyToAddresses)

    def handle(self, alert, recipient_email=None, sender_email=None,
               text=None, html=None, subject=None, cc=None, bcc=None,
               reply_to=None, charset="UTF-8"):
        if recipient_email is None or text is None:
            return None
        destination = {
            "ToAddresses": [recipient_email],
            "CcAddresses": cc.split(",") if cc else [],
            "BccAddresses": bcc.split(",") if bcc else [],
        }
        body = {"Text": {"Charset": charset, "Data": text}}
        if html is not None:
            body["Html"] = {"Charset": charset, "Data": html}
        message = {"Body": body,
                   "Subject": {"Charset": charset, "Data": subject}}
        return self.client.send_email(
            Destination=destination,
            Message=message,
            Source=sender_email,
            ReplyToAddresses=reply_to.split(",") if reply_to else [],
        )


@dataclass
class SmtpHandler:
    # connect(host, port, use_ssl, use_tls) -> login/sendmail/close
    connect: object
    host: str = ""
    port: int = 587
    user: str = ""
    password: str = ""
    use_ssl: bool = True
    use_tls: bool = True

    def handle(self, alert, sender_email=None, recipient_email=None,
               text=None, html=None, subject=None, reply_to=None,
               cc=None, bcc=None):
        from email.mime.multipart import MIMEMultipart
        from email.mime.text import MIMEText

        sender_email = sender_email or self.user
        if recipient_email is None or text is None:
            return None
        message = MIMEMultipart("alternative" if html else "mixed")
        message.attach(MIMEText(text, "plain"))
        if html is not None:
            message.attach(MIMEText(html, "html"))
        message["Subject"] = subject
        message["From"] = sender_email
        message["To"] = recipient_email
        recipients = recipient_email.split(",")
        if cc is not None:
            message["Cc"] = cc
            recipients += cc.split(",")
        if bcc is not None:
            recipients += bcc.split(",")
        if reply_to is not None:
            message.add_header("reply-to", reply_to)
        server = self.connect(self.host, self.port, self.use_ssl, self.use_tls)
        try:
            if self.user and self.password:
                server.login(self.user, self.password)
            return server.sendmail(sender_email, recipients, message.as_string())
        finally:
            server.close()


@dataclass
class ServiceNowHandler:
    # post(url, auth=None, data=None, json=None) -> (status, body);
    # defaults to the stdlib HTTPS PostTransport when not injected
    transport: object = None
    host: str = ""
    endpoint: str = "/now/table/incident"
    field_prefix: str = ""
    username: str | None = None
    password: str | None = None
    oauth_client_id: str | None = None
    oauth_client_secret: str | None = None
    oauth_refresh_token: str | None = None

    def handle(self, alert, assignee="", payload=None):
        if not self.host:
            return None
        if self.transport is None:
            from snowalert_spark.sources.transport import PostTransport

            self.transport = PostTransport()
        access_token = None
        if self.oauth_client_id:
            status, result = self.transport.post(
                f"https://{self.host}/oauth_token.do",
                data={
                    "grant_type": "refresh_token",
                    "client_id": self.oauth_client_id,
                    "client_secret": self.oauth_client_secret,
                    "refresh_token": self.oauth_refresh_token,
                },
            )
            access_token = (result or {}).get("access_token")
            if not access_token:
                raise RuntimeError(result)
        if not (self.username and self.password) and not access_token:
            return None
        fp = self.field_prefix
        auth = (
            {"bearer": access_token}
            if access_token
            else (self.username, self.password)
        )
        status, body = self.transport.post(
            f"https://{self.host}/api{self.endpoint}",
            auth=auth,
            json=payload or {
                f"{fp}contact_type": "Integration",
                f"{fp}impact": "2",
                f"{fp}urgency": "2",
                f"{fp}category": "IT Security",
                f"{fp}subcategory": "Remediation",
                f"{fp}assignment_group": "Security Compliance",
                f"{fp}short_description": alert.get(
                    "TITLE", "SnowAlert Generate Incident"),
                f"{fp}description": alert.get("DESCRIPTION", ""),
                f"{fp}assigned_to": assignee,
            },
        )
        if status != 201:
            raise RuntimeError(body)
        return body


@dataclass
class ProcedureHandler:
    """sp.py analog: the 'stored procedure' is a registered Python
    callable (the driver is the procedure engine here); returns the
    call result, None on error or missing procedure."""

    procedures: dict = field(default_factory=dict)

    def handle(self, alert, procedure=None, parameters=None):
        if procedure is None or procedure not in self.procedures:
            return None
        try:
            return self.procedures[procedure](*(parameters or ()))
        except Exception:
            return None
