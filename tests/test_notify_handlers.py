"""pd/sms/sns/ses/smtp/service_now/sp handler tests (reference unit
tests' behaviors, fake clients)."""

from __future__ import annotations

import json

import pytest

from snowalert_spark.handlers.notify import (
    PagerDutyHandler,
    ProcedureHandler,
    ServiceNowHandler,
    SesHandler,
    SmsHandler,
    SmtpHandler,
    SnsHandler,
)

ALERT = {"TITLE": "Root login", "DESCRIPTION": "root logged in",
         "DETECTOR": "SnowAlert", "SEVERITY": "High"}


class Recorder:
    def __init__(self, ret=None):
        self.calls = []
        self.ret = ret

    def __getattr__(self, name):
        def method(*a, **kw):
            self.calls.append((name, a, kw))
            return self.ret

        return method


def test_pagerduty_severity_fallback_and_defaults():
    pd = Recorder(ret={"status": "success"})
    out = PagerDutyHandler(client=pd).handle(ALERT)
    (name, args, kw), = pd.calls
    assert name == "trigger"
    # summary/source default from the alert; 'High' is not a PD severity
    assert args == ("root logged in", "SnowAlert", None, "unknown")
    assert kw["custom_details"] == ALERT
    out2 = PagerDutyHandler(client=pd).handle(ALERT, severity="critical")
    assert pd.calls[-1][1][3] == "critical"


def test_sms_requires_phone_and_message():
    sms = Recorder(ret={"sid": "S1"})
    h = SmsHandler(client=sms)
    assert h.handle(ALERT, message="hi") is None
    assert h.handle(ALERT, recipient_phone="+15551234") is None
    out = h.handle(ALERT, recipient_phone="+15551234", sender_phone="+15550000",
                   message="hi")
    assert out == {"sid": "S1"}
    assert sms.calls[-1][2] == {"body": "hi", "from_": "+15550000",
                                "to": "+15551234"}


def test_sns_param_building_and_json_structure():
    sns = Recorder(ret={"MessageId": "m1"})
    h = SnsHandler(client=sns)
    assert h.handle(ALERT, message="x") is None  # no destination
    assert h.handle(ALERT, topic="arn:t") is None  # no message
    h.handle(ALERT, topic="arn:t", subject="s",
             message={"default": "x"}, message_structure="json")
    _, _, kw = sns.calls[-1]
    assert kw["TopicArn"] == "arn:t" and kw["Subject"] == "s"
    assert kw["MessageStructure"] == "json"
    assert json.loads(kw["Message"]) == {"default": "x"}
    h.handle(ALERT, recipient_phone="+15551234", message="plain")
    assert sns.calls[-1][2]["PhoneNumber"] == "+15551234"


def test_ses_destination_and_optional_html():
    ses = Recorder(ret={"MessageId": "m2"})
    h = SesHandler(client=ses)
    assert h.handle(ALERT, text="t") is None
    h.handle(ALERT, recipient_email="a@x.io", sender_email="sa@x.io",
             text="t", html="<b>t</b>", subject="s",
             cc="c1@x.io,c2@x.io", reply_to="r@x.io")
    _, _, kw = ses.calls[-1]
    assert kw["Destination"]["ToAddresses"] == ["a@x.io"]
    assert kw["Destination"]["CcAddresses"] == ["c1@x.io", "c2@x.io"]
    assert kw["Message"]["Body"]["Html"]["Data"] == "<b>t</b>"
    assert kw["ReplyToAddresses"] == ["r@x.io"]


class FakeSmtp:
    def __init__(self):
        self.logins, self.sent = [], []

    def login(self, u, p):
        self.logins.append((u, p))

    def sendmail(self, sender, recipients, msg):
        self.sent.append((sender, recipients, msg))
        return {}

    def close(self):
        self.closed = True


def test_smtp_mime_and_recipient_fanout():
    server = FakeSmtp()
    h = SmtpHandler(connect=lambda h_, p, ssl_, tls: server,
                    host="mail", user="sa", password="pw")
    h.handle(ALERT, recipient_email="a@x.io,b@x.io", text="t",
             html="<p>t</p>", subject="s", cc="c@x.io", bcc="d@x.io",
             reply_to="r@x.io")
    assert server.logins == [("sa", "pw")]
    sender, recipients, msg = server.sent[0]
    assert sender == "sa"
    assert recipients == ["a@x.io", "b@x.io", "c@x.io", "d@x.io"]
    assert "Subject: s" in msg and "reply-to: r@x.io" in msg
    assert "text/html" in msg and server.closed


class SnTransport:
    def __init__(self, oauth_ok=True, status=201):
        self.oauth_ok, self.status, self.posts = oauth_ok, status, []

    def post(self, url, auth=None, data=None, json=None):
        self.posts.append((url, auth, data, json))
        if url.endswith("oauth_token.do"):
            return 200, ({"access_token": "tok"} if self.oauth_ok
                         else {"error": "bad refresh"})
        return self.status, {"result": {"sys_id": "I1"}}


def test_service_now_basic_auth_payload():
    t = SnTransport()
    h = ServiceNowHandler(transport=t, host="sn.example.com",
                          field_prefix="u_", username="u", password="p")
    out = h.handle(ALERT, assignee="kim")
    url, auth, _, payload = t.posts[-1]
    assert url == "https://sn.example.com/api/now/table/incident"
    assert auth == ("u", "p")
    assert payload["u_short_description"] == "Root login"
    assert payload["u_assigned_to"] == "kim"
    assert out == {"result": {"sys_id": "I1"}}


def test_service_now_oauth_and_failures():
    t = SnTransport(oauth_ok=True)
    h = ServiceNowHandler(transport=t, host="sn", oauth_client_id="cid",
                          oauth_client_secret="cs", oauth_refresh_token="rt")
    h.handle(ALERT)
    assert t.posts[-1][1] == {"bearer": "tok"}
    with pytest.raises(RuntimeError):
        ServiceNowHandler(transport=SnTransport(oauth_ok=False), host="sn",
                          oauth_client_id="cid").handle(ALERT)
    with pytest.raises(RuntimeError):
        ServiceNowHandler(transport=SnTransport(status=403), host="sn",
                          username="u", password="p").handle(ALERT)
    # unconfigured → skip, no raise
    assert ServiceNowHandler(transport=SnTransport(), host="").handle(ALERT) is None
    assert ServiceNowHandler(transport=SnTransport(), host="sn").handle(ALERT) is None


def test_procedure_handler():
    h = ProcedureHandler(procedures={
        "escalate": lambda sev, team: f"{team}:{sev}",
        "boom": lambda: 1 / 0,
    })
    assert h.handle(ALERT, procedure="escalate",
                    parameters=["high", "secops"]) == "secops:high"
    assert h.handle(ALERT, procedure="boom") is None  # errors quarantine
    assert h.handle(ALERT, procedure="missing") is None
    assert h.handle(ALERT) is None
