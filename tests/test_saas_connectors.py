"""gsuite/jamf connector tests (reference behaviors with fake
transports): per-(subject,event) watermarks, login-row projection with
param collapsing, jamf id→detail fan-out."""

from __future__ import annotations

import datetime as dt

from snowalert_spark.sources import saas_logs as S


def test_gsuite_per_key_watermarks_and_projection():
    listed = []
    watermarks = {("a@x.io", "login_failure"): dt.datetime(2024, 5, 1, 9)}

    def list_activities(subject, event, start):
        listed.append((subject, event, start))
        if (subject, event) != ("a@x.io", "login_failure"):
            return {}
        return {"items": [{
            "id": {"time": "2024-05-01T10:00:00Z", "customerId": "C1"},
            "etag": '"abc"',
            "events": [{"name": "login_failure",
                        "parameters": [
                            {"name": "login_type", "value": "google_password"},
                            {"name": "is_suspicious", "boolValue": True},
                            {"name": "factors", "multiValue": ["pwd", "otp"]},
                        ]}],
            "actor": {"email": "bob@x.io", "profileId": "p9"},
            "ipAddress": "1.2.3.4",
        }]}

    out = list(S.gsuite_ingest(
        {"subjects_list": ["a@x.io", "b@x.io"]},
        list_activities,
        lambda s, e: watermarks.get((s, e)),
    ))
    # 2 subjects x 5 login event types, each its own listing + watermark
    assert len(out) == 10
    assert listed.count(("a@x.io", "login_failure",
                         dt.datetime(2024, 5, 1, 9))) == 1
    assert all(start is None for (s, e, start) in listed
               if (s, e) != ("a@x.io", "login_failure"))

    rows = dict(((s, e), r) for s, e, r in out)[("a@x.io", "login_failure")]
    (time, etag, subject, event, params, customer, email, profile, ip, raw), = rows
    assert etag == "abc" and subject == "a@x.io" and event == "login_failure"
    assert params == {"login_type": "google_password", "is_suspicious": True,
                      "factors": ["pwd", "otp"]}
    assert customer == "C1" and email == "bob@x.io" and ip == "1.2.3.4"


def test_gsuite_empty_subject_list_runs_default_subject():
    seen = []
    list(S.gsuite_ingest({}, lambda s, e, t: seen.append(s) or {},
                         lambda s, e: None))
    assert seen == [""] * len(S.LOGIN_EVENTS)


def test_jamf_id_to_detail_fanout():
    at = dt.datetime(2024, 5, 1, 12)

    def fetch(url):
        if url == "/computers":
            return {"computers": [{"id": 1}, {"id": 2}]}, at
        if url == "/computers/id/1":
            return {"computer": {"general": {"name": "mac-1"}}}, at
        if url == "/computers/id/2":
            return {}, at  # detail failed to parse: id + time still land
        raise AssertionError(url)

    rows = S.jamf_computers(fetch)
    assert [r["computer_id"] for r in rows] == [1, 2]
    assert rows[0]["general"]["name"] == "mac-1"
    assert rows[1] == {"computer_id": 2, "recorded_at": at}
