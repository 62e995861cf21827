"""Concrete okta connector tests (reference style:
src/connectors/okta.py behaviors — pagination, empty page, since-cursor
resume, group member embedding — driven by a dict-backed fake
transport, landing in Spark parquet via LandingStore)."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from snowalert_spark.sources import okta
from snowalert_spark.sources.okta import TransportResponse
from snowalert_spark.sources.rest import LandingStore

OPTS = {"subdomain": "acme", "api_key": "k3y"}
BASE = "https://acme.okta.com/api/v1"


class FakeTransport:
    """url -> list of responses (served in order; last one repeats)."""

    def __init__(self, routes):
        self.routes = {u: list(rs) for u, rs in routes.items()}
        self.calls = []

    def __call__(self, url, headers, params):
        self.calls.append((url, params))
        assert headers["Authorization"] == "SSWS k3y"
        rs = self.routes[url]
        return rs.pop(0) if len(rs) > 1 else rs[0]


def _users(n, start=0):
    return [{"id": f"u{i}", "status": "ACTIVE"} for i in range(start, start + n)]


def test_users_pagination_follows_next_links():
    t = FakeTransport({
        f"{BASE}/users": [
            TransportResponse(200, _users(2), {"next": f"{BASE}/users?after=u1"})],
        f"{BASE}/users?after=u1": [TransportResponse(200, _users(1, start=2))],
        f'{BASE}/users?filter=status+eq+"DEPROVISIONED"':
            [TransportResponse(200, [])],
    })
    pages = list(okta.ingest("OKTA_USERS_CONNECTION", OPTS, transport=t))
    assert [len(p) for p in pages] == [2, 1]
    assert [r["id"] for page in pages for r, _ in page] == ["u0", "u1", "u2"]


def test_users_includes_deprovisioned_pass():
    t = FakeTransport({
        f"{BASE}/users": [TransportResponse(200, _users(1))],
        f'{BASE}/users?filter=status+eq+"DEPROVISIONED"':
            [TransportResponse(200, [{"id": "gone", "status": "DEPROVISIONED"}])],
    })
    pages = list(okta.ingest("OKTA_USERS_CONNECTION", OPTS, transport=t))
    assert [r["id"] for page in pages for r, _ in page] == ["u0", "gone"]


def test_error_status_aborts_without_raising():
    t = FakeTransport({
        f"{BASE}/users": [
            TransportResponse(200, _users(1), {"next": f"{BASE}/users?after=u0"})],
        f"{BASE}/users?after=u0": [TransportResponse(429, {"error": "rate"})],
        f'{BASE}/users?filter=status+eq+"DEPROVISIONED"':
            [TransportResponse(200, [])],
    })
    pages = list(okta.ingest("OKTA_USERS_CONNECTION", OPTS, transport=t))
    assert [len(p) for p in pages] == [1]  # partial progress kept


def test_groups_embed_member_lists():
    t = FakeTransport({
        f"{BASE}/groups": [TransportResponse(200, [
            {"id": "g1", "_links": {"users": {"href": f"{BASE}/groups/g1/users"}}},
        ])],
        f"{BASE}/groups/g1/users": [TransportResponse(200, _users(2))],
    })
    pages = list(okta.ingest("OKTA_GROUPS_CONNECTION", OPTS, transport=t))
    (page,) = pages
    (row, _), = ((r, ts) for r, ts in page)
    assert [u["id"] for u in row["users"]] == ["u0", "u1"]


def test_logs_default_cursor_is_one_hour_ago():
    now = dt.datetime(2024, 5, 1, 12, 0, 0)
    t = FakeTransport({f"{BASE}/logs": [TransportResponse(200, [])]})
    list(okta.ingest("OKTA_SYSTEM_LOG_CONNECTION", OPTS, transport=t, now=now))
    (_, params), = t.calls
    assert params == {"since": "2024-05-01T11:00:00.000Z",
                      "limit": 500, "sortOrder": "ASCENDING"}


def test_logs_cursor_resume_and_published_event_times():
    latest = dt.datetime(2024, 5, 1, 10, 30, 0)
    ev = lambda i, ts: {"uuid": f"e{i}", "published": ts,
                        "eventType": "user.session.start"}
    t = FakeTransport({
        f"{BASE}/logs": [TransportResponse(
            200,
            [ev(1, "2024-05-01T10:31:00.000Z"), ev(2, "2024-05-01T10:32:00.000Z")],
            {"next": f"{BASE}/logs?after=e2"},
        )],
        f"{BASE}/logs?after=e2": [TransportResponse(200, [])],
    })
    pages = list(okta.ingest(
        "OKTA_SYSTEM_LOG_CONNECTION", OPTS, transport=t,
        latest_event_time=latest))
    assert t.calls[0][1]["since"] == "2024-05-01T10:30:00.000Z"
    (page,) = pages
    assert [ts for _, ts in page] == [
        dt.datetime(2024, 5, 1, 10, 31), dt.datetime(2024, 5, 1, 10, 32)]
    # the next-page fetch must not resend the initial params
    assert t.calls[1] == (f"{BASE}/logs?after=e2", None)


def test_connect_names_three_landing_tables():
    out = okta.connect("default", OPTS)
    assert out["tables"] == [
        "data.okta_system_log_connection",
        "data.okta_users_connection",
        "data.okta_groups_connection",
    ]
    out = okta.connect("prod", OPTS)
    assert out["tables"][0] == "data.okta_prod_system_log_connection"


def test_landing_roundtrip_and_cursor(spark, tmp_path):
    """End-to-end: land two log pages via LandingStore.append_timed,
    then resume with fetch_latest as the since-cursor — and the landed
    rows satisfy the okta.sql projection chain (raw:path::type)."""
    landing = LandingStore(spark, str(tmp_path))
    ev = lambda i, ts: {"uuid": f"e{i}", "published": ts,
                        "eventType": "user.session.start",
                        "actor": {"id": f"u{i}"}}
    t = FakeTransport({
        f"{BASE}/logs": [TransportResponse(
            200, [ev(1, "2024-05-01T10:31:00.000Z")])],
    })
    for page in okta.ingest("OKTA_SYSTEM_LOG_CONNECTION", OPTS, transport=t,
                            latest_event_time=dt.datetime(2024, 5, 1, 10, 0)):
        landing.append_timed("okta_system_log_connection", page)

    assert landing.fetch_latest("okta_system_log_connection") == dt.datetime(
        2024, 5, 1, 10, 31)
    assert landing.fetch_latest("missing_table") is None

    df = landing.read("okta_system_log_connection")
    row = df.collect()[0]
    assert json.loads(row.raw)["eventType"] == "user.session.start"
    assert row.event_time == dt.datetime(2024, 5, 1, 10, 31)
