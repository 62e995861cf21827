"""airwatch/assetpanda/duo/tenable connector tests (the last four
reference connector modules, fake transports)."""

from __future__ import annotations

import datetime as dt

from snowalert_spark.sources import inventory as I

NOW = dt.datetime(2024, 5, 1, 12, 0)


def test_airwatch_zero_based_pages():
    pages_served = {0: [{"Udid": "u1", "SerialNumber": "s1"}],
                    1: [{"Udid": "u2", "SerialNumber": "s2"}],
                    2: []}
    calls = []

    def get(url, params):
        calls.append(params["Page"])
        return {"Devices": pages_served[params["Page"]]}

    pages = list(I.airwatch_devices(
        {"host_airwatch": "aw.example.com"}, get, now=NOW))
    assert calls == [0, 1, 2]
    assert [len(p) for p in pages] == [1, 1]
    snap, raw, *fields = pages[0][0]
    assert snap == NOW and raw["Udid"] == "u1"
    assert fields[I.AIRWATCH_DEVICE_FIELDS.index("Udid")] == "u1"


def test_assetpanda_field_renaming_and_offset_walk():
    def get(url, params):
        if url.endswith("/objects"):
            return {"objects": [
                {"id": "a1", "field_144": {"value": "00:0a"},
                 "field_135": "10.0.0.9"},
            ], "totals": {"objects": 1}}
        return {"fields": [
            {"key": "field_144", "name": "MAC Address!"},
            {"key": "field_135", "name": "IP"},
        ]}

    pages = list(I.assetpanda_objects({"asset_entity_id": "e9"}, get, now=NOW))
    assert len(pages) == 1
    raw, oid, ts = pages[0][0]
    assert oid == "a1" and ts == NOW
    assert raw["MAC_Address"] == {"value": "00:0a"}
    assert raw["IP"] == "10.0.0.9"
    assert "field_144" not in raw


def test_assetpanda_collision_suffixing():
    objs = [{"field_1": "x", "MAC": "keep"}]
    out = I.replace_device_keys(objs, {"field_1": "MAC"})
    assert out[0] == {"MAC": "keep", "MAC_2": "x"}


def test_duo_admin_dump():
    rows = I.duo_admins(lambda: [{"name": "adm1"}, {"name": "adm2"}])
    assert rows == [{"raw": {"name": "adm1"}}, {"raw": {"name": "adm2"}}]


def test_tenable_users_role_mapping():
    rows = I.tenable_users([
        {"username": "kim", "permissions": 64, "id": 7},
        {"username": "lee", "permissions": 3, "id": 8},
    ], NOW)
    assert rows[0][1] == "Administrator"
    assert rows[1][1] == "unknown permissions {permissions}"
    assert rows[0][0] == "kim" and rows[0][3] == NOW


def test_tenable_export_daily_gate():
    now = dt.datetime(2024, 5, 2, 12, tzinfo=dt.timezone.utc)
    # fresh export ran 2 hours ago: gated
    assert I.tenable_vulns_export(
        now - dt.timedelta(hours=2), lambda: iter([{"v": 1}]), now=now) == []
    # stale: marker row first, then vulns
    rows = I.tenable_vulns_export(
        now - dt.timedelta(days=2), lambda: iter([{"v": 1}]), now=now)
    assert rows[0] == {"export_at": now}
    assert rows[1] == {"raw": {"v": 1}, "export_at": now}
    # never ran: also exports
    assert len(I.tenable_vulns_export(None, lambda: iter([]), now=now)) == 1


def test_salesforce_event_log_extract():
    queries = []

    def query(soql):
        queries.append(soql)
        return {"totalSize": 1, "records": [
            {"Id": "0AT1", "EventType": "Login",
             "attributes": {"url": "/services/data/v38.0/sobjects/"
                                   "EventLogFile/0AT1"}},
        ]}

    def download(url_relative):
        assert url_relative == "sobjects/EventLogFile/0AT1/LogFile"
        return ("EVENT_TYPE,USER_ID,TIMESTAMP_DERIVED\n"
                "Login,u1,2024-05-01T10:00:00.000Z\n"
                "Login,u2,2024-05-01T10:01:00.000Z\n")

    out = dict(I.salesforce_event_logs(
        "2024-05-01T00:00:00.000Z", query, download))
    assert "logdate > 2024-05-01T00:00:00.000Z" in queries[0]
    assert [r["USER_ID"] for r in out["0AT1"]] == ["u1", "u2"]


def test_salesforce_default_watermark_is_epoch():
    seen = []
    list(I.salesforce_event_logs(None, lambda q: seen.append(q) or {},
                                 lambda u: ""))
    assert "logdate > 1900-01-01T00:00:00.000Z" in seen[0]
