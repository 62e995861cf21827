"""Device-inventory connector tests (reference walks from
cisco_umbrella.py, crowdstrike_devices.py, meraki_devices.py with fake
transports)."""

from __future__ import annotations

import datetime as dt

import pytest

from snowalert_spark.sources import devices as D

NOW = dt.datetime(2024, 5, 1, 12, 0)


def test_umbrella_page_number_pagination():
    calls = []

    def get(url, params):
        calls.append(dict(params))
        page = params["page"]
        if page == 1:
            return [{"deviceId": "d1", "name": "laptop-1", "status": "on"},
                    {"deviceId": "d2", "name": "laptop-2", "status": "off"}]
        if page == 2:
            return [{"deviceId": "d3", "name": "laptop-3", "status": "on"}]
        return []

    pages = list(D.cisco_umbrella_devices(
        {"organization_id": 77}, get, now=NOW))
    assert [len(p) for p in pages] == [2, 1]
    snap, raw, device_id, *_ = pages[0][0]
    assert snap == NOW and device_id == "d1" and raw["name"] == "laptop-1"
    assert calls[0] == {"limit": 500, "page": 1}
    assert [c["page"] for c in calls] == [1, 2, 3]


def test_crowdstrike_offset_walk_and_details_expansion():
    calls = []

    def get(url, params):
        calls.append((url, params))
        if url == D.CROWDSTRIKE_IDS_URL:
            if params["offset"] == "":
                return {"resources": ["id1", "id2"],
                        "meta": {"pagination": {"offset": "tok1"}}}
            return {"resources": [], "meta": {"pagination": {"offset": ""}}}
        assert url == D.crowdstrike_details_url(["id1", "id2"])
        return {"resources": [
            {"device_id": "id1", "hostname": "h1", "platform_name": "Linux"},
            {"device_id": "id2", "hostname": "h2", "platform_name": "Mac"},
        ]}

    pages = list(D.crowdstrike_devices({}, get, now=NOW))
    assert len(pages) == 1
    snap, raw, device_id, *rest = pages[0][0]
    assert device_id == "id1"
    hostname = rest[CROWDSTRIKE_HOSTNAME_IDX]
    assert hostname == "h1"
    # second listing call carried the offset token forward
    assert calls[2][1]["offset"] == "tok1"


CROWDSTRIKE_HOSTNAME_IDX = D.CROWDSTRIKE_FIELDS.index("hostname") - 1


def test_meraki_nested_walk_whitelist_and_error_skip():
    def get(url, params):
        if url.endswith("/organizations"):
            return [{"id": "o1"}, {"name": "no-id-org"}]
        if url.endswith("/o1/networks"):
            return [{"id": "n1"}, {"id": "n2"}, {"id": "n3"}]
        if url.endswith("/n1/devices"):
            return [{"serial": "S1", "name": "ap-1", "networkId": "n1"}]
        if url.endswith("/n2/devices"):
            raise ConnectionError("403")
        raise AssertionError(url)

    pages = list(D.meraki_devices(
        {"network_id_whitelist": ["n1", "n2"]}, get, now=NOW))
    # n3 filtered by whitelist, n2 skipped on error, n1 lands
    assert len(pages) == 1
    snap, raw, serial, *_ = pages[0][0]
    assert serial == "S1" and raw["name"] == "ap-1"


def test_meraki_no_whitelist_visits_all_networks():
    visited = []

    def get(url, params):
        if url.endswith("/organizations"):
            return [{"id": "o1"}]
        if url.endswith("/networks"):
            return [{"id": "n1"}, {"id": "n2"}]
        visited.append(url)
        return []

    list(D.meraki_devices({}, get, now=NOW))
    assert sorted(visited) == [
        f"{D.MERAKI_BASE}/networks/n1/devices",
        f"{D.MERAKI_BASE}/networks/n2/devices",
    ]
