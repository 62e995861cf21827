"""azure_collect connector tests (reference semantics from
src/connectors/azure_collect.py:753-1933 with a fake transport):
url building, strict response maps with '*' wildcards, pagination,
empty-page and error-row shaping, subscription→resource DAG fan-out —
and an end-to-end proof that collected rows satisfy an actual
cis_azure pack view."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from snowalert_spark.sources import azure_collect as AZ
from snowalert_spark.sources.azure_collect import TransportPage

NOW = dt.datetime(2024, 5, 1, 12, 0)
OPTS = {"tenant": "t1"}


class FakeTransport:
    def __init__(self, routes, header_date=NOW):
        self.routes = dict(routes)
        self.header_date = header_date
        self.calls = []

    def __call__(self, url, headers):
        self.calls.append(url)
        body = self.routes[url]
        return TransportPage(200, body, header_date=self.header_date)


def test_build_url_mgmt_and_graph():
    assert AZ.build_url("pricings", {"subscriptionId": "sub1"}) == (
        "https://management.azure.com/subscriptions/sub1"
        "/providers/Microsoft.Security/pricings?api-version=2018-06-01"
    )
    assert AZ.build_url("users", {}).startswith(
        "https://graph.microsoft.com/v1.0/users?%24select="
    )
    assert AZ.build_url("pricings", {"subscriptionId": "s"}, cloud="usgov"
                        ).startswith("https://management.usgovcloudapi.net/")


def test_map_row_strict_and_wildcard():
    row = AZ.map_row("pricings", {
        "id": "p1", "name": "n", "properties": {"pricingTier": "Free"},
        "type": "t", "subscriptionId": "sub1", "headerDate": NOW,
        "tenantId": "t1",
    })
    assert row["subscription_id"] == "sub1" and row["recorded_at"] == NOW
    # strict map: an unmapped key raises (azure_collect.py:1901-1909)
    with pytest.raises(KeyError):
        AZ.map_row("pricings", {"unexpectedField": 1})
    # '*' specs capture the whole value as raw instead
    row = AZ.map_row("security_contacts", {"unexpectedField": 1})
    assert row["raw"] == {"unexpectedField": 1}


def test_get_pages_follows_next_links():
    u1 = AZ.build_url("pricings", {"subscriptionId": "sub1"})
    t = FakeTransport({
        u1: {"value": [{"id": "p1", "name": "a", "properties": {},
                        "type": "t"}],
             "nextLink": u1 + "&skip=1"},
        u1 + "&skip=1": {"value": [{"id": "p2", "name": "b",
                                    "properties": {}, "type": "t"}]},
    })
    rows = list(AZ.get_pages("pricings", {"subscriptionId": "sub1"}, t, "t1"))
    assert [r["id"] for r in rows] == ["p1", "p2"]
    assert all(r["tenant_id"] == "t1" and r["subscription_id"] == "sub1"
               for r in rows)


def test_empty_page_lands_empty_row():
    """azure_collect.py:1858: a subscription with no log profiles still
    records a row (NULL name) — exactly what CIS 5.1.1 alerts on."""
    u = AZ.build_url("log_profiles", {"subscriptionId": "sub2"})
    t = FakeTransport({u: {"value": []}})
    rows = list(AZ.get_pages("log_profiles", {"subscriptionId": "sub2"}, t, "t1"))
    assert len(rows) == 1
    assert rows[0]["name"] is None and rows[0]["subscription_id"] == "sub2"


def test_error_payload_lands_error_row():
    u = AZ.build_url("disks", {"subscriptionId": "sub1"})
    t = FakeTransport({u: {"value": "AuthorizationFailed"}})
    rows = list(AZ.get_pages("disks", {"subscriptionId": "sub1"}, t, "t1"))
    assert rows[0]["error"] == "AuthorizationFailed"


def test_subscription_fanout_dag():
    subs_url = AZ.build_url("subscriptions", {})
    routes = {
        subs_url: {"value": [{"id": "/subscriptions/sub1",
                              "subscriptionId": "sub1",
                              "displayName": "Prod", "state": "Enabled"}]},
    }
    for kind in ("virtual_machines", "disks", "role_definitions",
                 "role_assignments", "pricings", "auto_provisioning_settings",
                 "policy_assignments", "security_contacts", "vaults",
                 "network_watchers", "network_security_groups", "log_profiles",
                 "subscriptions_locations", "storage_accounts"):
        routes[AZ.build_url(kind, {"subscriptionId": "sub1"})] = {"value": []}
    t = FakeTransport(routes)
    batches = dict(AZ.ingest(OPTS | {}, t, kinds=("subscriptions",)))
    assert batches["subscriptions"][0]["subscription_id"] == "sub1"
    assert len(batches) == 15  # subscriptions + 14 child kinds
    assert all(len(rows) == 1 for k, rows in batches.items())  # empty rows


def test_collected_rows_feed_the_pack_view(spark):
    """End-to-end: collect pricing rows via the connector, land them as
    data_azure_collect_pricings, run the verbatim AZURE_CIS_2_1 pack
    view over them."""
    from snowalert_spark import packs
    from snowalert_spark.rules import RuleRegistry

    if not __import__("os").path.isdir(packs.PACKS_DIR):
        pytest.skip("reference packs dir unavailable")

    u = AZ.build_url("pricings", {"subscriptionId": "sub9"})
    recent = dt.datetime.utcnow()  # the pack view windows on recorded_at
    t = FakeTransport({
        u: {"value": [
            {"id": "p1", "name": "SecurityCenterFree",
             "properties": {"pricingTier": "Free"}, "type": "t"},
            {"id": "p2", "name": "Default2",
             "properties": {"pricingTier": "Standard"}, "type": "t"},
        ]},
    }, header_date=recent)
    rows = list(AZ.get_pages("pricings", {"subscriptionId": "sub9"}, t, "t9"))
    landed = [
        (r["tenant_id"], r["subscription_id"], r["name"], r["type"],
         json.dumps(r["properties"]), r["recorded_at"])
        for r in rows
    ]
    spark.createDataFrame(
        landed,
        "tenant_id string, subscription_id string, name string, type string, "
        "properties string, recorded_at timestamp",
    ).createOrReplaceTempView("data_azure_collect_pricings")

    reg = RuleRegistry()
    packs.register_pack_rules(
        reg, f"{packs.PACKS_DIR}/cis_azure_pack.sql",
        only={"AZURE_CIS_2_1_VIOLATION_QUERY"})
    out = reg.rules["AZURE_CIS_2_1_VIOLATION_QUERY"].df(spark).collect()
    assert len(out) == 1
    ident = json.loads(out[0].identity)
    assert ident["subscription_id"] == "sub9" and ident["tenant_id"] == "t9"
