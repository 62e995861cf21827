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


SUB_CHILD_KINDS = (
    "virtual_machines", "disks", "sql_servers", "role_definitions",
    "role_assignments", "pricings", "auto_provisioning_settings",
    "policy_assignments", "security_contacts", "activity_log_alerts",
    "vaults", "network_watchers", "network_security_groups", "log_profiles",
    "hosting_environments", "resource_groups", "subscriptions_locations",
    "managed_clusters", "storage_accounts",
)


def test_subscription_fanout_dag():
    """Full reference fan-out (azure_collect.py:768-810): 19 child
    kinds per subscription; empty child pages land empty rows and
    spawn no grandchildren (their arg bindings are NULL)."""
    subs_url = AZ.build_url("subscriptions", {})
    routes = {
        subs_url: {"value": [{"id": "/subscriptions/sub1",
                              "subscriptionId": "sub1",
                              "displayName": "Prod", "state": "Enabled"}]},
    }
    for kind in SUB_CHILD_KINDS:
        routes[AZ.build_url(kind, {"subscriptionId": "sub1"})] = {"value": []}
    t = FakeTransport(routes)
    batches = dict(AZ.ingest(OPTS | {}, t, kinds=("subscriptions",)))
    assert batches["subscriptions"][0]["subscription_id"] == "sub1"
    assert len(batches) == 20  # subscriptions + 19 child kinds
    assert all(len(rows) == 1 for k, rows in batches.items())  # empty rows


def test_spec_covers_all_reference_kinds():
    """All 37 kinds of the reference API_SPECS (azure_collect.py:
    753-1790) are encoded, and every child kind is itself spec'd."""
    assert len(AZ.API_SPECS) == 37
    for kind, spec in AZ.API_SPECS.items():
        for child in spec.get("children", []):
            assert child["kind"] in AZ.API_SPECS, f"{kind} -> {child['kind']}"
    # landing naming parity: the subscriptions seed lands _connection
    assert AZ.landing_table("subscriptions") == "data_azure_collect_connection"
    assert AZ.landing_table("pricings") == "data_azure_collect_pricings"


def test_groups_members_chain():
    """Graph group → per-member child with groupId echo and '*' raw."""
    groups_url = AZ.build_url("groups", {})
    members_url = AZ.build_url("groups_members", {"groupId": "g1"})
    t = FakeTransport({
        groups_url: {"value": [{"id": "g1", "displayName": "Admins",
                                "securityEnabled": True}]},
        members_url: {"value": [
            {"id": "u1", "@odata.type": "#microsoft.graph.user",
             "extraField": "kept-in-raw"},
        ]},
    })
    batches = dict(AZ.ingest(OPTS | {}, t, kinds=("groups",)))
    assert batches["groups"][0]["display_name"] == "Admins"
    m = batches["groups_members"][0]
    assert m["group_id"] == "g1" and m["odata_type"] == "#microsoft.graph.user"
    assert m["raw"]["extraField"] == "kept-in-raw"


def test_vault_data_plane_host_templating():
    """vaults_keys hosts are per-vault templates
    (azure_collect.py:1233-1236); usgov swaps the suffix."""
    assert AZ.build_url("vaults_keys", {"vaultName": "v1"}).startswith(
        "https://v1.vault.azure.net/keys?api-version=7.0")
    assert AZ.build_url("vaults_keys", {"vaultName": "v1"}, cloud="usgov"
                        ).startswith("https://v1.vault.usgovcloudapi.net/")


def test_vaults_spawn_keys_secrets_diagnostics():
    vaults_url = AZ.build_url("vaults", {"subscriptionId": "sub1"})
    routes = {
        vaults_url: {"value": [{"id": "/subscriptions/sub1/v1", "name": "v1",
                                "location": "eastus", "type": "kv",
                                "tags": {}}]},
        AZ.build_url("vaults_keys", {"vaultName": "v1"}): {"value": [
            {"kid": "https://v1.vault.azure.net/keys/k1",
             "attributes": {"enabled": True}, "managed": None, "tags": None}]},
        AZ.build_url("vaults_secrets", {"vaultName": "v1"}): {"value": []},
        AZ.build_url("diagnostic_settings",
                     {"resourceUri": "/subscriptions/sub1/v1"}): {"value": []},
    }
    t = FakeTransport(routes)
    vault_rows = list(AZ.get_pages("vaults", {"subscriptionId": "sub1"}, t, "t1"))
    children = list(AZ.child_tasks("vaults", vault_rows[0]))
    assert [k for k, _ in children] == [
        "vaults_keys", "vaults_secrets", "diagnostic_settings"]
    batches = {k: list(AZ.get_pages(k, args, t, "t1")) for k, args in children}
    assert batches["vaults_keys"][0]["kid"].endswith("/keys/k1")
    assert batches["vaults_keys"][0]["vault_name"] == "v1"
    assert batches["diagnostic_settings"][0]["resource_uri"] == (
        "/subscriptions/sub1/v1")


def test_hosting_environment_callable_arg_binding():
    """webapps' resourceGroupName binds via a callable from
    properties.resourceGroup (azure_collect.py:1325-1328)."""
    row = {"subscription_id": "sub1", "name": "ase1",
           "properties": {"resourceGroup": "rg9"}}
    children = dict(AZ.child_tasks("hosting_environments", row))
    assert children["webapps"] == {
        "subscriptionId": "sub1", "resourceGroupName": "rg9", "name": "ase1"}
    # missing resourceGroup → binding is None → child skipped
    assert not list(AZ.child_tasks("hosting_environments",
                                   {**row, "properties": {}}))


def test_queue_services_properties_header_and_value_key():
    """Storage data-plane call versions via x-ms-version header and
    unwraps the StorageServiceProperties envelope."""
    url = AZ.build_url("queue_services_properties",
                       {"subscriptionId": "sub1", "accountName": "acct1",
                        "accountFullId": "/subscriptions/sub1/sa/acct1"})
    assert url.startswith("https://acct1.queue.core.windows.net/?")
    assert "api-version" not in url
    assert AZ.request_headers("queue_services_properties") == {
        "Accept": "application/json", "x-ms-version": "2019-12-12"}
    t = FakeTransport({url: {"StorageServiceProperties": {
        "Logging": {"Read": "true"}, "HourMetrics": {"Enabled": "false"}}}})
    rows = list(AZ.get_pages(
        "queue_services_properties",
        {"subscriptionId": "sub1", "accountName": "acct1",
         "accountFullId": "/subscriptions/sub1/sa/acct1"}, t, "t1"))
    assert rows[0]["logging"] == {"Read": "true"}
    assert rows[0]["account_name"] == "acct1"


def test_sql_server_auditing_chain():
    sql_url = AZ.build_url("sql_servers", {"subscriptionId": "sub1"})
    srv_id = "/subscriptions/sub1/providers/Microsoft.Sql/servers/s1"
    routes = {
        sql_url: {"value": [{"id": srv_id, "name": "s1", "location": "eastus",
                             "type": "t", "kind": "v12", "properties": {},
                             "tags": {}, "identity": None}]},
        AZ.build_url("sql_servers_auditing_settings",
                     {"serverFullId": srv_id}): {"value": [
            {"id": srv_id + "/auditingSettings/default", "name": "default",
             "type": "t", "properties": {"state": "Disabled"}}]},
    }
    t = FakeTransport(routes)
    srv_rows = list(
        AZ.get_pages("sql_servers", {"subscriptionId": "sub1"}, t, "t1"))
    (ck, args), = AZ.child_tasks("sql_servers", srv_rows[0])
    assert ck == "sql_servers_auditing_settings"
    audit = list(AZ.get_pages(ck, args, t, "t1"))[0]
    assert audit["server_full_id"] == srv_id
    assert audit["properties"]["state"] == "Disabled"


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
