"""azure ingest → land → cis_azure pack views, end-to-end.

A fake one-tenant Azure world is crawled through the full collection
DAG (``ingest`` from the reference's six seed kinds, every child task
spawned by the spec itself), the batches are landed via
``land_batches``, and 25 cis_azure_pack.sql views (verbatim reference
SQL through the transpiler) run over those collector-landed rows —
not planted fixtures. Complements test_pack_corpus_azure.py, which
golden-pins all 45 views on hand-planted landings.

Planted violations (subscription sub1 dirty; sub2 empty of resources,
which is itself the CIS 5.1.1 violation):
1.3 guest user; 2.1 free pricing tier; 2.2 auto-provisioning off;
2.16 empty security-contact email; 3.1 HTTP allowed; 3.6 public
container; 4.1 SQL auditing disabled; 5.1.1 no log profile; 6.1 RDP
open to the world; 7.3 unattached disk; 7.4 CustomScript extension;
8.1 key without expiry; 8.2 secret without expiry.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from snowalert_spark import packs
from snowalert_spark.rules import RuleRegistry
from snowalert_spark.sources import azure_collect as AZ
from snowalert_spark.sources.azure_collect import TransportPage

pytestmark = pytest.mark.skipif(
    not os.path.isdir(packs.PACKS_DIR), reason="reference packs dir unavailable"
)

T1 = "t1"
SUB1, SUB2 = "sub1", "sub2"
VM1 = "/subscriptions/sub1/resourceGroups/rg/providers/Microsoft.Compute/virtualMachines/vm1"
VM2 = "/subscriptions/sub1/resourceGroups/rg/providers/Microsoft.Compute/virtualMachines/vm2"
SRV1 = "/subscriptions/sub1/resourceGroups/rg/providers/Microsoft.Sql/servers/sqlsrv1"
V1_ID = "/subscriptions/sub1/resourceGroups/rg/providers/Microsoft.KeyVault/vaults/v1"
BADSA_ID = "/subscriptions/sub1/resourceGroups/rg/providers/Microsoft.Storage/storageAccounts/badsa"
LOGSA_ID = "/subscriptions/sub1/resourceGroups/rg/providers/Microsoft.Storage/storageAccounts/logsa1"


def _mk_routes():
    u = AZ.build_url
    routes: dict[str, object] = {}

    # ---- tenant-level Graph seeds
    routes[u("reports_credential_user_registration_details", {})] = {"value": [
        {"id": "r1", "userPrincipalName": "admin@x.io",
         "userDisplayName": "Admin A", "isMfaRegistered": False,
         "isRegistered": False, "isEnabled": True, "isCapable": True,
         "authMethods": []},   # privileged (Owner role below) → CIS 1.1
        {"id": "r2", "userPrincipalName": "user@x.io",
         "userDisplayName": "User B", "isMfaRegistered": False,
         "isRegistered": False, "isEnabled": True, "isCapable": True,
         "authMethods": []},   # non-privileged → CIS 1.2
    ]}
    routes[u("users", {})] = {"value": [
        {"id": "uid-a", "userPrincipalName": "admin@x.io",
         "displayName": "Admin A", "userType": "Member"},
        {"id": "uid-u", "userPrincipalName": "user@x.io",
         "displayName": "User B", "userType": "Member"},
        {"id": "uid-guest", "userPrincipalName": "guest@x.io",
         "displayName": "Guest G", "userType": "Guest"},  # CIS 1.3
    ]}
    routes[u("groups", {})] = {"value": []}
    routes[u("service_principals", {})] = {"value": []}
    routes[u("managed_devices", {})] = {"value": []}

    # ---- subscriptions seed → full 19-child fan-out per subscription
    routes[u("subscriptions", {})] = {"value": [
        {"id": f"/subscriptions/{SUB1}", "subscriptionId": SUB1,
         "displayName": "Prod", "state": "Enabled"},
        {"id": f"/subscriptions/{SUB2}", "subscriptionId": SUB2,
         "displayName": "Empty", "state": "Enabled"},
    ]}

    # sub2: every child empty — its empty log_profiles row IS CIS 5.1.1
    for kind in (
        "virtual_machines", "disks", "sql_servers", "role_definitions",
        "role_assignments", "pricings", "auto_provisioning_settings",
        "policy_assignments", "security_contacts", "activity_log_alerts",
        "vaults", "network_watchers", "network_security_groups",
        "log_profiles", "hosting_environments", "resource_groups",
        "subscriptions_locations", "managed_clusters", "storage_accounts",
    ):
        routes[u(kind, {"subscriptionId": SUB2})] = {"value": []}

    sub1 = {"subscriptionId": SUB1}
    routes[u("virtual_machines", sub1)] = {"value": [
        {"id": VM1, "name": "vm1", "location": "eastus", "type": "t",
         "properties": {"storageProfile": {
             "osDisk": {"managedDisk": {"id": "d1"}},        # platform key → 7.1
             "dataDisks": [{"managedDisk": {"id": "d3"}}]}}},  # → 7.2
        {"id": VM2, "name": "vm2", "location": "eastus", "type": "t",
         "properties": {"storageProfile": {
             "osDisk": {"managedDisk": {"id": "d2"}},
             "dataDisks": [{"managedDisk": {"id": "d4"}}]}}},
    ]}
    for vm in (VM1, VM2):
        routes[u("virtual_machines_instance_view", {"vmId": vm})] = {"value": []}
    routes[u("virtual_machines_extensions", {"vmId": VM1})] = {"value": [
        {"id": VM1 + "/extensions/cs", "name": "CustomScript",  # CIS 7.4
         "location": "eastus", "type": "t", "properties": {}},
    ]}
    routes[u("virtual_machines_extensions", {"vmId": VM2})] = {"value": [
        {"id": VM2 + "/extensions/ld", "name": "LinuxDiagnostic",
         "location": "eastus", "type": "t", "properties": {}},
    ]}
    routes[u("disks", sub1)] = {"value": [
        {"id": "d1", "name": "d1", "managedBy": VM1, "location": "eastus",
         "properties": {"encryption": {"type": "EncryptionAtRestWithPlatformKey"}}},
        {"id": "d2", "name": "d2", "managedBy": VM2, "location": "eastus",
         "properties": {"encryption": {"type": "EncryptionAtRestWithCustomerKey"}}},
        {"id": "d3", "name": "d3", "managedBy": VM1, "location": "eastus",
         "properties": {"encryption": {"type": "EncryptionAtRestWithPlatformKey"}}},
        {"id": "d4", "name": "d4", "managedBy": VM2, "location": "eastus",
         "properties": {"encryption": {"type": "EncryptionAtRestWithCustomerKey"}}},
        {"id": "d5", "name": "d5", "location": "eastus",  # unattached → 7.3
         "properties": {"encryption": {"type": "EncryptionAtRestWithPlatformKey"}}},
    ]}
    routes[u("sql_servers", sub1)] = {"value": [
        {"id": SRV1, "name": "sqlsrv1", "location": "eastus", "type": "t"},
    ]}
    routes[u("sql_servers_auditing_settings", {"serverFullId": SRV1})] = {
        "value": [{"id": SRV1 + "/auditingSettings/default", "name": "default",
                   "type": "t", "properties": {"state": "Disabled"}}]  # 4.1
    }
    routes[u("role_definitions", sub1)] = {"value": [
        {"id": "rd-owner", "name": "Owner",
         "properties": {"roleName": "Owner", "type": "BuiltInRole"}},
        {"id": "rd-reader", "name": "Reader",
         "properties": {"roleName": "Reader", "type": "BuiltInRole"}},
        {"id": "rd-custom", "name": "SuperCustom",  # CIS 1.23
         "properties": {"roleName": "SuperCustom", "type": "CustomRole",
                        "assignableScopes": ["/"],
                        "permissions": [{"actions": ["*"]}]}},
    ]}
    routes[u("role_assignments", sub1)] = {"value": [
        {"id": "ra1", "properties": {"principalId": "uid-a",
                                     "roleDefinitionId": "rd-owner"}},
        {"id": "ra2", "properties": {"principalId": "uid-u",
                                     "roleDefinitionId": "rd-reader"}},
    ]}
    routes[u("pricings", sub1)] = {"value": [
        {"id": "p1", "name": "SecurityCenterFree", "type": "t",
         "properties": {"pricingTier": "Free"}},  # CIS 2.1
    ]}
    routes[u("auto_provisioning_settings", sub1)] = {"value": [
        {"id": "aps", "name": "default", "type": "t",
         "properties": {"autoProvision": "Off"}},  # CIS 2.2
    ]}
    routes[u("policy_assignments", sub1)] = {"value": [
        {"id": "pa", "name": "SecurityCenterBuiltIn", "type": "t",
         "properties": {"parameters": {}}},
    ]}
    routes[u("security_contacts", sub1)] = {"value": [
        {"id": "sc", "name": "default1", "type": "t",
         "properties": {"email": "", "phone": "", "alertNotifications": "Off",
                        "alertsToAdmins": "Off"}},  # CIS 2.16
    ]}
    routes[u("activity_log_alerts", sub1)] = {"value": []}
    routes[u("vaults", sub1)] = {"value": [
        {"id": V1_ID, "name": "v1", "location": "eastus",
         "type": "Microsoft.KeyVault/vaults", "tags": {}},
    ]}
    routes[u("vaults_keys", {"vaultName": "v1"})] = {"value": [
        {"kid": "https://v1/keys/k1",
         "attributes": {"enabled": True, "exp": "2030-01-01T00:00:00Z"}},
        {"kid": "https://v1/keys/k2", "attributes": {"enabled": True}},  # 8.1
    ]}
    routes[u("vaults_secrets", {"vaultName": "v1"})] = {"value": [
        {"id": "https://v1/secrets/s1",
         "attributes": {"enabled": True, "exp": "2030-01-01T00:00:00Z"}},
        {"id": "https://v1/secrets/s2", "attributes": {"enabled": True}},  # 8.2
    ]}
    routes[u("diagnostic_settings", {"resourceUri": V1_ID})] = {"value": []}
    routes[u("network_watchers", sub1)] = {"value": [
        {"id": "nw1", "name": "nw1", "etag": "e1", "location": "eastus",
         "properties": {"provisioningState": "Succeeded"}},
    ]}
    routes[u("network_security_groups", sub1)] = {"value": [
        {"id": "nsg1", "name": "nsg1", "etag": "e1", "location": "eastus",
         "properties": {"securityRules": [
             {"properties": {"access": "Allow", "direction": "Inbound",
                             "protocol": "TCP", "destinationPortRange": "3389",
                             "sourceAddressPrefix": "*"}}]}},  # CIS 6.1
    ]}
    routes[u("log_profiles", sub1)] = {"value": [
        {"id": f"/subscriptions/{SUB1}/logprofiles/default", "name": "default",
         "type": "Microsoft.Insights/logProfiles",
         "properties": {"retentionPolicy": {"days": 90, "enabled": True},
                        "categories": ["Write", "Delete", "Action"],
                        "locations": ["eastus"],
                        "storageAccountId": LOGSA_ID}},
    ]}
    routes[u("hosting_environments", sub1)] = {"value": []}
    routes[u("resource_groups", sub1)] = {"value": []}
    routes[u("subscriptions_locations", sub1)] = {"value": [
        {"id": "loc-eastus", "name": "eastus", "displayName": "East US"},
        {"id": "loc-westus2", "name": "westus2",  # uncovered → 5.1.4, 6.5
         "displayName": "West US 2"},
    ]}
    routes[u("managed_clusters", sub1)] = {"value": []}
    routes[u("storage_accounts", sub1)] = {"value": [
        {"id": BADSA_ID, "name": "badsa", "kind": "StorageV2",
         "location": "eastus", "type": "t",
         "properties": {"supportsHttpsTrafficOnly": False,  # CIS 3.1
                        "networkAcls": {"defaultAction": "Allow",
                                        "bypass": "None"},
                        "encryption": {"keySource": "Microsoft.Storage"}}},
        {"id": LOGSA_ID, "name": "logsa1", "kind": "StorageV2",
         "location": "eastus", "type": "t",
         "properties": {"supportsHttpsTrafficOnly": True,
                        "networkAcls": {"defaultAction": "Deny",
                                        "bypass": "AzureServices"},
                        "encryption": {"keySource": "Microsoft.Storage"}}},
    ]}
    routes[u("storage_accounts_containers",
             {"subscriptionId": SUB1, "accountName": "badsa"})] = {
        "EnumerationResults": {"Containers": {"Container": [
            {"Name": "webassets",
             "Properties": {"PublicAccess": "Blob"}},  # CIS 3.6
        ]}}
    }
    routes[u("storage_accounts_containers",
             {"subscriptionId": SUB1, "accountName": "logsa1"})] = {
        "EnumerationResults": {"Containers": {"Container": [
            {"Name": "insight-operational-logs",          # CIS 5.1.5
             "Properties": {"PublicAccess": "Container"}},
        ]}}
    }
    routes[u("queue_services",
             {"subscriptionId": SUB1, "accountFullId": LOGSA_ID,
              "accountName": "logsa1"})] = {"value": []}
    routes[u("queue_services_properties",
             {"subscriptionId": SUB1, "accountFullId": LOGSA_ID,
              "accountName": "logsa1"})] = {
        "StorageServiceProperties": {
            "Logging": {"Read": "true", "Write": "true", "Delete": "true"}}
    }
    routes[u("queue_services",
             {"subscriptionId": SUB1, "accountFullId": BADSA_ID,
              "accountName": "badsa"})] = {"value": []}
    routes[u("queue_services_properties",
             {"subscriptionId": SUB1, "accountFullId": BADSA_ID,
              "accountName": "badsa"})] = {
        "StorageServiceProperties": {
            "Logging": {"Read": "true", "Write": "false", "Delete": "true"}}
    }
    return routes


class FakeTransport:
    def __init__(self, routes):
        self.routes = routes
        self.header_date = dt.datetime.utcnow()

    def __call__(self, url, headers):
        assert url in self.routes, f"unrouted url: {url}"
        return TransportPage(200, self.routes[url], header_date=self.header_date)


@pytest.fixture(scope="module")
def landed(spark):
    batches = AZ.ingest({"tenant": T1}, FakeTransport(_mk_routes()))
    views = AZ.land_batches(spark, batches)

    reg = RuleRegistry()
    packs.register_pack_rules(reg, f"{packs.PACKS_DIR}/cis_azure_pack.sql")
    return views, reg


def _idents(spark, landed, cis, *fields):
    _, reg = landed
    rows = reg.rules[f"AZURE_CIS_{cis}_VIOLATION_QUERY"].df(spark).collect()
    return {
        tuple(json.loads(r.identity).get(f) for f in fields) if len(fields) > 1
        else json.loads(r.identity).get(fields[0])
        for r in rows
    }


CIS_EXPECTED = {
    "1_1": (("user_principal_name",), {"admin@x.io"}),
    "1_2": (("user_principal_name",), {"user@x.io"}),
    "1_3": (("user_principal_name",), {"guest@x.io"}),
    "1_23": (("role_definition_id",), {"rd-custom"}),
    "2_1": (("subscription_id",), {SUB1}),
    "2_2": (("subscription_id",), {SUB1}),
    "2_16": (("subscription_id",), {SUB1}),
    "3_1": (("storage_account_name",), {"badsa"}),
    "3_3": (("account_name",), {"badsa"}),
    "3_6": (("account_name", "container_name"),
            {("badsa", "webassets"), ("logsa1", "insight-operational-logs")}),
    "3_7": (("storage_account_id",), {BADSA_ID}),
    "3_8": (("storage_account_id",), {BADSA_ID}),
    "4_1": (("server_full_id",), {SRV1}),
    "5_1_1": (("subscription_id",), {SUB2}),
    "5_1_2": (("subscription_id",), {SUB1}),
    "5_1_4": (("subscription_id", "location_name"),
              {(SUB1, "westus2"), (SUB2, None)}),
    "5_1_5": (("subscription_id",), {SUB1}),
    "5_1_6": (("subscription_id",), {SUB1}),
    "6_5": (("subscription_id", "location_name"),
            {(SUB1, "westus2"), (SUB2, None)}),
    "7_1": (("vm_id",), {VM1}),
    "7_2": (("vm_id",), {VM1}),
    "7_3": (("disk_id",), {"d5"}),
    "8_1": (("key_id",), {"https://v1/keys/k2"}),
    "8_2": (("secret_id",), {"https://v1/secrets/s2"}),
}


@pytest.mark.parametrize("cis", sorted(CIS_EXPECTED))
def test_cis_view_over_collector_rows(spark, landed, cis):
    fields, expected = CIS_EXPECTED[cis]
    assert _idents(spark, landed, cis, *fields) == expected


def test_cis_6_1_rdp_over_collector_rows(spark, landed):
    _, reg = landed
    rows = reg.rules["AZURE_CIS_6_1_VIOLATION_QUERY"].df(spark).collect()
    assert len(rows) == 1 and '"nsg1"' in rows[0].object


def test_cis_7_4_extensions_over_collector_rows(spark, landed):
    _, reg = landed
    rows = reg.rules["AZURE_CIS_7_4_VIOLATION_QUERY"].df(spark).collect()
    assert {r.object for r in rows} == {VM1}


def test_crawl_landed_every_pack_table(landed):
    views, _ = landed
    for t in (
        "data_azure_collect_connection",
        "data_azure_collect_users",
        "data_azure_collect_pricings",
        "data_azure_collect_auto_provisioning_settings",
        "data_azure_collect_security_contacts",
        "data_azure_collect_storage_accounts",
        "data_azure_collect_storage_accounts_containers",
        "data_azure_collect_queue_services_properties",
        "data_azure_collect_sql_servers_auditing_settings",
        "data_azure_collect_log_profiles",
        "data_azure_collect_network_security_groups",
        "data_azure_collect_disks",
        "data_azure_collect_virtual_machines_extensions",
        "data_azure_collect_vaults_keys",
        "data_azure_collect_vaults_secrets",
    ):
        assert t in views, t
