"""cis_azure_pack.sql corpus: all 45 views run verbatim (original SQL
from the reference checkout through compat.transpile) over synthetic
azure_collect_* landing fixtures, each pinned by a golden assertion.

Fixture design: tenant t1 with subscriptions sub1 (violating most
checks), sub2 (log-profile/vault gaps) and sub3 (clean except CIS
5.1.3). Two reference views (1.3, 1.23) build ``object`` from
``environment:account`` although their environment JSON has no
``account`` key — their object is NULL in Snowflake too; the goldens
pin that faithfully.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from snowalert_spark import packs
from snowalert_spark.rules import RuleRegistry

pytestmark = pytest.mark.skipif(
    not os.path.isdir(packs.PACKS_DIR), reason="reference packs dir unavailable"
)

T1 = "t1"
BADSA_ID = "/subscriptions/sub1/resourceGroups/rg/providers/Microsoft.Storage/storageAccounts/badsa"
LOGSA1_ID = "/subscriptions/sub1/resourceGroups/rg/providers/Microsoft.Storage/storageAccounts/logsa1"
LOGSA3_ID = "/subscriptions/sub3/resourceGroups/rg/providers/Microsoft.Storage/storageAccounts/logsa3"
SRV1 = "/subscriptions/sub1/resourceGroups/rg/providers/Microsoft.Sql/servers/sqlsrv1"
SRV2 = "/subscriptions/sub3/resourceGroups/rg/providers/Microsoft.Sql/servers/sqlsrv2"
V1_ID = "/subscriptions/sub1/resourceGroups/rg/providers/Microsoft.KeyVault/vaults/v1"
V2_ID = "/subscriptions/sub2/resourceGroups/rg/providers/Microsoft.KeyVault/vaults/v2"

ASC_PARAMS = [
    "systemUpdatesMonitoringEffect",
    "systemConfigurationsMonitoringEffect",
    "endpointProtectionMonitoringEffect",
    "diskEncryptionMonitoringEffect",
    "networkSecurityGroupsMonitoringEffect",
    "webApplicationFirewallMonitoringEffect",
    "nextGenerationFirewallMonitoringEffect",
    "vulnerabilityAssesmentMonitoringEffect",
    "storageEncryptionMonitoringEffect",
    "jitNetworkAccessMonitoringEffect",
    "adaptiveApplicationControlsMonitoringEffect",
    "sqlAuditingMonitoringEffect",
    "sqlEncryptionMonitoringEffect",
]


def ago(hours: float = 0, days: float = 0) -> dt.datetime:
    return dt.datetime.utcnow() - dt.timedelta(hours=hours, days=days)


def _df(spark, rows, schema, name):
    spark.createDataFrame(rows, schema).createOrReplaceTempView(name)


@pytest.fixture(scope="module")
def azure(spark):
    J = json.dumps
    now = ago(hours=1)

    _df(spark, [
        (T1, "admin@x.io", "Admin A", False, now),   # privileged, no MFA → 1.1
        (T1, "user@x.io", "User B", False, now),     # non-privileged, no MFA → 1.2
        (T1, "good@x.io", "Good C", True, now),
    ], "tenant_id string, user_principal_name string, user_display_name string, "
       "is_mfa_registered boolean, recorded_at timestamp",
       "data_azure_collect_reports_credential_user_registration_details")

    _df(spark, [
        (T1, "uid-a", "admin@x.io", "Member", now),
        (T1, "uid-u", "user@x.io", "Member", now),
        (T1, "uid-g", "good@x.io", "Member", now),
        (T1, "uid-guest", "guest@x.io", "Guest", now),  # → 1.3
    ], "tenant_id string, id string, user_principal_name string, "
       "user_type string, recorded_at timestamp",
       "data_azure_collect_users")

    _df(spark, [
        (T1, "ra1", J({"principalId": "uid-a", "roleDefinitionId": "rd-owner"}), now),
        (T1, "ra2", J({"principalId": "uid-u", "roleDefinitionId": "rd-reader"}), now),
        (T1, "ra3", J({"principalId": "uid-g", "roleDefinitionId": "rd-owner"}), now),
    ], "tenant_id string, id string, properties string, recorded_at timestamp",
       "data_azure_collect_role_assignments")

    _df(spark, [
        (T1, "sub1", "rd-owner", "Owner",
         J({"roleName": "Owner", "type": "BuiltInRole"}), now),
        (T1, "sub1", "rd-reader", "Reader",
         J({"roleName": "Reader", "type": "BuiltInRole"}), now),
        # custom role assignable to root scope with all actions → 1.23
        (T1, "sub1", "rd-custom", "SuperCustom",
         J({"roleName": "SuperCustom", "type": "CustomRole",
            "assignableScopes": ["/"],
            "permissions": [{"actions": ["*"]}]}), now),
    ], "tenant_id string, subscription_id string, id string, name string, "
       "properties string, recorded_at timestamp",
       "data_azure_collect_role_definitions")

    _df(spark, [
        (T1, "sub1", "SecurityCenterFree", "Microsoft.Security/pricings",
         J({"pricingTier": "Free"}), now),                      # → 2.1
        (T1, "sub3", "SecurityCenterFree", "Microsoft.Security/pricings",
         J({"pricingTier": "Standard"}), now),
    ], "tenant_id string, subscription_id string, name string, type string, "
       "properties string, recorded_at timestamp",
       "data_azure_collect_pricings")

    _df(spark, [
        (T1, "sub1", "default", "Microsoft.Security/autoProvisioningSettings",
         J({"autoProvision": "Off"}), now),                     # → 2.2
        (T1, "sub3", "default", "Microsoft.Security/autoProvisioningSettings",
         J({"autoProvision": "On"}), now),
    ], "tenant_id string, subscription_id string, name string, type string, "
       "properties string, recorded_at timestamp",
       "data_azure_collect_auto_provisioning_settings")

    _df(spark, [
        # sub1: no ASC params at all → violates every 2.3-2.15 check
        (T1, "sub1", "SecurityCenterBuiltIn",
         "Microsoft.Authorization/policyAssignments", "A1",
         J({"parameters": {}}), now),
        (T1, "sub3", "SecurityCenterBuiltIn",
         "Microsoft.Authorization/policyAssignments", "A1",
         J({"parameters": {k: "AuditIfNotExists" for k in ASC_PARAMS}}), now),
    ], "tenant_id string, subscription_id string, name string, type string, "
       "sku string, properties string, recorded_at timestamp",
       "data_azure_collect_policy_assignments")

    _df(spark, [
        (T1, "sub1", "default1", "Microsoft.Security/securityContacts",
         J({"email": "", "phone": "", "alertNotifications": "Off",
            "alertsToAdmins": "Off"}), now),                    # → 2.16-2.19
        (T1, "sub3", "default1", "Microsoft.Security/securityContacts",
         J({"email": "sec@x.io", "phone": "123", "alertNotifications": "On",
            "alertsToAdmins": "On"}), now),
    ], "tenant_id string, subscription_id string, name string, type string, "
       "properties string, recorded_at timestamp",
       "data_azure_collect_security_contacts")

    _df(spark, [
        # violates 3.1 (no https), 3.7 (Allow), 3.8 (no AzureServices bypass)
        (T1, "sub1", BADSA_ID, "StorageV2", "badsa",
         J({"supportsHttpsTrafficOnly": False,
            "networkAcls": {"defaultAction": "Allow", "bypass": "None"},
            "encryption": {"keySource": "Microsoft.Keyvault",
                           "keyVaultProperties": {"keyname": "k1"}}}),
         None, now),
        # activity-log account without BYOK → 5.1.6
        (T1, "sub1", LOGSA1_ID, "StorageV2", "logsa1",
         J({"supportsHttpsTrafficOnly": True,
            "networkAcls": {"defaultAction": "Deny", "bypass": "AzureServices"},
            "encryption": {"keySource": "Microsoft.Storage"}}),
         None, now),
        (T1, "sub3", LOGSA3_ID, "StorageV2", "logsa3",
         J({"supportsHttpsTrafficOnly": True,
            "networkAcls": {"defaultAction": "Deny", "bypass": "AzureServices"},
            "encryption": {"keySource": "Microsoft.Keyvault",
                           "keyVaultProperties": {"keyname": "k3"}}}),
         None, now),
    ], "tenant_id string, subscription_id string, id string, kind string, "
       "name string, properties string, tags string, recorded_at timestamp",
       "data_azure_collect_storage_accounts")

    _df(spark, [
        (T1, "sub1", "badsa",
         J({"Read": "true", "Write": "false", "Delete": "true"}), now),  # → 3.3
        (T1, "sub1", "badsa",
         J({"Read": "false", "Write": "false", "Delete": "false"}), ago(days=3)),
        (T1, "sub3", "logsa3",
         J({"Read": "true", "Write": "true", "Delete": "true"}), now),
    ], "tenant_id string, subscription_id string, account_name string, "
       "logging string, recorded_at timestamp",
       "data_azure_collect_queue_services_properties")

    _df(spark, [
        # public container on the activity-log account → 3.6 and 5.1.5
        (T1, "sub1", "logsa1", "insight-operational-logs",
         J({"PublicAccess": "Container"}), now),
        (T1, "sub1", "badsa", "webassets", J({"PublicAccess": "Blob"}), now),  # → 3.6
        (T1, "sub3", "logsa3", "insight-operational-logs", J({}), now),
    ], "tenant_id string, subscription_id string, account_name string, "
       "name string, properties string, recorded_at timestamp",
       "data_azure_collect_storage_accounts_containers")

    _df(spark, [
        (T1, SRV1, J({"state": "Disabled"}), now),              # → 4.1
        (T1, SRV2, J({"state": "Enabled"}), now),
    ], "tenant_id string, server_full_id string, properties string, "
       "recorded_at timestamp",
       "data_azure_collect_sql_servers_auditing_settings")

    _df(spark, [
        # p1: 90-day retention → 5.1.2; covers eastus only
        (T1, "sub1", "/subscriptions/sub1/logprofiles/default", None, None,
         None, "default",
         J({"retentionPolicy": {"days": 90, "enabled": True},
            "categories": ["Write", "Delete", "Action"],
            "locations": ["eastus"],
            "storageAccountId": LOGSA1_ID}),
         None, "Microsoft.Insights/logProfiles", now),
        # p2: subscription with no log profile → 5.1.1
        (T1, "sub2", None, None, None, None, None, None, None, None, now),
        # p3: fine except missing the Action category → 5.1.3
        (T1, "sub3", "/subscriptions/sub3/logprofiles/main", None, None,
         None, "main",
         J({"retentionPolicy": {"days": 400, "enabled": True},
            "categories": ["Write", "Delete"],
            "locations": ["westus"],
            "storageAccountId": LOGSA3_ID}),
         None, "Microsoft.Insights/logProfiles", now),
    ], "tenant_id string, subscription_id string, id string, identity string, "
       "kind string, location string, name string, properties string, "
       "tags string, type string, recorded_at timestamp",
       "data_azure_collect_log_profiles")

    _df(spark, [
        (T1, "sub1", "loc-eastus", "eastus", "East US", now),
        (T1, "sub1", "loc-westus2", "westus2", "West US 2", now),  # uncovered
        (T1, "sub3", "loc-westus", "westus", "West US", now),
    ], "tenant_id string, subscription_id string, id string, name string, "
       "display_name string, recorded_at timestamp",
       "data_azure_collect_subscriptions_locations")

    _df(spark, [
        (V1_ID, J({"logs": [{"category": "AuditEvent", "enabled": True,
                             "retentionPolicy": {"days": 30, "enabled": True}}]}),
         now),
    ], "resource_uri string, properties string, recorded_at timestamp",
       "data_azure_collect_diagnostic_settings")

    _df(spark, [
        (T1, "sub1", V1_ID, "v1", now),
        (T1, "sub2", V2_ID, "v2", now),  # no diagnostic settings → 5.1.7
    ], "tenant_id string, subscription_id string, id string, name string, "
       "recorded_at timestamp",
       "data_azure_collect_vaults")

    def nsg(sub, nid, name, rules):
        return (T1, sub, nid, f"etag-{nid}", name, "eastus",
                J({"securityRules": rules}), now)

    def rule(access, port, prefix, protocol="TCP"):
        return {"properties": {"access": access, "direction": "Inbound",
                               "protocol": protocol,
                               "destinationPortRange": port,
                               "sourceAddressPrefix": prefix}}

    _df(spark, [
        nsg("sub1", "nsg1", "nsg1", [rule("Allow", "3389", "*")]),     # → 6.1
        nsg("sub1", "nsg2", "nsg2", [rule("Allow", "20-30", "*")]),    # → 6.2
        nsg("sub1", "nsg3", "nsg3", [rule("Deny", "3389", "*")]),
    ], "tenant_id string, subscription_id string, id string, etag string, "
       "name string, location string, properties string, recorded_at timestamp",
       "data_azure_collect_network_security_groups")

    _df(spark, [
        (T1, "sub1", "nw1", "e1", "nw1", "eastus",
         J({"provisioningState": "Succeeded"}), now),
        (T1, "sub3", "nw3", "e3", "nw3", "westus",
         J({"provisioningState": "Succeeded"}), now),
    ], "tenant_id string, subscription_id string, id string, etag string, "
       "name string, location string, properties string, recorded_at timestamp",
       "data_azure_collect_network_watchers")

    def disk(did, managed_by, enc_type):
        return (did, T1, "sub1", managed_by,
                J({"encryption": {"type": enc_type}}), now)

    _df(spark, [
        disk("d1", "vm1", "EncryptionAtRestWithPlatformKey"),
        disk("d2", "vm2", "EncryptionAtRestWithCustomerKey"),
        disk("d3", "vm1", "EncryptionAtRestWithPlatformKey"),
        disk("d4", "vm2", "EncryptionAtRestWithCustomerKey"),
        disk("d5", None, "EncryptionAtRestWithPlatformKey"),  # unattached → 7.3
    ], "id string, tenant_id string, subscription_id string, managed_by string, "
       "properties string, recorded_at timestamp",
       "data_azure_collect_disks")

    _df(spark, [
        (T1, "sub1", "vm1",
         J({"storageProfile": {"osDisk": {"managedDisk": {"id": "d1"}},
                               "dataDisks": [{"managedDisk": {"id": "d3"}}]}}),
         now),                                                   # → 7.1, 7.2
        (T1, "sub1", "vm2",
         J({"storageProfile": {"osDisk": {"managedDisk": {"id": "d2"}},
                               "dataDisks": [{"managedDisk": {"id": "d4"}}]}}),
         now),
    ], "tenant_id string, subscription_id string, id string, properties string, "
       "recorded_at timestamp",
       "data_azure_collect_virtual_machines")

    _df(spark, [
        (T1, "vm1", "CustomScript", now),                        # → 7.4
        (T1, "vm2", "LinuxDiagnostic", now),
    ], "tenant_id string, vm_id string, name string, recorded_at timestamp",
       "data_azure_collect_virtual_machines_extensions")

    _df(spark, [
        (T1, "https://v1/keys/k1",
         J({"enabled": True, "exp": "2030-01-01T00:00:00Z"}), None, now),
        (T1, "https://v1/keys/k2", J({"enabled": True}), None, now),  # → 8.1
        (T1, "https://v1/keys/k3", J({"enabled": True}), "AccessDenied", now),
    ], "tenant_id string, kid string, attributes string, error string, "
       "recorded_at timestamp",
       "azure_collect_vaults_keys")

    _df(spark, [
        (T1, "https://v1/secrets/s1",
         J({"enabled": True, "exp": "2030-01-01T00:00:00Z"}), None, now),
        (T1, "https://v1/secrets/s2", J({"enabled": True}), None, now),  # → 8.2
    ], "tenant_id string, id string, attributes string, error string, "
       "recorded_at timestamp",
       "azure_collect_vaults_secrets")

    reg = RuleRegistry()
    names = packs.register_pack_rules(reg, f"{packs.PACKS_DIR}/cis_azure_pack.sql")
    assert len(names) == 45
    return reg


def _rows(spark, azure, cis):
    return azure.rules[f"AZURE_CIS_{cis}_VIOLATION_QUERY"].df(spark).collect()


def _idents(rows, *fields):
    out = set()
    for r in rows:
        ident = json.loads(r.identity)
        out.add(tuple(ident.get(f) for f in fields) if len(fields) > 1
                else ident.get(fields[0]))
    return out


# identity-field goldens: CIS id → (identity fields, expected set)
IDENT_GOLDENS = {
    "1_1": (("user_principal_name",), {"admin@x.io"}),
    "1_2": (("user_principal_name",), {"user@x.io"}),
    "1_23": (("role_definition_id",), {"rd-custom"}),
    "2_1": (("subscription_id",), {"sub1"}),
    "2_2": (("subscription_id",), {"sub1"}),
    **{f"2_{n}": (("subscription_id",), {"sub1"}) for n in range(3, 20)},
    "3_1": (("storage_account_name",), {"badsa"}),
    "3_3": (("account_name",), {"badsa"}),
    "3_6": (("account_name", "container_name"),
            {("logsa1", "insight-operational-logs"), ("badsa", "webassets")}),
    "3_7": (("storage_account_id",), {BADSA_ID}),
    "3_8": (("storage_account_id",), {BADSA_ID}),
    "4_1": (("server_full_id",), {SRV1}),
    "5_1_1": (("subscription_id",), {"sub2"}),
    "5_1_2": (("subscription_id",), {"sub1"}),
    "5_1_3": (("subscription_id",), {"sub3"}),
    "5_1_4": (("subscription_id", "location_name"), {("sub1", "westus2")}),
    "5_1_5": (("subscription_id",), {"sub1"}),
    "5_1_6": (("subscription_id",), {"sub1"}),
    "5_1_7": (("subscription_id",), {"sub2"}),
    "6_5": (("subscription_id", "location_name"), {("sub1", "westus2")}),
    "7_1": (("vm_id",), {"vm1"}),
    "7_2": (("vm_id",), {"vm1"}),
    "7_3": (("disk_id",), {"d5"}),
    "8_1": (("key_id",), {"https://v1/keys/k2"}),
    "8_2": (("secret_id",), {"https://v1/secrets/s2"}),
}


@pytest.mark.parametrize("cis", sorted(IDENT_GOLDENS))
def test_azure_cis_view(spark, azure, cis):
    fields, expected = IDENT_GOLDENS[cis]
    rows = _rows(spark, azure, cis)
    assert _idents(rows, *fields) == expected
    for r in rows:
        assert r.query_id and r.title and r.event_data


def test_azure_cis_1_3(spark, azure):
    rows = _rows(spark, azure, "1_3")
    assert _idents(rows, "user_principal_name") == {"guest@x.io"}
    # the view builds object from environment:account, a key its own
    # environment JSON never sets — NULL in Snowflake as well
    assert rows[0].object is None


def test_azure_cis_6_1_rdp(spark, azure):
    rows = _rows(spark, azure, "6_1")
    assert len(rows) == 1 and '"nsg1"' in rows[0].object


def test_azure_cis_6_2_ssh(spark, azure):
    rows = _rows(spark, azure, "6_2")
    assert len(rows) == 1 and '"nsg2"' in rows[0].object


def test_azure_cis_7_4_extensions(spark, azure):
    rows = _rows(spark, azure, "7_4")
    assert {r.object for r in rows} == {"vm1"}


def test_azure_corpus_plans_product_free(spark, azure):
    """All 45 azure views compile cartesian-free over their landing
    fixtures — the corpus-wide scale-health pin."""
    offenders = {}
    for rule in azure.rules.values():
        plan = rule.df(spark)._jdf.queryExecution().executedPlan().toString()
        prods = [op for op in ("CartesianProduct", "BroadcastNestedLoopJoin")
                 if op in plan]
        if prods:
            offenders[rule.name] = prods
    assert offenders == {}
