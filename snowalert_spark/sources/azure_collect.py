"""Azure inventory collector (reference: src/connectors/azure_collect.py).

The reference walks the Azure management/Graph APIs as a spec-driven
DAG: each *kind* has a request (path template + api-version + per-cloud
host), a flat response map (api field → landing column, with the
specials ``headerDate``/``tenantId``/``error`` and ``'*' → raw``), and
children whose args bind from emitted rows (azure_collect.py:753-1790).
``GET`` follows ``nextLink``/``@odata.nextLink`` pagination, shapes
empty pages as empty rows and error payloads as error rows
(azure_collect.py:1793-1910).

This module re-expresses that engine with an injectable transport
(``(url, headers) -> TransportPage``) and encodes the sixteen kinds the
cis_azure pack consumes — landing columns match the pack's
``data.azure_collect_*`` fixtures byte-for-byte. The strict-map
contract is kept: an unmapped response key raises KeyError unless the
spec carries ``'*'`` (azure_collect.py:1901-1909's documented
behavior).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from urllib.parse import urlencode

MGMT_HOSTS = {"azure": "management.azure.com", "usgov": "management.usgovcloudapi.net"}
GRAPH_HOSTS = {"azure": "graph.microsoft.com", "usgov": "graph.microsoft.us"}

_SUB = "/subscriptions/{subscriptionId}"

API_SPECS: dict[str, dict] = {
    # azure_collect.py:754-810 (children trimmed to encoded kinds)
    "subscriptions": {
        "request": {"path": "/subscriptions", "api-version": "2019-06-01"},
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "error": "error",
            "id": "id",
            "subscriptionId": "subscription_id",
            "displayName": "display_name",
            "state": "state",
            "subscriptionPolicies": "subscription_policies",
            "authorizationSource": "authorization_source",
            "managedByTenants": "managed_by_tenants",
        },
        "children": [
            {"kind": k, "args": {"subscriptionId": "subscription_id"}}
            for k in (
                "virtual_machines", "disks", "role_definitions",
                "role_assignments", "pricings", "auto_provisioning_settings",
                "policy_assignments", "security_contacts", "vaults",
                "network_watchers", "network_security_groups", "log_profiles",
                "subscriptions_locations", "storage_accounts",
            )
        ],
    },
    # azure_collect.py:812-831
    "reports_credential_user_registration_details": {
        "request": {
            "path": "/beta/reports/credentialUserRegistrationDetails",
            "host": GRAPH_HOSTS,
        },
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "error": "error",
            "id": "id",
            "userPrincipalName": "user_principal_name",
            "userDisplayName": "user_display_name",
            "authMethods": "auth_methods",
            "isRegistered": "is_registered",
            "isEnabled": "is_enabled",
            "isCapable": "is_capable",
            "isMfaRegistered": "is_mfa_registered",
            "*": "raw",
        },
    },
    # azure_collect.py users spec ($select-restricted field set)
    "users": {
        "request": {
            "path": "/v1.0/users",
            "host": GRAPH_HOSTS,
            "params": {
                "$select": (
                    "accountEnabled,businessPhones,city,country,"
                    "createdDateTime,department,displayName,employeeId,"
                    "faxNumber,givenName,jobTitle,mail,id,"
                    "lastPasswordChangeDateTime,mobilePhone,officeLocation,"
                    "preferredLanguage,surname,passwordPolicies,"
                    "passwordProfile,userPrincipalName,userType"
                )
            },
        },
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "error": "error",
            "accountEnabled": "account_enabled",
            "businessPhones": "business_phones",
            "city": "city",
            "country": "country",
            "createdDateTime": "created",
            "department": "department",
            "displayName": "display_name",
            "employeeId": "employee_id",
            "faxNumber": "fax_number",
            "givenName": "given_name",
            "jobTitle": "job_title",
            "mail": "mail",
            "id": "id",
            "lastPasswordChangeDateTime": "last_password_change",
            "mobilePhone": "mobile_phone",
            "officeLocation": "office_location",
            "preferredLanguage": "preferred_language",
            "surname": "surname",
            "passwordPolicies": "password_policies",
            "passwordProfile": "password_profile",
            "userPrincipalName": "user_principal_name",
            "userType": "user_type",
        },
    },
    "role_definitions": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Authorization/roleDefinitions",
            "api-version": "2015-07-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "displayName": "display_name", "id": "id", "name": "name",
            "properties": "properties", "type": "type",
        },
    },
    "role_assignments": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Authorization/roleAssignments",
            "api-version": "2015-07-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "id": "id", "name": "name", "properties": "properties",
            "type": "type",
        },
    },
    "pricings": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Security/pricings",
            "api-version": "2018-06-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "id": "id", "name": "name", "properties": "properties",
            "type": "type",
        },
    },
    "auto_provisioning_settings": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Security/autoProvisioningSettings",
            "api-version": "2017-08-01-preview",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "id": "id", "name": "name", "properties": "properties",
            "type": "type", "*": "raw",
        },
    },
    "policy_assignments": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Authorization/policyAssignments",
            "api-version": "2019-09-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "id": "id", "identity": "identity", "location": "location",
            "name": "name", "properties": "properties", "sku": "sku",
            "type": "type",
        },
    },
    "security_contacts": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Security/securityContacts",
            "api-version": "2017-08-01-preview",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "id": "id", "name": "name", "type": "type",
            "properties": "properties", "etag": "etag", "*": "raw",
        },
    },
    "storage_accounts": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Storage/storageAccounts",
            "api-version": "2019-06-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "id": "id", "identity": "identity", "kind": "kind",
            "location": "location", "name": "name",
            "properties": "properties", "sku": "sku", "tags": "tags",
            "type": "type",
        },
    },
    "subscriptions_locations": {
        "request": {
            "path": _SUB + "/locations",
            "api-version": "2019-06-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "displayName": "display_name", "id": "id",
            "latitude": "latitude", "longitude": "longitude", "name": "name",
        },
    },
    "log_profiles": {
        "request": {
            "path": _SUB + "/providers/microsoft.insights/logprofiles",
            "api-version": "2016-03-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "id": "id", "identity": "identity", "kind": "kind",
            "location": "location", "name": "name",
            "properties": "properties", "tags": "tags", "type": "type",
        },
    },
    "network_security_groups": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Network/networkSecurityGroups",
            "api-version": "2019-09-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "etag": "etag", "id": "id", "location": "location",
            "name": "name", "properties": "properties", "tags": "tags",
            "type": "type",
        },
    },
    "network_watchers": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Network/networkWatchers",
            "api-version": "2019-09-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "etag": "etag", "id": "id", "location": "location",
            "name": "name", "properties": "properties", "tags": "tags",
            "type": "type",
        },
    },
    "vaults": {
        "request": {
            "path": _SUB + "/resources",
            "params": {"$filter": "resourceType eq 'Microsoft.KeyVault/vaults'"},
            "api-version": "2019-11-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "id": "id", "location": "location", "name": "name",
            "tags": "tags", "type": "type",
        },
    },
    "disks": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Compute/disks",
            "api-version": "2019-07-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "id": "id", "location": "location", "managedBy": "managed_by",
            "name": "name", "properties": "properties", "sku": "sku",
            "tags": "tags", "type": "type", "zones": "zones",
        },
    },
    "virtual_machines": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Compute/virtualMachines",
            "api-version": "2019-03-01",
        },
        "response": {
            "headerDate": "recorded_at", "tenantId": "tenant_id",
            "subscriptionId": "subscription_id", "error": "error",
            "id": "id", "identity": "identity", "location": "location",
            "name": "name", "plan": "plan", "properties": "properties",
            "resources": "resources", "tags": "tags", "type": "type",
            "zones": "zones",
        },
    },
}

# the reference seeds these kinds per credential (azure_collect.py:1920-1933)
SEED_KINDS = ("reports_credential_user_registration_details", "users", "subscriptions")


@dataclass
class TransportPage:
    status: int
    body: dict | list  # parsed JSON payload
    header_date: dt.datetime | None = None


Transport = Callable[[str, dict], TransportPage]


def build_url(kind: str, params: dict, cloud: str = "azure") -> str:
    """azure_collect.py:1794-1822: path template + per-cloud host +
    api-version/query params."""
    req = API_SPECS[kind]["request"]
    path = req["path"].format(**params)
    host = req.get("host", MGMT_HOSTS)
    if isinstance(host, dict):
        host = host[cloud]
    api_version = req.get("api-version")
    query = urlencode(
        {**({"api-version": api_version} if api_version else {}),
         **req.get("params", {})}
    )
    return f"https://{host}{path}" + (f"?{query}" if query else "")


def _response_values(spec: dict, result) -> list:
    """azure_collect.py:1859-1875: list → items; dict → single row;
    scalar/None → error row; empty list → one empty row."""
    for vk in spec.get("response_value_key", "value").split("."):
        if result is None or not isinstance(result, dict) or vk not in result:
            break
        result = result[vk]
    return (
        result
        if type(result) is list
        else [result]
        if type(result) is dict
        else [{"error": result}]
    ) or [{}]


def map_row(kind: str, value: dict) -> dict:
    """Strict response-map application (azure_collect.py:1898-1909):
    unmapped keys raise KeyError unless the spec has ``'*'``."""
    response_spec = API_SPECS[kind]["response"]
    return {
        response_spec[k]: (value if k == "*" else value.get(k))
        for k in value.keys() | response_spec.keys()
        if k in response_spec or "*" not in response_spec
    }


def get_pages(
    kind: str,
    params: dict,
    transport: Transport,
    tenant: str,
    cloud: str = "azure",
    now: dt.datetime | None = None,
) -> Iterator[dict]:
    """One mapped landing row per response value, across all pages
    (nextLink / @odata.nextLink chains)."""
    url = build_url(kind, params, cloud)
    while url:
        page = transport(url, {"Accept": "application/json"})
        result = page.body
        if not isinstance(result, (dict, list)):
            result = {
                "error": {"type": "JSONDecodeError", "status_code": page.status,
                          "response_text": str(result)}
            }
        for v in _response_values(API_SPECS[kind], result):
            value = {
                **v,
                **params,
                "headerDate": page.header_date or now or dt.datetime.utcnow(),
                "tenantId": tenant,
            }
            yield map_row(kind, value)
        url = ""
        if isinstance(result, dict):
            url = result.get("nextLink") or result.get("@odata.nextLink") or ""


def child_tasks(kind: str, row: dict) -> Iterator[tuple[str, dict]]:
    """DAG edges: child kinds with args bound from the emitted row;
    kinds outside the encoded spec subset are skipped."""
    for child in API_SPECS[kind].get("children", []):
        ck = child["kind"]
        if ck not in API_SPECS:
            continue
        args = {arg: row.get(src) for arg, src in child["args"].items()}
        if any(v is None for v in args.values()):
            continue
        yield ck, args


def ingest(
    options: dict,
    transport: Transport,
    kinds: tuple[str, ...] = SEED_KINDS,
) -> Iterator[tuple[str, list[dict]]]:
    """Walk the collection DAG from the seed kinds, yielding
    ``(kind, rows)`` batches for the ``data.azure_collect_{kind}``
    landing tables (azure_collect.py:1912-2040 shape)."""
    tenant = options["tenant"]
    cloud = options.get("cloud", "azure")
    queue: list[tuple[str, dict]] = [(k, {}) for k in kinds]
    seen = set()
    while queue:
        kind, params = queue.pop(0)
        key = (kind, tuple(sorted(params.items())))
        if key in seen:
            continue
        seen.add(key)
        rows = list(get_pages(kind, params, transport, tenant, cloud))
        yield kind, rows
        for row in rows:
            queue.extend(child_tasks(kind, row))
