"""Device-inventory connectors (reference: cisco_umbrella.py,
crowdstrike_devices.py, meraki_devices.py).

All three land periodic device snapshots as ``(snapshot_at, raw,
*typed fields)`` rows; they differ in how the API walks:

- **cisco_umbrella**: page-number pagination over the organization's
  roaming computers — ``limit``/``page`` starting at 1, stop on the
  first empty page (cisco_umbrella.py:105-147);
- **crowdstrike**: two-step offset walk — a device-id listing whose
  ``meta.pagination.offset`` feeds the next request, each id batch
  expanded through the details endpoint's repeated ``ids`` params
  (crowdstrike_devices.py:119-240);
- **meraki**: nested traversal — organizations → networks
  (intersected with an optional whitelist) → per-network devices,
  with inaccessible networks skipped, not fatal
  (meraki_devices.py:135-200).

Transport is ``get(url, params) -> parsed JSON`` — injectable, like
the other concrete connectors in this package.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator

Get = Callable[[str, dict | None], object]

PAGE_SIZE = 500  # cisco_umbrella.py:13 / crowdstrike_devices.py:39


def _project(device: dict, fields: list[str], now: dt.datetime) -> tuple:
    return (now, device, *[device.get(f) for f in fields])


UMBRELLA_FIELDS = [
    "deviceId", "osVersionName", "lastSyncStatus", "type", "version",
    "lastSync", "osVersion", "name", "status", "originId", "appliedBundle",
    "hasIpBlocking",
]


def cisco_umbrella_devices(
    options: dict, get: Get, now: dt.datetime | None = None
) -> Iterator[list[tuple]]:
    """cisco_umbrella.py:105-147: page-number walk, stop on empty."""
    now = now or dt.datetime.utcnow()
    org = options["organization_id"]
    url = (
        "https://management.api.umbrella.com/v1/organizations/"
        f"{org}/roamingcomputers"
    )
    params = {"limit": PAGE_SIZE, "page": 1}
    while True:
        devices = get(url, dict(params))
        params["page"] += 1
        if len(devices) == 0:
            return
        yield [_project(d, UMBRELLA_FIELDS, now) for d in devices]


CROWDSTRIKE_IDS_URL = "https://api.crowdstrike.com/devices/queries/devices/v1"
CROWDSTRIKE_DETAILS_URL = "https://api.crowdstrike.com/devices/entities/devices/v1"

CROWDSTRIKE_FIELDS = [
    "device_id", "first_seen", "system_manufacturer", "config_id_base",
    "last_seen", "policies", "slow_changing_modified_timestamp",
    "minor_version", "system_product_name", "hostname", "mac_address",
    "product_type_desc", "platform_name", "external_ip", "agent_load_flags",
    "group_hash", "provision_status", "os_version", "groups", "bios_version",
    "modified_timestamp",
]


def crowdstrike_details_url(ids: list[str]) -> str:
    """crowdstrike_devices.py:156-160: repeated ``ids`` query params."""
    return CROWDSTRIKE_DETAILS_URL + "?" + "".join(f"&ids={i}" for i in ids)


def crowdstrike_devices(
    options: dict, get: Get, now: dt.datetime | None = None
) -> Iterator[list[tuple]]:
    """crowdstrike_devices.py:177-240: offset-paged id listing, each
    batch expanded through the details endpoint."""
    now = now or dt.datetime.utcnow()
    params = {"limit": PAGE_SIZE, "offset": ""}
    while True:
        listing = get(CROWDSTRIKE_IDS_URL, dict(params))
        resources = listing["resources"]
        params["offset"] = listing["meta"]["pagination"]["offset"]
        if len(resources) == 0:
            return
        details = get(crowdstrike_details_url(resources), None)
        yield [_project(d, CROWDSTRIKE_FIELDS, now) for d in details["resources"]]


MERAKI_FIELDS = [
    "serial", "address", "name", "networkId", "model", "mac", "lanIp",
    "wan1Ip", "wan2Ip", "tags", "lng", "lat",
]

MERAKI_BASE = "https://api.meraki.com/api/v0"


def meraki_devices(
    options: dict, get: Get, now: dt.datetime | None = None
) -> Iterator[list[tuple]]:
    """meraki_devices.py:135-200: orgs → whitelisted networks →
    devices; a network that errors is skipped, not fatal."""
    now = now or dt.datetime.utcnow()
    whitelist = set(options.get("network_id_whitelist") or [])
    for org in get(f"{MERAKI_BASE}/organizations", None):
        org_id = org.get("id")
        if not org_id:
            continue
        networks = get(f"{MERAKI_BASE}/organizations/{org_id}/networks", None)
        network_ids = {n.get("id") for n in networks}
        if whitelist:
            network_ids &= whitelist
        for network in sorted(network_ids):
            try:
                devices = get(f"{MERAKI_BASE}/networks/{network}/devices", None)
            except Exception:
                continue  # meraki_devices.py:168-171
            yield [_project(d, MERAKI_FIELDS, now) for d in devices]
