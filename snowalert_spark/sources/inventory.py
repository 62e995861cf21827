"""Remaining inventory connectors (reference: airwatch_devices.py,
assetpanda.py, duo_collect.py, tenable_io.py) — the last four modules
of the reference's connector surface, each with its distinguishing
walk re-expressed over injectable transports:

- **airwatch**: zero-based page-number search over
  ``/api/mdm/devices/search`` reading ``result['Devices']``
  (airwatch_devices.py:158-200);
- **assetpanda**: offset/limit walk bounded by the response's
  ``totals.objects`` count, with the free-text custom-field cleanup —
  field keys (``field_140``) renamed to alphanumeric-joined field
  names, colliding names suffixed ``_2``, ``_3``, …
  (assetpanda.py:51-96, 133-190);
- **duo**: one-shot admin inventory dump (duo_collect.py:68-80);
- **tenable**: a daily-gated vulnerability export (watermark = max
  export_at; an empty marker row lands first because the export is
  slow) plus a user listing with the numeric-permission → role-name
  mapping (tenable_io.py:74-140).
"""

from __future__ import annotations

import datetime as dt
import re
from collections.abc import Callable, Iterator

PAGE_SIZE = 500

Get = Callable[[str, dict | None], dict]


AIRWATCH_DEVICE_FIELDS = ["EasIds", "Udid", "SerialNumber", "MacAddress",
                          "Imei", "DeviceFriendlyName", "OwnerId", "Model",
                          "Platform", "OperatingSystem", "LastSeen",
                          "EnrollmentStatus", "ComplianceStatus"]


def airwatch_devices(
    options: dict, get: Get, now: dt.datetime | None = None
) -> Iterator[list[tuple]]:
    """airwatch_devices.py:172-200: Page starts at 0; stop on empty."""
    now = now or dt.datetime.utcnow()
    url = f"https://{options['host_airwatch']}/api/mdm/devices/search"
    params = {"PageSize": PAGE_SIZE, "Page": 0}
    while True:
        devices = get(url, dict(params)).get("Devices", [])
        params["Page"] += 1
        if not devices:
            return
        yield [
            (now, d, *[d.get(f) for f in AIRWATCH_DEVICE_FIELDS])
            for d in devices
        ]


def reduce_fields(fields: list[dict]) -> dict:
    """assetpanda.py:61-68: field key → alphanumeric-joined name."""
    return {
        f["key"]: "_".join(re.findall(r"[a-zA-Z]+", f["name"])) for f in fields
    }


def replace_device_keys(objects: list[dict], names: dict) -> list[dict]:
    """assetpanda.py:71-96: rename field_N keys to their display names,
    disambiguating collisions with _2, _3, … suffixes."""
    for key, value in names.items():
        for device in objects:
            if device.get(key, False):
                # per-device target: the reference mutates the shared
                # loop variable here (assetpanda.py:92-93), so a
                # collision on one device renames every later device's
                # field to the suffixed name — replicating that would
                # scatter the landing columns
                target = value
                if device.get(target) is not None:
                    number = 2
                    while device.get(f"{target}_{number}") is not None:
                        number += 1
                    target = f"{target}_{number}"
                device[target] = device.pop(key)
    return objects


def assetpanda_objects(
    options: dict, get: Get, now: dt.datetime | None = None
) -> Iterator[list[tuple]]:
    """assetpanda.py:133-190: offset walk to totals.objects, each page
    field-renamed before landing as (raw, id, insert_time)."""
    now = now or dt.datetime.utcnow()
    eid = options["asset_entity_id"]
    objects_url = f"https://api.assetpanda.com:443//v2/entities/{eid}/objects"
    fields_url = f"https://api.assetpanda.com:443//v2/entities/{eid}"
    params = {"offset": 0, "limit": PAGE_SIZE}
    total = 0
    while params["offset"] <= total:
        result = get(objects_url, dict(params))
        objects, total = result["objects"], result["totals"]["objects"]
        names = reduce_fields(get(fields_url, dict(params))["fields"])
        renamed = replace_device_keys(objects, names)
        yield [(o, o.get("id"), now) for o in renamed]
        params["offset"] += PAGE_SIZE


def duo_admins(get_admins: Callable[[], list[dict]]) -> list[dict]:
    """duo_collect.py:68-80: raw admin dump rows."""
    return [{"raw": a} for a in get_admins()]


TENABLE_ROLES = {
    16: "Basic",
    24: "Scan Operator",
    32: "Standard",
    40: "Scan Manager",
    64: "Administrator",
}

TENABLE_USER_FIELDS = ["uuid", "id", "user_name", "email", "type",
                       "permissions", "last_login_attempt",
                       "login_fail_count", "login_fail_total", "enabled",
                       "two_factor", "lastlogin", "uuid_id"]


def tenable_users(users: list[dict], now: dt.datetime) -> list[tuple]:
    """tenable_io.py:101-140: numeric permissions → role name, then the
    seventeen-column landing projection."""
    rows = []
    for user in users:
        role = TENABLE_ROLES.get(
            user["permissions"], "unknown permissions {permissions}"
        )
        rows.append(
            (user.get("username"), role, user, now,
             *[user.get(f) for f in TENABLE_USER_FIELDS])
        )
    return rows


def tenable_vulns_export(
    last_export_at: dt.datetime | None,
    export: Callable[[], Iterator[dict]],
    now: dt.datetime | None = None,
) -> list[dict]:
    """tenable_io.py:74-98: run at most daily (watermark on export_at);
    the empty marker row lands first — the export is slow, and the
    marker advances the watermark so a crashed export isn't retried in
    a tight loop."""
    now = now or dt.datetime.now(dt.timezone.utc)
    if last_export_at is not None and (now - last_export_at) <= dt.timedelta(days=1):
        return []
    rows = [{"export_at": now}]
    rows += [{"raw": v, "export_at": now} for v in export()]
    return rows


def salesforce_event_logs(
    last_timestamp_derived: str | None,
    query_log_files: Callable[[str], dict],
    download_log_file: Callable[[str], str],
) -> Iterator[tuple[str, list[dict]]]:
    """Salesforce hourly event-log extract
    (salesforce_event_log.py:82-166): SOQL for EventLogFiles newer than
    the landing table's max raw:TIMESTAMP_DERIVED (epoch default when
    empty), each file downloaded as CSV and converted to one dict per
    event — schema-on-read, ~50 event types share one landing table.
    The relative file URL is rebuilt from its ``sobjects/`` tail with
    ``/LogFile`` appended (salesforce_event_log.py:129-131)."""
    import csv
    import io

    start = last_timestamp_derived or "1900-01-01T00:00:00.000Z"
    soql = (
        "SELECT id, eventtype, logdate "
        "FROM eventlogfile "
        "WHERE interval='Hourly' "
        f"  AND logdate > {start}"
    )
    log_files = query_log_files(soql)
    for record in log_files.get("records", []):
        url = record["attributes"]["url"]
        url_relative = "sobjects/" + url.split("sobjects/")[1] + "/LogFile"
        text = download_log_file(url_relative)
        yield record["Id"], list(csv.DictReader(io.StringIO(text)))
