"""SaaS audit-log / inventory connectors (reference: gsuite_logs.py,
jamf_inventory.py).

- **gsuite login activities** (gsuite_logs.py:110-165): one listing
  per (delegated subject × login event type), each with its *own*
  incremental start-time watermark (``fetch_latest`` filtered by
  subject+event); items project into the eleven-column login landing
  shape — event params collapse to a ``{name: value|boolValue|
  multiValue}`` map, etag quotes stripped, raw preserved.
- **jamf computer inventory** (jamf_inventory.py:20-75): a
  ``/computers`` id listing fanned out to per-id detail fetches (the
  reference paces ~16/s with asyncio; the fan-out here is caller-
  controlled), each detail row stamped with the response Date header
  as ``recorded_at``.

Transports are injectable callables, matching this package's other
concrete connectors.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator

LOGIN_EVENTS = [
    "logout",
    "login_challenge",
    "login_failure",
    "login_verification",
    "login_success",
]

# list_activities(subject, event_name, start_time) -> {'items': [...]}
ListActivities = Callable[[str, str, dt.datetime | None], dict]
# latest(subject, event_name) -> datetime | None  (per-key watermark)
LatestFn = Callable[[str, str], dt.datetime | None]


def gsuite_login_row(item: dict, subject: str) -> tuple:
    """gsuite_logs.py:129-147 projection (created_on is stamped by the
    landing writer)."""
    event = (item.get("events") or [{}])[0]
    params = {
        p["name"]: (p.get("value") or p.get("boolValue") or p.get("multiValue"))
        for p in event.get("parameters", [])
    }
    return (
        item["id"]["time"],
        item["etag"].strip('"'),
        subject,
        event.get("name"),
        params,
        item["id"]["customerId"],
        item["actor"].get("email"),
        item["actor"].get("profileId"),
        item.get("ipAddress"),
        item,
    )


def gsuite_ingest(
    options: dict,
    list_activities: ListActivities,
    latest: LatestFn,
) -> Iterator[tuple[str, str, list[tuple]]]:
    """Yield (subject, event_name, rows) per listing — one incremental
    watermark per key, exactly the reference's fetch_latest filter."""
    for subject in options.get("subjects_list") or [""]:
        for event in LOGIN_EVENTS:
            start = latest(subject, event)
            items = list_activities(subject, event, start).get("items", [])
            yield subject, event, [gsuite_login_row(i, subject) for i in items]


# jamf: fetch(url) -> (parsed json dict, Date header datetime | None)
JamfFetch = Callable[[str], tuple[dict, dt.datetime | None]]


def jamf_computers(fetch: JamfFetch) -> list[dict]:
    """jamf_inventory.py:49-74: id listing → per-id detail rows with
    computer_id + recorded_at merged in; a detail response that fails
    to parse still lands its id + timestamp (visibility over loss)."""
    listing, _ = fetch("/computers")
    cids = [c["id"] for c in listing.get("computers", [])]
    rows = []
    for cid in cids:
        detail, recorded_at = fetch(f"/computers/id/{cid}")
        row = dict(detail.get("computer") or {})
        row["computer_id"] = cid
        row["recorded_at"] = recorded_at
        rows.append(row)
    return rows
