"""Concrete Okta connector (reference: src/connectors/okta.py).

Reference-fidelity behaviors, re-expressed with an injectable HTTP
transport so the module is testable without a network and portable to
any driver environment:

- three landing tables per connection — system_log / users / groups
  (okta.py:47-80), each ``(raw VARIANT→JSON text, event_time)``;
- users ingest paginates via the ``Link: rel=next`` response header
  until a page is empty or no next link remains (okta.py:86-112), and
  runs twice: active users then the DEPROVISIONED filter
  (okta.py:165-169);
- groups ingest fetches each group's member list from
  ``_links.users.href`` and embeds it as ``row['users']``
  (okta.py:141-163);
- logs ingest is incremental: ``since`` = the landing table's max
  event_time (falling back to one hour ago when the table is empty),
  500-event pages, ascending sort, rel=next pagination; each log row
  lands with its own ``published`` timestamp as event_time
  (okta.py:171-215);
- a non-200 page aborts the ingest without raising (okta.py:91-93,
  189-191) — partial progress stays landed.

The transport is ``(url, headers, params) -> TransportResponse``;
production wires an HTTP client, tests a dict-backed fake.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

CONNECTION_OPTIONS = [
    {"name": "subdomain", "title": "Okta Account Name", "type": "str", "required": True},
    {"name": "api_key", "title": "API Token", "type": "str", "secret": True,
     "required": True},
]

LANDING_TABLE_COLUMNS = [("raw", "string"), ("event_time", "timestamp")]

PAGE_LIMIT = 500


@dataclass
class TransportResponse:
    status: int
    body: list | dict
    links: dict[str, str] = field(default_factory=dict)  # rel -> url


Transport = Callable[[str, dict, dict | None], TransportResponse]


def connect(connection_name: str, options: dict) -> dict:
    """Landing-table naming convention (okta.py:47-60)."""
    table_name = "okta" + (
        "" if connection_name in ("default", "undefined") else f"_{connection_name}"
    )
    return {
        "newStage": "finalized",
        "newMessage": "Okta ingestion table, user table, group table created!",
        "tables": [
            f"data.{table_name}_system_log_connection",
            f"data.{table_name}_users_connection",
            f"data.{table_name}_groups_connection",
        ],
    }


def _headers(options: dict) -> dict:
    return {
        "Accept": "application/json",
        "Content-Type": "application/json",
        "Authorization": f"SSWS {options['api_key']}",
    }


def _domain(options: dict) -> str:
    sub = options["subdomain"]
    return sub if "." in sub else f"{sub}.okta.com"


def _paginate(
    transport: Transport, url: str, headers: dict, params: dict | None = None
) -> Iterator[list]:
    """rel=next pagination shared by users and logs (okta.py:86-112):
    stop on error status, empty page, or missing next link. Params are
    only sent on the first request — the next link embeds them."""
    while url:
        resp = transport(url, headers, params)
        params = None
        if resp.status != 200:
            return
        if resp.body == []:
            return
        yield resp.body
        url = resp.links.get("next", "")


def ingest_users(
    transport: Transport, url: str, headers: dict, now: dt.datetime
) -> Iterator[list[tuple[dict, dt.datetime]]]:
    for page in _paginate(transport, url, headers):
        yield [(row, now) for row in page]


def ingest(
    table_name: str,
    options: dict,
    *,
    transport: Transport | None = None,
    latest_event_time: dt.datetime | None = None,
    now: dt.datetime | None = None,
) -> Iterator[list[tuple[dict, dt.datetime]]]:
    """Yield pages of ``(raw_row, event_time)`` pairs for the landing
    table chosen by the table-name suffix (okta.py:114-121).

    When no transport is injected, the stdlib HTTPS default
    (``sources.transport.okta_transport``) is used — paced, retrying
    urllib, the production analog of the reference's ``requests``
    session (okta.py:113-215)."""
    if transport is None:
        from snowalert_spark.sources.transport import okta_transport

        transport = okta_transport()
    now = now or dt.datetime.utcnow()
    ingest_type = (
        "users"
        if table_name.upper().endswith("_USERS_CONNECTION")
        else "groups"
        if table_name.upper().endswith("_GROUPS_CONNECTION")
        else "logs"
    )
    domain = _domain(options)
    headers = _headers(options)
    urls = {
        "users": f"https://{domain}/api/v1/users",
        "deprovisioned_users":
            f'https://{domain}/api/v1/users?filter=status+eq+"DEPROVISIONED"',
        "groups": f"https://{domain}/api/v1/groups",
        "logs": f"https://{domain}/api/v1/logs",
    }

    if ingest_type == "groups":
        resp = transport(urls["groups"], headers, None)
        if resp.status != 200:
            return
        rows = resp.body
        for row in rows:
            members = transport(row["_links"]["users"]["href"], headers, None)
            row["users"] = members.body
        yield [(row, now) for row in rows]

    elif ingest_type == "users":
        yield from ingest_users(transport, urls["users"], headers, now)
        yield from ingest_users(transport, urls["deprovisioned_users"], headers, now)

    else:
        since = latest_event_time
        if since is None:
            # okta.py:186-191: no watermark → default to one hour ago
            since = now - dt.timedelta(hours=1)
        params = {
            "since": since.strftime("%Y-%m-%dT%H:%M:%S.000Z"),
            "limit": PAGE_LIMIT,
            "sortOrder": "ASCENDING",
        }
        for page in _paginate(transport, urls["logs"], headers, params):
            yield [
                (row, dt.datetime.strptime(row["published"], "%Y-%m-%dT%H:%M:%S.%fZ"))
                for row in page
            ]
