"""Default stdlib HTTPS transport for connectors and handlers.

The reference talks to live services through ``requests`` / cloud SDK
clients with timeouts and pacing (aws_collect.py:35-36 paces at
RATE_PER_SECOND = 24; okta.py:113-215 pages via the ``Link`` response
header; jira.py:217-281 and service_now's handler POST JSON with
basic/bearer auth). This engine keeps every connector and handler
*injectable* so tests never touch a network — but a production adopter
needs a default. This module is that default, built only on
``urllib.request``:

- per-request timeout;
- bounded retry with exponential backoff on 429 / 5xx / network
  errors, honoring ``Retry-After`` when the server sends one;
- a request-rate gate (the reference's 24 req/s) shared across calls
  through one client instance;
- adapters presenting the three transport contracts already used by
  the code base (``okta.TransportResponse``-style page transport,
  ``azure_collect.TransportPage`` transport, and the handlers'
  ``post(url, auth=..., data=..., json=...)`` shape).

``clock``/``sleep``/``opener`` are injectable, so the retry/backoff/
pacing logic is unit-testable against a local ``http.server`` (and
without real sleeps).
"""

from __future__ import annotations

import datetime as dt
import json as _json
import time
import urllib.error
import urllib.parse
import urllib.request
from base64 import b64encode
from collections.abc import Callable
from dataclasses import dataclass, field

# reference aws_collect.py:35-36
RATE_PER_SECOND = 24.0

RETRYABLE = {429, 500, 502, 503, 504}


@dataclass
class RawResponse:
    status: int
    body: object  # parsed JSON when possible, else text
    headers: dict  # lower-cased header -> value


def _parse_body(data: bytes):
    text = data.decode("utf-8", errors="replace")
    try:
        return _json.loads(text)
    except ValueError:
        return text


class HttpClient:
    """Paced, retrying urllib HTTPS client.

    One instance = one pacing domain: successive requests through the
    same client are spaced ``1 / rate_per_second`` apart, mirroring the
    reference collector's rate limit. Retries are bounded
    (``max_tries``) with exponential backoff ``backoff * 2**attempt``;
    a ``Retry-After: N`` response overrides the computed backoff.
    Non-retryable statuses (e.g. 401/404) are returned, not raised —
    the connectors' "non-200 aborts the page loop" contract handles
    them.
    """

    def __init__(
        self,
        timeout: float = 30.0,
        max_tries: int = 5,
        backoff: float = 0.5,
        rate_per_second: float = RATE_PER_SECOND,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
        opener: urllib.request.OpenerDirector | None = None,
    ):
        self.timeout = timeout
        self.max_tries = max_tries
        self.backoff = backoff
        self.min_interval = 1.0 / rate_per_second if rate_per_second else 0.0
        self.clock = clock
        self.sleep = sleep
        self.opener = opener or urllib.request.build_opener()
        self._last_at: float | None = None

    # ---- pacing ----------------------------------------------------------
    def _pace(self) -> None:
        now = self.clock()
        if self._last_at is not None:
            wait = self.min_interval - (now - self._last_at)
            if wait > 0:
                self.sleep(wait)
                now = self.clock()
        self._last_at = now

    # ---- one attempt -----------------------------------------------------
    def _attempt(self, req: urllib.request.Request) -> RawResponse:
        try:
            with self.opener.open(req, timeout=self.timeout) as resp:
                return RawResponse(
                    resp.status,
                    _parse_body(resp.read()),
                    {k.lower(): v for k, v in resp.headers.items()},
                )
        except urllib.error.HTTPError as e:
            # non-2xx: a response, not an exception, for our callers
            return RawResponse(
                e.code,
                _parse_body(e.read() or b""),
                {k.lower(): v for k, v in (e.headers or {}).items()},
            )

    def request(
        self,
        url: str,
        headers: dict | None = None,
        params: dict | None = None,
        method: str = "GET",
        data: dict | None = None,
        json: object | None = None,
    ) -> RawResponse:
        if params:
            sep = "&" if "?" in url else "?"
            url = url + sep + urllib.parse.urlencode(params)
        body = None
        headers = dict(headers or {})
        if json is not None:
            body = _json.dumps(json).encode()
            headers.setdefault("Content-Type", "application/json")
            method = "POST" if method == "GET" else method
        elif data is not None:
            body = urllib.parse.urlencode(data).encode()
            headers.setdefault(
                "Content-Type", "application/x-www-form-urlencoded"
            )
            method = "POST" if method == "GET" else method

        last: RawResponse | None = None
        for attempt in range(self.max_tries):
            self._pace()
            req = urllib.request.Request(
                url, data=body, headers=headers, method=method
            )
            try:
                last = self._attempt(req)
            except urllib.error.URLError:
                # network-level failure: back off and retry
                if attempt + 1 >= self.max_tries:
                    raise
                self.sleep(self.backoff * (2**attempt))
                continue
            if last.status not in RETRYABLE or attempt + 1 >= self.max_tries:
                return last
            retry_after = last.headers.get("retry-after")
            try:
                delay = float(retry_after) if retry_after else None
            except ValueError:
                delay = None
            self.sleep(delay if delay is not None else self.backoff * (2**attempt))
        return last  # pragma: no cover — loop always returns/raises


# ---- contract adapters ----------------------------------------------------


def _parse_link_header(value: str | None) -> dict[str, str]:
    """``<url>; rel="next", <url2>; rel="self"`` -> {rel: url}
    (the Okta pagination contract, okta.py:86-112)."""
    links: dict[str, str] = {}
    for part in (value or "").split(","):
        seg = part.split(";")
        if len(seg) < 2:
            continue
        url = seg[0].strip().strip("<>")
        for p in seg[1:]:
            k, _, v = p.strip().partition("=")
            if k == "rel":
                links[v.strip('"')] = url
    return links


def okta_transport(client: HttpClient | None = None):
    """``(url, headers, params) -> okta.TransportResponse`` over the
    default client, with ``Link`` header pagination parsed."""
    from snowalert_spark.sources.okta import TransportResponse

    client = client or HttpClient()

    def transport(url, headers, params=None):
        r = client.request(url, headers=headers, params=params)
        return TransportResponse(
            status=r.status,
            body=r.body if isinstance(r.body, (list, dict)) else [],
            links=_parse_link_header(r.headers.get("link")),
        )

    return transport


def azure_transport(client: HttpClient | None = None):
    """``(url, headers) -> azure_collect.TransportPage`` over the
    default client, carrying the response ``Date`` header."""
    from snowalert_spark.sources.azure_collect import TransportPage

    client = client or HttpClient()

    def transport(url, headers):
        r = client.request(url, headers=headers)
        hdr_date = None
        raw = r.headers.get("date")
        if raw:
            try:
                from email.utils import parsedate_to_datetime

                hdr_date = parsedate_to_datetime(raw).replace(tzinfo=None)
            except (TypeError, ValueError):
                hdr_date = None
        return TransportPage(
            status=r.status,
            body=r.body if isinstance(r.body, (list, dict)) else {},
            header_date=hdr_date,
        )

    return transport


@dataclass
class PostTransport:
    """The handlers' ``post(url, auth=None, data=None, json=None) ->
    (status, body)`` contract (service_now / jira POST shape) over the
    default client. ``auth`` is ``(user, password)`` for basic auth or
    ``{"bearer": token}``."""

    client: HttpClient = field(default_factory=HttpClient)

    def post(self, url, auth=None, data=None, json=None, headers=None):
        headers = dict(headers or {})
        if isinstance(auth, tuple):
            cred = b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
            headers["Authorization"] = f"Basic {cred}"
        elif isinstance(auth, dict) and auth.get("bearer"):
            headers["Authorization"] = f"Bearer {auth['bearer']}"
        r = self.client.request(
            url, headers=headers, method="POST", data=data, json=json
        )
        return r.status, r.body


def utcnow() -> dt.datetime:  # seam for tests
    return dt.datetime.utcnow()
