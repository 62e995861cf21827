"""REST-pull connector contract (reference: connectors_runner.py +
src/connectors/okta.py shape).

A connector module exposes ``ingest(table_name, options) ->
Iterator[list[dict]]`` yielding page batches; the runner sums row
counts, appends each page to the landing table, and records ingestion
metadata. Connection options are YAML (the reference stores them in
the landing table's COMMENT — connectors_runner.py:62); schedules are
gated at 15-minute runner granularity (:31-50).

Landing shape (okta.py:32-45): ``(raw VARIANT, event_time TIMESTAMP)``
— raw JSON string + extraction timestamp; projection views cast paths
out of raw (packs/okta.sql:3-32), which the compat layer's
``raw:path::type`` rewrite serves directly.
"""

from __future__ import annotations

import datetime as dt
import json
import uuid
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowalert_spark.runners import metadata
from snowalert_spark.store import ResultsStore

IngestFn = Callable[[str, dict], Iterator[list[dict]]]


def schedule_ok(schedule: str | None, now: dt.datetime) -> bool:
    """connectors_runner.py:31-50 cron-subset: the runner fires every
    15 minutes; a connection runs when its schedule matches the current
    slot. Supported: None/'15 minutes' (always), 'hourly' (minute 0
    slot), 'every N hours[ offset M]' (hour % N == M, minute-0 slot)."""
    if not schedule or schedule.strip() == "15 minutes":
        return True
    s = schedule.strip().lower()
    slot0 = now.minute < 15
    if s == "hourly":
        return slot0
    parts = s.split()
    if len(parts) >= 3 and parts[0] == "every" and parts[2].startswith("hour"):
        n = int(parts[1])
        offset = int(parts[4]) if len(parts) >= 5 and parts[3] == "offset" else 0
        return slot0 and now.hour % n == offset
    raise ValueError(f"unsupported schedule {schedule!r}")


@dataclass
class Connection:
    """A configured data connection (landing table + module + options)."""

    name: str  # e.g. OKTA_DEFAULT_CONNECTION
    module: IngestFn
    options: dict = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, name: str, module: IngestFn, comment: str) -> "Connection":
        return cls(name=name, module=module, options=yaml.safe_load(comment) or {})


class LandingStore:
    """Minimal landing-table writer: (raw, event_time) parquet dirs."""

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base

    def append_page(self, table: str, page: list[dict]) -> int:
        rows = [(json.dumps(r, default=str, sort_keys=True),) for r in page]
        df = self.spark.createDataFrame(rows, "raw string").withColumn(
            "event_time", F.current_timestamp()
        )
        df.write.mode("append").parquet(f"{self.base}/{table}")
        return len(rows)

    def append_timed(self, table: str, pairs: list[tuple[dict, "dt.datetime"]]) -> int:
        """Append rows carrying their own event_time (okta system logs
        land with each row's ``published`` — okta.py:196-199)."""
        rows = [
            (json.dumps(r, default=str, sort_keys=True), t) for r, t in pairs
        ]
        df = self.spark.createDataFrame(rows, "raw string, event_time timestamp")
        df.write.mode("append").parquet(f"{self.base}/{table}")
        return len(rows)

    def fetch_latest(self, table: str) -> dt.datetime | None:
        """db.fetch_latest analog: the incremental since-cursor."""
        try:
            df = self.read(table)
        except Exception:
            return None
        row = df.agg(F.max("event_time").alias("m")).collect()[0]
        return row["m"]

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(f"{self.base}/{table}")


def connection_run(
    conn: Connection,
    landing: LandingStore,
    results: ResultsStore,
    now: dt.datetime | None = None,
    run_id: str | None = None,
) -> int:
    """connectors_runner.connection_run analog: schedule gate → ingest
    generator → per-page append → ingestion metadata (before/after)."""
    from snowalert_spark.sources import secrets

    now = now or dt.datetime.utcnow()
    run_id = run_id or uuid.uuid4().hex
    if not schedule_ok(conn.options.get("schedule"), now):
        return 0
    start = dt.datetime.utcnow()
    total = 0
    err = None
    try:
        options = secrets.resolve_options(conn.options)
        for page in conn.module(conn.name, options):
            total += landing.append_page(conn.name, page)
    except Exception as e:  # error quarantine
        err = e
    metadata.record(
        results,
        "ingestion_metadata",
        run_id,
        query_name=conn.name,
        run_type="CONNECTOR",
        start=start,
        row_counts={"inserted": total},
        error=err,
    )
    return total
