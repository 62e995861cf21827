"""Late/out-of-order data e2e (round-7 verdict item 7): the
reference's no-watermark design — a 90-minute trailing window
re-scanned every run, with the dedupe-merge absorbing re-detections
(alert_queries_runner.py:27-34, 64-94) — must absorb a file that
arrives AFTER events newer than it were already ingested and alerted
on: the next window run emits no duplicate alert rows, increments the
existing groups' counters by the re-scan count, and creates exactly
one alert for genuinely new late objects.
"""

from __future__ import annotations

import datetime as dt
import json
import time

import pytest
from pyspark.sql import types as T

from snowalert_spark.rules import RuleRegistry
from snowalert_spark.runners import alert_queries
from snowalert_spark.store import ResultsStore
from snowalert_spark.streaming import file_stream_ingest_continuous

SCHEMA = T.StructType(
    [
        T.StructField("actor", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)


def _write(src, name, rows):
    (src / name).write_text(
        "\n".join(
            json.dumps(
                {
                    "actor": a,
                    "action": act,
                    "event_time": t.strftime("%Y-%m-%dT%H:%M:%S"),
                }
            )
            for a, act, t in rows
        )
    )


def _landed(spark, landing, expect_n, timeout=60):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            n = spark.read.parquet(landing).count()
            if n >= expect_n:
                return n
        except Exception:
            pass
        time.sleep(0.5)
    raise AssertionError(f"landing never reached {expect_n} rows")


def test_late_file_absorbed_by_window_rescan(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    store = ResultsStore(spark, str(tmp_path / "results"))

    t0 = dt.datetime.utcnow().replace(microsecond=0)
    frm = t0 - dt.timedelta(minutes=90)
    to = t0 + dt.timedelta(hours=1)

    reg = RuleRegistry()
    reg.create(
        "_LATE_ALERT_QUERY",
        sql=(
            "SELECT actor, actor AS object, action, "
            "CONCAT('late login by ', actor) AS description, "
            "'Late Login' AS title, event_time, event_time AS alert_time, "
            "'late detector' AS detector, 'low' AS severity "
            "FROM late_events"
        ),
        comment="Late-arrival rule\n@id late_rule_id",
    )

    def refresh_view_and_run():
        # re-list the landing dir (a DataFrame pins its file index at
        # creation — exactly what a per-run rule evaluation does)
        spark.read.parquet(landing).createOrReplaceTempView("late_events")
        alert_queries.main(spark, store, reg, from_ts=frm, to_ts=to)
        return store.read("alerts").collect()

    q = file_stream_ingest_continuous(
        spark, str(src), landing, ckpt, SCHEMA, processing_interval="1 second"
    )
    try:
        # on-time batch: u1 twice, u2 once — all inside the window
        _write(
            src,
            "ontime.jsonl",
            [
                ("u1", "login", t0 - dt.timedelta(minutes=10)),
                ("u1", "login", t0 - dt.timedelta(minutes=9)),
                ("u2", "login", t0 - dt.timedelta(minutes=8)),
            ],
        )
        _landed(spark, landing, 3)
        rows = refresh_view_and_run()
        by_obj = {r.alert.OBJECT: r for r in rows}
        assert set(by_obj) == {"u1", "u2"}
        assert by_obj["u1"].counter == 2
        assert by_obj["u2"].counter == 1

        # LATE file: events OLDER than everything already ingested
        # (60 min ago — out-of-order but inside the 90-min window),
        # for an existing group (u1) and a brand-new one (u3)
        _write(
            src,
            "late.jsonl",
            [
                ("u1", "login", t0 - dt.timedelta(minutes=60)),
                ("u3", "login", t0 - dt.timedelta(minutes=55)),
            ],
        )
        _landed(spark, landing, 5)
        rows = refresh_view_and_run()
    finally:
        q.stop()
        q.awaitTermination()

    # no duplicate alert rows: one per (OBJECT, DESCRIPTION) group
    assert len(rows) == 3, [r.alert.OBJECT for r in rows]
    by_obj = {r.alert.OBJECT: r for r in rows}
    # u1: 2 (first run) + 3 (re-scan now sees 2 on-time + 1 late) = 5
    assert by_obj["u1"].counter == 5
    # u2: 1 + 1 (re-scan) = 2
    assert by_obj["u2"].counter == 2
    # u3 arrived only in the late file: exactly one alert, counter 1
    assert by_obj["u3"].counter == 1
    assert by_obj["u3"].alert.QUERY_NAME == "_LATE_ALERT_QUERY"
    # exactly-once ingest under the running stream: 5 rows, no dupes
    assert spark.read.parquet(landing).count() == 5


def test_late_file_outside_window_is_ignored(spark, tmp_path):
    """An event older than the 90-minute cutoff must NOT alert — the
    window bound is the no-watermark design's lateness limit."""
    landing = str(tmp_path / "landing")
    store = ResultsStore(spark, str(tmp_path / "results"))
    t0 = dt.datetime.utcnow().replace(microsecond=0)
    frm = t0 - dt.timedelta(minutes=90)

    df = spark.createDataFrame(
        [
            ("u1", "login", t0 - dt.timedelta(minutes=10)),
            ("u4", "login", t0 - dt.timedelta(minutes=200)),  # too late
        ],
        SCHEMA,
    )
    df.write.parquet(landing)
    spark.read.parquet(landing).createOrReplaceTempView("late_events")

    reg = RuleRegistry()
    reg.create(
        "_LATE_ALERT_QUERY",
        sql=(
            "SELECT actor, actor AS object, action, "
            "CONCAT('late login by ', actor) AS description, "
            "'Late Login' AS title, event_time, event_time AS alert_time, "
            "'late detector' AS detector, 'low' AS severity "
            "FROM late_events"
        ),
        comment="Late-arrival rule\n@id late_rule_id",
    )
    alert_queries.main(spark, store, reg, from_ts=frm, to_ts=t0)
    objs = [r.alert.OBJECT for r in store.read("alerts").collect()]
    assert objs == ["u1"]
