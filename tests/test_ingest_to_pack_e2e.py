"""End-to-end ingestion → pack-view integration: osquery JSON-lines
files stream exactly-once into a parquet landing dir
(streaming.file_stream_ingest), project through the osquery reader
shape into data_osquery_v, and the verbatim osquery pack view runs
over the result. Plus the webui DDL create path on the registry."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from snowalert_spark import packs
from snowalert_spark.rules import RuleRegistry


def test_create_from_ddl_roundtrip(spark):
    reg = RuleRegistry()
    rule = reg.create_from_ddl(
        "CREATE OR REPLACE VIEW rules.night_login_ALERT_QUERY COPY GRANTS\n"
        "  COMMENT='Night logins\n  @id nl1\n  @tags auth, odd-hours'\n"
        "AS\n"
        "SELECT 'u1' AS actor, IFF(1=1, 'login', 'other') AS action"
    )
    assert rule.name == "NIGHT_LOGIN_ALERT_QUERY"
    assert rule.rule_id == "nl1" and rule.tags == ["auth", "odd-hours"]
    row = rule.df(spark).collect()[0]
    assert row.actor == "u1" and row.action == "login"

    with pytest.raises(ValueError):
        reg.create_from_ddl("SELECT 1")
    # 3-part names and plain CREATE VIEW also parse (azure pack style)
    r2 = reg.create_from_ddl(
        "CREATE VIEW snowalert.rules.x_VIOLATION_QUERY AS SELECT 1 AS one")
    assert r2.name == "X_VIOLATION_QUERY"


@pytest.mark.skipif(
    not os.path.isdir(packs.PACKS_DIR), reason="reference packs dir unavailable"
)
def test_osquery_stream_to_pack_view(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from snowalert_spark.streaming import file_stream_ingest

    src = tmp_path / "incoming"
    src.mkdir()
    now = dt.datetime.utcnow()
    ts = int(now.timestamp())
    (src / "batch1.jsonl").write_text("\n".join(json.dumps(r) for r in [
        {"unixTime": ts - 600, "instance_id": "i-123", "name": "mounts",
         "action": "added", "hostIdentifier": "web-1"},
        {"unixTime": ts - 500, "instance_id": "i-456", "name": "mounts",
         "action": "added", "hostIdentifier": "web-2"},
    ]))

    schema = T.StructType([
        T.StructField("unixTime", T.LongType()),
        T.StructField("instance_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("hostIdentifier", T.StringType()),
    ])
    landing = str(tmp_path / "landing")
    file_stream_ingest(
        spark, str(src), landing, str(tmp_path / "ckpt"), schema,
        transform=lambda df: df.select(
            F.col("instance_id"),
            F.timestamp_seconds("unixTime").alias("event_time"),
        ),
    )
    spark.read.parquet(landing).createOrReplaceTempView("data_osquery_v")

    # inventory: i-123 and i-789 running; only i-123 ships logs... but
    # i-123 DOES ship here, so the violation is i-789
    spark.createDataFrame([
        (now, json.dumps({"InstanceId": "i-123", "Tags": "[]",
                          "State": {"Name": "running"}}), "acct1"),
        (now, json.dumps({"InstanceId": "i-789", "Tags": "[]",
                          "State": {"Name": "running"}}), "acct1"),
    ], "snapshot_at timestamp, data string, accountid string"
    ).createOrReplaceTempView("aws_inventory_snapshots_instances")
    spark.createDataFrame([("acct1", "prod", "acme")],
                          "account_id string, deployment string, "
                          "account_alias string"
                          ).createOrReplaceTempView(
        "aws_inventory_snapshots_aws_account_map")

    reg = RuleRegistry()
    packs.register_pack_rules(
        reg, f"{packs.PACKS_DIR}/osquery_query_pack.sql")
    rows = reg.rules["MISSING_SERVER_OSQUERY_LOGS_VIOLATION_QUERY"].df(
        spark).collect()
    assert {r.object for r in rows} == {"i-789"}


def test_continuous_trigger_ingest_exactly_once(spark, tmp_path):
    """processingTime pipe parity (aws_cloudtrail.py:270-275 — the
    1-minute ingest task): a running stream picks up newly-arrived
    files without restart, and a restarted stream resumes from the
    checkpoint without reprocessing — exactly once per file."""
    import time

    from pyspark.sql import types as T

    from snowalert_spark.streaming import file_stream_ingest_continuous

    src = tmp_path / "incoming"
    src.mkdir()
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("payload", T.StringType()),
    ])

    def write_file(name, ids):
        (src / name).write_text(
            "\n".join(json.dumps({"event_id": i, "payload": f"p{i}"})
                      for i in ids))

    def landed_ids(expect_n, timeout=60):
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            try:
                rows = spark.read.parquet(landing).collect()
                if len(rows) >= expect_n:
                    return sorted(r.event_id for r in rows)
            except Exception:
                pass
            time.sleep(0.5)
        raise AssertionError(f"landing never reached {expect_n} rows")

    write_file("a.jsonl", [1, 2])
    q = file_stream_ingest_continuous(
        spark, str(src), landing, ckpt, schema,
        processing_interval="1 second")
    try:
        assert landed_ids(2) == [1, 2]
        # mid-flight arrival: picked up by a later tick, no restart
        write_file("b.jsonl", [3])
        assert landed_ids(3) == [1, 2, 3]
    finally:
        q.stop()
        q.awaitTermination()

    # restart from checkpoint: only the new file lands, a/b not redone
    write_file("c.jsonl", [4])
    q2 = file_stream_ingest_continuous(
        spark, str(src), landing, ckpt, schema,
        processing_interval="1 second")
    try:
        assert landed_ids(4) == [1, 2, 3, 4]
    finally:
        q2.stop()
        q2.awaitTermination()
