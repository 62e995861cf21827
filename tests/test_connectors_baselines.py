"""Baselines, file/REST connectors, incremental + streaming ingest."""

from __future__ import annotations

import datetime as dt
import gzip
import json

import pyspark.sql.functions as F
import pytest

from snowalert_spark.runners import baselines
from snowalert_spark.sources import files, rest
from snowalert_spark.store import ResultsStore
from snowalert_spark.streaming import WatermarkBatch, file_stream_ingest
from snowalert_spark.tables import table


# --- baselines ---------------------------------------------------------
def test_hourly_counts_zero_filled(spark):
    e = table(spark, "/root/testdata/sf0.001", "events").select(
        F.col("ts").alias("event_time"), "event_type"
    )
    counts = baselines.hourly_counts(e, ["event_type"])
    rows = counts.collect()
    n_types = e.select("event_type").distinct().count()
    n_slices = counts.select("slice_start").distinct().count()
    assert len(rows) == n_types * n_slices, "matrix must be dense (zero-filled)"
    assert sum(r.n for r in rows) == e.count()
    assert all(r.slice_end == r.slice_start + dt.timedelta(hours=1) for r in rows[:10])


def test_percentile_summary_and_trailing(spark):
    e = table(spark, "/root/testdata/sf0.001", "events").select(
        F.col("ts").alias("event_time"), "event_type"
    )
    counts = baselines.hourly_counts(e, ["event_type"])
    summary = baselines.percentile_summary(counts, ["event_type"]).collect()
    assert all(r.p01 <= r.p50 <= r.p99 for r in summary)
    trail = baselines.trailing_24h(counts, ["event_type"])
    r = trail.filter(F.col("trailing_24h").isNotNull()).limit(1).collect()[0]
    assert r.trailing_24h >= 0


def test_temporal_by_day_pandas(spark):
    e = table(spark, "/root/testdata/sf0.001", "events")
    out = baselines.temporal_by_day(e, "event_type", "ts", "value").collect()
    assert len(out) > 0
    r = out[0]
    assert r.min <= r.p25 <= r.p50 <= r.p75 <= r.max
    assert r.n > 0


# --- file connectors ---------------------------------------------------
def test_cloudtrail_json(spark, tmp_path):
    rec = {
        "eventTime": "2024-03-01T12:00:00Z",
        "awsRegion": "us-east-1",
        "eventID": "e-1",
        "eventName": "StopLogging",
        "eventSource": "cloudtrail.amazonaws.com",
        "eventType": "AwsApiCall",
        "eventVersion": "1.08",
        "recipientAccountId": "123",
        "requestId": "r-1",
        "sourceIPAddress": "1.2.3.4",
        "userAgent": "aws-cli",
        "userIdentity": {"type": "IAMUser", "arn": "arn:x", "userName": "u",
                          "accountId": "123"},
        "readOnly": False,
    }
    p = tmp_path / "trail.json"
    p.write_text(json.dumps({"Records": [rec, {**rec, "eventID": "e-2"}]}))
    df = files.read_cloudtrail_json(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2
    assert {r.event_id for r in rows} == {"e-1", "e-2"}
    assert rows[0].event_name == "StopLogging"
    assert rows[0].user_identity_type == "IAMUser"
    assert rows[0].event_time == dt.datetime(2024, 3, 1, 12, 0)
    assert json.loads(rows[0].raw)["eventSource"] == "cloudtrail.amazonaws.com"


def test_flow_log_csv(spark, tmp_path):
    header = "version account_id interface_id srcaddr dstaddr srcport dstport protocol packets bytes start_time end_time action log_status"
    line1 = "2 123 eni-1 10.0.0.1 10.0.0.2 443 49152 6 10 840 1709294400 1709294460 ACCEPT OK"
    line2 = "2 123 eni-2 - - - - - - - 1709294400 1709294460 - NODATA"
    p = tmp_path / "flow.csv"
    p.write_text(header + "\n" + line1 + "\n" + line2 + "\n")
    rows = files.read_flow_log_csv(spark, str(p)).collect()
    assert len(rows) == 2
    ok = [r for r in rows if r.log_status == "OK"][0]
    assert ok.srcport == 443 and ok.bytes == 840
    assert ok.start_time == dt.datetime(2024, 3, 1, 12, 0)
    nd = [r for r in rows if r.log_status == "NODATA"][0]
    assert nd.srcaddr is None and nd.packets is None  # '-' → NULL


# --- REST connector contract ------------------------------------------
def fake_okta_ingest(table_name, options):
    for page in range(2):
        yield [
            {"uuid": f"{page}-{i}", "eventType": "user.session.start",
             "published": "2024-01-01T00:00:00Z"}
            for i in range(3)
        ]


def test_connection_run_and_schedule(spark, tmp_path):
    landing = rest.LandingStore(spark, str(tmp_path / "landing"))
    results = ResultsStore(spark, str(tmp_path / "results"))
    conn = rest.Connection.from_yaml(
        "OKTA_TEST_CONNECTION", fake_okta_ingest, "module: okta\nschedule: hourly\n"
    )
    # off-slot → gated
    assert rest.connection_run(conn, landing, results,
                               now=dt.datetime(2024, 1, 1, 10, 30)) == 0
    # on-slot → ingests 2 pages × 3 rows
    n = rest.connection_run(conn, landing, results,
                            now=dt.datetime(2024, 1, 1, 10, 5))
    assert n == 6
    df = landing.read("OKTA_TEST_CONNECTION")
    assert df.count() == 6
    # projection through the compat layer's variant-path rewrite
    from snowalert_spark import compat

    df.createOrReplaceTempView("okta_raw")
    out = spark.sql(compat.transpile(
        "SELECT raw:uuid::string AS uuid, raw:eventType::string AS et FROM okta_raw"
    ))
    assert out.filter(F.col("et") == "user.session.start").count() == 6


def test_schedule_parser():
    now0 = dt.datetime(2024, 1, 1, 12, 5)
    assert rest.schedule_ok(None, now0)
    assert rest.schedule_ok("hourly", now0)
    assert not rest.schedule_ok("hourly", dt.datetime(2024, 1, 1, 12, 20))
    assert rest.schedule_ok("every 12 hours", dt.datetime(2024, 1, 1, 12, 0))
    assert not rest.schedule_ok("every 12 hours", dt.datetime(2024, 1, 1, 13, 0))
    assert rest.schedule_ok("every 12 hours offset 1", dt.datetime(2024, 1, 1, 13, 0))


# --- incremental / streaming ------------------------------------------
def test_watermark_batch(spark, tmp_path):
    e = table(spark, "/root/testdata/sf0.001", "events")
    wb = WatermarkBatch(str(tmp_path / "ckpt" / "wm.json"), "event_id")
    inc1 = wb.read_increment(e)
    assert inc1.count() == 1000
    wb.commit(inc1)
    assert wb.read_increment(e).count() == 0  # exactly-once


def test_file_stream_ingest(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    (src / "batch1.json").write_text(
        "\n".join(json.dumps({"id": i, "kind": "a"}) for i in range(5))
    )
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("kind", T.StringType())]
    )
    file_stream_ingest(spark, str(src), dst, ckpt, schema)
    assert spark.read.parquet(dst).count() == 5
    # new file arrives → only the delta is ingested
    (src / "batch2.json").write_text(json.dumps({"id": 99, "kind": "b"}))
    file_stream_ingest(spark, str(src), dst, ckpt, schema)
    got = spark.read.parquet(dst)
    assert got.count() == 6
    assert got.filter(F.col("kind") == "b").count() == 1


def test_secret_resolution(spark, tmp_path, monkeypatch):
    from snowalert_spark.sources import secrets

    monkeypatch.setenv("SA_SECRET_OKTA_TOKEN", "tok-123")
    opts = secrets.resolve_options(
        {"api_token": "secret:okta_token", "subdomain": "acme"}
    )
    assert opts == {"api_token": "tok-123", "subdomain": "acme"}
    secrets.set_resolver(lambda name: f"kms:{name}")
    try:
        assert secrets.resolve_value("secret:x") == "kms:x"
    finally:
        secrets.set_resolver(None)
    with pytest.raises(KeyError):
        secrets.resolve_value("secret:missing")

    # connection_run resolves secrets before handing options to ingest
    seen = {}

    def ingest(table, options):
        seen.update(options)
        yield []

    landing = rest.LandingStore(spark, str(tmp_path / "l2"))
    results = ResultsStore(spark, str(tmp_path / "r2"))
    conn = rest.Connection("SEC_TEST_CONNECTION", ingest,
                           {"api_token": "secret:okta_token"})
    rest.connection_run(conn, landing, results)
    assert seen["api_token"] == "tok-123"


def test_has_no_violations(spark, tmp_path):
    from snowalert_spark.rules import RuleRegistry
    from snowalert_spark.runners import violation_queries

    store = ResultsStore(spark, str(tmp_path / "hv"))
    reg = RuleRegistry()
    reg.create(
        "_HV_VIOLATION_QUERY",
        sql="SELECT 'o' AS object, 'T' AS title, CURRENT_TIMESTAMP() AS alert_time",
        comment="hv\n@id hv_query_id",
    )
    assert violation_queries.has_no_violations(store, "hv_query_id")
    violation_queries.main(spark, store, reg)
    assert not violation_queries.has_no_violations(store, "hv_query_id")
    assert violation_queries.has_no_violations(store, "other_query")


def test_streaming_windowed_counts(spark, tmp_path):
    from snowalert_spark.streaming import windowed_counts

    src = tmp_path / "wev"
    rows = [(1, "2024-01-01 00:10:00", "a"), (2, "2024-01-01 00:20:00", "a"),
            (3, "2024-01-01 01:10:00", "b"), (4, "2024-01-01 03:10:00", "a")]
    spark.createDataFrame(rows, "id long, ts string, k string").select(
        "id", F.col("ts").cast("timestamp").alias("ts"), "k"
    ).write.parquet(str(src))
    stream = spark.readStream.schema("id long, ts timestamp, k string").parquet(
        str(src)
    )
    out = windowed_counts(stream, "ts", ["k"], window="1 hour")
    q = (out.writeStream.format("memory").queryName("wc")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.slice_start.hour, r.k): r.n for r in spark.sql("SELECT * FROM wc").collect()}
    # append mode emits only windows sealed by the watermark (the last
    # event at 03:10 holds back its own window)
    assert got[(0, "a")] == 2
    assert got[(1, "b")] == 1
