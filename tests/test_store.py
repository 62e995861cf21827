"""ResultsStore: append / overwrite / upsert semantics + idempotency
(the MERGE-replacement is SURVEY §7.2 step 1's 'unit-test first')."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from snowalert_spark.store import ResultsStore


@pytest.fixture
def store(spark, tmp_path):
    return ResultsStore(spark, str(tmp_path / "results"))


def _violation(spark, vid, title, t=None):
    t = t or dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [("{}", vid, t, None, None, None)],
        "result string, id string, alert_time timestamp, ticket string, "
        "suppressed boolean, suppression_rule string",
    )


def test_read_empty(store):
    assert store.read("violations").count() == 0


def test_append_and_overwrite(store, spark):
    store.append("violations", _violation(spark, "a", "t1"))
    store.append("violations", _violation(spark, "b", "t2"))
    assert store.read("violations").count() == 2
    store.overwrite("violations", _violation(spark, "c", "t3"))
    assert [r.id for r in store.read("violations").collect()] == ["c"]


def test_upsert_insert_then_update(store, spark):
    n = store.upsert("violations", _violation(spark, "a", "t"), on=["id"])
    assert n == {"updated": 0, "inserted": 1}
    # second run with same id: update path (set suppressed)
    n = store.upsert(
        "violations",
        _violation(spark, "a", "t"),
        on=["id"],
        when_matched={"suppressed": F.lit(True)},
    )
    assert n == {"updated": 1, "inserted": 0}
    rows = store.read("violations").collect()
    assert len(rows) == 1 and rows[0].suppressed is True


def test_upsert_counter_increment(store, spark):
    """Alert-dedupe shape: counter += src_counter on match."""
    from snowalert_spark.schema import ALERTS

    def mk(counter):
        return spark.createDataFrame(
            [
                (
                    {"ALERT_ID": "x", "OBJECT": "o", "DESCRIPTION": "d"},
                    dt.datetime(2024, 1, 1),
                    dt.datetime(2024, 1, 1),
                    None,
                    None,
                    None,
                    counter,
                    None,
                    None,
                )
            ],
            ALERTS,
        )

    store.upsert(
        "alerts",
        mk(1),
        on=lambda t, s: (F.col("alert.OBJECT") == F.col("src_alert.OBJECT"))
        & (F.col("alert.DESCRIPTION") == F.col("src_alert.DESCRIPTION")),
        when_matched={"counter": F.col("counter") + F.col("src_counter")},
    )
    store.upsert(
        "alerts",
        mk(2),
        on=lambda t, s: (F.col("alert.OBJECT") == F.col("src_alert.OBJECT"))
        & (F.col("alert.DESCRIPTION") == F.col("src_alert.DESCRIPTION")),
        when_matched={"counter": F.col("counter") + F.col("src_counter")},
    )
    rows = store.read("alerts").collect()
    assert len(rows) == 1
    assert rows[0].counter == 3


def test_update(store, spark):
    store.append("violations", _violation(spark, "a", "t"))
    store.append("violations", _violation(spark, "b", "t"))
    n = store.update(
        "violations",
        F.col("id") == "a",
        {"suppressed": F.lit(True), "suppression_rule": F.lit("r")},
    )
    assert n == 1
    got = {r.id: (r.suppressed, r.suppression_rule) for r in store.read("violations").collect()}
    assert got["a"] == (True, "r")
    assert got["b"] == (None, None)


def test_versioned_dirs_survive_partial_writes(store, spark, tmp_path):
    import os

    store.overwrite("violations", _violation(spark, "a", "t"))
    # simulate a crashed writer: incomplete version dir without _SUCCESS
    bad = tmp_path / "results" / "violations" / "v=99"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"garbage")
    assert [r.id for r in store.read("violations").collect()] == ["a"]


def test_export_chunks(store, spark):
    import pyspark.sql.functions as F

    df = spark.range(25).select(
        F.lit("{}").alias("result"),
        F.col("id").cast("string").alias("id"),
        F.lit("2024-01-01").cast("timestamp").alias("alert_time"),
        F.lit(None).cast("string").alias("ticket"),
        F.lit(None).cast("boolean").alias("suppressed"),
        F.lit(None).cast("string").alias("suppression_rule"),
    )
    store.overwrite("violations", df)
    chunks = list(store.export_chunks("violations", chunk_rows=10))
    assert [len(c) for c in chunks] == [10, 10, 5]
    assert {r.id for c in chunks for r in c} == {str(i) for i in range(25)}
