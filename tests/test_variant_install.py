"""Variant helpers (JSON-null sentinel, object_construct/assign) and
the installer analog."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from snowalert_spark.functions import variant as V


def test_object_construct_sorted_compact(spark):
    df = spark.range(1).select(
        V.object_construct(
            b=F.lit("x"), a=F.lit(1).cast("int"), z=F.lit(None).cast("string")
        ).alias("doc")
    )
    doc = df.collect()[0].doc
    assert doc == '{"a":1,"b":"x"}'  # sorted keys, compact, nulls omitted


def test_is_json_null(spark):
    df = spark.createDataFrame(
        [("null",), (None,), ('"x"',)], "v string"
    ).select("v", V.is_json_null(F.col("v")).alias("jn"))
    got = [(r.v, r.jn) for r in df.collect()]
    assert got == [("null", True), (None, None), ('"x"', False)]


def test_object_assign_last_wins(spark):
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    df = spark.range(1).select(
        V.object_assign(
            F.lit('{"a": "1", "b": "2"}'), F.lit('{"b": "3", "c": "4"}')
        ).alias("m")
    )
    merged = json.loads(df.collect()[0].m)
    assert merged == {"a": "1", "b": "3", "c": "4"}


def test_install_views(spark, tmp_path):
    from snowalert_spark import install
    from snowalert_spark.rules import RuleRegistry
    from snowalert_spark.store import ResultsStore

    store = ResultsStore(spark, str(tmp_path / "results"))
    reg = RuleRegistry()
    install.install(spark, store, reg, sf_dir="/root/testdata/sf0.001")
    # sample rule registered + fixture view live
    assert "SNOWFLAKE_LOGIN_WITHOUT_MFA_ALERT_QUERY" in reg.rules
    assert spark.table("successful_snowflake_logins_v").count() > 0
    # data views exist (empty but typed)
    assert spark.table("data_alerts_v").columns[:3] == [
        "alert_id", "query_name", "query_id",
    ]
    tags = spark.table("data_rule_tags").collect()
    assert {t.tag for t in tags} == {"snowflake", "mfa"}


def test_metadata_views(spark, tmp_path):
    import datetime as dt

    from snowalert_spark import install
    from snowalert_spark.rules import RuleRegistry
    from snowalert_spark.runners import violation_queries
    from snowalert_spark.store import ResultsStore

    store = ResultsStore(spark, str(tmp_path / "mdv"))
    reg = RuleRegistry()
    reg.create("_OK_VIOLATION_QUERY", sql="SELECT 'o' AS object, 'T' AS title",
               comment="ok")
    reg.create("_BAD_VIOLATION_QUERY", sql="SELECT raise_error('boom') AS object",
               comment="bad")
    violation_queries.main(spark, store, reg)
    install.register_metadata_views(spark, store)
    runs = {r.query_name: r for r in spark.table("data_rule_runs").collect()}
    assert runs["_OK_VIOLATION_QUERY"].inserted == 1
    assert runs["_OK_VIOLATION_QUERY"].error is None
    assert runs["_BAD_VIOLATION_QUERY"].error is not None
    errs = spark.table("data_rule_run_errors").collect()
    assert [e.query_name for e in errs] == ["_BAD_VIOLATION_QUERY"]
