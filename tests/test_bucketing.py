"""Bucketed co-located joins: the shuffle-elimination technique for
repeated large-table joins (SURVEY §4 / pyspark guide). Landing tables
that are joined on the same key every run (e.g. cloudtrail ↔ enrich
tables on account_id) should be bucketed at write time so every
subsequent join skips both shuffles."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from snowalert_spark.tables import table


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = table(spark, "/root/testdata/sf0.001", "orders")
        c = table(spark, "/root/testdata/sf0.001", "customer")
        o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
            "overwrite"
        ).saveAsTable("orders_b")
        c.withColumnRenamed("c_custkey", "o_custkey").write.bucketBy(
            8, "o_custkey"
        ).sortBy("o_custkey").mode("overwrite").saveAsTable("customer_b")

        joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"

        # and the result matches the plain join
        plain = o.join(
            c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        ).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
