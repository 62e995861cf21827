"""Approximate aggregates: bounded-error checks against exact values.

Engine-specific sketches can't hash-match a cross-engine oracle, so
the driver-facing query (workload/core.py approx_aggregates) emits
exact anchors + in-bound booleans; here we verify those booleans hold
AND bound the raw sketch error directly.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from snowalert_spark.tables import table
from snowalert_spark.workload.core import approx_aggregates

SF = "/root/testdata/sf0.01"


def test_approx_contract_holds(spark):
    rows = approx_aggregates(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.users_within_bound, r
        assert r.p50_within_bracket, r
        assert r.quantiles_monotonic, r


def test_approx_vs_exact(spark):
    e = table(spark, SF, "events")
    approx = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", 0.5).alias("approx_p50"),
            F.percentile_approx(
                "value", [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]
            ).alias("approx_quantiles"),
        )
        .collect()
    }
    exact = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for t, ex in exact.items():
        ap = approx[t]
        assert abs(ap.approx_users - ex.users) <= max(1, 0.05 * ex.users)
        assert abs(ap.approx_p50 - ex.p50) <= 0.05 * max(ex.p50, 1)
        qs = ap.approx_quantiles
        assert all(qs[i] <= qs[i + 1] for i in range(len(qs) - 1))
