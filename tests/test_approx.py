"""Approximate aggregates: bounded-error checks against exact values
(no cross-engine oracle is possible for sketches)."""

from __future__ import annotations

import pyspark.sql.functions as F

from snowalert_spark.tables import table
from snowalert_spark.workload.core import approx_aggregates

SF = "/root/testdata/sf0.01"


def test_approx_vs_exact(spark):
    approx = {r.event_type: r for r in approx_aggregates(spark, SF).collect()}
    exact = {
        r.event_type: r
        for r in table(spark, SF, "events")
        .groupBy("event_type")
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
