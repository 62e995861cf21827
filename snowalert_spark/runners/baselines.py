"""Baselines: count-percentile anomaly baselines (reference:
src/baselines/percentiles.py + baseline_modules/temporal_by_day R
module via baseline_runner.py).

The reference maintains ``{table}_counts(slice_start, slice_end,
groups, n)`` with an hourly MERGE task (:43-102), then derives
percentile views: per-group approx quantiles of the hourly counts and
a trailing-24h comparison (:104-241). Spark port:

- ``hourly_counts``: date_trunc binning (the regular-grid rewrite of
  the reference's time_slices range join — no non-equi join, one
  aggregation shuffle) + zero-fill against the groups × slices matrix
  (J4+J6).
- ``percentile_summary``: groupBy percentiles of n (the reference's
  APPROX_PERCENTILE window collapses to a grouped aggregate + join —
  W3/A10/A11).
- ``trailing_24h``: 24h sliding frame, excluding the current hour (W2).
- ``temporal_by_day``: applyInPandas port of the R dplyr summaries
  (baseline_modules/temporal_by_day/module.R): per (pivot,
  day-of-week) mean/sd/min/max/quantiles — the F7 UDAF surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def hourly_counts(
    df: DataFrame, group_cols: list[str], time_col: str = "event_time"
) -> DataFrame:
    """Zero-filled hourly counts per group combination."""
    binned = df.select(
        F.date_trunc("hour", F.col(time_col)).alias("slice_start"), *group_cols
    )
    counts = binned.groupBy("slice_start", *group_cols).agg(
        F.count("*").alias("n")
    )
    bounds = binned.agg(
        F.min("slice_start").alias("lo"), F.max("slice_start").alias("hi")
    )
    slices = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("slice_start")
    )
    groups = df.select(*group_cols).distinct()
    matrix = slices.crossJoin(groups)
    return (
        matrix.join(counts, ["slice_start", *group_cols], "left")
        .select(
            "slice_start",
            F.col("slice_start") + F.expr("INTERVAL 1 HOUR"),
            *group_cols,
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .toDF("slice_start", "slice_end", *group_cols, "n")
    )


def percentile_summary(
    counts: DataFrame,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
) -> DataFrame:
    """Per-group quantiles of the hourly count (percentiles.py:110-116:
    seven APPROX_PERCENTILE levels). percentile_approx does the same
    partial/merge accumulation the reference's two-phase
    ACCUMULATE/ESTIMATE form does (:151-206)."""
    aggs = [
        F.percentile_approx("n", q).alias(f"p{int(q * 100):02d}") for q in quantiles
    ]
    return counts.groupBy(*group_cols).agg(*aggs, F.count("*").alias("n_slices"))


def trailing_24h(counts: DataFrame, group_cols: list[str]) -> DataFrame:
    """Current hour vs trailing-24h sum, excluding current
    (percentiles.py:200-205)."""
    w = (
        W.partitionBy(*group_cols)
        .orderBy("slice_start")
        .rowsBetween(-24, -1)
    )
    return counts.select(
        "slice_start",
        *group_cols,
        "n",
        F.sum("n").over(w).alias("trailing_24h"),
        (F.col("n") / F.greatest(F.sum("n").over(w) / 24.0, F.lit(1.0))).alias(
            "hourly_ratio"
        ),
    )


TEMPORAL_SCHEMA = (
    "pivot string, dow int, mean double, sd double, min double, max double, "
    "p25 double, p50 double, p75 double, n long"
)


def temporal_by_day(
    df: DataFrame, pivot_col: str, time_col: str, value_col: str
) -> DataFrame:
    """applyInPandas port of the temporal_by_day R baseline module:
    per (pivot, day-of-week) distributional summary of the value."""

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(["pivot", "dow"])["v"]
        out = g.agg(
            mean="mean", sd="std", min="min", max="max", n="count"
        ).reset_index()
        q = g.quantile([0.25, 0.5, 0.75]).unstack()
        q.columns = ["p25", "p50", "p75"]
        out = out.merge(q.reset_index(), on=["pivot", "dow"])
        return out[
            ["pivot", "dow", "mean", "sd", "min", "max", "p25", "p50", "p75", "n"]
        ]

    prepped = df.select(
        F.col(pivot_col).cast("string").alias("pivot"),
        F.dayofweek(F.col(time_col)).alias("dow"),
        F.col(value_col).cast("double").alias("v"),
    )
    return prepped.groupBy("pivot").applyInPandas(summarize, TEMPORAL_SCHEMA)
