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


def login_baseline(df: DataFrame, pivot_col: str = "pivot") -> DataFrame:
    """login R baseline module port (baseline_modules/login/module.R):
    per-pivot login statistics over (EVENT_TIME, DAY, USER_ID,
    LOGIN_STATUS) rows. Pure column aggregation — no Python stage; the
    one global scalar (distinct day count) broadcasts."""
    total_days = df.select(
        F.countDistinct("day").alias("_num_days_total")
    )
    grouped = df.groupBy(F.col(pivot_col).alias("pivot")).agg(
        F.count("event_time").alias("num_logins"),
        F.countDistinct("user_id").alias("num_unique_users"),
        F.count(F.when(F.col("login_status") == "Success", 1)).alias(
            "num_successful_logins"
        ),
        F.countDistinct("day").alias("num_days"),
    )
    return grouped.crossJoin(F.broadcast(total_days)).select(
        "pivot",
        "num_logins",
        "num_unique_users",
        "num_successful_logins",
        "num_days",
        (F.col("num_days") / F.col("_num_days_total")).alias("percent_of_days"),
        (F.col("num_successful_logins") / F.col("num_days")).alias(
            "average_per_day_when_active"
        ),
        (F.col("num_successful_logins") / F.col("_num_days_total")).alias(
            "average_per_day_overall"
        ),
    )


def violations_daily_counts(df: DataFrame) -> DataFrame:
    """Shared stage of the two violation-regression baselines
    (violations_linear_prediction/module.R:33-48): distinct violation
    keys per (query_id, day), zero-filled over the global date spine ×
    all query ids. The spine is days × rules — tiny — so the fill is a
    broadcast left join; the count aggregation is the only shuffle."""
    counts = df.groupBy("query_id", "current_day").agg(
        F.countDistinct("unique_keys").alias("counts")
    )
    titles = df.groupBy("query_id").agg(F.min("title").alias("title"))
    bounds = df.select(
        F.min("current_day").alias("lo"), F.max("current_day").alias("hi")
    )
    spine = (
        bounds.select(
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias(
                "current_day"
            )
        )
        .crossJoin(titles)
    )
    return (
        spine.join(counts, ["query_id", "current_day"], "left")
        .withColumn("counts", F.coalesce("counts", F.lit(0)))
    )


PREDICTION_SCHEMA = (
    "query_id string, title string, current_day date, counts double, "
    "fitted double, sefit double, confidence_low double, confidence_high double"
)


def violations_linear_prediction(
    daily: DataFrame, today=None, horizon_days: int = 100
) -> DataFrame:
    """violations_linear_prediction R module port: per rule, an
    age-weighted (1/age²) linear fit of daily counts, evaluated with
    standard errors over the history plus a ``horizon_days`` future
    spine; confidence band = fitted ± 3·se.

    The reference fits MASS::rlm (robust M-estimation); this port uses
    closed-form weighted least squares — the 1/age² weighting, which
    dominates the fit in practice, is identical. Per-rule work is a
    days×2 matrix solve inside applyInPandas."""
    import datetime as _dt

    import numpy as np

    today = today or _dt.date.today()

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("current_day")
        days = pd.to_datetime(pdf["current_day"])
        t = (days - days.min()).dt.days.to_numpy(dtype=float)
        y = pdf["counts"].to_numpy(dtype=float)
        age = (pd.Timestamp(today) - days).dt.days.to_numpy(dtype=float) + 2
        w = 1.0 / age**2
        X = np.column_stack([np.ones_like(t), t])
        XtWX = X.T @ (w[:, None] * X)
        XtWX_inv = np.linalg.pinv(XtWX)
        beta = XtWX_inv @ X.T @ (w * y)
        resid = y - X @ beta
        dof = max(len(t) - 2, 1)
        s2 = float((w * resid**2).sum() / dof)

        future = pd.date_range(
            days.max() + pd.Timedelta(days=1), periods=horizon_days
        )
        all_days = pd.concat([pd.Series(days), pd.Series(future)])
        t_all = (all_days - days.min()).dt.days.to_numpy(dtype=float)
        Xa = np.column_stack([np.ones_like(t_all), t_all])
        fitted = Xa @ beta
        se = np.sqrt(np.einsum("ij,jk,ik->i", Xa, XtWX_inv, Xa) * s2)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "title": pdf["title"].iloc[0],
                "current_day": all_days.dt.date,
                "counts": np.concatenate(
                    [y, np.full(horizon_days, np.nan)]
                ),
                "fitted": fitted,
                "sefit": se,
                "confidence_low": fitted - 3 * se,
                "confidence_high": fitted + 3 * se,
            }
        )

    return daily.groupBy("query_id").applyInPandas(fit, PREDICTION_SCHEMA)


def violations_closeout_date(prediction: DataFrame) -> DataFrame:
    """violations_closeout_date R module port (module.R:60-80): the
    projected day each rule's fitted violation count crosses zero —
    per rule, the day minimizing |fitted|; a minimum sitting on the
    spine's last day means the trend never reaches zero in-horizon
    (UNKNOWN_END = true)."""
    scored = prediction.withColumn("near_zero", F.abs(F.col("fitted")))
    summary = scored.groupBy("query_id").agg(
        F.max("current_day").alias("last_day"),
        F.min_by("current_day", "near_zero").alias("closeout_date"),
        F.min("title").alias("title"),
    )
    return summary.select(
        "query_id",
        "title",
        (F.col("closeout_date") == F.col("last_day")).alias("unknown_end"),
        "closeout_date",
    )
