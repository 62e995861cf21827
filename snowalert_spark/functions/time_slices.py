"""time_slices table functions (reference UDTFs:
installer-queries/create-udtfs.sql.fmt:3-64).

``time_slices(n, s, e)`` partitions [s, e) into n even slices;
``time_slices_before_t(n, seconds, t)`` yields n trailing slices of
the given width ending at t. Spark-side these are ``spark.range``
plans (W4: no window function needed) — fully parallel, no data scan.

Boundary arithmetic is integral microseconds so slices are exact and
engine-portable: slice i = [s + i*D div n, s + (i+1)*D div n) where
D = total microseconds.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _us(t: dt.datetime) -> int:
    """Naive datetimes are UTC wall-clock (session timezone is UTC)."""
    if t.tzinfo is None:
        t = t.replace(tzinfo=dt.timezone.utc)
    return int(t.timestamp() * 1_000_000)


def time_slices(
    spark: SparkSession, n: int, start: dt.datetime, end: dt.datetime
) -> DataFrame:
    s_us = _us(start)
    d_us = _us(end) - s_us
    return spark.range(n).select(
        F.timestamp_micros(
            F.expr(f"{s_us} + (id * {d_us}) div {n}")
        ).alias("slice_start"),
        F.timestamp_micros(
            F.expr(f"{s_us} + ((id + 1) * {d_us}) div {n}")
        ).alias("slice_end"),
    )


def time_slices_before_t(
    spark: SparkSession, n: int, seconds: int, t: dt.datetime
) -> DataFrame:
    """n trailing slices of `seconds` width ending at t
    (create-udtfs.sql.fmt:21-64)."""
    t_us = _us(t)
    w_us = seconds * 1_000_000
    i = F.col("id")
    return spark.range(n).select(
        F.timestamp_micros(F.lit(t_us) - (n - i) * F.lit(w_us)).alias("slice_start"),
        F.timestamp_micros(F.lit(t_us) - (n - i - 1) * F.lit(w_us)).alias("slice_end"),
    )
