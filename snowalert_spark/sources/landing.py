"""Partitioned landing tables: the 100 TB shape for connector output.

Connectors land rows with a ``recorded_at``/``event_time`` watermark;
at scale the landing table is a parquet root partitioned by the
derived date (``p_date=YYYY-MM-DD/``). Pack rules filter on the raw
timestamp (``WHERE recorded_at > CURRENT_DATE - 2`` — verbatim
Snowflake text, untouchable), and Spark does not transitively prune
``p_date`` from a ``recorded_at`` predicate. The bridge is the
*freshness view*: the landing view the rules read carries an explicit
partition bound (collectors only ever append rows whose
``recorded_at`` date equals their ``p_date``, so the bound is
semantically free). The rule's own timestamp filter then applies on
top — scans touch only ``retention_days`` worth of partitions no
matter how many years of landing history exist.

Verified by tests/test_partitioned_landing.py: the pack view's
FileScan shows ``PartitionFilters: [p_date >= …]`` and reads only the
fresh partition directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_landing(
    df: DataFrame, path: str, time_col: str = "recorded_at", mode: str = "append"
) -> None:
    """Append connector output into a date-partitioned landing root.

    Partition grain is one directory per day of ``time_col`` — at a
    1000-executor scale each collector run touches only the current
    day's directory, and compaction/retention are per-directory
    operations."""
    (
        df.withColumn("p_date", F.to_date(F.col(time_col)))
        .write.mode(mode)
        .partitionBy("p_date")
        .parquet(path)
    )


def register_landing_view(
    spark: SparkSession,
    name: str,
    path: str,
    retention_days: int | None = None,
) -> DataFrame:
    """Register the freshness view the rules read.

    ``retention_days`` bounds the scan to the newest N day-partitions
    (static partition pruning: the bound lands in the FileScan's
    PartitionFilters). None registers the full-history view — for
    backfills and investigations."""
    df = spark.read.parquet(path)
    if retention_days is not None:
        df = df.filter(
            F.col("p_date") >= F.date_sub(F.current_date(), retention_days)
        )
    df = df.drop("p_date")
    df.createOrReplaceTempView(name)
    return df
