"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the SnowAlert alert-dedupe
pipeline shape) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the
full oracle-backed workload registry from ``snowalert_spark.workload``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snowalert_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: alert projection → dedupe grouping on sf0.001."""
    return workload.queries()["alert_dedupe_groups"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()
