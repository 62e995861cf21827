"""SparkSession factory.

Local testing runs a single JVM (``local[N]``); production target is a
multi-executor cluster reading ~100 TB. All scale-relevant settings are
expressed as spark.sql.* conf so they apply unchanged on a real cluster:
AQE (runtime re-planning, partition coalescing, skew-join splitting),
UTC session timezone (oracle comparability + log data is UTC), Arrow
for the few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(
    app_name: str = "snowalert_spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a cluster, ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # tz-less parquet timestamps read as TIMESTAMP (not NTZ): session
        # tz is UTC, so values match DuckDB's naive reading, and the
        # workload's epoch arithmetic (cast-to-double, unix_micros) stays
        # legal. tables.py additionally normalizes per-column for
        # sessions not built by this factory.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 100 TB note: autoBroadcastJoinThreshold stays default (10 MB);
        # dimension tables (region/nation/rule metadata) broadcast, fact
        # scans never do. maxPartitionBytes default 128 MB keeps scan
        # tasks memory-bounded regardless of total input size.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from snowalert_spark.functions.variant import register_sql_functions

    register_sql_functions(spark)
    return spark
