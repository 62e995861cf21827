"""Test-data catalog: load the driver's parquet tables and register views.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
an ``sf_dir``. Reading goes through ``spark.read.parquet`` so Catalyst
gets predicate pushdown + column pruning on every scan; at cluster
scale the same loader points at partitioned table roots instead.
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=None)
def _nano_ts_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark rejects the
    type outright; we read them as int64 (legacy conf) and truncate to
    microseconds, exactly what DuckDB's TIMESTAMP_NS→TIMESTAMP cast
    does, so oracle comparisons agree. One driver-side footer read per
    path (cached) — no data scan."""
    schema = pq.read_schema(path)
    return tuple(
        f.name for f in schema if str(f.type) in ("timestamp[ns]", "timestamp[ns, tz=UTC]")
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    path = f"{sf_dir}/{name}.parquet"
    nanos = _nano_ts_cols(path)
    if not nanos:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the named tables (default: all) as temp views so both
    the DataFrame API and ``spark.sql`` can reach them."""
    for name in names or TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
