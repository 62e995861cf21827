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
def _ts_normalize_cols(path: str) -> tuple[tuple[str, ...], tuple[str, ...]]:
    """Footer-driven timestamp normalization plan: ``(nanos, ntz)``.

    * ``nanos`` — parquet TIMESTAMP(NANOS) columns; Spark rejects the
      type outright, so we read them as int64 (legacy conf) and truncate
      to microseconds, exactly what DuckDB's TIMESTAMP_NS→TIMESTAMP cast
      does, so oracle comparisons agree.
    * ``ntz`` — tz-less ``timestamp[us/ms/s]`` columns; PySpark ≥3.4
      reads these as TIMESTAMP_NTZ (inferTimestampNTZ), which forbids
      ``cast(ts AS DOUBLE)`` / ``unix_micros(ts)`` and breaks oracle
      schema parity. We cast to session-zone TIMESTAMP on load — the
      session timezone is pinned UTC (session.py), so the conversion is
      value-preserving and matches DuckDB's naive-timestamp reading.

    One driver-side footer read per path (cached) — no data scan, and at
    cluster scale the per-column cast is a pure projection (no shuffle).
    Handles both the driver's single-file layout and a directory of
    part files (the real cluster table layout): one part's footer
    speaks for the table.
    """
    import os

    if os.path.isdir(path):
        part = next(
            p for p in sorted(os.listdir(path)) if p.endswith(".parquet")
        )
        path = os.path.join(path, part)
    pf = pq.ParquetFile(path)
    schema = pf.schema_arrow
    # physical INT96 (Spark's default timestamp encoding) also surfaces
    # as timestamp[ns] in arrow — but Spark reads its own INT96 as
    # TIMESTAMP natively, so it must NOT take the nanos-as-long path
    int96 = {
        c.path_in_schema
        for c in (pf.metadata.row_group(0).column(i)
                  for i in range(pf.metadata.num_columns))
        if c.physical_type == "INT96"
    } if pf.metadata.num_row_groups else set()
    nanos, ntz = [], []
    for f in schema:
        t = str(f.type)
        if f.name in int96:
            continue
        if t in ("timestamp[ns]", "timestamp[ns, tz=UTC]"):
            nanos.append(f.name)
        elif t in ("timestamp[us]", "timestamp[ms]", "timestamp[s]"):
            ntz.append(f.name)
    return tuple(nanos), tuple(ntz)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    path = f"{sf_dir}/{name}.parquet"
    nanos, ntz = _ts_normalize_cols(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c in ntz:
        # No-op if the session already read the column as TIMESTAMP
        # (e.g. inferTimestampNTZ disabled); NTZ→TIMESTAMP otherwise.
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the named tables (default: all) as temp views so both
    the DataFrame API and ``spark.sql`` can reach them."""
    for name in names or TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
