"""Test-data catalog: load the driver's parquet tables and register views.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
an ``sf_dir``. Reading goes through ``spark.read.parquet`` so Catalyst
gets predicate pushdown + column pruning on every scan; at cluster
scale the same loader points at partitioned table roots instead.
"""

from __future__ import annotations

import logging
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)

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


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Scale-adaptive parallelism recovery for heavy per-row operators.

    The driver's testdata is one single-row-group parquet file per
    table — unsplittable below ONE scan task no matter what
    ``maxPartitionBytes`` says — so any expensive per-row expansion
    (window fingerprints, shingle explodes, codebook argmax) that runs
    straight off the scan is serialized onto one core. This helper
    repartitions the input up to the session's default parallelism
    ONLY when the incoming plan is narrower than that; at cluster
    scale a 100 TB table arrives in thousands of splits and the guard
    makes this a no-op (no gratuitous corpus shuffle). The exchanged
    bytes in the narrow case are the RAW rows — orders of magnitude
    cheaper than exchanging any downstream expansion of them.

    ``key_cols`` (when given) hash-partition by those columns so a
    downstream per-key aggregate can reuse the partitioning instead of
    adding its own exchange; the explicit partition count pins the
    fan-out (AQE's coalescer would otherwise fold a few-MB exchange
    back to one partition, recreating the serial scan).

    The narrowness test reads ``df.inputFiles()`` — pure driver-side
    file metadata, no Spark jobs (``df.rdd.getNumPartitions()`` would
    EXECUTE every upstream AQE query stage just to count partitions —
    measured as a per-call re-materialization of the whole prefilter
    subtree). Fewer source files than cores ⇒ the scan cannot reach
    core-count parallelism (a parquet file with one row group is one
    task no matter what); a non-file source (in-memory batch) counts
    as narrow, which is the right call for the small streaming tick
    frames that hit this path.

    Each narrow→repartition / wide→no-op decision is debug-logged once
    per source (r13 verdict item 6: the bare except silently degraded
    to the serial scan on a cluster misconfig — now the degradation is
    visible at DEBUG without spamming per-call)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception as exc:  # noqa: BLE001 — any source w/o file info
        _spread_log_once(
            ("inputFiles-error", type(exc).__name__),
            "spread: inputFiles() failed (%s: %s) — leaving the plan "
            "unspread (serial scan possible)", type(exc).__name__, exc,
        )
        return df
    src = files[0] if files else "<non-file source>"
    if len(files) >= target:
        _spread_log_once(
            (src, "no-op"),
            "spread: %d input files >= %d cores for %s — no-op",
            len(files), target, src,
        )
        return df
    _spread_log_once(
        (src, "repartition"),
        "spread: %d input files < %d cores for %s — repartitioning%s",
        len(files), target, src,
        f" by {key_cols}" if key_cols else "",
    )
    return df.repartition(target, *[F.col(c) for c in key_cols]) if key_cols \
        else df.repartition(target)


_SPREAD_LOGGED: set[tuple] = set()


def _spread_log_once(key: tuple, msg: str, *args) -> None:
    if key not in _SPREAD_LOGGED:
        _SPREAD_LOGGED.add(key)
        _log.debug(msg, *args)


def register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the named tables (default: all) as temp views so both
    the DataFrame API and ``spark.sql`` can reach them."""
    for name in names or TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
