"""Oracle-backed workload registry.

Every operator from SURVEY.md §2 that this engine implements is
represented here as a named query: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI
SQL oracle string DuckDB runs over the same parquet tables. The driver
hash-compares the two at sf=0.01 — this is the correctness gate.

Conventions (to make cross-engine value-hashing deterministic):
- every computed column is aliased identically on both sides;
- double aggregates go through exact decimal summation and a single
  final cast to double (order-independent, engine-independent);
- top-k queries order by a unique tiebreak key;
- representative-row picks use deterministic ``min``/``min_by``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snowalert_spark.workload import core, pipeline, scalar, textops, vector

_MODULES = (core, pipeline, scalar, textops, vector)

QueryFn = Callable[[SparkSession, str], DataFrame]


def queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        dup = out.keys() & m.QUERIES.keys()
        if dup:
            raise ValueError(f"duplicate query names {dup} in {m.__name__}")
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
