"""Local replica of the driver's correctness gate.

Runs a workload query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names, and
cell values exactly (stricter than a hash: we localize the diff).
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from snowalert_spark.tables import TABLES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    # numpy arrays (DuckDB list columns) → python lists, cell-normalized
    if type(v).__module__ == "numpy" and hasattr(v, "ndim") and v.ndim > 0:
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    # numpy scalars → python
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    # pandas NaT
    if type(v).__name__ == "NaTType":
        return None
    if type(v).__name__ == "Timestamp":
        return v.to_pydatetime().replace(tzinfo=None)
    return v


def _typed(v):
    # type-strict: int64 vs float64 (e.g. DuckDB HUGEINT→float64 from an
    # uncast SUM) must FAIL even when values compare equal — the driver
    # may hash stringified values where 123 != 123.0.
    if v is None:
        return (0, None)
    return (type(v).__name__, v)


def _normalize(df):
    cols = sorted(df.columns)
    rows = [
        tuple(_typed(_norm_cell(v)) for v in row)
        for row in df[cols].itertuples(index=False)
    ]
    rows.sort(key=lambda r: tuple((x[1] is None, x[0], str(x[1])) for x in r))
    return cols, rows


def compare(spark_df, oracle: str, sf_dir: str, name: str = "?") -> None:
    sp = spark_df.toPandas()
    du = duckdb_run(oracle, sf_dir)
    scols, srows = _normalize(sp)
    ocols, orows = _normalize(du)
    assert scols == ocols, f"{name}: columns differ: spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), (
        f"{name}: row count differs: spark={len(srows)} oracle={len(orows)}"
    )
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            # floats: report magnitude to distinguish real bugs from ulp noise
            detail = []
            for c, ((tx, x), (ty, y)) in zip(scols, zip(a, b)):
                if (tx, x) != (ty, y):
                    d = (
                        abs(x - y)
                        if isinstance(x, (int, float)) and isinstance(y, (int, float))
                        else None
                    )
                    detail.append(
                        f"{c}: spark={x!r}({tx}) oracle={y!r}({ty}) absdiff={d}"
                    )
            raise AssertionError(
                f"{name}: row {i}/{len(srows)} differs:\n  " + "\n  ".join(detail)
            )
