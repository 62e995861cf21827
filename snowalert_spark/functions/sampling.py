"""Deterministic sampling operators for corpus curation.

Training-data pipelines rebalance corpora by stratum (language,
source, quality band) — and at 100 TB the sample must be
*deterministic* so reruns, backfills, and the train/holdout split all
agree without coordinating state. Both operators here key the
keep/drop decision on a content-independent md5 hash bucket of the
row id: pure column expressions, no RNG, no shuffle, engine-portable
(the DuckDB oracle replays the identical arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of
    md5(value-as-string) taken mod ``buckets``. DuckDB oracle form:
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::UBIGINT % B``."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_pct: dict[str, int],
    id_col: str,
    default_pct: int = 100,
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum deterministic downsample: keep a row iff its id's
    hash bucket falls below the stratum's percentage. Map-only (the
    rate lookup is a literal map, the filter is a column predicate) —
    the filter is applied at the scan, nothing shuffles, and the same
    row set survives on any cluster layout or rerun.

    Returns the input rows (all columns) plus ``bucket`` and
    ``rate_pct`` so the decision is auditable downstream.
    """
    pairs = [x for k, v in sorted(rates_pct.items()) for x in (F.lit(k), F.lit(v))]
    rate = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)] if pairs else F.lit(None),
        F.lit(default_pct),
    )
    return (
        df.withColumn("bucket", hash_bucket(F.col(id_col), buckets))
        .withColumn("rate_pct", rate)
        .filter(F.col("bucket") < F.col("rate_pct"))
    )
