"""Skew mitigation (SURVEY §4 / 100 TB design note).

Security-log workloads are inherently skewed: one noisy actor / IP /
account can dominate a join or aggregation key. Two mitigations:

- AQE skew-join splitting is enabled by the session factory
  (``spark.sql.adaptive.skewJoin.enabled``) — handles sort-merge join
  skew at runtime with no code change.
- ``salted_join`` handles the broadcast-averse case explicitly: the
  skewed (big) side's key is salted with a deterministic bucket, the
  small side is replicated per salt, restoring a uniform shuffle.
- ``salted_distinct_count`` two-phase aggregation for heavy-hitter
  keys with expensive per-key state (COUNT DISTINCT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted (deterministic per-row salt)
    and the small side replicated ``n_salts``×. Result equals
    ``big.join(small, on, how)`` for inner/left joins."""
    salted_big = big.withColumn(
        SALT, F.pmod(F.xxhash64(*big.columns), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT)
    replicated = small.select("*", salts).withColumn(SALT, F.col(SALT).cast("bigint"))
    return salted_big.join(replicated, [on, SALT], how).drop(SALT)


def salted_distinct_count(
    df: DataFrame, key: str, value: str, n_salts: int = 32
) -> DataFrame:
    """COUNT(DISTINCT value) per key in two phases: distinct within
    (key, salt) partials, then merge — bounds per-task state for
    heavy-hitter keys."""
    partial = (
        df.withColumn(SALT, F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)))
        .groupBy(key, SALT)
        .agg(F.countDistinct(value).alias("partial"))
    )
    return partial.groupBy(key).agg(F.sum("partial").alias("n_distinct"))
