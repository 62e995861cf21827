"""Training-data sinks: materialize a curated corpus as shard files.

The last step of a pretraining data pipeline is not a table but a
directory of shard files a data loader streams — fixed shard count,
deterministic membership and intra-shard order, so every rerun (and
every epoch with the same seed) produces byte-identical shards.

Built on the same seeded-hash shuffle as
``workload.textops.corpus_shuffle_shards``: shard id and order come
from md5 over a seed tag + row id, never from RNG or partition
layout. The write plan is ONE hash exchange on the shard expression
(``repartition(n_shards, shard)`` puts each shard's rows in exactly
one task) followed by a per-task local sort — no global ORDER BY. At
100 TB you raise ``n_shards`` until a shard fits a task comfortably;
``maxRecordsPerFile`` then splits oversized shards without breaking
order (files sort lexicographically within the shard dir).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from snowalert_spark.functions.sampling import hash_bucket_hex


def shard_columns(id_col: Column, n_shards: int, seed: str = "shuf42") -> tuple[Column, Column]:
    """(shard_id, sort_key) for deterministic shard assignment —
    identical arithmetic to the corpus_shuffle_shards workload query
    (md5 of ``seed || ':' || id``; shard = first-8-hex-chars mod n)."""
    hx = F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string")))
    return hash_bucket_hex(hx, n_shards), hx


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: str = "shuf42",
    fmt: str = "json",
) -> None:
    """Write ``df`` as ``out_dir/shard_id=K/`` JSONL (or parquet)
    shards with deterministic membership and row order. Rerunning with
    the same seed rewrites identical shards; changing the seed is an
    epoch reshuffle."""
    shard, hx = shard_columns(F.col(id_col), n_shards, seed)
    (
        df.withColumn("shard_id", shard)
        .withColumn("_sk", hx)
        .repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "_sk", id_col)
        .drop("_sk")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .format(fmt)
        .save(out_dir)
    )


def read_training_shards(
    spark, out_dir: str, fmt: str = "json"
) -> DataFrame:
    """Read shards back (shard_id recovered from the partition dir)."""
    return spark.read.format(fmt).load(out_dir)


def shard_files(out_dir: str) -> dict[int, list[str]]:
    """Data files per shard, sorted — the manifest a loader consumes."""
    out: dict[int, list[str]] = {}
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("shard_id="):
            continue
        sid = int(d.split("=", 1)[1])
        files = sorted(
            f
            for f in os.listdir(os.path.join(out_dir, d))
            if not f.startswith(("_", "."))
        )
        out[sid] = [os.path.join(out_dir, d, f) for f in files]
    return out
