"""Streaming EMBEDDING near-dup tier e2e (round-8 verdict item 6).

A planted near-duplicate VECTOR arriving in a later file must be
dropped against the accumulated rplsh band state (the base corpus is
never re-signed), and the state must stay bounded by the retention
horizon — mirrors the text tier's contract in test_neardup_stream.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import types as T

from snowalert_spark.streaming import neardup_embedding_stream_ingest

DIM = 8

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def _unit(seed: int) -> list[float]:
    # deterministic pseudo-random direction per seed
    v = [math.sin(seed * 37.0 + k * 11.0) + 0.01 for k in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _near(v: list[float]) -> list[float]:
    w = list(v)
    w[0] += 0.001  # cosine >> 0.99
    return w


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for vec_id, emb in rows:
            f.write(json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n")


def _run(spark, tmp, retention=None):
    neardup_embedding_stream_ingest(
        spark,
        src_path=f"{tmp}/src",
        dst_path=f"{tmp}/out",
        checkpoint=f"{tmp}/ckpt",
        state_dir=f"{tmp}/state",
        schema=SCHEMA,
        threshold=0.99,
        n_planes=16,
        bands=4,
        dim=DIM,
        retention_batches=retention,
    )


def _out_ids(spark, tmp):
    return sorted(
        r["vec_id"]
        for r in spark.read.schema(SCHEMA).parquet(f"{tmp}/out").collect()
    )


def test_cross_file_vector_neardup_dropped(spark, tmp_path):
    tmp = str(tmp_path)
    a, b = _unit(1), _unit(2)
    _write(f"{tmp}/src", "f1.json", [(1, a), (2, b)])
    _run(spark, tmp)
    assert _out_ids(spark, tmp) == [1, 2]

    # later file: 3 is a near-dup of 1, 4 is a fresh direction
    _write(f"{tmp}/src", "f2.json", [(3, _near(a)), (4, _unit(9))])
    _run(spark, tmp)
    assert _out_ids(spark, tmp) == [1, 2, 4]


def test_in_batch_vector_neardup_keeps_min_id(spark, tmp_path):
    tmp = str(tmp_path)
    a = _unit(5)
    _write(f"{tmp}/src", "f1.json", [(7, _near(a)), (3, a), (9, _unit(6))])
    _run(spark, tmp)
    assert _out_ids(spark, tmp) == [3, 9]


def test_vector_state_bounded_by_retention(spark, tmp_path):
    tmp = str(tmp_path)
    a = _unit(11)
    _write(f"{tmp}/src", "f1.json", [(1, a)])
    _run(spark, tmp, retention=1)
    _write(f"{tmp}/src", "f2.json", [(2, _unit(12))])
    _run(spark, tmp, retention=1)
    # batch 0's state (vec 1) fell out of the 1-batch horizon: its
    # near-dup is ingested again, like an event past the watermark
    _write(f"{tmp}/src", "f3.json", [(3, _near(a))])
    _run(spark, tmp, retention=1)
    assert _out_ids(spark, tmp) == [1, 2, 3]

    # compaction: only the newest batch's state survives on disk
    vec = spark.read.schema(
        "vec_id long, embedding array<double>, batch_id long"
    ).parquet(f"{tmp}/state/base_vectors")
    assert {r["vec_id"] for r in vec.select("vec_id").collect()} == {3}
    bk = spark.read.schema("vec_id long, b int, h int, batch_id long").parquet(
        f"{tmp}/state/base_buckets"
    )
    assert {r["vec_id"] for r in bk.select("vec_id").distinct().collect()} == {3}


def test_matches_batch_rplsh_operator(spark, tmp_path):
    """Streaming tier agrees with the batch pair finder on the same
    split: survivors = batch minus vectors cosine_pairs_rplsh pairs
    against the already-ingested base at the same (planes, bands)."""
    from snowalert_spark.functions.similarity import cosine_pairs_rplsh

    tmp = str(tmp_path)
    f1 = [(1, _unit(1)), (2, _unit(2))]
    f2 = [(10, _near(_unit(2))), (11, _unit(3))]
    _write(f"{tmp}/src", "f1.json", f1)
    _run(spark, tmp)
    _write(f"{tmp}/src", "f2.json", f2)
    _run(spark, tmp)

    both = spark.createDataFrame(f1 + f2, "vec_id long, embedding array<double>")
    pairs = cosine_pairs_rplsh(
        both, 0.99, n_planes=16, bands=4, dim=DIM
    ).collect()
    base_ids = {d for d, _ in f1}
    flagged = {
        r["vec_b"] for r in pairs if r["vec_a"] in base_ids
    } | {r["vec_a"] for r in pairs if r["vec_b"] in base_ids}
    expected = sorted(
        [d for d, _ in f1] + [d for d, _ in f2 if d not in flagged]
    )
    assert _out_ids(spark, tmp) == expected
