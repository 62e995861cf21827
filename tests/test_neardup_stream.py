"""Streaming near-dup dedup tier e2e (round-7 verdict item 7).

A planted near-duplicate arriving in a LATER file must be dropped
against the accumulated band state (no re-shingling of the base
corpus), and the state must stay bounded by the retention horizon —
the micro-batch analog of a streaming watermark.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from snowalert_spark.streaming import neardup_stream_ingest

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BASE = ("the quick brown fox jumps over the lazy dog while the "
        "bright sun shines over the green quiet valley today")
# same text with one token changed near the end: shingle Jaccard ~0.9
NEAR = ("the quick brown fox jumps over the lazy dog while the "
        "bright sun shines over the green quiet meadow today")
OTHER = ("completely different content about spark structured "
         "streaming joins state stores and watermark semantics here")


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run(spark, tmp, retention=None):
    neardup_stream_ingest(
        spark,
        src_path=f"{tmp}/src",
        dst_path=f"{tmp}/out",
        checkpoint=f"{tmp}/ckpt",
        state_dir=f"{tmp}/state",
        schema=SCHEMA,
        threshold=0.8,
        retention_batches=retention,
    )


def _out_ids(spark, tmp):
    return sorted(
        r["doc_id"] for r in spark.read.schema(SCHEMA).parquet(f"{tmp}/out").collect()
    )


def test_cross_file_neardup_dropped(spark, tmp_path):
    tmp = str(tmp_path)
    _write(f"{tmp}/src", "f1.json", [(1, BASE), (2, OTHER)])
    _run(spark, tmp)
    assert _out_ids(spark, tmp) == [1, 2]

    # later file: 3 is a near-dup of 1 (one-token mutation), 4 is new,
    # 5 is a byte-exact redelivery of 2
    _write(f"{tmp}/src", "f2.json", [(3, NEAR), (4, "brand new unseen text "
                                                   "with many original tokens"), (5, OTHER)])
    _run(spark, tmp)
    assert _out_ids(spark, tmp) == [1, 2, 4]


def test_in_batch_neardup_keeps_min_id(spark, tmp_path):
    tmp = str(tmp_path)
    _write(f"{tmp}/src", "f1.json", [(7, NEAR), (3, BASE), (9, OTHER)])
    _run(spark, tmp)
    # 3 < 7 and they are near-dups: 7 dropped inside the batch
    assert _out_ids(spark, tmp) == [3, 9]


def test_state_bounded_by_retention(spark, tmp_path):
    tmp = str(tmp_path)
    _write(f"{tmp}/src", "f1.json", [(1, BASE)])
    _run(spark, tmp, retention=1)
    _write(f"{tmp}/src", "f2.json", [(2, OTHER)])
    _run(spark, tmp, retention=1)
    # batch 0's state (doc 1) has fallen out of the 1-batch horizon:
    # a near-dup of doc 1 is ingested again, like an event past the
    # watermark
    _write(f"{tmp}/src", "f3.json", [(3, NEAR)])
    _run(spark, tmp, retention=1)
    assert _out_ids(spark, tmp) == [1, 2, 3]

    # the state stores were compacted: only the newest batch survives
    sh = spark.read.schema("doc_id long, s string, batch_id long").parquet(
        f"{tmp}/state/base_shingles"
    )
    assert {r["doc_id"] for r in sh.select("doc_id").distinct().collect()} == {3}
    bk = spark.read.schema(
        "doc_id long, band int, band_hash string, batch_id long"
    ).parquet(f"{tmp}/state/base_buckets")
    assert {r["doc_id"] for r in bk.select("doc_id").distinct().collect()} == {3}


def test_matches_batch_operator(spark, tmp_path):
    """The streaming tier must agree with the batch cross-snapshot
    operator on the same split: survivors = batch minus the docs
    cross_snapshot_minhash flags against the already-ingested base."""
    from pyspark.sql import functions as F

    from snowalert_spark.functions.dedup import cross_snapshot_minhash

    tmp = str(tmp_path)
    f1 = [(1, BASE), (2, OTHER)]
    f2 = [(10, NEAR), (11, "fresh text nothing like anything else "
                           "in this tiny corpus of documents")]
    _write(f"{tmp}/src", "f1.json", f1)
    _run(spark, tmp)
    _write(f"{tmp}/src", "f2.json", f2)
    _run(spark, tmp)

    base = spark.createDataFrame(f1, "doc_id long, text string")
    batch = spark.createDataFrame(f2, "doc_id long, text string")
    flagged = {
        r["doc_id"]
        for r in cross_snapshot_minhash(batch, base, threshold=0.8).collect()
    }
    expected = sorted([d for d, _ in f1] + [d for d, _ in f2 if d not in flagged])
    assert _out_ids(spark, tmp) == expected
