"""Streaming MEDIA near-dup tier e2e (r9 verdict item 8): a planted
perceptual near-duplicate arriving in a LATER file must be dropped
against the accumulated multi-block key state (the base corpus is
never re-hashed), state stays bounded by the retention horizon, and
the tier agrees with the batch multi-block operator on the same split
— completing the incremental dedup story for all three modalities
(text / embeddings / media).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowalert_spark.streaming import neardup_media_stream_ingest

SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BASE = ("the quick brown fox jumps over the lazy dog while the "
        "bright sun shines over the green quiet valley today")
# first 5 payload bytes uppercased: a byte-local perturbation like a
# recompression artifact — shifts at most the first pooling cells
# (hamming <= ~2), the same plant the batch tier's oracle pins
NEAR = BASE[:5].upper() + BASE[5:]
OTHER = ("completely different content about spark structured "
         "streaming joins state stores and watermark semantics here")
FRESH = ("numbers 12345 alphabets qwerty zxcvb entirely unrelated "
         "payload bytes for a genuinely distinct perceptual hash!!")


def _fingerprint(batch):
    """documents-as-media fingerprint for the (media_id, text) test
    stream: utf-8 payload bytes through the synthetic-parity dHash."""
    from snowalert_spark.functions import multimodal as MM

    media = batch.select(
        "media_id",
        F.encode("text", "utf-8").alias("data"),
        F.lit(None).cast("struct<format:string>").alias("meta"),
    )
    return MM.image_dhash(media, decode="fake")


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for media_id, text in rows:
            f.write(json.dumps({"media_id": media_id, "text": text}) + "\n")


def _run(spark, tmp, retention=None):
    neardup_media_stream_ingest(
        spark,
        src_path=f"{tmp}/src",
        dst_path=f"{tmp}/out",
        checkpoint=f"{tmp}/ckpt",
        state_dir=f"{tmp}/state",
        schema=SCHEMA,
        threshold=3,
        retention_batches=retention,
        fingerprint=_fingerprint,
    )


def _out_ids(spark, tmp):
    return sorted(
        r["media_id"]
        for r in spark.read.schema(SCHEMA).parquet(f"{tmp}/out").collect()
    )


def test_cross_file_media_neardup_dropped(spark, tmp_path):
    tmp = str(tmp_path)
    _write(f"{tmp}/src", "f1.json", [(1, BASE), (2, OTHER)])
    _run(spark, tmp)
    assert _out_ids(spark, tmp) == [1, 2]

    # later file: 3 is a perceptual near-dup of 1, 4 is fresh
    _write(f"{tmp}/src", "f2.json", [(3, NEAR), (4, FRESH)])
    _run(spark, tmp)
    assert _out_ids(spark, tmp) == [1, 2, 4]


def test_in_batch_media_neardup_keeps_min_id(spark, tmp_path):
    tmp = str(tmp_path)
    _write(f"{tmp}/src", "f1.json", [(7, NEAR), (3, BASE), (9, OTHER)])
    _run(spark, tmp)
    assert _out_ids(spark, tmp) == [3, 9]


def test_media_state_bounded_by_retention(spark, tmp_path):
    tmp = str(tmp_path)
    _write(f"{tmp}/src", "f1.json", [(1, BASE)])
    _run(spark, tmp, retention=2)
    # within the horizon (current batch + one previous): dropped
    _write(f"{tmp}/src", "f2.json", [(3, NEAR)])
    _run(spark, tmp, retention=2)
    assert _out_ids(spark, tmp) == [1]
    _write(f"{tmp}/src", "f3.json", [(4, OTHER)])
    _run(spark, tmp, retention=2)
    # batch 0's state (media 1) has expired: its near-dup re-ingests
    _write(f"{tmp}/src", "f4.json", [(5, NEAR)])
    _run(spark, tmp, retention=2)
    assert _out_ids(spark, tmp) == [1, 4, 5]

    # state stores hold only the retention window's batch dirs
    hs = spark.read.schema("media_id long, bd array<int>, batch_id long").parquet(
        f"{tmp}/state/base_hashes"
    )
    assert {r["batch_id"] for r in hs.select("batch_id").distinct().collect()} <= {2, 3}


def test_matches_batch_multiblock_operator(spark, tmp_path):
    """Streaming tier agrees with the batch multi-block pair engine on
    the same split: survivors = batch minus media flagged against the
    already-ingested base at the same threshold."""
    from snowalert_spark.functions.dedup import hamming_pairs_multiblock

    tmp = str(tmp_path)
    f1 = [(1, BASE), (2, OTHER)]
    f2 = [(10, NEAR), (11, FRESH)]
    _write(f"{tmp}/src", "f1.json", f1)
    _run(spark, tmp)
    _write(f"{tmp}/src", "f2.json", f2)
    _run(spark, tmp)

    both = spark.createDataFrame(f1 + f2, "media_id long, text string")
    hashed = _fingerprint(both).select(
        "media_id", *[f"band_{r}" for r in range(8)]
    )
    pairs = hamming_pairs_multiblock(hashed, 3, blocks=6, combo=3).collect()
    base_ids = {d for d, _ in f1}
    flagged = {r["dup_of"] for r in pairs if r["media_id"] in base_ids} | {
        r["media_id"] for r in pairs if r["dup_of"] in base_ids
    }
    expected = sorted(
        [d for d, _ in f1] + [d for d, _ in f2 if d not in flagged]
    )
    assert _out_ids(spark, tmp) == expected
