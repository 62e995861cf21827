"""Training-shard sink: deterministic membership, order, and bytes.

The sink contract a data loader depends on: same seed → byte-identical
shard files on every rerun; different seed → different (epoch) order;
shard assignment identical to the corpus_shuffle_shards workload
query; and a one-exchange-no-global-sort physical plan.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

from pyspark.sql import functions as F

from snowalert_spark import sinks
from snowalert_spark.tables import table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return table(spark, SF, "documents").select("doc_id", "text", "source")


def _file_hashes(out_dir):
    hs = {}
    for sid, files in sinks.shard_files(out_dir).items():
        h = hashlib.md5()
        for f in files:
            with open(f, "rb") as fh:
                h.update(fh.read())
        hs[sid] = h.hexdigest()
    return hs


def test_shards_partition_the_corpus(spark, tmp_path):
    out = str(tmp_path / "shards")
    d = _docs(spark)
    sinks.write_training_shards(d, out, n_shards=4)
    back = sinks.read_training_shards(spark, out)
    assert back.count() == d.count()
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in d.select("doc_id").collect()
    )
    assert set(sinks.shard_files(out)) == {0, 1, 2, 3}


def test_shards_byte_identical_on_rerun(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    d = _docs(spark)
    sinks.write_training_shards(d, a, n_shards=4)
    sinks.write_training_shards(d, b, n_shards=4)
    assert _file_hashes(a) == _file_hashes(b)


def test_epoch_seed_reshuffles(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    d = _docs(spark)
    sinks.write_training_shards(d, a, n_shards=4, seed="epoch0")
    sinks.write_training_shards(d, b, n_shards=4, seed="epoch1")
    assert _file_hashes(a) != _file_hashes(b)
    # membership is still a partition of the same corpus
    na = sum(len(v) > 0 for v in sinks.shard_files(a).values())
    assert na == 4


def test_shard_assignment_matches_workload_query(spark, tmp_path):
    from snowalert_spark.workload.textops import corpus_shuffle_shards

    out = str(tmp_path / "shards")
    sinks.write_training_shards(_docs(spark), out, n_shards=8)
    back = sinks.read_training_shards(spark, out).select("doc_id", "shard_id")
    want = corpus_shuffle_shards(spark, SF).select("doc_id", "shard_id")
    got = {r["doc_id"]: r["shard_id"] for r in back.collect()}
    exp = {r["doc_id"]: r["shard_id"] for r in want.collect()}
    assert got == exp


def test_intra_shard_order_is_the_seeded_hash_order(spark, tmp_path):
    out = str(tmp_path / "shards")
    sinks.write_training_shards(_docs(spark), out, n_shards=4)
    for sid, files in sinks.shard_files(out).items():
        ids = []
        for f in files:
            with open(f) as fh:
                ids += [json.loads(line)["doc_id"] for line in fh if line.strip()]
        hx = [
            (hashlib.md5(f"shuf42:{i}".encode()).hexdigest(), i) for i in ids
        ]
        assert hx == sorted(hx), f"shard {sid} not in seeded-hash order"


def test_write_plan_single_hash_exchange(spark):
    d = _docs(spark)
    shard, hx = sinks.shard_columns(F.col("doc_id"), 8)
    plan = (
        d.withColumn("shard_id", shard)
        .withColumn("_sk", hx)
        .repartition(8, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "_sk", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan


def test_streaming_curation_ingest(spark, tmp_path):
    """The curation gate and PII scrub are pure column expressions, so
    they compose with Structured Streaming unchanged: stream doc files
    through file_stream_ingest with the gate as the transform; only
    keeps land, scrubbed, exactly once across restarts."""
    from pyspark.sql import types as T

    from snowalert_spark.functions import text as X
    from snowalert_spark.streaming import file_stream_ingest

    src = tmp_path / "src"
    src.mkdir()
    dst, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    long_text = " ".join(f"tok{i}" for i in range(40))
    rows1 = [
        {"doc_id": 1, "text": long_text + " mail me a@b.com", "lang": "en", "n_chars": 500},
        {"doc_id": 2, "text": "too short", "lang": "en", "n_chars": 9},
    ]
    (src / "f1.json").write_text("\n".join(json.dumps(r) for r in rows1))

    def curate(stream):
        tok = X.tokens("text")
        scrubbed, _counts = X.pii_scrub(F.col("text"))
        return (
            stream.withColumn("n_tokens", F.size(tok).cast("long"))
            .filter(F.col("n_tokens") >= 12)
            .filter(F.col("lang").isin("en", "de", "fr", "es"))
            .select("doc_id", scrubbed.alias("text"), "lang")
        )

    file_stream_ingest(spark, str(src), dst, ckpt, schema, transform=curate)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(dst).collect()}
    assert set(got) == {1}
    assert "[EMAIL]" in got[1] and "a@b.com" not in got[1]

    # late file: second invocation ingests ONLY the new file (doc 3
    # keeps, doc 1 is not re-landed)
    rows2 = [
        {"doc_id": 3, "text": long_text, "lang": "en", "n_chars": 400},
        {"doc_id": 4, "text": long_text, "lang": "xx", "n_chars": 400},
    ]
    (src / "f2.json").write_text("\n".join(json.dumps(r) for r in rows2))
    file_stream_ingest(spark, str(src), dst, ckpt, schema, transform=curate)
    ids = sorted(r["doc_id"] for r in spark.read.parquet(dst).collect())
    assert ids == [1, 3]
