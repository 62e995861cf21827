"""Streaming semantic decontamination tier (r13):
``semantic_decontam_stream_ingest`` — embedding-space companion to the
curation gate's n-gram rule.

Pins:
1. batch equality — streamed keeps over any tick split equal the
   batch ``decontaminate_semantic`` survivors on the union (the tier
   is stateless, so this must hold exactly), and the audit rows carry
   identical (nearest_eval_id, max_sim, contaminated) scores;
2. checkpointed re-run no-op;
3. dropped-commit replay rewrites only its own partition.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowalert_spark.functions.similarity import decontaminate_semantic
from snowalert_spark.streaming import semantic_decontam_stream_ingest
from snowalert_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)
OUT_SCHEMA = "vec_id long, embedding array<float>"
AUDIT_SCHEMA = (
    "vec_id long, nearest_eval_id long, max_sim double, contaminated boolean"
)
# calibrated to the synthetic embedding distribution like the
# registry's SEMDECON_THRESHOLD (max off-diagonal cosine at this SF is
# ~0.48; 0.35 flags ~38 of 450 corpus vectors against this eval split)
THRESHOLD = 0.35


def _split(spark):
    vecs = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    ev = vecs.filter("vec_id % 10 = 0")
    corpus = vecs.filter("vec_id % 10 <> 0")
    return corpus, ev


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "vec_id": r["vec_id"],
                        "embedding": [float(x) for x in r["embedding"]],
                    }
                )
                + "\n"
            )


def _run(spark, tmp, ev):
    semantic_decontam_stream_ingest(
        spark,
        src_path=f"{tmp}/src",
        dst_path=f"{tmp}/out",
        checkpoint=f"{tmp}/ckpt",
        schema=SCHEMA,
        eval_vecs=ev,
        threshold=THRESHOLD,
        audit_dir=f"{tmp}/audit",
    )


def test_stream_equals_batch(spark, tmp_path):
    tmp = str(tmp_path)
    corpus, ev = _split(spark)
    rows = sorted(corpus.collect(), key=lambda r: r["vec_id"])
    third = len(rows) // 3
    for t, lo in enumerate(range(0, len(rows), third)):
        _write(f"{tmp}/src", f"tick{t}.json", rows[lo : lo + third])
        _run(spark, tmp, ev)

    batch = decontaminate_semantic(corpus, ev, THRESHOLD)
    dropped = {r["vec_id"] for r in batch.filter("contaminated").collect()}
    assert dropped, "fixture must exercise the rule"

    kept = {
        r["vec_id"]
        for r in spark.read.schema(OUT_SCHEMA).parquet(f"{tmp}/out").collect()
    }
    assert kept == {r["vec_id"] for r in rows} - dropped

    # audit scores identical to the batch scorer
    batch_scores = {
        r["vec_id"]: (r["nearest_eval_id"], r["max_sim"], r["contaminated"])
        for r in batch.collect()
    }
    audit = {
        r["vec_id"]: (r["nearest_eval_id"], r["max_sim"], r["contaminated"])
        for r in spark.read.schema(AUDIT_SCHEMA)
        .parquet(f"{tmp}/audit")
        .collect()
    }
    assert audit == batch_scores

    # no new files -> nothing changes
    before = sorted(os.listdir(f"{tmp}/out"))
    _run(spark, tmp, ev)
    assert sorted(os.listdir(f"{tmp}/out")) == before


def test_replay_overwrites_own_partition(spark, tmp_path):
    tmp = str(tmp_path)
    corpus, ev = _split(spark)
    rows = sorted(corpus.collect(), key=lambda r: r["vec_id"])
    half = len(rows) // 2
    _write(f"{tmp}/src", "tick0.json", rows[:half])
    _run(spark, tmp, ev)
    _write(f"{tmp}/src", "tick1.json", rows[half:])
    _run(spark, tmp, ev)
    once = sorted(
        r["vec_id"]
        for r in spark.read.schema(OUT_SCHEMA).parquet(f"{tmp}/out").collect()
    )
    os.remove(f"{tmp}/ckpt/commits/1")
    crc = f"{tmp}/ckpt/commits/.1.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, tmp, ev)
    again = sorted(
        r["vec_id"]
        for r in spark.read.schema(OUT_SCHEMA).parquet(f"{tmp}/out").collect()
    )
    assert once == again and once
