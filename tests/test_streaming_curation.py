"""Streaming curation + decontamination gate (r13):
``curation_stream_ingest`` — the micro-batch form of the batch funnel.

Pins:
1. batch equality — the union of streamed keeps (and the summed
   streamed funnel) equals the batch gate run over the whole corpus
   at once, for any tick split (the tier is stateless, so this must
   hold exactly);
2. decontamination rule — with an eval set, exactly the docs the
   batch ``decontaminate_ngram`` flags (among gate survivors) are
   rejected as ``contaminated``, and the rule fires only for docs
   that pass every quality rule (funnel order);
3. re-running with no new files changes nothing (checkpointed
   exactly-once);
4. replayed tick overwrites its own partitions (crash idempotence).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowalert_spark.functions import dedup as DD
from snowalert_spark.functions import text as X
from snowalert_spark.streaming import curation_stream_ingest
from snowalert_spark.tables import table
from snowalert_spark.workload import textops

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def _ticks(spark, n_ticks):
    rows = sorted(
        table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "lang", "source")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    per = len(rows) // n_ticks
    out = []
    for t in range(n_ticks):
        hi = len(rows) if t == n_ticks - 1 else (t + 1) * per
        out.append(rows[t * per : hi])
    return out


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "doc_id": r["doc_id"],
                        "text": r["text"],
                        "lang": r["lang"],
                        "source": r["source"],
                    }
                )
                + "\n"
            )


def _run(spark, tmp, eval_docs=None):
    curation_stream_ingest(
        spark,
        src_path=f"{tmp}/src",
        dst_path=f"{tmp}/out",
        checkpoint=f"{tmp}/ckpt",
        schema=SCHEMA,
        audit_dir=f"{tmp}/audit",
        eval_docs=eval_docs,
    )


OUT_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "n_tokens long, quality double, top_word_frac double"
)
AUDIT_SCHEMA = "source string, outcome string, n_docs long, n_tokens long"


def test_stream_equals_batch_gate(spark, tmp_path):
    tmp = str(tmp_path)
    ticks = _ticks(spark, 3)
    for t, rows in enumerate(ticks):
        _write(f"{tmp}/src", f"tick{t}.json", rows)
        _run(spark, tmp)

    batch = {
        r["doc_id"]: (r["n_tokens"], r["quality"], r["top_word_frac"])
        for r in textops.curation_filter_pipeline(spark, SF_DIR)
        .filter("keep")
        .collect()
    }
    streamed = {
        r["doc_id"]: (r["n_tokens"], r["quality"], r["top_word_frac"])
        for r in spark.read.schema(OUT_SCHEMA)
        .parquet(f"{tmp}/out")
        .collect()
    }
    assert streamed == batch and len(batch) > 0

    # summed streamed funnel == batch funnel (per source x outcome)
    batch_funnel = {
        (r["source"], r["outcome"]): (r["n_docs"], r["n_tokens"])
        for r in textops.curation_funnel_stats(spark, SF_DIR).collect()
    }
    stream_funnel = {
        (r["source"], r["outcome"]): (r["n_docs"], r["n_tokens"])
        for r in spark.read.schema(AUDIT_SCHEMA)
        .parquet(f"{tmp}/audit")
        .groupBy("source", "outcome")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .collect()
    }
    assert stream_funnel == batch_funnel

    # no new files -> nothing changes (exactly-once)
    before = sorted(os.listdir(f"{tmp}/out"))
    _run(spark, tmp)
    assert sorted(os.listdir(f"{tmp}/out")) == before


def test_decontamination_rule_matches_batch(spark, tmp_path):
    tmp = str(tmp_path)
    docs = table(spark, SF_DIR, "documents")
    # eval set = one source's docs; the stream ingests the rest
    eval_pred = F.col("source") == "src0"
    eval_docs = docs.filter(eval_pred).select("doc_id", "text")
    assert eval_docs.count() > 0
    corpus = docs.filter(~eval_pred)

    _write(
        f"{tmp}/src",
        "tick0.json",
        corpus.select("doc_id", "text", "lang", "source").collect(),
    )
    _run(spark, tmp, eval_docs=eval_docs)

    flagged = {
        r["doc_id"]
        for r in DD.decontaminate_ngram(docs, eval_pred, k=5)
        .filter("contaminated")
        .collect()
    }
    # gate survivors by quality rules alone (contamination is the
    # LAST rule, so it only ever fires on these)
    survivors = {
        r["doc_id"]
        for r in corpus.select(
            "doc_id",
            "lang",
            *X.curation_signals(F.col("n_chars"), X.tokens("text")),
        )
        .withColumn("reason", X.curation_outcome())
        .filter("reason IS NULL")
        .collect()
    }

    kept = {
        r["doc_id"]
        for r in spark.read.schema(OUT_SCHEMA).parquet(f"{tmp}/out").collect()
    }
    assert kept == survivors - flagged

    audit = {
        (r["source"], r["outcome"]): r["n_docs"]
        for r in spark.read.schema(AUDIT_SCHEMA)
        .parquet(f"{tmp}/audit")
        .collect()
    }
    n_contaminated = sum(
        v for (src, oc), v in audit.items() if oc == "contaminated"
    )
    assert n_contaminated == len(survivors & flagged)
    assert len(survivors & flagged) > 0, "fixture must exercise the rule"


def test_replay_overwrites_own_partition(spark, tmp_path):
    tmp = str(tmp_path)
    ticks = _ticks(spark, 2)
    _write(f"{tmp}/src", "tick0.json", ticks[0])
    _run(spark, tmp)
    _write(f"{tmp}/src", "tick1.json", ticks[1])
    _run(spark, tmp)
    once = sorted(
        tuple(r)
        for r in spark.read.schema(OUT_SCHEMA).parquet(f"{tmp}/out").collect()
    )
    # at-least-once replay of the last micro-batch: drop its commit
    # marker so the restarted stream re-executes batch 1 with the same
    # content — the batch rewrites exactly its own batch_id dir, so
    # the full multiset of output rows is unchanged
    os.remove(f"{tmp}/ckpt/commits/1")
    # the Hadoop local FS keeps a checksum sidecar; left behind it
    # makes the replayed commit's rename fail as a phantom
    # concurrent-query conflict
    crc = f"{tmp}/ckpt/commits/.1.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, tmp)
    again = sorted(
        tuple(r)
        for r in spark.read.schema(OUT_SCHEMA).parquet(f"{tmp}/out").collect()
    )
    assert once == again and len(once) > 0
