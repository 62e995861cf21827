"""Streaming BPE tokenize tier (r13): ``bpe_encode_stream_ingest`` —
the last stage of the streaming ingestion pipeline, encoding arriving
docs with a FIXED trained merge table.

Pins:
1. batch equality — streamed (n_words, toks) over any tick split
   equal the batch vocab-join encode of the whole corpus (per-doc
   pure function of (text, merges));
2. zero-word docs land with an empty token array;
3. checkpointed re-run no-op.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from snowalert_spark.functions import bpe as B
from snowalert_spark.streaming import bpe_encode_stream_ingest
from snowalert_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)
OUT_SCHEMA = "doc_id long, n_words long, toks array<string>"
N_MERGES = 48


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(
                json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n"
            )


def test_stream_equals_batch_encode(spark, tmp_path):
    tmp = str(tmp_path)
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    merges = B.bpe_train_auto(docs, N_MERGES)
    assert len(merges) == N_MERGES

    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    rows.append({"doc_id": 10**9, "text": "   "})  # zero-word doc
    third = len(rows) // 3
    for t, lo in enumerate(range(0, len(rows), third)):
        _write(f"{tmp}/src", f"tick{t}.json", rows[lo : lo + third])
        bpe_encode_stream_ingest(
            spark,
            src_path=f"{tmp}/src",
            dst_path=f"{tmp}/out",
            checkpoint=f"{tmp}/ckpt",
            schema=SCHEMA,
            merges=merges,
        )

    batch = {
        r["doc_id"]: (r["n_words"], tuple(r["toks"]))
        for r in B.encode_docs_via_vocab(docs, merges).collect()
    }
    streamed = {
        r["doc_id"]: (r["n_words"], tuple(r["toks"]))
        for r in spark.read.schema(OUT_SCHEMA).parquet(f"{tmp}/out").collect()
    }
    assert streamed.pop(10**9) == (0, ())
    assert streamed == batch and len(batch) > 0

    # no new files -> nothing changes (exactly-once)
    before = sorted(os.listdir(f"{tmp}/out"))
    bpe_encode_stream_ingest(
        spark,
        src_path=f"{tmp}/src",
        dst_path=f"{tmp}/out",
        checkpoint=f"{tmp}/ckpt",
        schema=SCHEMA,
        merges=merges,
    )
    assert sorted(os.listdir(f"{tmp}/out")) == before
