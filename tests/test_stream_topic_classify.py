"""Train offline, classify in-stream: the topic model's literal-
codebook argmax is a stateless Column expression, so a streaming
micro-batch classifies arriving documents with zero state and zero
shuffle — and agrees row-for-row with the batch operator."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowalert_spark import workload
from snowalert_spark.streaming import file_stream_ingest
from snowalert_spark.workload import vector as V

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_stream_topic_assignments_match_batch(spark, tmp_path):
    # offline: the batch operator's ground truth + the trained model
    batch = {
        r["doc_id"]: r["topic"]
        for r in workload.queries(include_local=True)["doc_topic_clusters"](
            spark, SF
        ).collect()
    }
    cents = V.topic_centroid_rows(spark, SF)

    # stream: documents arrive as two json files; the ingest transform
    # featurizes + classifies each micro-batch with the offline model
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = [(int(r["doc_id"]), r["text"]) for r in docs.collect()]
    src = tmp_path / "src"
    src.mkdir()
    for name, chunk in (("a.json", rows[: len(rows) // 2]),
                        ("b.json", rows[len(rows) // 2 :])):
        with open(src / name, "w") as f:
            for doc_id, text in chunk:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    # topic_assign_col references the feature expression by SQL name,
    # so bind the feature vector as a real column first
    def classify(stream):
        return stream.select(
            "doc_id", V.doc_tf_vector(F.col("text")).alias("v")
        ).select("doc_id", V.topic_assign_col(cents, "v").alias("topic"))

    dst = str(tmp_path / "landing")
    file_stream_ingest(
        spark, str(src), dst, str(tmp_path / "ckpt"), DOC_SCHEMA,
        transform=classify,
    )
    streamed = {
        r["doc_id"]: r["topic"] for r in spark.read.parquet(dst).collect()
    }
    assert streamed == batch
