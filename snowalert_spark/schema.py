"""Engine-owned table schemas (reference parity: install.py:99-141).

VARIANT convention (SURVEY §7.3): the alert/violation document has a
*fixed vocabulary*, so it is a typed StructType — JVM-native access,
no JSON parsing in the hot path. Open-content fields (EVENT_DATA,
handled) stay JSON strings. JSON-null vs SQL-null: Snowflake's
``PARSE_JSON('null')`` sentinel is represented by the literal string
"null" in JSON-string fields; helpers in functions.variant.
"""

from __future__ import annotations

from pyspark.sql import types as T

# src/runners/alert_queries_runner.py:38-55 — the alert vocabulary
ALERT_DOC = T.StructType(
    [
        T.StructField("ALERT_ID", T.StringType()),
        T.StructField("QUERY_NAME", T.StringType()),
        T.StructField("QUERY_ID", T.StringType()),
        T.StructField("ENVIRONMENT", T.StringType()),
        T.StructField("SOURCES", T.ArrayType(T.StringType())),
        T.StructField("ACTOR", T.StringType()),
        T.StructField("OBJECT", T.StringType()),
        T.StructField("ACTION", T.StringType()),
        T.StructField("TITLE", T.StringType()),
        T.StructField("EVENT_TIME", T.TimestampType()),
        T.StructField("ALERT_TIME", T.TimestampType()),
        T.StructField("DESCRIPTION", T.StringType()),
        T.StructField("DETECTOR", T.StringType()),
        T.StructField("EVENT_DATA", T.StringType()),  # open JSON
        T.StructField("SEVERITY", T.StringType()),
        T.StructField("HANDLERS", T.ArrayType(T.StringType())),
    ]
)

# install.py:100-112
ALERTS = T.StructType(
    [
        T.StructField("alert", ALERT_DOC),
        T.StructField("alert_time", T.TimestampType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("ticket", T.StringType()),
        T.StructField("suppressed", T.BooleanType()),
        T.StructField("suppression_rule", T.StringType()),
        T.StructField("counter", T.IntegerType()),
        T.StructField("correlation_id", T.StringType()),
        T.StructField("handled", T.StringType()),  # open JSON
    ]
)

# install.py:113-122; result doc is open JSON (db.py:465-492)
VIOLATIONS = T.StructType(
    [
        T.StructField("result", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("alert_time", T.TimestampType()),
        T.StructField("ticket", T.StringType()),
        T.StructField("suppressed", T.BooleanType()),
        T.StructField("suppression_rule", T.StringType()),
    ]
)

# install.py:123-141 — (event_time TIMESTAMP, v VARIANT) × 3
METADATA = T.StructType(
    [
        T.StructField("event_time", T.TimestampType()),
        T.StructField("v", T.StringType()),  # open JSON
    ]
)

# Trained-model sidecar (IVF / PQ codebooks): one row per centroid,
# keyed by the model key "{corpus_version}|k={k}|iters={iters}". The
# reference keeps runner state in warehouse tables rather than process
# memory (alert_queries_runner.py:64-94); this is the ANN analog — a
# few KB per codebook, persisted through the same versioned CAS store
# so a fresh session reuses a trained codebook instead of re-running
# k-means over the corpus sample.
TRAINED_CENTROIDS = T.StructType(
    [
        T.StructField("model_key", T.StringType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("cent", T.ArrayType(T.DoubleType())),
    ]
)

# the tokenizer analog of TRAINED_CENTROIDS: the trained BPE merge
# table (a few rows per corpus version) persisted through the same
# versioned CAS store so a fresh session tokenizes without retraining.
TRAINED_BPE_MERGES = T.StructType(
    [
        T.StructField("model_key", T.StringType()),
        T.StructField("merge_rank", T.IntegerType()),
        T.StructField("lhs", T.StringType()),
        T.StructField("rhs", T.StringType()),
        T.StructField("pair_count", T.LongType()),
    ]
)

RESULT_TABLES: dict[str, T.StructType] = {
    "alerts": ALERTS,
    "violations": VIOLATIONS,
    "query_metadata": METADATA,
    "run_metadata": METADATA,
    "ingestion_metadata": METADATA,
    "trained_centroids": TRAINED_CENTROIDS,
    "trained_bpe_merges": TRAINED_BPE_MERGES,
}
