"""Full streaming corpus-ingestion chain (r13): curation gate ->
MinHash near-dup -> substring dedup, each stage a Structured
Streaming file source over the previous stage's batch_id-partitioned
output, each with its own checkpoint — the composition the tier
docstrings advertise. Near-dup runs BEFORE substring removal: a
whole-doc dup must be dropped as a doc (excising it first would
strip its text and let the empty husk through the near-dup tier).

Pins:
1. gate rejects never reach later stages;
2. a near-dup of an earlier tick's kept doc is dropped by stage 2
   via its state, across stage boundaries;
3. already-seen substrings arriving in a later tick are excised by
   stage 3 (first occurrence kept intact);
4. no reprocessing: the chain over two ticks equals the chain over
   the concatenated corpus in one tick.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from snowalert_spark.streaming import (
    curation_stream_ingest,
    neardup_stream_ingest,
    substring_stream_ingest,
)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

# stage-1/2 row shape (curation keeps with signals; near-dup passes
# source columns through)
GATE_OUT_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "n_tokens long, quality double, top_word_frac double"
)
# stage-3 output (cleaned docs)
FINAL_SCHEMA = (
    "doc_id long, clean_text string, removed_chars long, "
    "n_removed_windows long"
)

L = 40


def _good(i: int, seed: str) -> dict:
    # >=12 tokens, high quality, low repetition, en
    words = [f"{seed}{i}w{j}" for j in range(30)]
    return {
        "doc_id": i,
        "text": "the report " + " ".join(words) + " concludes here",
        "lang": "en",
        "source": "src",
    }


def _chain(spark, tmp):
    curation_stream_ingest(
        spark,
        src_path=f"{tmp}/src",
        dst_path=f"{tmp}/gate_out",
        checkpoint=f"{tmp}/ckpt1",
        schema=SRC_SCHEMA,
    )
    neardup_stream_ingest(
        spark,
        src_path=f"{tmp}/gate_out",
        dst_path=f"{tmp}/near_out",
        checkpoint=f"{tmp}/ckpt2",
        state_dir=f"{tmp}/state2",
        schema=T._parse_datatype_string(GATE_OUT_SCHEMA),
        fmt="parquet",
    )
    substring_stream_ingest(
        spark,
        src_path=f"{tmp}/near_out",
        dst_path=f"{tmp}/final",
        checkpoint=f"{tmp}/ckpt3",
        state_dir=f"{tmp}/state3",
        schema=T._parse_datatype_string(GATE_OUT_SCHEMA),
        fmt="parquet",
        window=L,
    )


def _write(tmp, name, rows):
    os.makedirs(f"{tmp}/src", exist_ok=True)
    with open(f"{tmp}/src/{name}", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _final(spark, tmp):
    return {
        r["doc_id"]: r
        for r in spark.read.schema(FINAL_SCHEMA)
        .parquet(f"{tmp}/final")
        .collect()
    }


def test_three_stage_chain(spark, tmp_path):
    tmp = str(tmp_path)
    boiler = " ".join(f"boiler{j}" for j in range(12))  # > window chars

    # tick 1: two good docs (doc 1 carries the boilerplate), one
    # low-quality reject
    d1 = _good(1, "a")
    d1["text"] += " " + boiler
    d2 = _good(2, "b")
    junk = {"doc_id": 3, "text": "spam spam", "lang": "en", "source": "src"}
    _write(tmp, "tick1.json", [d1, d2, junk])
    _chain(spark, tmp)

    out1 = _final(spark, tmp)
    assert set(out1) == {1, 2}
    assert out1[1]["removed_chars"] == 0  # boilerplate's 1st occurrence

    # tick 2: doc 4 repeats the boilerplate (stage 3 must excise it —
    # its own words survive), doc 5 duplicates doc 2's text (stage 2
    # must drop it via cross-tick state), doc 6 is fresh
    d4 = _good(4, "c")
    d4["text"] += " " + boiler
    d5 = dict(_good(2, "b"), doc_id=5)
    d6 = _good(6, "d")
    _write(tmp, "tick2.json", [d4, d5, d6])
    _chain(spark, tmp)

    out2 = _final(spark, tmp)
    assert set(out2) == {1, 2, 4, 6}
    assert out2[4]["removed_chars"] > 0
    assert "boiler3" not in out2[4]["clean_text"]
    assert "c4w7" in out2[4]["clean_text"]  # doc 4's own words survive
    assert out2[6]["removed_chars"] == 0

    # gate reject and near-dup never entered the final stage's input
    near_ids = {
        r["doc_id"]
        for r in spark.read.schema(GATE_OUT_SCHEMA)
        .parquet(f"{tmp}/near_out")
        .select("doc_id")
        .collect()
    }
    assert near_ids == {1, 2, 4, 6}

    # no-reprocessing: the same chain over the concatenated corpus in
    # ONE tick yields the same survivors and the same cleaned text
    tmp2 = f"{tmp}/once"
    _write(tmp2, "all.json", [d1, d2, junk, d4, d5, d6])
    _chain(spark, tmp2)
    once = _final(spark, tmp2)
    assert {k: v["clean_text"] for k, v in once.items()} == {
        k: v["clean_text"] for k, v in out2.items()
    }
