"""Streaming near-dup tier throughput probe: feed the driver's real
tables through all three incremental tiers (text MinHash / embedding
RPLSH / media multi-block) tick by tick and record per-tick wall and
steady-state rows/s — the evidence that the micro-batch path's cost
stays flat as the accumulated state grows (candidates come from
band/bucket equi-joins against state, never a rescan of the base).

Each tick writes one JSON file of new rows and drives the ingest
function once (availableNow + shared checkpoint = the mid-flight
pickup pattern the e2e suites use). Ticks after the first measure the
real regime: batch-vs-accumulated-state.

Usage: python tools/probe_streaming_throughput.py OUT.json [SF_DIR] [TICKS]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowalert_spark.session import get_session
from snowalert_spark import streaming as S

TICKS = 5


def _tiers(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(vecs.select("embedding").first()[0])

    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    vec_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    media_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])

    def media_fingerprint(batch):
        from snowalert_spark.functions import multimodal as MM

        media = batch.select(
            "media_id",
            F.encode("text", "utf-8").alias("data"),
            F.lit(None).cast("struct<format:string>").alias("meta"),
        )
        return MM.image_dhash(media, decode="fake")

    return {
        "text": {
            "rows": [
                {"doc_id": r["doc_id"], "text": r["text"]}
                for r in docs.select("doc_id", "text").collect()
            ],
            "run": lambda spark, tmp: S.neardup_stream_ingest(
                spark, src_path=f"{tmp}/src", dst_path=f"{tmp}/out",
                checkpoint=f"{tmp}/ckpt", state_dir=f"{tmp}/state",
                schema=doc_schema),
        },
        "embedding": {
            "rows": [
                {"vec_id": r["vec_id"],
                 "embedding": [float(x) for x in r["embedding"]]}
                for r in vecs.select("vec_id", "embedding").collect()
            ],
            "run": lambda spark, tmp: S.neardup_embedding_stream_ingest(
                spark, src_path=f"{tmp}/src", dst_path=f"{tmp}/out",
                checkpoint=f"{tmp}/ckpt", state_dir=f"{tmp}/state",
                schema=vec_schema, dim=dim),
        },
        "media": {
            "rows": [
                {"media_id": r["doc_id"], "text": r["text"]}
                for r in docs.select("doc_id", "text").collect()
            ],
            "run": lambda spark, tmp: S.neardup_media_stream_ingest(
                spark, src_path=f"{tmp}/src", dst_path=f"{tmp}/out",
                checkpoint=f"{tmp}/ckpt", state_dir=f"{tmp}/state",
                schema=media_schema, fingerprint=media_fingerprint),
        },
    }


def probe_tier(spark, name, rows, run, ticks) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"streamprobe_{name}_")
    os.makedirs(f"{tmp}/src")
    per = len(rows) // ticks
    walls = []
    try:
        for t in range(ticks):
            chunk = rows[t * per : (t + 1) * per]
            with open(f"{tmp}/src/tick{t}.json", "w") as f:
                for row in chunk:
                    f.write(json.dumps(row) + "\n")
            t0 = time.perf_counter()
            run(spark, tmp)
            walls.append(round(time.perf_counter() - t0, 2))
        survivors = spark.read.parquet(f"{tmp}/out").count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    steady = walls[1:] or walls
    return {
        "ticks": ticks,
        "rows_per_tick": per,
        "tick_walls_s": walls,
        "survivors_total": survivors,
        "steady_rows_per_s": round(per / (sum(steady) / len(steady)), 1),
        # flat-cost signal: last tick (max state) vs first steady tick
        "last_over_first_steady": round(
            walls[-1] / max(steady[0], 1e-9), 2),
    }


def main(out_path: str, sf_dir: str = "/root/testdata/sf0.1",
         ticks: int = TICKS) -> None:
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    tiers = _tiers(spark, sf_dir)
    doc = {
        "note": (
            "streaming near-dup tier throughput: per-tick wall driving "
            "each tier's ingest over TICKS equal slices of the real "
            f"{sf_dir} tables (tick 0 = cold stream start incl. "
            "checkpoint init; later ticks = batch-vs-accumulated-state "
            "regime). last_over_first_steady ~1 means cost stays flat "
            "as state grows."
        ),
        "sf_dir": sf_dir,
    }
    for name, spec in tiers.items():
        doc[name] = probe_tier(spark, name, spec["rows"], spec["run"],
                               int(ticks))
        print(json.dumps({name: doc[name]}), flush=True)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
