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
    cur_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
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

    # row sources are (count, iterator-factory) pairs: tick files are
    # written straight off toLocalIterator so the driver never holds
    # the whole table as a Python list (at sf10 the documents table is
    # multi-GB in dict form — the old .collect() capped the probe at
    # ~sf1)
    def _doc_rows():
        for r in docs.select("doc_id", "text").toLocalIterator():
            yield {"doc_id": r["doc_id"], "text": r["text"]}

    def _cur_rows():
        cols = ("doc_id", "text", "lang", "source")
        for r in docs.select(*cols).toLocalIterator():
            yield {c: r[c] for c in cols}

    def _vec_rows():
        for r in vecs.select("vec_id", "embedding").toLocalIterator():
            yield {"vec_id": r["vec_id"],
                   "embedding": [float(x) for x in r["embedding"]]}

    def _media_rows():
        for r in docs.select("doc_id", "text").toLocalIterator():
            yield {"media_id": r["doc_id"], "text": r["text"]}

    n_docs = docs.count()
    n_vecs = vecs.count()
    return {
        "text": {
            "n": n_docs,
            "rows": _doc_rows,
            "run": lambda spark, tmp: S.neardup_stream_ingest(
                spark, src_path=f"{tmp}/src", dst_path=f"{tmp}/out",
                checkpoint=f"{tmp}/ckpt", state_dir=f"{tmp}/state",
                schema=doc_schema),
        },
        "substring": {
            "n": n_docs,
            "rows": _doc_rows,
            "run": lambda spark, tmp: S.substring_stream_ingest(
                spark, src_path=f"{tmp}/src", dst_path=f"{tmp}/out",
                checkpoint=f"{tmp}/ckpt", state_dir=f"{tmp}/state",
                schema=doc_schema),
        },
        "curation": {
            # stateless gate tier (r13): the flat-cost claim is free
            # by construction, but the rows/s number sizes the full
            # streaming ingestion chain (gate -> dedup tiers). The
            # eval set for the decontamination rule is the first 1000
            # docs (an eval suite is small and fixed).
            "n": n_docs,
            "rows": _cur_rows,
            "run": lambda spark, tmp: S.curation_stream_ingest(
                spark, src_path=f"{tmp}/src", dst_path=f"{tmp}/out",
                checkpoint=f"{tmp}/ckpt", schema=cur_schema,
                audit_dir=f"{tmp}/audit",
                eval_docs=docs.select("doc_id", "text").limit(1000)),
        },
        "semdecon": {
            # stateless semantic decontamination (r13): fixed
            # 1000-vector eval set, broadcast scoring join per tick
            "n": n_vecs,
            "rows": _vec_rows,
            "run": lambda spark, tmp: S.semantic_decontam_stream_ingest(
                spark, src_path=f"{tmp}/src", dst_path=f"{tmp}/out",
                checkpoint=f"{tmp}/ckpt", schema=vec_schema,
                eval_vecs=vecs.select("vec_id", "embedding").limit(1000),
                threshold=0.35, audit_dir=f"{tmp}/audit"),
        },
        "embedding": {
            "n": n_vecs,
            "rows": _vec_rows,
            "run": lambda spark, tmp: S.neardup_embedding_stream_ingest(
                spark, src_path=f"{tmp}/src", dst_path=f"{tmp}/out",
                checkpoint=f"{tmp}/ckpt", state_dir=f"{tmp}/state",
                schema=vec_schema, dim=dim),
        },
        "media": {
            "n": n_docs,
            "rows": _media_rows,
            "run": lambda spark, tmp: S.neardup_media_stream_ingest(
                spark, src_path=f"{tmp}/src", dst_path=f"{tmp}/out",
                checkpoint=f"{tmp}/ckpt", state_dir=f"{tmp}/state",
                schema=media_schema, fingerprint=media_fingerprint),
        },
    }


def probe_tier(spark, name, n, rows, run, ticks) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"streamprobe_{name}_")
    os.makedirs(f"{tmp}/src")
    per = n // ticks
    walls = []
    it = rows()
    try:
        for t in range(ticks):
            # tick-file write happens OUTSIDE the timer; the iterator
            # is consumed lazily so only one tick's rows are ever
            # buffered driver-side. The LAST tick takes the n % ticks
            # remainder too (r12 advice: silently dropping it made the
            # sidecar throughput cover fewer rows than the table holds).
            want = per if t < ticks - 1 else per + n % ticks
            with open(f"{tmp}/src/tick{t}.json", "w") as f:
                for _ in range(want):
                    try:
                        f.write(json.dumps(next(it)) + "\n")
                    except StopIteration:
                        break
            t0 = time.perf_counter()
            run(spark, tmp)
            walls.append(round(time.perf_counter() - t0, 2))
        survivors = spark.read.parquet(f"{tmp}/out").count()
        # accumulated state size at end of run (the x-axis of the
        # flat-cost claim) — the substring tier's fingerprint store
        state_rows = None
        fp = f"{tmp}/state/seen_fingerprints"
        if os.path.isdir(fp):
            state_rows = spark.read.parquet(fp).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    steady = walls[1:] or walls
    out = {
        "ticks": ticks,
        "rows_per_tick": per,
        "rows_total": n,
        "tick_walls_s": walls,
        "survivors_total": survivors,
        "steady_rows_per_s": round(
            per / max(sum(steady) / len(steady), 1e-9), 1
        ),
        # flat-cost signal: last tick (max state) vs first steady tick
        "last_over_first_steady": round(
            walls[-1] / max(steady[0], 1e-9), 2),
    }
    if state_rows is not None:
        out["state_rows_final"] = state_rows
    return out


def main(out_path: str, sf_dir: str = "/root/testdata/sf0.1",
         ticks: str = str(TICKS), only: str = "") -> None:
    """OUT [SF_DIR] [TICKS_CSV] [TIERS_CSV]

    TICKS_CSV runs the ladder sequentially inside ONE tool invocation
    (sidecar provenance: note, bases and ratios all come from this
    run): e.g. ``5,5,1`` = two 5-tick passes (run-to-run noise floor)
    plus one single-tick pass of the whole table (the bigger-tick
    flat-cost check). TIERS_CSV subsets tiers (e.g. ``substring``)."""
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    tiers = _tiers(spark, sf_dir)
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        tiers = {k: v for k, v in tiers.items() if k in keep}
    tick_ladder = [int(t) for t in str(ticks).split(",")]
    doc = {
        "note": (
            "streaming dedup tier throughput: per-tick wall driving "
            "each tier's ingest over equal slices of the real "
            f"{sf_dir} tables (tick 0 = cold stream start incl. "
            "checkpoint init; later ticks = batch-vs-accumulated-state "
            "regime). last_over_first_steady ~1 means cost stays flat "
            f"as state grows. Tick ladder {tick_ladder} ran "
            "sequentially in THIS tool invocation (single-run "
            "provenance); repeated tick counts are independent "
            "fresh-state runs of the same slicing (run-to-run noise "
            "floor in *_tick_min_of_runs); a 1-tick rung streams the "
            "whole table in one micro-batch (the bigger-tick check — "
            "compare its rows/s to the multi-tick rungs)."
        ),
        "sf_dir": sf_dir,
        "tick_ladder": tick_ladder,
    }
    for name, spec in tiers.items():
        runs: dict[str, dict] = {}
        seen_ticks: dict[int, int] = {}
        for t in tick_ladder:
            seen_ticks[t] = seen_ticks.get(t, 0) + 1
            key = f"ticks{t}" + (
                f"_run{seen_ticks[t]}" if tick_ladder.count(t) > 1 else ""
            )
            runs[key] = probe_tier(
                spark, name, spec["n"], spec["rows"], spec["run"], t
            )
            print(json.dumps({name: {key: runs[key]}}), flush=True)
        for t, n_runs in seen_ticks.items():
            if n_runs > 1:
                group = [v for k, v in runs.items()
                         if k.startswith(f"ticks{t}_run")]
                mins = [round(min(ws), 2) for ws in zip(
                    *[g["tick_walls_s"] for g in group])]
                runs[f"ticks{t}_tick_min_of_runs"] = {
                    "tick_walls_s": mins,
                    "last_over_first_steady": round(
                        mins[-1] / max(mins[1] if len(mins) > 1 else mins[0],
                                       1e-9), 2),
                }
        doc[name] = runs
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
