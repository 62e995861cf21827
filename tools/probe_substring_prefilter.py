"""Shuffle-volume evidence for the winnowing substring-dedup prefilter
(r10 verdict item 3): at each probe SF, measure

- the stride-1 fingerprint row count (the phase-2 / single-phase
  exchange volume) vs the winnow-selected row count (the phase-1
  exchange volume) — the ~(w+1)/2 cut;
- the hit-doc fraction (how much of the corpus phase 2 must rescan);
- wall for spans/removal with prefilter off vs on, outputs asserted
  row-identical.

Usage: python tools/probe_substring_prefilter.py OUT.json DIR [DIR...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from snowalert_spark.functions import dedup as DD
from snowalert_spark.session import get_session

WINDOW = 40


def probe_dir(spark, sf_dir: str) -> dict:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = d.count()
    stride1 = DD._window_fingerprints(d, WINDOW, "doc_id", "text").count()
    t0 = time.perf_counter()
    hit = DD.winnow_hit_docs(d, WINDOW)
    n_hit = hit.count()
    wall_phase1 = round(time.perf_counter() - t0, 2)
    # selected-gram rows = phase-1 exchange volume (same xxhash64 gram
    # hash as winnow_hit_docs since r12 — the replica must select the
    # same positions the operator selects)
    g = WINDOW - DD.WINNOW_W + 1
    hl = (
        f"transform(sequence(1, length(text) - {g} + 1), "
        f"i -> xxhash64(substring(text, i, {g})))"
    )
    sel_rows = (
        d.select(
            F.when(F.length("text") >= WINDOW, F.expr(hl))
            .otherwise(F.expr("CAST(array() AS array<bigint>)"))
            .alias("hl")
        )
        .select(
            F.expr(
                f"CASE WHEN size(hl) >= {DD.WINNOW_W} THEN "
                f"size(array_distinct(transform(sequence(1, size(hl) - {DD.WINNOW_W} + 1), "
                f"j -> aggregate(sequence(0, {DD.WINNOW_W} - 1), "
                f"struct(CAST(0 AS INT) AS p, CAST(9223372036854775807 AS BIGINT) AS m), "
                f"(acc, k) -> IF(hl[j + k - 1] <= acc.m, "
                f"struct(CAST(j + k AS INT) AS p, hl[j + k - 1] AS m), acc)).p))) "
                f"ELSE 0 END"
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    out = {
        "docs": n_docs,
        "stride1_fingerprint_rows": stride1,
        "winnow_selected_rows": int(sel_rows),
        "phase1_volume_cut": round(stride1 / max(int(sel_rows), 1), 2),
        "hit_docs": n_hit,
        "hit_frac": round(n_hit / max(n_docs, 1), 4),
        "phase1_wall_s": wall_phase1,
    }
    for label, fn in (
        ("spans", DD.repeated_substring_spans),
        ("removal", DD.remove_repeated_substrings),
    ):
        walls = {}
        sums = {}
        # three modes: plain, forced prefilter, and the r12 auto (sunk-
        # cost rule: after full phase 1, restrict whenever hit_frac <=
        # SUBSTR_RESTRICT_MAX_HIT_FRAC) — all three must be
        # row-identical, and on this mid-density corpus auto should
        # beat BOTH forced modes (restriction skips ~(1-hit_frac) of
        # docs in both materializations of the salted exchange)
        for mode in (False, True, "auto"):
            t0 = time.perf_counter()
            fn(d, prefilter=mode).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[mode] = round(time.perf_counter() - t0, 2)
            # order-independent whole-output checksum: all modes must
            # be row-identical, not just row-count-identical
            res = fn(d, prefilter=mode)
            sums[mode] = res.agg(
                # decimal(38,0) sum: a long sum of 64-bit hashes
                # overflows under ANSI mode
                F.sum(F.xxhash64(*res.columns).cast("decimal(38,0)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
        for mode in (True, "auto"):
            assert (sums[False]["s"], sums[False]["n"]) == (
                sums[mode]["s"],
                sums[mode]["n"],
            ), f"{label}: prefilter={mode} output diverged"
        assert sums[False]["n"] == n_docs
        out[label] = {
            "wall_plain_s": walls[False],
            "wall_prefilter_s": walls[True],
            "wall_auto_s": walls["auto"],
        }
    return out


def main(out_path: str, *dirs: str) -> None:
    spark = get_session(app_name="probe_substring_prefilter")
    spark.sparkContext.setLogLevel("ERROR")
    doc = {
        "note": (
            "winnowing prefilter evidence (window=40, w=16, gram=25): "
            "phase-1 exchange carries winnow_selected_rows instead of "
            "stride1_fingerprint_rows; phase 2 rescans only hit docs. "
            "The synthetic corpus plants heavy duplication, so "
            "hit_frac here is an upper bound vs real crawls."
        )
    }
    for sf_dir in dirs:
        doc[sf_dir] = probe_dir(spark, sf_dir)
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        print(json.dumps({sf_dir: doc[sf_dir]}), flush=True)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
