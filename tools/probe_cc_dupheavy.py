"""Dup-heavy connected-components probe (r13 verdict item 5/9).

The r13 CC rewrite checkpoints + counts RAW pairs before dispatching:
on the driver path that removed the 2|E| symmetrize+distinct exchange,
but on the DISTRIBUTED path (raw > CC_DRIVER_MAX_EDGES) the raw-pair
checkpoint is an extra materialization vs the r12 shape whenever raw
is much larger than distinct (highly duplicated pair lists). No bench
row exercises that regime; this probe does, synthetically:

- graph: ``n_nodes`` chained into components of size ``comp``, each
  edge repeated ``dup`` times (raw = n_edges * dup >> distinct).
- current shape: functions.dedup.connected_components as shipped
  (raw localCheckpoint -> count -> symmetrize+distinct -> propagate).
- r12 shape: symmetrize+distinct FIRST (no raw checkpoint), then the
  same propagation loop — reconstructed here for the A/B.

Writes a JSON sidecar with wall times and the label-equality check.

Usage: python tools/probe_cc_dupheavy.py <out.json> [n_nodes] [dup]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from snowalert_spark.functions import dedup as DD
from snowalert_spark.session import get_session


def _raw_edges(spark, n_nodes: int, comp: int, dup: int):
    """Chained components: node i links to i+1 unless i ends a
    component; every edge emitted ``dup`` times (dup-heavy raw list).
    Deterministic — no rand()."""
    e = (
        spark.range(n_nodes)
        .filter((F.col("id") % comp) != comp - 1)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    return e.crossJoin(
        spark.range(dup).select(F.col("id").alias("_r"))
    ).drop("_r")


def _r12_shape(edges, max_iter: int = 25):
    """The pre-r13 distributed CC: symmetrize+distinct FIRST (no raw
    checkpoint, no raw count), then the same min-label propagation."""
    e = edges.select(
        F.col("doc_a").cast("long").alias("a"),
        F.col("doc_b").cast("long").alias("b"),
    )
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("label")
        )
        new = (
            neigh.union(labels.select("node", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("new_label"))
        )
        new_labels = new.select(
            "node", F.col("new_label").alias("label")
        ).localCheckpoint()
        delta = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "node")
            .filter(F.col("new_label") != F.col("label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if delta == 0:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))


def main() -> None:
    out_path = sys.argv[1]
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    dup = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    comp = 4
    spark = get_session(app_name="probe_cc_dupheavy")
    spark.sparkContext.setLogLevel("ERROR")

    edges = _raw_edges(spark, n_nodes, comp, dup)
    n_raw = edges.count()
    n_distinct = edges.distinct().count()
    assert n_raw > DD.CC_DRIVER_MAX_EDGES, (
        "probe must exercise the distributed path: raise n_nodes/dup"
    )

    def run(fn) -> tuple[float, int]:
        t0 = time.perf_counter()
        df = fn()
        cnt = df.count()
        return round(time.perf_counter() - t0, 3), cnt

    results: dict[str, list] = {"current": [], "r12_shape": []}
    checks = []
    # interleaved cycles, current-first then r12-first alternating
    for cyc in range(3):
        order = (
            [("current", lambda: DD.connected_components(edges)),
             ("r12_shape", lambda: _r12_shape(edges))]
            if cyc % 2 == 0
            else [("r12_shape", lambda: _r12_shape(edges)),
                  ("current", lambda: DD.connected_components(edges))]
        )
        for name, fn in order:
            w, cnt = run(fn)
            results[name].append({"wall_s": w, "labels": cnt})
    # one equality check (bit-identical labels)
    cur = DD.connected_components(edges)
    old = _r12_shape(edges)
    diff = cur.exceptAll(old).count() + old.exceptAll(cur).count()
    checks.append({"label_diff_rows": diff})

    doc = {
        "note": (
            "dup-heavy CC probe: raw pairs >> distinct, past "
            "CC_DRIVER_MAX_EDGES so the DISTRIBUTED path runs. "
            "'current' = shipped connected_components (raw checkpoint "
            "+ count, lazily symmetrized); 'r12_shape' = "
            "symmetrize+distinct first. Interleaved 3 cycles."
        ),
        "n_nodes": n_nodes,
        "component_size": comp,
        "dup_factor": dup,
        "raw_pairs": n_raw,
        "distinct_pairs": n_distinct,
        "driver_max_edges": DD.CC_DRIVER_MAX_EDGES,
        "results": results,
        "min_wall_s": {
            k: min(r["wall_s"] for r in v) for k, v in results.items()
        },
        "label_equality": checks,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["min_wall_s"]), "labels equal:", diff == 0)


if __name__ == "__main__":
    main()
