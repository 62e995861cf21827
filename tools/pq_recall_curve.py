"""PQ ANN cost/recall curve (round-7 verdict item 4).

Sweeps the PQ search dials — shortlist size and codebook geometry
(m subspaces x k centroids) — against exhaustive brute-force cosine
top-3, measuring recall@3 and wall time per configuration. Production
ANN wants this dial measured, not guessed: the default shipped in
workload/vector.py (PQ_SHORTLIST, PQ_M, N_CENTROIDS) is picked from
this curve.

Usage: python tools/pq_recall_curve.py [sf_dir ...]
       (default: /root/testdata/sf0.1 plus /tmp/sf1 when present)

Emits one JSON document (also written to PQ_RECALL_CURVE.json when run
from the repo root) with per-config recall@3, wall seconds (median of
3 after warm-up), and corpus size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from snowalert_spark.functions import similarity as S
from snowalert_spark.session import get_session
from snowalert_spark.tables import table

N_QUERIES = 10
TRAIN_N = 64
ITERS = 2
DIM = 64

CONFIGS = [
    # (m, k, shortlist)
    (4, 8, 50),
    (4, 8, 100),
    (4, 8, 200),
    (4, 8, 400),
    (8, 8, 100),
    (8, 16, 100),
    (8, 16, 200),
]


def sweep(spark, sf_dir: str) -> list[dict]:
    emb = table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    train = emb.filter(F.col("vec_id") < TRAIN_N)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=3).collect()
    }
    out = []
    for m, k, shortlist in CONFIGS:
        def build():
            return S.pq_topk(
                spark, sf_dir, emb, queries, train=train,
                dim=DIM, m=m, k=k, iters=ITERS,
                shortlist=shortlist, topk=3,
            )

        rows = build().collect()  # warm (also trains/caches codebooks)
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        recall = len(got & exact) / len(exact)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        out.append({
            "m": m, "k": k, "shortlist": shortlist,
            "recall_at_3": round(recall, 4),
            "wall_sec": round(sorted(walls)[1], 4),
            "corpus_rows": n,
        })
        print(f"  m={m} k={k} shortlist={shortlist}: "
              f"recall@3={recall:.3f} wall={out[-1]['wall_sec']}s",
              file=sys.stderr)
    emb.unpersist()
    return out


def main(*dirs: str) -> None:
    if not dirs:
        dirs = ["/root/testdata/sf0.1"]
        if os.path.isdir("/tmp/sf1"):
            dirs.append("/tmp/sf1")
    spark = get_session(app_name="pq_recall_curve")
    result = {}
    for d in dirs:
        print(f"== {d}", file=sys.stderr)
        result[d] = sweep(spark, d)
    doc = {"note": ("PQ ANN cost/recall sweep: recall@3 vs brute-force "
                    "cosine over the full corpus; wall = median of 3 "
                    "noop-sink runs after a warm-up that also trains "
                    "the codebooks (training excluded from wall, "
                    "matching the cached-codebook production shape)."),
           "configs": result}
    print(json.dumps(doc))
    if os.path.exists("bench.py"):
        with open("PQ_RECALL_CURVE.json", "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
