"""Capture .explain("formatted") for named registry queries.

Usage:
    python tools/capture_plans.py <tag> [query ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND (default r14)/<query>_<tag>.txt for each named query (default: the
optimization-round target list). Plans are captured from the same
(spark, sf_dir) callables the bench times, at $SPARK_GRAFT_SF_DIR
(default sf0.1), so the committed artifacts match what the bench runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snowalert_spark import workload
from snowalert_spark.session import get_session

DEFAULT_QUERIES = [
    "dedup_substring_spans",
    "dedup_substring_removal",
    "dedup_substring_full",
    "dedup_substring_cross_snapshot",
    "dedup_clusters",
    "dedup_video_clusters",
    "semantic_dedup",
    "dsir_select",
    "ann_ivfpq_topk",
    "doc_fingerprint_rolling",
    "dedup_image_clusters",
    "dedup_audio_clusters",
    "dedup_ngram_jaccard",
    "decontaminate_semantic",
    "ann_pq_topk",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="capture_plans")
    qs = workload.queries(include_local=True)
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
