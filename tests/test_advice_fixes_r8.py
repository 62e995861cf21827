"""Round-8 advice/verdict fixes.

- registry counts have one source of truth (workload.registry_stats)
  and the documented numbers are asserted here so doc drift can't
  recur silently (round-7 verdict item 8);
- mixture_plan keeps fractional weights (round-7 advice: cast('long')
  silently truncated 0.5 -> 0);
- quality_percentile_filter keeps tiny sources whole (round-7 advice:
  percent_rank >= 0.2 dropped the ONLY doc of a 1-doc source);
- cross_snapshot_dedup's passthrough columns are parameterized.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowalert_spark import workload
from snowalert_spark.functions import dedup as D
from snowalert_spark.functions.sampling import mixture_plan


def test_registry_stats_single_source_of_truth():
    stats = workload.registry_stats()
    # the numbers quoted in README.md and PARITY.md (r11: +3 cluster-
    # form media rows + the zipf tokenizer-depth row; r12: +the combined
    # substring spans+removal row and its cross-snapshot sibling;
    # r13: +curation_gate_decontam, the full gate rule chain with
    # n-gram decontamination as the final rule)
    assert stats == {
        "total": 103,
        "driver_declared": 50,
        "local_only": 53,
        # oracle-complete since r10: every registry row has a
        # cross-engine DuckDB oracle (the cluster rows close theirs
        # with recursive-CTE connected components; bpe_encode_zipf's
        # is the 128-round training replay on the zipf sidecar)
        "with_oracle": 103,
    }
    assert stats["driver_declared"] <= workload.DRIVER_QUERY_CAP
    assert stats["local_only"] == len(workload.LOCAL_ONLY)


def test_mixture_plan_fractional_weights(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(10)],
        "src string, doc_id int",
    )
    w = F.when(F.col("src") == "a", 0.5).otherwise(1.5)
    plan = {r["src"]: r for r in mixture_plan(df, "src", w).collect()}
    # 0.5 must NOT truncate to 0: target_frac a=0.25, b=0.75
    assert plan["a"]["weight"] == 0.5
    assert abs(plan["a"]["target_frac"] - 0.25) < 1e-9
    assert abs(plan["b"]["target_frac"] - 0.75) < 1e-9
    # a: rate = min(100, floor(100*0.25*20/10)) = 50
    assert plan["a"]["rate_pct"] == 50
    assert plan["b"]["rate_pct"] == 100


def test_quality_percentile_keeps_tiny_sources(spark, tmp_path):
    # single-doc source: percent_rank = 0.0 -> previously dropped;
    # 4-doc source: below the 5-row floor -> all kept;
    # 10-doc source: bottom 20% dropped as designed.
    rows = [("only1", "tiny", "some reasonable text here", 25)]
    rows += [(f"s4_{i}", "small", f"text {i} words here now", 22) for i in range(4)]
    rows += [(f"b_{i}", "big", f"document {i} with body text", 26) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string, n_chars int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = workload.queries(include_local=True)["quality_percentile_filter"](
        spark, str(tmp_path)
    )
    kept = {r["doc_id"]: r["kept"] for r in out.collect()}
    assert kept["only1"] is True
    assert all(kept[f"s4_{i}"] for i in range(4))
    dropped_big = [d for d, k in kept.items() if d.startswith("b_") and not k]
    assert len(dropped_big) == 2  # percent_rank < 0.2 of 10 docs


def test_cross_snapshot_keep_cols_parameterized(spark):
    batch = spark.createDataFrame(
        [("d1", "hello", "2024-01"), ("d2", "world", "2024-01")],
        "doc_id string, text string, snapshot string",
    )
    base = spark.createDataFrame([("x", "hello")], "doc_id string, text string")
    out = D.cross_snapshot_dedup(batch, base, keep_cols=("snapshot",))
    assert out.columns == ["doc_id", "snapshot", "text_hash"]
    assert [r["doc_id"] for r in out.collect()] == ["d2"]
    # missing keep_cols are skipped, not an error (default carries
    # 'source' only when present)
    out2 = D.cross_snapshot_dedup(batch, base)
    assert out2.columns == ["doc_id", "text_hash"]
