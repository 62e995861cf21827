"""Physical-plan regression: the plans we tuned for must not silently
degrade (broadcasts stay broadcasts, filters stay pushed, top-k stays
TakeOrderedAndProject, regular-grid range join stays binning)."""

from __future__ import annotations

import pytest

from snowalert_spark import workload

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return (
        workload.queries(include_local=True)[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_dim_joins_broadcast(spark):
    plan = _plan(spark, "join_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_filter_pushed_down(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_topk_is_take_ordered(spark):
    plan = _plan(spark, "top_orders")
    assert "TakeOrderedAndProject" in plan


def test_range_join_is_binning_not_nested_loop(spark):
    plan = _plan(spark, "range_join_hourly_counts")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_lsh_no_cartesian(spark):
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan


def test_brute_force_broadcasts_queries(spark):
    plan = _plan(spark, "cosine_topk_bruteforce")
    # the tiny query set is the broadcast side of the nested-loop join
    assert "BroadcastNestedLoopJoin" in plan


def test_embedding_ivf_dedup_no_cartesian(spark):
    """The scale-safe embedding near-dup tier: the corpus-corpus
    candidate join is equi on cell id — the only product in the plan
    is the broadcast scan against the k(=8) centroids."""
    plan = _plan(spark, "dedup_embedding_ivf")
    assert "CartesianProduct" not in plan


def test_curation_ops_are_map_only(spark):
    """The round-7 curation operators claim zero-shuffle map-only
    plans: chunking, stratified sampling, repetition stats, and int8
    quantization must compile to scan → project/filter with no
    Exchange and no product join."""
    for name in (
        "doc_chunks",
        "stratified_sample_docs",
        "text_repetition_stats",
        "embedding_quantize_int8",
    ):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "NestedLoop" not in plan, name


def test_decontaminate_broadcasts_benchmark_shingles(spark):
    """The eval-set shingle side must broadcast (it is tiny relative
    to the corpus at scale); the corpus shingles must never feed a
    product join."""
    plan = _plan(spark, "decontaminate_ngram")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_pii_scrub_is_map_only(spark):
    plan = _plan(spark, "pii_scrub_events")
    assert "Exchange" not in plan
    # "*(1)" is the WholeStageCodegen stage marker in executedPlan
    # strings; the whole scrub must live in one codegen'd stage
    assert "*(1) Project" in plan
    # projection is pruned to the two consumed columns
    assert "ReadSchema: struct<event_id:bigint,props:string>" in plan
