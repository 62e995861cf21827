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


def _assert_map_only(plan, name):
    """Map-only contract, r13 form: no ORGANIC shuffle (an Exchange
    the operators themselves require, origin ENSURE_REQUIREMENTS) and
    no product join. The one allowed Exchange kind is the explicit
    scan-spread repartition (origin REPARTITION_BY_NUM) that
    tables.spread adds when the driver's single-row-group parquet
    would serialize the per-row expansion onto one core — a no-op at
    cluster scale (guarded on input file count), so the 100 TB plan
    this pin protects is still shuffle-free."""
    assert "ENSURE_REQUIREMENTS" not in plan, name
    assert plan.count("Exchange") == plan.count("REPARTITION_BY_NUM"), name
    assert "CartesianProduct" not in plan, name
    assert "NestedLoop" not in plan, name


def test_curation_ops_are_map_only(spark):
    """The round-7 curation operators claim zero-shuffle map-only
    plans: chunking, stratified sampling, repetition stats, and int8
    quantization must compile to scan → project/filter with no
    organic Exchange and no product join; doc_chunks and
    stratified_sample_docs additionally take no scan-spread (measured
    losers), so their plans stay literally Exchange-free."""
    for name in ("doc_chunks", "stratified_sample_docs"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "NestedLoop" not in plan, name
    for name in ("text_repetition_stats", "embedding_quantize_int8"):
        _assert_map_only(_plan(spark, name), name)


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


def test_mixture_plan_single_corpus_shuffle(spark):
    """corpus_mixture_plan: one Exchange for the per-source count
    aggregation; the corpus-wide totals join back by broadcast (a
    1-row side), never a second corpus shuffle or a global window."""
    plan = _plan(spark, "corpus_mixture_plan")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_shuffle_shards_no_global_sort(spark):
    """corpus_shuffle_shards: exactly one hash Exchange on shard_id
    and a per-shard local sort — a global ORDER BY (rangepartitioning
    exchange) would serialize the corpus through one task chain."""
    plan = _plan(spark, "corpus_shuffle_shards")
    assert "hashpartitioning(shard_id" in plan
    assert "rangepartitioning" not in plan


def test_cross_snapshot_dedup_is_anti_join_on_hash(spark):
    """dedup_cross_snapshot: survival is a LeftAnti hash join on the
    md5 fingerprint; text never shuffles (ReadSchema carries text but
    the exchanged keys are the 16-byte hashes)."""
    plan = _plan(spark, "dedup_cross_snapshot")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_curation_filter_pipeline_map_only(spark):
    """The composite gate is one scan → projection: no organic
    Exchange (the scan-spread repartition is allowed — see
    _assert_map_only), no join. (The signal projection uses
    higher-order array functions, which Spark never
    whole-stage-codegens — so pin the stage shape, not a codegen
    marker.)"""
    plan = _plan(spark, "curation_filter_pipeline")
    _assert_map_only(plan, "curation_filter_pipeline")
    assert "Join" not in plan
    assert plan.count("FileScan") == 1


def test_cross_snapshot_minhash_no_cartesian(spark):
    """Candidates come from the (band, band_hash) equi-join between
    the batch and base bucket sets — never a product join."""
    plan = _plan(spark, "dedup_cross_snapshot_minhash")
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_quality_percentile_window_partitioned_by_source(spark):
    """The percentile window must shuffle on the source key (each
    source ranks independently) — a global rank would serialize the
    corpus through one range-partitioned sort."""
    plan = _plan(spark, "quality_percentile_filter")
    assert "hashpartitioning(source" in plan
    assert "rangepartitioning" not in plan


def test_pq_coding_is_map_only(spark):
    """PQ coding embeds the trained codebook as plan literals: the
    coder must be scan → project with no join, no Exchange (training
    happens once per corpus version at plan-construction time)."""
    plan = _plan(spark, "embedding_pq_codes")
    _assert_map_only(plan, "embedding_pq_codes")
    assert "Join" not in plan
    assert plan.count("FileScan") == 1


def test_pq_topk_scoring_stage_shape(spark):
    """ADC scoring: corpus coded map-only, queries broadcast (the only
    nested-loop is the 10-row LUT broadcast), no cartesian product of
    data-sized sides, and the shortlist is two-phase (a pid-keyed
    window before the query-keyed one)."""
    plan = _plan(spark, "ann_pq_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(pid" in plan


def test_decontaminate_semantic_shape(spark):
    """Eval vectors broadcast (BroadcastNestedLoopJoin — no corpus
    shuffle of vectors); the only exchange is the n-row partial-agg
    result of the per-corpus-row max."""
    plan = _plan(spark, "decontaminate_semantic")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # no ORGANIC exchange at all in the test plan: the scan-spread
    # repartition (REPARTITION_BY_NUM, keyed on vec_id) is REUSED by
    # the final per-vec max aggregate, so the agg's own exchange
    # vanishes (keyed-spread reuse, guide §2.4). At cluster scale the
    # spread no-ops and the single agg exchange reappears — either
    # way the corpus vectors shuffle at most once, as ids+score.
    organic = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "REPARTITION_BY_NUM" not in ln
    ]
    assert len(organic) == 0, plan
    assert "REPARTITION_BY_NUM" in plan  # the keyed spread is present


def test_dedup_image_dhash_no_cartesian(spark):
    """The image near-dup candidate stage is a banded equi-join on
    (band, value) — never a product join of media rows."""
    plan = _plan(spark, "dedup_image_dhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_registry_wide_no_cartesian_or_per_row_python(spark):
    """Registry-wide guardrail (r8): EVERY query in the full
    include_local registry — current and future — must execute with
    no CartesianProduct (the intentional tiny cross joins resolve to
    BroadcastNestedLoopJoin) and no row-at-a-time Python stage
    (BatchEvalPython; Arrow-batched MapInPandas/ArrowEvalPython are
    the sanctioned Python paths). A new operator that trips either
    needs an explicit argument, not a silent merge."""
    from snowalert_spark import workload

    qs = workload.queries(include_local=True)
    flagged = {}
    for name, fn in qs.items():
        plan = (
            fn(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        flags = [
            f for f in ("CartesianProduct", "BatchEvalPython") if f in plan
        ]
        if flags:
            flagged[name] = flags
    assert flagged == {}, f"scale red flags in executed plans: {flagged}"
