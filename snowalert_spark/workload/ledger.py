"""Gate-rotation ledger (r10 verdict item 8).

The driver's correctness gate caps at 50 declared rows, so registry
rows rotate: new operator families get promoted in, rows strictly
subsumed by declared siblings get demoted to LOCAL_ONLY (where the
in-repo DuckDB oracle replica still runs them every suite). Four
rounds of rotations lived as prose comments in workload/__init__.py;
this module is the same history as DATA — rendered into PARITY.md as
one table and asserted consistent with the live registry by
tests/test_rotation_ledger.py, so rotation hygiene is verifiable in
one read.

Fields per row:
- ``declared_in``: round whose gate first carried the row (None = the
  row has only ever been LOCAL_ONLY);
- ``demoted_in``: round that rotated it out (None = still declared,
  or never declared);
- ``added_in``: round the row first existed (defaults to declared_in);
- ``subsumed_by``: the declared sibling(s) covering its semantics
  while local (required whenever the row is currently LOCAL_ONLY).
"""

from __future__ import annotations


def _e(declared_in=None, demoted_in=None, added_in=None, subsumed_by=""):
    return {
        "declared_in": declared_in,
        "demoted_in": demoted_in,
        "added_in": added_in or declared_in,
        "subsumed_by": subsumed_by,
    }


#: rows declared since the first gate and never rotated out
_R1_DECLARED = [
    "q1_pricing_summary", "join_revenue_by_nation", "q3_shipping_priority",
    "anti_join_parts_no_bulk_orders", "latest_event_per_user",
    "group_having_active_users", "full_outer_nation_presence",
    "range_join_hourly_counts", "sliding_24h_trailing_sum",
    "percentiles_by_type", "user_profile_rollup", "alert_projection",
    "alert_dedupe_groups", "alert_suppression_flags",
    "violation_md5_identity", "ann_ivf_topk", "dedup_embedding_rplsh",
    "like_rlike_filters", "conditional_functions",
    "time_slices_table_function", "timezone_and_array_functions",
    "recursive_flatten_paths", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "text_quality_scores", "doc_fingerprint_rolling",
]

LEDGER: dict[str, dict] = {
    **{n: _e(declared_in="r1") for n in _R1_DECLARED},
    # --- currently declared, promoted in later rounds ------------------
    "kmeans_centroids": _e(declared_in="r7", added_in="r6"),
    "skew_salted_join": _e(declared_in="r7", added_in="r6"),
    "dedup_clusters": _e(declared_in="r7"),
    "decontaminate_ngram": _e("r7", "r14", subsumed_by="curation_gate_decontam (declared r14; calls decontaminate_ngram(d, eval_pred, k=5) verbatim — same doc_id % 17 == 0 held-out split, same shingle width — and its oracle replays the hits CTE end to end)"),
    "pii_scrub_events": _e(declared_in="r7"),
    "dedup_cross_snapshot": _e(declared_in="r7"),
    "curation_filter_pipeline": _e("r7", "r13", subsumed_by="curation_funnel_stats (declared r13; drives the identical signal projection + rule chain — same thresholds — and audits every rule's loss; the per-doc keep/reason projection keeps its local oracle)"),
    "semantic_dedup": _e(declared_in="r8"),
    "dsir_select": _e(declared_in="r8"),
    # demoted r13 (⊂ dedup_substring_full, bit-identity pinned by
    # tests/test_substring_combined.py), RE-promoted r14 per the r13
    # verdict (driver re-verifies the r13 optimizer's hardest-touched
    # family directly)
    "dedup_substring_removal": _e(declared_in="r14", added_in="r8"),
    "unigram_logprob_scores": _e("r8", "r14", subsumed_by="bigram_logprob_scores (declared r10; its stupid-backoff tier re-derives the identical add-one unigram model — same LM_VOCAB cap, same corpus total, same 6dp-quantized log-prob — and its oracle replays that chain)"),
    "dedup_image_dhash": _e("r8", "r12", subsumed_by="dedup_image_clusters (declared r12; same decode -> dHash -> multi-block candidate -> popcount-verify pairs feed its rep graph)"),
    "doc_topic_clusters": _e(declared_in="r8"),
    "dedup_audio_fp": _e("r8", "r12", subsumed_by="dedup_audio_clusters (declared r12; same fingerprint pair engine feeds its rep graph)"),
    "ann_ivfpq_topk": _e(declared_in="r9", added_in="r8"),
    "dedup_video_framehash": _e("r9", "r12", added_in="r8", subsumed_by="dedup_video_clusters (declared r11; same frame-signature collapse + aligned candidate/verify pairs feed its rep graph)"),
    "topic_balanced_sample": _e(declared_in="r9", added_in="r8"),
    "bigram_logprob_scores": _e(declared_in="r10", added_in="r9"),
    "bpe_encode_128": _e(declared_in="r10"),
    "dedup_substring_spans": _e("r11", "r13", added_in="r8", subsumed_by="dedup_substring_full (declared r13; computes the same span fold off the same exchange — bit-identity pinned by tests/test_substring_combined.py)"),
    "corpus_vocab_topk": _e(declared_in="r11", added_in="r8"),
    "doc_tfidf_topterms": _e(declared_in="r11", added_in="r8"),
    "dedup_video_clusters": _e(declared_in="r11"),
    # --- early-cap demotions (the round-1 gate read only the first 50
    # declared names; these sat past the cap) -------------------------
    "global_agg_events": _e("r1", "r6", subsumed_by="q1_pricing_summary (A14 = zero-key groupBy)"),
    "range_join_90min_slices": _e("r1", "r6", subsumed_by="range_join_hourly_counts + time_slices_table_function"),
    "convert_timezone_shift": _e("r1", "r6", subsumed_by="timezone_and_array_functions + datetime_functions"),
    "multimodal_frame_sample": _e("r1", "r6", subsumed_by="multimodal_features (same mapInPandas plumbing)"),
    # --- r7 rotations --------------------------------------------------
    "cross_join_region_type_matrix": _e("r1", "r7", subsumed_by="baselines J6 cross-join tests + no-cartesian pins"),
    "semi_join_suppliers_big_lots": _e("r1", "r7", subsumed_by="anti_join_parts_no_bulk_orders (same LeftSemi/LeftAnti strategy) + suppression e2e"),
    "top_orders": _e("r1", "r7", subsumed_by="latest_event_per_user + dispatcher TakeOrderedAndProject e2e"),
    "q5_supplier_volume_by_nation": _e("r1", "r7", subsumed_by="q3_shipping_priority + join_revenue_by_nation (multi-join broadcast-agg)"),
    "group_by_ordinals_sql": _e("r1", "r7", subsumed_by="group_having_active_users (A8 ordinal/HAVING rewrite) + pack corpus"),
    "approx_aggregates": _e("r1", "r7", subsumed_by="percentiles_by_type (A10/A11 approx-percentile collapse)"),
    "zerofill_customers_per_nation": _e("r1", "r7", subsumed_by="full_outer_nation_presence (J4 = one side of J5) + baselines A12"),
    "dedup_embedding_cosine": _e("r1", "r7", subsumed_by="dedup_embedding_ivf/rplsh (same exact-cosine verify); all-pairs baseline pytest-guarded"),
    # --- r7 additions past the cap --------------------------------------
    "doc_chunks": _e(None, None, "r7", "local oracle (doc chunking projection)"),
    "stratified_sample_docs": _e(None, None, "r7", "local oracle (deterministic stratified sampler)"),
    "text_repetition_stats": _e(None, None, "r7", "text_quality_scores (same featurizer family)"),
    "embedding_quantize_int8": _e(None, None, "r7", "bit-exact local oracle"),
    "doc_chunk_packing": _e(None, None, "r7", "curation_filter_pipeline (same map-only shape)"),
    "corpus_mixture_plan": _e(declared_in="r12", added_in="r7"),
    "corpus_shuffle_shards": _e(None, None, "r7", "local oracle (deterministic shard assignment)"),
    "curation_funnel_stats": _e(declared_in="r13", added_in="r7"),
    "dedup_cross_snapshot_minhash": _e(None, None, "r7", "dedup_cross_snapshot (declared; same LeftAnti) + dedup_minhash_lsh"),
    "quality_percentile_filter": _e(None, None, "r7", "percentiles_by_type + text_quality_scores"),
    "embedding_pq_codes": _e(None, None, "r7", "ann_pq_topk/ann_ivfpq_topk (same PQ coding, oracle-checked end to end)"),
    # local-only through r13, promoted r14 (r13 verdict item 10: the
    # 103rd row, never driver-checked, now pins the gate COMPOSITION
    # — and subsumes the demoted decontaminate_ngram row it drives)
    "curation_gate_decontam": _e(declared_in="r14", added_in="r13"),
    # --- r8 rotations ----------------------------------------------------
    "union_dedupe_nationkeys": _e("r1", "r8", subsumed_by="dedup_exact collapse semantics + pack corpus UNION ALL verbatim"),
    "image_dhash": _e(None, None, "r8", "dedup_image_clusters (declared r12; computes the same hashes before the band join)"),
    "not_in_subquery_orders": _e("r1", "r8", subsumed_by="anti_join_parts_no_bulk_orders (identical LeftAnti plan) + pack corpus NOT IN"),
    "try_cast_coercion": _e("r1", "r8", subsumed_by="conditional_functions (same TRY_*/IFF rewrite path) + pack corpus"),
    "embedding_label_stats": _e("r1", "r8", subsumed_by="q1_pricing_summary (decimal-exact SUM/AVG) + ANN rows' norm arithmetic"),
    "correlation_sessions": _e("r1", "r8", subsumed_by="alert_processor e2e suites + latest_event_per_user (W1)"),
    "count_distinct_users_by_type": _e("r1", "r8", subsumed_by="user_profile_rollup (distinct-aggregate plan) + approx_aggregates local"),
    "cosine_topk_bruteforce": _e("r1", "r8", subsumed_by="ann_ivf_topk (oracle verifies exact-cosine ranking); recall tests keep the baseline"),
    "json_path_extract": _e("r1", "r8", subsumed_by="recursive_flatten_paths + object_construct_canonical + pack corpus col:path"),
    "text_token_stats": _e("r1", "r8", subsumed_by="text_quality_scores + corpus_vocab_topk + bpe encode rows count every token"),
    "audio_fingerprint": _e(None, None, "r8", "dedup_audio_clusters (declared r12; same fingerprints before the band join)"),
    "video_framehash": _e(None, None, "r8", "dedup_video_clusters (declared r11; same frame hashes before the aligned join)"),
    "bpe_encode_1k": _e(None, None, "r9", "bpe_encode_128 (declared; same vocab-join path) + exhaustion-asserted 128-round oracle"),
    # --- r9 rotations ----------------------------------------------------
    "object_construct_canonical": _e("r1", "r9", subsumed_by="violation_md5_identity (S7 drives OBJECT_CONSTRUCT -> MD5 e2e) + pack corpus"),
    "dedup_exact": _e("r1", "r9", subsumed_by="dedup_clusters (verified edges ARE the md5 groups) + dedup_cross_snapshot"),
    "string_functions": _e("r1", "r9", subsumed_by="like_rlike_filters (P5/P6) + pii_scrub_events + pack corpus string funcs"),
    "text_lang_id": _e("r1", "r9", subsumed_by="text_quality_scores (same tokenizer featurizer, map-only projection)"),
    # --- r10 rotations ---------------------------------------------------
    "bpe_merges": _e("r9", "r10", added_in="r8", subsumed_by="bpe_encode_128 (its oracle's first six training rounds)"),
    "bpe_encode_docs": _e("r8", "r10", subsumed_by="bpe_encode_128 (same encode_docs_via_vocab path above the fold ceiling)"),
    "multimodal_features": _e("r1", "r10", subsumed_by="dedup_image_clusters + dedup_audio_clusters (declared r12; same Arrow decode stage)"),
    # --- r11 rotations ---------------------------------------------------
    "datetime_functions": _e("r1", "r11", subsumed_by="timezone_and_array_functions (same date/time compat family) + pack corpus"),
    "ann_pq_topk": _e("r9", "r11", added_in="r8", subsumed_by="ann_ivfpq_topk (same PQ coding + ADC LUT, verified as every probe's scoring stage)"),
    "dedup_embedding_ivf": _e("r1", "r11", subsumed_by="ann_ivf_topk (same IVF training/assignment) + dedup_embedding_rplsh (same candidate/verify)"),
    "decontaminate_semantic": _e("r8", "r11", subsumed_by="semantic_dedup (same codebook assignment + verify) + decontaminate_ngram (same LeftAnti)"),
    "dedup_image_clusters": _e(declared_in="r12", added_in="r11"),
    "dedup_audio_clusters": _e(declared_in="r12", added_in="r11"),
    "bpe_encode_zipf": _e(None, None, "r11", "full 128-round training-replay oracle on the zipf sidecar (non-sf_dir corpus, so local by construction)"),
    # --- r13 rotations (r12 verdict item 5) -------------------------------
    "dedup_substring_full": _e(declared_in="r13", added_in="r12"),
    "dedup_substring_cross_snapshot": _e(declared_in="r13", added_in="r12"),
}


def render_markdown() -> str:
    """The PARITY.md rotation-ledger table, derived from LEDGER + the
    live registry (status and oracle presence are computed, never
    hand-written)."""
    from snowalert_spark import workload

    all_q = workload.queries(include_local=True)
    oracles = workload.oracle_sql(include_local=True)
    lines = [
        "| row | status | added | declared | demoted | oracle | subsumed by (while local) |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in sorted(all_q):
        e = LEDGER[name]
        local = name in workload.LOCAL_ONLY
        lines.append(
            "| {} | {} | {} | {} | {} | {} | {} |".format(
                name,
                "local" if local else "declared",
                e["added_in"] or "—",
                e["declared_in"] or "—",
                e["demoted_in"] or "—",
                "yes" if name in oracles else "rows-only",
                e["subsumed_by"] or "—",
            )
        )
    return "\n".join(lines)
