"""Unit pins for the corpus-curation operators added in round 7:
token-window chunking, deterministic stratified sampling, repetition
stats, and int8 embedding quantization. Oracle equivalence for each
workload binding is covered by tests/test_oracle.py; these pin the
operator semantics on hand-built rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowalert_spark.functions import sampling as SMP
from snowalert_spark.functions import text as X
from snowalert_spark.workload.textops import text_repetition_stats  # noqa: F401
from snowalert_spark.workload.vector import embedding_quantize_int8  # noqa: F401


def _chunks(spark, text, size):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        df.select(
            F.posexplode(X.token_chunks(X.tokens("text"), size)).alias("i", "c")
        )
        .select("i", "c.chunk_text", "c.n_tokens")
        .collect()
    )
    return [(r["i"], r["chunk_text"], r["n_tokens"]) for r in rows]


def test_token_chunks_exact_multiple(spark):
    got = _chunks(spark, "a b c d", 2)
    assert got == [(0, "a b", 2), (1, "c d", 2)]


def test_token_chunks_ragged_tail(spark):
    got = _chunks(spark, "a b c d e", 2)
    assert got == [(0, "a b", 2), (1, "c d", 2), (2, "e", 1)]


def test_token_chunks_short_doc_single_chunk(spark):
    got = _chunks(spark, "hello", 32)
    assert got == [(0, "hello", 1)]


def test_stratified_sample_deterministic_and_audited(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 3 == 0 else "de") for i in range(300)],
        "doc_id long, lang string",
    )
    s1 = SMP.stratified_sample(df, "lang", {"en": 20}, "doc_id", default_pct=80)
    s2 = SMP.stratified_sample(df, "lang", {"en": 20}, "doc_id", default_pct=80)
    r1 = sorted(r["doc_id"] for r in s1.collect())
    r2 = sorted(r["doc_id"] for r in s2.collect())
    assert r1 == r2, "hash sampling must be rerun-stable"
    audited = s1.filter(F.col("bucket") >= F.col("rate_pct")).count()
    assert audited == 0
    kept = {r["lang"]: 0 for r in s1.select("lang").distinct().collect()}
    for r in s1.collect():
        kept[r["lang"]] += 1
    n_en = df.filter(F.col("lang") == "en").count()
    n_de = df.filter(F.col("lang") == "de").count()
    # md5 buckets are near-uniform: expect ~20% / ~80% with slack
    assert 0.05 < kept.get("en", 0) / n_en < 0.4
    assert 0.6 < kept.get("de", 0) / n_de < 0.95


def test_repetition_stats_hand_values(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.createOrReplaceTempView("curation_docs")
    tok = X.tokens("text")
    from snowalert_spark.workload.textops import _topfrac

    row = docs.select(
        _topfrac(tok).alias("twf"),
        _topfrac(X.shingles(tok, 2)).alias("tbf"),
    ).collect()[0]
    assert abs(row["twf"] - 0.75) < 1e-9  # "a" 3 of 4
    assert abs(row["tbf"] - 2 / 3) < 1e-9  # "a a" 2 of 3 bigrams


def test_int8_quantization_bounds_and_fidelity(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = (
        df.withColumn("v", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn(
            "scale",
            F.expr("nullif(array_max(transform(v, x -> abs(x))), 0.0D) / 127.0D"),
        )
        .withColumn("codes", F.expr("transform(v, x -> floor(x / scale + 0.5D))"))
        .collect()[0]
    )
    assert all(-127 <= c <= 127 for c in out["codes"])
    # the max-magnitude element maps exactly to ±127
    assert min(out["codes"]) == -127.0
    # reconstruction stays within half a quantization step per element
    for orig, code in zip(out["v"], out["codes"]):
        assert abs(orig - code * out["scale"]) <= out["scale"] / 2 + 1e-12


def test_chunk_packing_bin_semantics(spark):
    from snowalert_spark.workload.textops import doc_chunk_packing  # noqa: F401
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [("s1", 1, 0, 100), ("s1", 1, 1, 100), ("s1", 2, 0, 100), ("s2", 9, 0, 300)],
        "source string, doc_id long, chunk_id long, n_tokens long",
    )
    w = W.partitionBy("source").orderBy("doc_id", "chunk_id")
    out = df.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "bin_id", F.floor((F.col("cum") - F.col("n_tokens")) / 256)
    )
    got = {(r["source"], r["doc_id"], r["chunk_id"]): r["bin_id"] for r in out.collect()}
    # s1: prefix sums before each chunk are 0, 100, 200 → bins 0, 0, 0
    # (200 < 256 — the third chunk STARTS in bin 0 under contiguous fill)
    assert got[("s1", 1, 0)] == 0 and got[("s1", 1, 1)] == 0
    assert got[("s1", 2, 0)] == 0
    # s2 packs independently of s1 (per-source parallel packing)
    assert got[("s2", 9, 0)] == 0


def test_chunk_packing_rolls_into_next_bin(spark):
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [("s", 1, i, 100) for i in range(5)],
        "source string, doc_id long, chunk_id long, n_tokens long",
    )
    w = W.partitionBy("source").orderBy("doc_id", "chunk_id")
    out = df.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "bin_id", F.floor((F.col("cum") - F.col("n_tokens")) / 256)
    )
    bins = [r["bin_id"] for r in out.orderBy("chunk_id").collect()]
    # prefix sums 0,100,200,300,400 → bins 0,0,0,1,1
    assert bins == [0, 0, 0, 1, 1]


def test_mixture_plan_hand_values(spark):
    # 30 'a' docs, 10 'b' docs; weights a=1, b=3 => total_w=4, N=40.
    # a: rate = min(100, floor(100*(1/4)*40/30)) = 33, planned 9
    # b: rate = min(100, floor(100*(3/4)*40/10)) = 100 (capped), planned 10
    df = spark.createDataFrame(
        [(i, "a" if i < 30 else "b") for i in range(40)],
        "doc_id long, source string",
    )
    w = F.when(F.col("source") == "b", 3).otherwise(1)
    rows = {r["source"]: r for r in SMP.mixture_plan(df, "source", w).collect()}
    assert rows["a"]["n_docs"] == 30 and rows["a"]["rate_pct"] == 33
    assert rows["a"]["planned_docs"] == 9
    assert rows["b"]["rate_pct"] == 100 and rows["b"]["planned_docs"] == 10
    assert abs(rows["b"]["target_frac"] - 0.75) < 1e-9


def test_mixture_plan_feeds_stratified_sample(spark):
    """The plan's rate_pct column drives stratified_sample directly:
    the sampled mixture moves toward the target weights."""
    df = spark.createDataFrame(
        [(i, "a" if i < 300 else "b") for i in range(400)],
        "doc_id long, source string",
    )
    w = F.when(F.col("source") == "b", 3).otherwise(1)
    plan = {
        r["source"]: r["rate_pct"]
        for r in SMP.mixture_plan(df, "source", w).collect()
    }
    s = SMP.stratified_sample(df, "source", plan, "doc_id")
    kept = {
        r["source"]: r["n"]
        for r in s.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # 'b' keeps everything (capped at 100), 'a' roughly a third
    assert kept["b"] == 100
    assert 60 < kept["a"] < 140


def test_shuffle_shards_deterministic_total_order(spark):
    from snowalert_spark.workload.textops import corpus_shuffle_shards

    a = corpus_shuffle_shards(spark, "/root/testdata/sf0.001").collect()
    b = corpus_shuffle_shards(spark, "/root/testdata/sf0.001").collect()
    ka = sorted((r["shard_id"], r["pos"], r["doc_id"]) for r in a)
    kb = sorted((r["shard_id"], r["pos"], r["doc_id"]) for r in b)
    assert ka == kb, "epoch order must be rerun-stable"
    # (shard, pos) is a dense total order: positions are 1..n per shard
    per_shard: dict[int, list[int]] = {}
    for s, p, _ in ka:
        per_shard.setdefault(s, []).append(p)
    for s, ps in per_shard.items():
        assert ps == list(range(1, len(ps) + 1)), s
    # and every doc appears exactly once
    assert len({d for _, _, d in ka}) == len(ka)


def test_cross_snapshot_dedup_drops_known_dup(spark):
    from snowalert_spark.functions.dedup import cross_snapshot_dedup

    base = spark.createDataFrame(
        [(1, "s1", "seen text"), (2, "s1", "other text")],
        "doc_id long, source string, text string",
    )
    batch = spark.createDataFrame(
        [(10, "s2", "seen text"), (11, "s2", "fresh text")],
        "doc_id long, source string, text string",
    )
    out = cross_snapshot_dedup(batch, base)
    assert [r["doc_id"] for r in out.collect()] == [11]


def test_curation_filter_first_fail_reason(spark):
    """Rule order is fixed: a doc failing several rules reports the
    FIRST one (too_short before low_quality before repetitive before
    lang_excluded)."""
    from snowalert_spark.workload.textops import _GATE_LANGS  # noqa: F401

    docs = spark.createDataFrame(
        [
            # 3 tokens AND zh lang: reason must be too_short
            (1, "x y z", "zh", "s", 5),
            # long, decent quality, zh: lang_excluded
            (
                2,
                " ".join(f"w{i}" for i in range(40)),
                "zh",
                "s",
                400,
            ),
            # long, repetitive ('a' * 40): too uniform -> repetitive
            # (quality low too: low_quality fires first)
            (3, " ".join(["a"] * 40), "en", "s", 80),
            # long unique en doc: keep
            (
                4,
                " ".join(f"tok{i}" for i in range(40)),
                "en",
                "s",
                500,
            ),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.createOrReplaceTempView("documents_gate_test")
    import snowalert_spark.workload.textops as T

    tok = X.tokens("text")
    sig = docs.select(
        "doc_id",
        "lang",
        F.size(tok).cast("long").alias("n_tokens"),
        X.quality_score(F.col("n_chars"), tok).alias("quality"),
        T.quantize(T._topfrac(tok), 6).alias("top_word_frac"),
    )
    reason = (
        F.when(F.col("n_tokens") < 12, "too_short")
        .when(F.col("quality") < 0.55, "low_quality")
        .when(F.col("top_word_frac") > 0.2, "repetitive")
        .when(~F.col("lang").isin(*T._GATE_LANGS), "lang_excluded")
    )
    got = {
        r["doc_id"]: (r["reject_reason"], r["keep"])
        for r in sig.select(
            "doc_id", reason.alias("reject_reason"), reason.isNull().alias("keep")
        ).collect()
    }
    assert got[1] == ("too_short", False)
    assert got[2] == ("lang_excluded", False)
    assert got[3] == ("low_quality", False)
    assert got[4] == (None, True)


def test_curation_filter_every_rule_fires_at_gate_sf(spark):
    """At the driver's gate SF the thresholds are set so each signal
    path is actually exercised (a gate whose rules never fire tests
    nothing)."""
    from snowalert_spark.workload.textops import curation_filter_pipeline

    df = curation_filter_pipeline(spark, "/root/testdata/sf0.01")
    reasons = {
        r["reject_reason"]
        for r in df.select("reject_reason").distinct().collect()
    }
    assert None in reasons, "some docs must survive"
    assert {"too_short", "low_quality", "repetitive", "lang_excluded"} <= reasons


def test_cross_snapshot_minhash_planted_neardup(spark):
    """A batch doc that is a boilerplate-mutated copy of a base doc
    (one token changed out of 40) is flagged with its base source;
    an unrelated doc is not."""
    from snowalert_spark.functions.dedup import cross_snapshot_minhash

    body = " ".join(f"tok{i}" for i in range(40))
    mutated = body.replace("tok7", "tokX")
    base = spark.createDataFrame(
        [(1, "s1", body), (2, "s1", "completely different words here " * 5)],
        "doc_id long, source string, text string",
    )
    batch = spark.createDataFrame(
        [(10, "s2", mutated), (11, "s2", "nothing in common with anything")],
        "doc_id long, source string, text string",
    )
    rows = cross_snapshot_minhash(batch, base, threshold=0.8).collect()
    got = {(r["doc_id"], r["dup_of"]) for r in rows}
    assert (10, 1) in got
    assert all(d != 11 for d, _ in got)


def test_quality_percentile_filter_drops_bottom_quintile(spark):
    from snowalert_spark.workload.textops import quality_percentile_filter

    df = quality_percentile_filter(spark, "/root/testdata/sf0.01")
    rows = df.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        kept = sum(r["kept"] for r in rs)
        # bottom ~20% dropped per source (rank < 0.2), keep the rest
        assert 0.7 * len(rs) <= kept <= 0.85 * len(rs), src
        # the kept set is exactly the top of the quality order
        srt = sorted(rs, key=lambda r: (r["quality"], r["doc_id"]))
        assert all(not r["kept"] for r in srt[: len(rs) - kept])
        assert all(r["kept"] for r in srt[len(rs) - kept :])


def test_cross_snapshot_minhash_full_recall_at_gate_sf(spark):
    """Band-collision candidates recover EVERY true cross-half
    near-dup pair (J >= 0.8) in the fixed gate corpus — the oracle
    equality proves Spark==DuckDB on the LSH pipeline, this proves
    the LSH pipeline loses nothing vs exhaustive verification here
    (expected: ~96% per-pair collision probability; this corpus'
    12 planted pairs all collide)."""
    import duckdb

    from snowalert_spark.workload.textops import (
        _BASE_SOURCES,
        dedup_cross_snapshot_minhash,
    )

    got = {
        (r["doc_id"], r["dup_of"])
        for r in dedup_cross_snapshot_minhash(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    exhaustive = con.execute(
        rf"""
        WITH tok AS (SELECT doc_id,
                            string_split_regex(lower(text), '\s+') w
                     FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(0, len(w) - 2),
                             i -> array_to_string(w[i+1:i+3], ' '))) s
               FROM tok WHERE len(w) >= 3),
        sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
        common AS (
            SELECT a.doc_id da, b.doc_id db, COUNT(*) c
            FROM sh a JOIN sh b ON a.s = b.s
            JOIN documents xa ON xa.doc_id = a.doc_id
                             AND xa.source NOT IN {_BASE_SOURCES}
            JOIN documents xb ON xb.doc_id = b.doc_id
                             AND xb.source IN {_BASE_SOURCES}
            GROUP BY 1, 2)
        SELECT da, db FROM common
        JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        WHERE FLOOR(c / (sa.n + sb.n - c) * 1000000.0 + 0.5) / 1000000.0
              >= 0.8
        """
    ).fetchall()
    want = {(a, b) for a, b in exhaustive}
    assert want, "fixture must contain cross-half near-dups"
    assert got == want, f"missed {want - got}, spurious {got - want}"
