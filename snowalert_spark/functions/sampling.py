"""Deterministic sampling operators for corpus curation.

Training-data pipelines rebalance corpora by stratum (language,
source, quality band) — and at 100 TB the sample must be
*deterministic* so reruns, backfills, and the train/holdout split all
agree without coordinating state. Both operators here key the
keep/drop decision on a content-independent md5 hash bucket of the
row id: pure column expressions, no RNG, no shuffle, engine-portable
(the DuckDB oracle replays the identical arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from snowalert_spark.functions.numeric import quantize


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of
    md5(value-as-string) taken mod ``buckets``. DuckDB oracle form:
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::UBIGINT % B``."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_bucket_hex(hex_col: Column, buckets: int) -> Column:
    """Same bucket arithmetic over an already-computed md5 hex string
    (callers that also need the full digest compute it once)."""
    h = F.conv(F.substring(hex_col, 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_pct: dict[str, int],
    id_col: str,
    default_pct: int = 100,
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum deterministic downsample: keep a row iff its id's
    hash bucket falls below the stratum's percentage. Map-only (the
    rate lookup is a literal map, the filter is a column predicate) —
    the filter is applied at the scan, nothing shuffles, and the same
    row set survives on any cluster layout or rerun.

    Returns the input rows (all columns) plus ``bucket`` and
    ``rate_pct`` so the decision is auditable downstream.
    """
    pairs = [x for k, v in sorted(rates_pct.items()) for x in (F.lit(k), F.lit(v))]
    rate = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)] if pairs else F.lit(None),
        F.lit(default_pct),
    )
    return (
        df.withColumn("bucket", hash_bucket(F.col(id_col), buckets))
        .withColumn("rate_pct", rate)
        .filter(F.col("bucket") < F.col("rate_pct"))
    )


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    weight: Column,
) -> DataFrame:
    """Corpus-mixture planning: given a per-stratum target *weight*
    (a column expression over ``strata_col``), compute the
    deterministic downsample rate each stratum needs so the sampled
    corpus approaches the target mixture, never upsampling (rate is
    capped at 100%).

    Definitions per stratum ``s`` with count ``n_s`` and weight
    ``w_s``: ``target_frac = w_s / Σw`` and
    ``rate_pct = min(100, floor(100·target_frac·N / n_s))`` where
    ``N = Σn``. The output is the *plan* (one row per stratum) —
    feeding ``rate_pct`` into :func:`stratified_sample` applies it.

    Scale shape: one map-side-combined count aggregation over the
    corpus (the only shuffle, reducing 100 TB to #strata rows), then
    the corpus-wide totals come from a single-row aggregate joined
    back by broadcast — no global window over the data, so the plan
    cost is the count scan regardless of corpus size.
    """
    # weights stay DOUBLE: a fractional weight (0.5, 2.25, …) is a
    # legitimate mixture target — the old cast('long') silently
    # truncated 0.5 → 0 (and an all-zero total nulled every rate)
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("weight", weight.cast("double"))
    )
    totals = counts.agg(
        F.sum("weight").alias("_tw"), F.sum("n_docs").alias("_tn")
    )
    planned = counts.join(F.broadcast(totals))
    rate = F.least(
        F.lit(100),
        F.floor(100.0 * F.col("weight") / F.col("_tw") * F.col("_tn") / F.col("n_docs")),
    ).cast("long")
    return planned.select(
        strata_col,
        F.col("n_docs"),
        F.col("weight"),
        quantize(F.col("weight") / F.col("_tw"), 6).alias("target_frac"),
        rate.alias("rate_pct"),
        F.floor(F.col("n_docs") * rate / 100.0).cast("long").alias("planned_docs"),
    )


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame | None = None,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_pred: Column | None = None,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al.,
    arXiv:2302.03169) — the hashed n-gram importance weights: build
    bag-of-hashed-ngram (unigram + bigram) distributions for the raw
    corpus and the target domain, smooth add-one over ``n_buckets``
    buckets, and score every raw document with
    ``log w = Σ_features [ln p_target(bucket) - ln p_raw(bucket)]``.
    Returns (doc_id, n_feats, logw) for every input doc (docs with no
    features score 0).

    Deterministic and engine-replayable: buckets come from the md5
    hash-bucket idiom above, per-bucket log-ratios are quantized to
    6dp before the per-doc sum runs through exact DECIMAL accumulation
    (order-independent across engines and partitionings).

    100 TB shape: the bucket-count model collapses to ≤ ``n_buckets``
    rows per side via partial-aggregated exchanges; the log-ratio
    table is bucket-bounded and BROADCASTS to the per-doc scoring
    scan, so the corpus-sized feature stream shuffles exactly once —
    the groupBy(doc_id) sum. The feature totals (``tr``/``tt``) are
    derived from the bucket counts (exact — they are sums of the same
    longs), never from extra passes over the stream (r13: the old
    standalone totals were two more full tokenize+hash scans).

    Pass ``target_pred`` (a boolean Column over ``docs``) instead of
    ``target`` when the target domain is a subset of the raw corpus:
    the raw and target bucket counts then come from ONE pass over the
    feature stream (count + conditional count per bucket) — exactly
    the counts the two-frame path computes, in half the scans. The
    scoring pass is the second and last scan either way."""
    from snowalert_spark.functions import text as X
    from snowalert_spark.tables import spread

    if (target is None) == (target_pred is None):
        raise ValueError("pass exactly one of target / target_pred")

    tok = X.tokens(text_col)

    def feats(df: DataFrame) -> DataFrame:
        return (
            spread(df, id_col)
            .select(
                F.col(id_col).alias("doc_id"),
                F.explode(F.concat(tok, X.shingles(tok, 2))).alias("f"),
            )
            .filter(F.col("f") != "")
            .select("doc_id", hash_bucket(F.col("f"), n_buckets).alias("b"))
        )

    if target_pred is not None:
        fr = (
            spread(docs, id_col)
            .select(
                F.col(id_col).alias("doc_id"),
                target_pred.alias("is_t"),
                F.explode(F.concat(tok, X.shingles(tok, 2))).alias("f"),
            )
            .filter(F.col("f") != "")
            .select("doc_id", "is_t", hash_bucket(F.col("f"), n_buckets).alias("b"))
        )
        counts = fr.groupBy("b").agg(
            F.count(F.lit(1)).alias("cr"),
            F.count_if(F.col("is_t")).alias("ct"),
        )
        totals = counts.agg(
            F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
        )
        lr_src = counts.crossJoin(F.broadcast(totals))
    else:
        fr = feats(docs)
        ft = feats(target)
        raw = fr.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
        tgt = ft.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
        tr = raw.agg(F.sum("cr").alias("tr"))
        tt = tgt.agg(F.sum("ct").alias("tt"))
        lr_src = (
            raw.join(tgt, "b", "full")
            .crossJoin(F.broadcast(tr))
            .crossJoin(F.broadcast(tt))
        )
    lr = lr_src.select(
        "b",
        quantize(
            F.log(
                ((F.coalesce("ct", F.lit(0)) + 1.0) / (F.col("tt") + n_buckets))
                / ((F.coalesce("cr", F.lit(0)) + 1.0) / (F.col("tr") + n_buckets))
            ),
            6,
        ).alias("lr"),
    )
    perdoc = (
        fr.select("doc_id", "b")
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.col("lr").cast("decimal(25,12)")).cast("double").alias("logw"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            quantize(F.coalesce("logw", F.lit(0.0)), 6).alias("logw"),
        )
    )


def gumbel_key(id_col: Column, salt: str = "dsir") -> Column:
    """Deterministic Gumbel(0,1) noise from the id's md5: the standard
    Gumbel-top-k trick turns weighted sampling-without-replacement into
    a deterministic top-k by ``logw + g``. u = (h32 + 1) / (2^32 + 1)
    is uniform in (0,1) on the 32-bit hash lattice; g = -ln(-ln(u)).
    DuckDB replays the identical arithmetic (quantized to 6dp)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = (h + 1.0) / 4294967297.0
    return quantize(-F.log(-F.log(u)), 6)
