"""Byte-pair-encoding merge training (tokenizer-training support for
the training-data layer; algorithm per Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909 §3.2).

Scale shape: the corpus is touched EXACTLY ONCE — one partial-
aggregated shuffle collapses 100 TB of text to the (word, count)
vocabulary, and every merge iteration runs on that vocab table (a few
hundred thousand rows regardless of corpus size). Per iteration: one
vocab-sized pair-count aggregate, a 1-row bounded collect of the best
pair (driver protocol, same as the k-means trainer), and a map-only
greedy re-segmentation fold. localCheckpoint truncates the iteration
lineage exactly like dedup_clusters' label propagation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, cnt) vocabulary: lowercase, whitespace-split
    (the engine-wide TOK convention). The ONLY corpus-sized stage of
    BPE training."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge to a symbol
    array: scan symbols, replacing each non-overlapping adjacent
    (left, right) occurrence with left||right. Overlapping runs (only
    possible when left == right) merge at alternate positions, exactly
    like the reference BPE implementation's re-segmentation. A symbol
    created by this pass never re-merges within the pass: the new
    symbol is left||right, and the fold's merge test needs the
    PREVIOUS accumulator element to equal `left` — left||right == left
    would require an empty right, which the tokenizer never emits."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.expr(
        "CASE WHEN size(syms) >= 2 THEN "
        "transform(sequence(1, size(syms) - 1), "
        "          i -> struct(syms[i-1] AS lhs, syms[i] AS rhs)) "
        "ELSE CAST(array() AS array<struct<lhs:string,rhs:string>>) END"
    )
    return (
        vocab.select("cnt", F.explode(pairs).alias("p"))
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Train the first ``n_merges`` BPE merges over the corpus.
    Returns [(merge_rank, lhs, rhs, pair_count_at_selection)].
    Deterministic: ties on pair_count break lexicographically on
    (lhs, rhs)."""
    cur = (
        word_freqs(docs, text_col)
        .select("word", "cnt", F.split("word", "").alias("syms"))
        .localCheckpoint()
    )
    out: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(cur)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        out.append((rank, b.lhs, b.rhs, int(b.pair_count)))
        cur = cur.select(
            "word", "cnt", merge_pair(F.col("syms"), b.lhs, b.rhs).alias("syms")
        ).localCheckpoint()
    return out


def encode_word(word: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Apply trained merges to one word (a string Column or lambda
    variable): character split, then each merge's greedy
    non-overlapping pass in rank order — the reference BPE apply step.
    The merge list rides the plan as literals (the codebook trick), so
    encoding is a pure map expression: zero shuffle at any corpus
    size. Expression depth grows with len(merges); a production
    tokenizer with tens of thousands of merges would instead join the
    corpus words to the trained segmentation table (the ``w{m+1}``
    vocabulary the oracle materializes) — same output by induction on
    the per-round fold parity."""
    syms = F.split(word, "")
    for _, lhs, rhs, _ in sorted(merges):
        syms = merge_pair(syms, lhs, rhs)
    return syms


# process-local merge cache + optional versioned-store persistence —
# the trained_centroids pattern (functions/similarity.py): a tokenizer
# is train-once state, not per-session work.
_MERGE_CACHE: dict[tuple, list] = {}


def trained_merges(
    spark,
    corpus_version: str,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    store=None,
) -> list[tuple[int, str, str, int]]:
    """The BPE merge table for a corpus version, trained at most once
    per version. With ``store`` (a ResultsStore, or $SNOWALERT_MODEL_DIR
    set), merges persist in the versioned ``trained_bpe_merges``
    sidecar table and later sessions reload them instead of re-running
    the trainer — the same state-in-tables shape as the k-means
    codebooks (and as the reference's results-table-resident runner
    state, alert_queries_runner.py:64-94)."""
    from snowalert_spark.functions.similarity import _default_model_store

    key = (corpus_version, n_merges, text_col)
    if store is None:
        store = _default_model_store(spark)
    mk = f"{corpus_version}|m={n_merges}|col={text_col}"
    if key not in _MERGE_CACHE and store is not None:
        persisted = [
            (int(r["merge_rank"]), r["lhs"], r["rhs"], int(r["pair_count"]))
            for r in store.read("trained_bpe_merges")
            .filter(F.col("model_key") == mk)
            .collect()
        ]
        if persisted:
            _MERGE_CACHE[key] = sorted(persisted)
    if key not in _MERGE_CACHE:
        _MERGE_CACHE[key] = bpe_train(docs, n_merges, text_col)
        if store is not None:
            new = spark.createDataFrame(
                [(mk, *m) for m in _MERGE_CACHE[key]],
                "model_key string, merge_rank int, lhs string, "
                "rhs string, pair_count bigint",
            )
            from snowalert_spark.store import ConcurrentWriteError

            try:
                store.upsert(
                    "trained_bpe_merges", new, on=["model_key", "merge_rank"]
                )
            except ConcurrentWriteError:
                # a concurrent trainer published first; the trainer is
                # deterministic per corpus version, so the loss is
                # harmless
                pass
    return _MERGE_CACHE[key]
