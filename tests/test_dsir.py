"""DSIR importance resampling (Xie et al. arXiv:2302.03169): hashed
n-gram importance weights must rank documents that look like the
target domain ABOVE ones that don't, deterministically. The bit-exact
DuckDB replay runs in tests/test_oracle.py; here: direction, zero-
feature behavior, and Gumbel determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowalert_spark.functions import sampling as SMP


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_score_higher(spark):
    """Directional check on a corpus large enough that the add-one
    smoothing doesn't swamp the ratios (the degenerate 4-doc case
    makes every p_target ≈ the floor)."""
    target_text = "zebra quagga okapi zebra quagga okapi zebra quagga"
    rows = [(1, target_text), (2, "zebra quagga okapi stripes"),
            (3, "lorem ipsum dolor sit amet consectetur")]
    # filler: off-domain docs with unique junk tokens fatten the raw
    # total so target-vocab features keep a higher p_t/p_r ratio
    rows += [(10 + i, " ".join(f"junk{i}x{j}" for j in range(8)))
             for i in range(20)]
    docs = _docs(spark, rows)
    target = docs.filter(F.col("doc_id") == 1)
    got = {r.doc_id: r for r in SMP.dsir_logweights(docs, target).collect()}
    # per-feature average avoids length confounds: the target-vocab
    # doc must average a better importance ratio than the off-domain
    # doc of the same shape
    avg = {d: got[d].logw / max(got[d].n_feats, 1) for d in got}
    assert avg[2] > avg[3]
    assert avg[1] == max(avg.values())  # the target itself ranks best


def test_empty_doc_scores_zero(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "")])
    got = {r.doc_id: r for r in
           SMP.dsir_logweights(docs, docs.filter("doc_id = 1")).collect()}
    assert got[2].n_feats == 0 and got[2].logw == 0.0


def test_gumbel_key_deterministic_and_varies(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.g for r in
         df.select("doc_id", SMP.gumbel_key(F.col("doc_id")).alias("g")).collect()}
    b = {r.doc_id: r.g for r in
         df.select("doc_id", SMP.gumbel_key(F.col("doc_id")).alias("g")).collect()}
    assert a == b
    assert len(set(a.values())) > 90  # noise actually varies by id
