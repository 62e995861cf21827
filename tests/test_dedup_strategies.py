"""The two ngram_jaccard_pairs physical strategies (direct inverted-
index join vs AllPairs/PPJoin prefix filtering) must be result-
identical — the prefix path only engages above the 100k-doc cost
cutoff, so without this test it would never run against real data in
CI."""

from __future__ import annotations

from snowalert_spark.functions import dedup as D
from snowalert_spark.tables import table

SF_DIR = "/root/testdata/sf0.01"


def _pairs(df):
    return {
        (r.doc_a, r.doc_b, r.jaccard) for r in df.collect()
    }


def test_prefix_path_matches_direct(spark):
    docs = table(spark, SF_DIR, "documents")
    direct = _pairs(D.ngram_jaccard_pairs(docs, 0.8, prefilter=False))
    prefix = _pairs(D.ngram_jaccard_pairs(docs, 0.8, prefilter=True))
    assert direct == prefix
    assert len(direct) > 0  # the corpus actually has near-dups


def test_prefix_path_matches_direct_low_threshold(spark):
    # T = 0.5 stresses the positional bound (longer prefixes, looser
    # length-ratio window) where an off-by-one would lose pairs
    docs = table(spark, SF_DIR, "documents")
    direct = _pairs(D.ngram_jaccard_pairs(docs, 0.5, prefilter=False))
    prefix = _pairs(D.ngram_jaccard_pairs(docs, 0.5, prefilter=True))
    assert direct == prefix
