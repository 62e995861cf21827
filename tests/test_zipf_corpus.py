"""The rich-vocabulary zipf sidecar corpus (r10 verdict item 2) and
the tokenizer-depth row built on it."""

from __future__ import annotations

import hashlib
import os

from snowalert_spark.sources import zipf_corpus as Z


def test_generator_is_deterministic(tmp_path):
    """Byte-stable regeneration: the oracle reads the same parquet the
    Spark side reads, so the generator must be seed-pure."""
    a = Z.ensure_zipf_corpus(str(tmp_path / "a"))
    b = Z.ensure_zipf_corpus(str(tmp_path / "b"))
    ha = hashlib.md5(
        open(os.path.join(a, "documents.parquet"), "rb").read()
    ).hexdigest()
    hb = hashlib.md5(
        open(os.path.join(b, "documents.parquet"), "rb").read()
    ).hexdigest()
    assert ha == hb


def test_vocabulary_floor_and_structure():
    rows = Z.generate_zipf_documents(n_docs=12000)
    words = set()
    for _, text, _, _, n_chars in rows[:2000]:
        words.update(text.split(" "))
    # the enumeration interleave guarantees every type appears across
    # ALL docs; 2000 docs already show a deep vocabulary
    assert len(words) > 10_000
    all_words = set()
    for _, text, _, _, _ in rows:
        all_words.update(text.split(" "))
    assert len(all_words) >= 50_000, "distinct-word floor regressed"


def test_zipf_subset_trains_128_real_merges(spark):
    from snowalert_spark.functions import bpe as B
    from snowalert_spark.workload.textops import ZIPF_ORACLE_DOCS

    import pyspark.sql.functions as F

    path = Z.ensure_zipf_corpus()
    d = spark.read.parquet(f"{path}/documents.parquet").filter(
        F.col("doc_id") < ZIPF_ORACLE_DOCS
    )
    merges = B.bpe_train_auto(d, 128)
    assert len(merges) == 128  # no vocabulary exhaustion: all REAL
    # counts strictly positive and ranks contiguous
    assert [m[0] for m in merges] == list(range(1, 129))
    assert all(m[3] >= 2 for m in merges)
