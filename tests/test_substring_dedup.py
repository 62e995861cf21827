"""Substring-level dedup (Lee et al. arXiv:2107.06499 shape):
repeated_substring_spans must flag exactly the characters covered by
corpus-repeated substrings >= the window length, with spans merged
per doc. The DuckDB hash-match oracle runs in tests/test_oracle.py
(LOCAL_ONLY replica); here: planted-repeat coverage, the window
granularity boundary, intra-doc repeats, and short-doc behavior.
"""

from __future__ import annotations

import string

from snowalert_spark.functions.dedup import repeated_substring_spans

L = 40


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(tag: str, n: int) -> str:
    """Deterministic filler that never repeats a 40-char window across
    calls with distinct tags: every 8-char block carries the tag and a
    running index."""
    out = []
    i = 0
    while sum(map(len, out)) < n:
        out.append(f"<{tag}:{i:04d}>")
        i += 1
    return "".join(out)[:n]


def _rows(df):
    return {r.doc_id: r for r in df.collect()}


def test_planted_cross_doc_repeat(spark):
    # doc-distinct guard chars pin the repeat to EXACTLY the block:
    # without them the _uniq fillers share boundary punctuation (':0'
    # before, '<' after) and the true repeated region is 65 chars —
    # which the operator correctly reports
    block = string.ascii_letters + "0123456789"  # 62 chars
    a = _uniq("a", 100) + "!" + block + "@" + _uniq("b", 100)
    b = _uniq("c", 100) + "#" + block + "$" + _uniq("d", 100)
    got = _rows(
        repeated_substring_spans(
            _docs(spark, [(1, a), (2, b), (3, _uniq("e", 260))]), window=L
        )
    )
    # 62-char shared block: windows at offsets 0..22 inside it repeat
    # -> one merged span covering exactly the 62 shared chars
    for d in (1, 2):
        assert got[d].n_spans == 1
        assert got[d].n_dup_windows == 62 - L + 1
        assert got[d].dup_chars == 62
    assert got[3].n_spans == 0 and got[3].dup_chars == 0
    assert got[3].dup_frac == 0.0


def test_below_window_granularity_not_flagged(spark):
    short_block = string.ascii_letters[: L - 1]  # 39 chars < window
    # guard chars as in the cross-doc test: without them the fillers'
    # shared boundary punctuation extends the repeat past the window
    a = _uniq("a", 80) + "!" + short_block + "@" + _uniq("b", 80)
    b = _uniq("c", 80) + "#" + short_block + "$" + _uniq("d", 80)
    got = _rows(repeated_substring_spans(_docs(spark, [(1, a), (2, b)]), window=L))
    assert got[1].n_dup_windows == 0 and got[2].n_dup_windows == 0


def test_intra_doc_repeat_two_spans(spark):
    block = string.ascii_uppercase + string.ascii_lowercase  # 52 chars
    text = (
        _uniq("a", 60) + "!" + block + "@" + _uniq("b", 60)
        + "#" + block + "$" + _uniq("c", 60)
    )
    got = _rows(repeated_substring_spans(_docs(spark, [(7, text)]), window=L))
    assert got[7].n_spans == 2
    assert got[7].dup_chars == 2 * 52
    assert got[7].n_dup_windows == 2 * (52 - L + 1)


def test_short_and_empty_docs(spark):
    got = _rows(
        repeated_substring_spans(
            _docs(spark, [(1, "tiny"), (2, ""), (3, "x" * (L - 1))]), window=L
        )
    )
    for d in (1, 2, 3):
        assert got[d].n_dup_windows == 0
        assert got[d].n_spans == 0
        assert got[d].dup_frac == 0.0


def test_exact_dup_docs_fully_covered(spark):
    text = _uniq("a", 300)
    got = _rows(repeated_substring_spans(_docs(spark, [(1, text), (2, text)]), window=L))
    for d in (1, 2):
        assert got[d].n_spans == 1
        assert got[d].dup_chars == 300
        assert got[d].dup_frac == 1.0


# --- removal form (keep the globally-first occurrence) ---------------

from snowalert_spark.functions.dedup import remove_repeated_substrings


def test_removal_keeps_first_occurrence_cross_doc(spark):
    block = string.ascii_letters + "0123456789"  # 62 chars
    a = _uniq("a", 100) + "!" + block + "@" + _uniq("b", 100)
    b = _uniq("c", 100) + "#" + block + "$" + _uniq("d", 100)
    got = _rows(
        remove_repeated_substrings(
            _docs(spark, [(1, a), (2, b), (3, _uniq("e", 260))]), window=L
        )
    )
    # doc 1 holds every window's first occurrence -> untouched
    assert got[1].clean_text == a
    assert got[1].removed_chars == 0 and got[1].n_removed_windows == 0
    # doc 2's copy of the block is excised exactly
    assert got[2].clean_text == _uniq("c", 100) + "#" + "$" + _uniq("d", 100)
    assert got[2].removed_chars == 62
    assert got[2].n_removed_windows == 62 - L + 1
    assert got[3].clean_text == _uniq("e", 260)


def test_removal_intra_doc_second_copy_cut(spark):
    block = string.ascii_uppercase + string.ascii_lowercase  # 52
    text = (
        _uniq("a", 60) + "!" + block + "@" + _uniq("b", 60)
        + "#" + block + "$" + _uniq("c", 60)
    )
    got = _rows(remove_repeated_substrings(_docs(spark, [(7, text)]), window=L))
    want = (
        _uniq("a", 60) + "!" + block + "@" + _uniq("b", 60)
        + "#" + "$" + _uniq("c", 60)
    )
    assert got[7].clean_text == want
    assert got[7].removed_chars == 52


def test_removal_identical_docs_one_survives_whole(spark):
    text = _uniq("a", 300)
    got = _rows(
        remove_repeated_substrings(_docs(spark, [(1, text), (2, text)]), window=L)
    )
    assert got[1].clean_text == text  # first occurrence of every window
    assert got[2].clean_text == ""  # full excision
    assert got[2].removed_chars == 300


def test_removal_short_docs_untouched(spark):
    got = _rows(
        remove_repeated_substrings(
            _docs(spark, [(1, "tiny"), (2, ""), (3, "x" * (L - 1))]), window=L
        )
    )
    for d in (1, 2, 3):
        assert got[d].removed_chars == 0
        assert got[d].n_removed_windows == 0
