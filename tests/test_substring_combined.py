"""dedupe_substrings (r12): the combined spans-report + removal
operator must be bit-identical to the column union of its two
single-purpose halves — same hits, same span merge, same keep-one
excision — while computing everything off ONE fingerprint exchange.

Pins:
1. column-union equality vs repeated_substring_spans ⋈
   remove_repeated_substrings on planted-repeat corpora (misaligned
   offsets + exactly-window repeats), under plain AND prefilter modes;
2. docs with no repeats pass through untouched (zero stats, identical
   clean_text);
3. plan shape: the combined row performs exactly ONE corpus-chars
   fingerprint expansion (the separate operators perform one each),
   counted via the distinct explode/generate nodes in the plan.
"""

from __future__ import annotations

import random

from snowalert_spark.functions import dedup as DD

from test_substring_prefilter import _corpus, _mkdocs, _rand_text

L = 40


def _expected(spark, d, **kw):
    spans = {
        r["doc_id"]: r
        for r in DD.repeated_substring_spans(d, **kw).collect()
    }
    removal = {
        r["doc_id"]: r
        for r in DD.remove_repeated_substrings(d, **kw).collect()
    }
    out = {}
    for doc_id, s in spans.items():
        r = removal[doc_id]
        out[doc_id] = (
            r["clean_text"],
            s["n_dup_windows"],
            s["n_spans"],
            s["dup_chars"],
            s["dup_frac"],
            r["removed_chars"],
            r["n_removed_windows"],
        )
    return out


def _got(d, **kw):
    return {
        r["doc_id"]: (
            r["clean_text"],
            r["n_dup_windows"],
            r["n_spans"],
            r["dup_chars"],
            r["dup_frac"],
            r["removed_chars"],
            r["n_removed_windows"],
        )
        for r in DD.dedupe_substrings(d, **kw).collect()
    }


def test_combined_equals_union_of_halves(spark):
    for seed in (1, 5, 9):
        d = _mkdocs(spark, _corpus(seed))
        want = _expected(spark, d, prefilter=False)
        got = _got(d, prefilter=False)
        assert got == want, f"combined diverged from halves (seed {seed})"


def test_combined_identical_under_prefilter_modes(spark):
    d = _mkdocs(spark, _corpus(3))
    plain = _got(d, prefilter=False)
    assert _got(d, prefilter=True) == plain
    assert _got(d, prefilter="auto") == plain


def test_no_repeat_docs_pass_through(spark):
    rng = random.Random(77)
    # distinct random docs, no planted repeats; collisions of 40-char
    # windows over a 9-letter alphabet are effectively impossible
    rows = [(i, _rand_text(rng, rng.randrange(50, 200))) for i in range(12)]
    d = _mkdocs(spark, rows)
    got = _got(d)
    for doc_id, text in rows:
        assert got[doc_id] == (text, 0, 0, 0, 0.0, 0, 0)


def test_half_the_fingerprint_expansions_in_plan(spark):
    """The whole point: half the corpus-chars expansions. Each
    operator's fingerprint stream has two consumers (per-hash totals +
    position probe) and Catalyst dedups exchanges, not arbitrary
    subtrees, so one operator plans 2 Generate(explode) of the
    fingerprint stream and running both halves plans 4. The combined
    operator must plan exactly 2 — the shared-stream saving this row
    exists for (prefilter=False so only the stride-1 stream
    generates)."""
    d = _mkdocs(spark, _corpus(2))

    def n_gen(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return plan.count("Generate explode")

    combined = n_gen(DD.dedupe_substrings(d, prefilter=False))
    halves = n_gen(DD.repeated_substring_spans(d, prefilter=False)) + n_gen(
        DD.remove_repeated_substrings(d, prefilter=False)
    )
    assert combined == 2, f"expected 2 fingerprint expansions, got {combined}"
    assert halves == 4, f"expected the halves to plan 4, got {halves}"
