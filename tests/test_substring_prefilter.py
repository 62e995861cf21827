"""Substring-dedup r11 upgrades, pinned:

1. winnowing prefilter (phase-1 stride cut): output of spans/removal
   with ``prefilter=True`` is bit-identical on planted-repeat corpora,
   including repeats at MISALIGNED offsets and at exactly the window
   length (the case a position-strided sample provably misses);
2. hot-key cap (r13 adaptive form): with ONE fingerprint covering
   ~50% of the corpus, the per-hash totals partial-aggregate map-side
   off the un-repartitioned stream (the hot key collapses to one row
   per input partition before any shuffle; the old static (h, salt)
   repartition is gone) — and outputs equal a brute-force python
   reference;
3. the two-level count + first-occurrence rule is semantics-preserving
   (removal keeps exactly the globally-first occurrence).
"""

from __future__ import annotations

import hashlib
import random

from snowalert_spark.functions import dedup as DD

L = 40


def _brute_spans(rows: list[tuple[int, str]], window=L, min_count=2):
    counts: dict[str, int] = {}
    for _, t in rows:
        for i in range(len(t) - window + 1):
            h = hashlib.md5(t[i : i + window].encode()).hexdigest()
            counts[h] = counts.get(h, 0) + 1
    out = {}
    for doc_id, t in rows:
        hits = [
            i + 1
            for i in range(len(t) - window + 1)
            if counts[hashlib.md5(t[i : i + window].encode()).hexdigest()]
            >= min_count
        ]
        n_spans = covered = 0
        cur_end = -2
        for p in hits:
            if p > cur_end + 1:
                n_spans += 1
                covered += window
            else:
                covered += p + window - 1 - cur_end
            cur_end = p + window - 1
        out[doc_id] = (len(hits), n_spans, covered)
    return out


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefgh ") for _ in range(n))


def _corpus(seed):
    rng = random.Random(seed)
    rows = []
    shared = _rand_text(rng, L + rng.randrange(0, 30))  # >= window repeat
    exact = _rand_text(rng, L)  # exactly-window repeat
    for i in range(24):
        t = _rand_text(rng, rng.randrange(30, 220))
        if i % 4 == 0:
            # misaligned offsets: insert at a random position
            p = rng.randrange(0, max(1, len(t)))
            t = t[:p] + shared + t[p:]
        if i % 7 == 0:
            p = rng.randrange(0, max(1, len(t)))
            t = t[:p] + exact + t[p:]
        rows.append((i, t))
    return rows


def test_prefilter_identical_on_planted_corpora(spark):
    for seed in (1, 2, 3):
        d = _mkdocs(spark, _corpus(seed))
        plain = sorted(
            map(tuple, DD.repeated_substring_spans(d, prefilter=False).collect())
        )
        pre = sorted(
            map(
                tuple,
                DD.repeated_substring_spans(d, prefilter=True).collect(),
            )
        )
        assert plain == pre, f"spans diverged under prefilter (seed {seed})"
        auto = sorted(
            map(tuple, DD.repeated_substring_spans(d, prefilter="auto").collect())
        )
        assert plain == auto, f"spans diverged under auto (seed {seed})"
        plain_r = sorted(
            map(tuple, DD.remove_repeated_substrings(d, prefilter=False).collect())
        )
        pre_r = sorted(
            map(
                tuple,
                DD.remove_repeated_substrings(d, prefilter=True).collect(),
            )
        )
        assert plain_r == pre_r, f"removal diverged (seed {seed})"


def test_spans_match_brute_force_reference(spark):
    rows = _corpus(11)
    want = _brute_spans(rows)
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["n_spans"], r["dup_chars"])
        for r in DD.repeated_substring_spans(_mkdocs(spark, rows)).collect()
    }
    assert got == want


def test_winnow_hits_cover_exact_window_repeats(spark):
    """A repeat of length EXACTLY `window` at misaligned offsets (the
    winnowing guarantee threshold, where stride sampling fails) must
    flag both docs; a unique-content doc must not be required."""
    rng = random.Random(5)
    exact = _rand_text(rng, L)
    rows = [
        (1, _rand_text(rng, 50) + exact + _rand_text(rng, 37)),
        (2, _rand_text(rng, 63) + exact + _rand_text(rng, 20)),
        (3, _rand_text(rng, 150)),
    ]
    hits = {
        r["doc_id"]
        for r in DD.winnow_hit_docs(_mkdocs(spark, rows), L).collect()
    }
    assert {1, 2} <= hits


def test_hot_key_counts_collapse_mapside(spark):
    """One fingerprint = ~50% of the corpus: the per-hash totals must
    PARTIAL-aggregate map-side straight off the fingerprint stream —
    the r13 adaptive replacement for the old static (h, salt)
    repartition (which shuffled the whole expanded stream twice only
    to feed a broadcast join and a partitioning-indifferent
    aggregate). The hot key collapses to one row per input partition
    before the only shuffle, and the span output must still match the
    brute-force reference."""
    rng = random.Random(7)
    boiler = _rand_text(rng, L)  # the hot window, repeated everywhere
    rows = [(i, boiler + _rand_text(rng, L)) for i in range(300)]
    d = _mkdocs(spark, rows)
    df = DD.repeated_substring_spans(d, prefilter=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, "totals must map-side combine"
    assert "salt" not in plan, "static salting must stay gone"
    want = _brute_spans(rows)
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["n_spans"], r["dup_chars"])
        for r in DD.repeated_substring_spans(d).collect()
    }
    assert got == want


def test_removal_keeps_globally_first_occurrence(spark):
    """The keep-one rule is min (doc_id, pos): doc 1 keeps its copy,
    doc 2's is excised — exactly the previous rank-1 semantics."""
    rng = random.Random(9)
    shared = _rand_text(rng, L)
    rows = [(1, shared + "x"), (2, "yz" + shared)]
    got = {
        r["doc_id"]: (r["clean_text"], r["removed_chars"])
        for r in DD.remove_repeated_substrings(_mkdocs(spark, rows)).collect()
    }
    assert got[1] == (shared + "x", 0)
    assert got[2] == ("yz", L)


def test_auto_mode_restricts_sparse_corpus(spark):
    """r11 verdict item 4: auto mode measures phase 1's hit fraction
    and restricts phase 2 only in the sparse regime. A 100-doc corpus
    with ONE duplicated pair is far under the 0.2 ceiling."""
    rng = random.Random(13)
    shared = _rand_text(rng, L + 5)
    rows = [(i, _rand_text(rng, 180)) for i in range(98)]
    rows += [(98, "a" + shared + "b"), (99, "cd" + shared)]
    d = _mkdocs(spark, rows)
    scan, used, frac = DD._resolve_substring_scan(
        d, L, "doc_id", "text", "auto"
    )
    assert used is True
    assert frac is not None and frac <= DD.SUBSTR_PREFILTER_MAX_HIT_FRAC
    # the restricted scan holds only the flagged docs
    assert scan.count() < len(rows)
    # and the operator output through auto still matches brute force
    want = _brute_spans(rows)
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["n_spans"], r["dup_chars"])
        for r in DD.repeated_substring_spans(d, prefilter="auto").collect()
    }
    assert got == want


def test_auto_mode_falls_through_dense_corpus(spark):
    """Every doc shares one boilerplate window (hit_frac 1.0 — above
    SUBSTR_RESTRICT_MAX_HIT_FRAC): restriction would skip nothing, so
    auto must run the plain path with phase 1 as the only overhead."""
    rng = random.Random(17)
    boiler = _rand_text(rng, L)
    rows = [(i, boiler + _rand_text(rng, 60)) for i in range(50)]
    d = _mkdocs(spark, rows)
    scan, used, frac = DD._resolve_substring_scan(
        d, L, "doc_id", "text", "auto"
    )
    assert used is False
    assert frac is not None and frac > DD.SUBSTR_RESTRICT_MAX_HIT_FRAC
    assert scan is d  # the plain path, phase 1 was the only overhead
    want = _brute_spans(rows)
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["n_spans"], r["dup_chars"])
        for r in DD.repeated_substring_spans(d, prefilter="auto").collect()
    }
    assert got == want


def test_auto_mode_restricts_mid_density_after_sunk_phase1(spark):
    """r12 sunk-cost rule: once the full phase 1 has run, a
    mid-density corpus (hit_frac ~0.5 — above the old 0.2 sampled
    ceiling, below SUBSTR_RESTRICT_MAX_HIT_FRAC) must RESTRICT phase 2
    to hit docs: each skipped doc is skipped in both materializations
    of the salted exchange, so restriction strictly beats the old
    fall-through-to-plain (which paid full phase 1 AND full phase 2)."""
    rng = random.Random(41)
    boiler = _rand_text(rng, L)
    rows = [
        (i, (boiler if i % 2 == 0 else "") + _rand_text(rng, 80))
        for i in range(50)
    ]
    d = _mkdocs(spark, rows)
    scan, used, frac = DD._resolve_substring_scan(
        d, L, "doc_id", "text", "auto"
    )
    assert used is True
    assert frac is not None
    assert DD.SUBSTR_PREFILTER_MAX_HIT_FRAC < frac <= DD.SUBSTR_RESTRICT_MAX_HIT_FRAC
    assert scan is not d  # the hit-doc restriction is in the plan
    want = _brute_spans(rows)
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["n_spans"], r["dup_chars"])
        for r in DD.repeated_substring_spans(d, prefilter="auto").collect()
    }
    assert got == want


def test_auto_mode_empty_corpus(spark):
    d = _mkdocs(spark, [])
    scan, used, frac = DD._resolve_substring_scan(
        d, L, "doc_id", "text", "auto"
    )
    assert used is False and frac == 0.0
    assert DD.repeated_substring_spans(d, prefilter="auto").count() == 0


def test_auto_mode_sampled_dense_fast_path(spark, monkeypatch):
    """Corpora bigger than the probe size get a sampled winnow first;
    a dense sample verdict (sound: sampling never overestimates the
    hit fraction) must skip the full phase-1 scan. Since r13 the full
    winnow PLAN is constructed up front for the pool-first lookup
    (construction is lazy and free), so the pin is on execution: the
    dense verdict must return without persisting a hit-id table (the
    persist's eager count is where the full scan is paid)."""
    rng = random.Random(23)
    boiler = _rand_text(rng, L)
    rows = [(i, boiler + _rand_text(rng, 60)) for i in range(60)]
    d = _mkdocs(spark, rows)
    monkeypatch.setattr(DD, "SUBSTR_PREFILTER_PROBE_DOCS", 20)
    calls = []
    real = DD.winnow_hit_docs

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(DD, "winnow_hit_docs", counting)
    pool_before = len(DD._HIT_ID_CACHE_POOL)
    scan, used, frac = DD._resolve_substring_scan(
        d, L, "doc_id", "text", "auto"
    )
    assert used is False and scan is d
    assert frac is not None and frac > DD.SUBSTR_PREFILTER_MAX_HIT_FRAC
    # at most the sample winnow + the lazy lookup plan — and no pool
    # persist, i.e. the full phase-1 scan never ran
    assert len(calls) <= 2, "dense sample verdict must skip full phase 1"
    assert len(DD._HIT_ID_CACHE_POOL) == pool_before, (
        "dense sample verdict must not persist a full hit-id table"
    )


def test_auto_mode_sampled_sparse_falls_to_exact(spark, monkeypatch):
    """A sparse sample verdict is only a maybe — the exact full
    phase 1 must still run and make the restriction decision."""
    rng = random.Random(29)
    shared = _rand_text(rng, L + 3)
    rows = [(i, _rand_text(rng, 150)) for i in range(58)]
    rows += [(58, shared + "q"), (59, "rr" + shared)]
    d = _mkdocs(spark, rows)
    monkeypatch.setattr(DD, "SUBSTR_PREFILTER_PROBE_DOCS", 20)
    calls = []
    real = DD.winnow_hit_docs

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(DD, "winnow_hit_docs", counting)
    scan, used, frac = DD._resolve_substring_scan(
        d, L, "doc_id", "text", "auto"
    )
    assert used is True
    assert frac == 2 / 60
    assert len(calls) == 2, "sparse sample must fall through to exact"
    want = _brute_spans(rows)
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["n_spans"], r["dup_chars"])
        for r in DD.repeated_substring_spans(d, prefilter="auto").collect()
    }
    assert got == want
