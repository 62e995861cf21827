"""Round-13 advice fixes, pinned:

1. the winnowing prefilter's persisted hit-id tables live in a BOUNDED
   pool (r12 advice: the persist leaked on the auto-restrict and
   forced paths — MEMORY_AND_DISK blocks are reclaimed only by
   unpersist or session end, so a long-lived session accumulated one
   cached table per substring-operator call);
2. the auto fall-through path removes its handle from the pool when it
   unpersists (no stale slot);
3. ``substring_fingerprint_counts`` stamps its build ``window`` into
   the table and ``cross_snapshot_substring_removal`` refuses a
   mismatched or malformed ``base_counts`` (r12 advice: a mismatched
   window silently produced wrong cut decisions) while still accepting
   a legacy un-stamped table;
4. the streaming-throughput probe streams ALL table rows — the
   ``n % ticks`` remainder lands in the last tick file and the sidecar
   records ``rows_total`` (r12 advice: it was silently dropped).
"""

from __future__ import annotations

import json
import os
import random

import pytest

from snowalert_spark.functions import dedup as DD

from test_substring_prefilter import _corpus, _mkdocs, _rand_text

L = 40


def _drain_pool():
    DD.release_substring_caches()
    assert DD._HIT_ID_CACHE_POOL == []


def test_hit_id_cache_pool_is_bounded(spark):
    _drain_pool()
    for seed in (3, 5, 7, 11):
        DD.repeated_substring_spans(
            _mkdocs(spark, _corpus(seed)), window=L, prefilter=True
        ).count()
    assert len(DD._HIT_ID_CACHE_POOL) == DD.SUBSTR_HIT_CACHE_SLOTS
    # the overflow handles were actually unpersisted, the pool's kept
    # handles are still cached
    for _, df in DD._HIT_ID_CACHE_POOL:
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
    released = DD.release_substring_caches()
    assert released == DD.SUBSTR_HIT_CACHE_SLOTS
    assert DD._HIT_ID_CACHE_POOL == []


def test_pool_reuses_shared_plan_entry(spark):
    """r13 regression pin: Spark's CacheManager keys cache entries by
    CANONICALIZED plan, so repeated calls over the SAME corpus share
    one cache entry. The pool must dedup those calls onto one slot —
    the naive append-and-evict unpersisted the shared entry out from
    under the newest query the moment the pool first overflowed
    (benched at 5 s -> 16 s per call), and a same-plan call must
    never consume a second slot."""
    _drain_pool()
    docs = _mkdocs(spark, _corpus(3))
    other = _mkdocs(spark, _corpus(5))
    for _ in range(4):  # > SUBSTR_HIT_CACHE_SLOTS calls, same corpus
        DD.repeated_substring_spans(docs, window=L, prefilter=True).count()
    assert len(DD._HIT_ID_CACHE_POOL) == 1  # one slot, refreshed
    plan0, df0 = DD._HIT_ID_CACHE_POOL[0]
    assert df0.storageLevel.useMemory or df0.storageLevel.useDisk
    # a different corpus takes its own slot; the shared one survives
    DD.repeated_substring_spans(other, window=L, prefilter=True).count()
    assert len(DD._HIT_ID_CACHE_POOL) == 2
    assert DD._HIT_ID_CACHE_POOL[1][1] is not df0
    assert df0.storageLevel.useMemory or df0.storageLevel.useDisk
    _drain_pool()


def test_auto_fallthrough_leaves_no_stale_slot(spark):
    """A corpus so dense that auto mode falls through to the plain path
    (hit_frac > SUBSTR_RESTRICT_MAX_HIT_FRAC) must unpersist AND
    remove its handle — the pool is unchanged afterwards."""
    _drain_pool()
    rng = random.Random(23)
    shared = _rand_text(rng, L)
    rows = [(i, shared + _rand_text(rng, 5)) for i in range(12)]
    scan, used, frac = DD._resolve_substring_scan(
        _mkdocs(spark, rows), L, "doc_id", "text", "auto"
    )
    assert used is False and frac is not None and frac > 0.9
    assert DD._HIT_ID_CACHE_POOL == []


def test_base_counts_window_stamp_and_validation(spark):
    rng = random.Random(31)
    shared = _rand_text(rng, L + 5)
    base = _mkdocs(spark, [(1, shared + _rand_text(rng, 30))])
    new = _mkdocs(spark, [(100, _rand_text(rng, 20) + shared)])

    counts = DD.substring_fingerprint_counts(base, window=L)
    assert "window" in counts.columns
    assert counts.select("window").distinct().collect()[0][0] == L

    # stamped + matching: accepted, bit-identical to the base_docs path
    via_counts = DD.cross_snapshot_substring_removal(
        new, base_counts=counts, window=L
    ).collect()
    via_docs = DD.cross_snapshot_substring_removal(
        new, base_docs=base, window=L
    ).collect()
    assert via_counts == via_docs

    # mismatched window: refused loudly
    wrong = DD.substring_fingerprint_counts(base, window=L - 10)
    with pytest.raises(ValueError, match="window=30.*window=40"):
        DD.cross_snapshot_substring_removal(new, base_counts=wrong, window=L)

    # legacy un-stamped table (pre-r13): still accepted
    legacy = counts.drop("window")
    via_legacy = DD.cross_snapshot_substring_removal(
        new, base_counts=legacy, window=L
    ).collect()
    assert via_legacy == via_docs

    # malformed schema: refused loudly
    with pytest.raises(ValueError, match="n_base"):
        DD.cross_snapshot_substring_removal(
            new, base_counts=counts.withColumnRenamed("n_base", "n"), window=L
        )
    with pytest.raises(ValueError, match="struct"):
        DD.cross_snapshot_substring_removal(
            new,
            base_counts=counts.selectExpr("h.a AS h", "n_base"),
            window=L,
        )


def test_probe_streams_remainder_rows(spark, tmp_path, monkeypatch):
    """probe_tier with n=10, ticks=3 writes tick files of 3/3/4 rows
    (remainder in the LAST tick) and reports rows_total."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import probe_streaming_throughput as P

    def rows():
        for i in range(10):
            yield {"doc_id": i, "text": "x"}

    def fake_run(spark_, tmp):
        # stand-in ingest: land one parquet row so the survivors read works
        spark_.range(1).write.mode("overwrite").parquet(f"{tmp}/out")

    out = P.probe_tier(spark, "fake", 10, rows, fake_run, 3)
    assert out["rows_total"] == 10
    assert out["rows_per_tick"] == 3


def test_probe_tick_files_carry_remainder(tmp_path):
    """The tick-file writer itself: last file holds per + n % ticks."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import inspect

    import probe_streaming_throughput as P

    src = inspect.getsource(P.probe_tier)
    assert "n % ticks" in src  # the remainder reaches the last tick

    # and end-to-end: count lines written per tick through probe_tier's
    # own loop by intercepting the run callable
    seen = []

    class SparkStub:
        def range(self, n):
            raise AssertionError("unused")

    def rows():
        for i in range(10):
            yield {"i": i}

    def run(spark_, tmp):
        files = sorted(os.listdir(f"{tmp}/src"))
        seen.append(
            [sum(1 for _ in open(f"{tmp}/src/{f}")) for f in files]
        )
        if len(seen) == 3:  # last tick: make the survivors read succeed
            os.makedirs(f"{tmp}/out", exist_ok=True)

    class FakeRead:
        def parquet(self, p):
            class C:
                def count(self):
                    return 0

            return C()

    class FakeSpark:
        read = FakeRead()

    P.probe_tier(FakeSpark(), "fake2", 10, rows, run, 3)
    assert seen[-1] == [3, 3, 4]
