"""Round-10 advice fixes, each pinned by a test:

1. the conditions making bpe_encode_1k's 128-round oracle exact are
   explicit ``raise ValueError``s, not bare asserts (asserts vanish
   under ``python -O`` and the row would silently drift on a richer
   corpus instead of failing loudly);
2. landing re-registration unpersists the superseded cached snapshot
   (``replace_cached_view``) so per-tick collector runs don't pin every
   old relation in the CacheManager until session end;
3. resuming a stream over a pre-r10 flat-layout state_dir fails with a
   clear migration message instead of Spark's opaque 'conflicting
   directory structures' partition-discovery error;
4. ``register_sql_functions``' session memo flag is lock-guarded
   (reached concurrently from packs.execute_concurrent's thread pool).
"""

from __future__ import annotations

import os
import threading

import pytest

from snowalert_spark.sources.collect import replace_cached_view


def test_bpe_rows_raise_not_assert(spark, monkeypatch):
    """Below BPE_FOLD_MAX both rows must raise (the vocab-join path
    would go unexercised) — explicit ValueError, so `python -O`
    cannot strip the guard. The r11 rich-corpus raise is GONE (r12:
    bpe_encode_1k is corpus-adaptive and must RUN on a vocabulary-rich
    corpus — tests/test_bpe_budget_oracle.py owns that check)."""
    from snowalert_spark.functions import bpe as B
    from snowalert_spark.workload import textops

    poor = [("a", "b")]
    monkeypatch.setattr(B, "trained_merges", lambda *a, **k: poor)
    with pytest.raises(ValueError, match="vocab-join"):
        textops.bpe_encode_1k(spark, "/root/testdata/sf0.001")
    with pytest.raises(ValueError, match="vocab-join"):
        textops.bpe_encode_128(spark, "/root/testdata/sf0.001")


def test_replace_cached_view_unpersists_old(spark):
    df1 = spark.range(5).cache()
    replace_cached_view(spark, df1, "advice_r11_landing")
    assert spark.catalog.isCached("advice_r11_landing")

    df2 = spark.range(7).cache()
    replace_cached_view(spark, df2, "advice_r11_landing")
    try:
        # the new snapshot serves the view; the old one left the cache
        assert spark.table("advice_r11_landing").count() == 7
        assert spark.catalog.isCached("advice_r11_landing")
        assert df1.storageLevel.useMemory is False, (
            "superseded landing snapshot still pinned in the CacheManager"
        )
        assert df2.storageLevel.useMemory is True
    finally:
        df2.unpersist()
        spark.catalog.dropTempView("advice_r11_landing")


def test_legacy_flat_state_dir_rejected(spark, tmp_path):
    from snowalert_spark.streaming import _read_batched_state

    state = tmp_path / "base_shingles"
    state.mkdir()
    # pre-r10 layout: appended root-level part files (+ _SUCCESS)
    (state / "part-00000-deadbeef.snappy.parquet").write_bytes(b"")
    (state / "_SUCCESS").write_bytes(b"")
    with pytest.raises(ValueError, match="legacy flat-layout"):
        _read_batched_state(
            spark, str(state), "doc_id long, batch_id long", 3, None
        )

    # the partitioned layout (plus harmless _/. entries) still reads
    os.remove(state / "part-00000-deadbeef.snappy.parquet")
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(
        str(state / "batch_id=1")
    )
    got = _read_batched_state(
        spark, str(state), "doc_id long, batch_id long", 3, None
    )
    assert got.count() == 1


def test_register_sql_functions_threadsafe(spark):
    from snowalert_spark.functions.variant import register_sql_functions

    if hasattr(spark, "_sa_sql_functions_registered"):
        del spark._sa_sql_functions_registered
    errs: list[Exception] = []

    def go():
        try:
            register_sql_functions(spark)
        except Exception as e:  # pragma: no cover - failure capture
            errs.append(e)

    threads = [threading.Thread(target=go) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert spark._sa_sql_functions_registered is True
    one = spark.sql(
        "SELECT sa_rflatten('{\"a\": 1}') AS r"
    ).collect()[0]["r"]
    assert one and one[0]["path"] == "a"
