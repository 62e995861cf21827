"""Concurrent-writer safety (round-7 verdict item 5): versioned
publication is a CAS-rename — two interleaved read-merge-write upserts
cannot silently lose an update or corrupt the table. One wins; the
other raises ConcurrentWriteError with its temp output removed.
"""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F
import pytest

from snowalert_spark.store import ConcurrentWriteError, ResultsStore
from snowalert_spark.store_partitioned import PartitionedResultsStore


def _violation(spark, vid, suppressed=None, t=None):
    t = t or dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [("{}", vid, t, None, suppressed, None)],
        "result string, id string, alert_time timestamp, ticket string, "
        "suppressed boolean, suppression_rule string",
    )


def _no_inflight(base):
    leftovers = []
    for root, dirs, _ in os.walk(base):
        leftovers += [d for d in dirs if d.startswith(".inflight")]
    return leftovers == []


def test_interleaved_upserts_one_wins_one_fails(spark, tmp_path):
    base = str(tmp_path / "results")
    a, b = ResultsStore(spark, base), ResultsStore(spark, base)
    a.upsert("violations", _violation(spark, "seed"), on=["id"])

    # interleave: while A's merge is between read and publish, B runs a
    # full merge to completion — A must CAS-fail, not clobber B's write
    orig = a.overwrite
    fired = []

    def racing_overwrite(table, df, expect_version=None):
        if not fired:
            fired.append(True)
            b.upsert("violations", _violation(spark, "from_b"), on=["id"])
        return orig(table, df, expect_version=expect_version)

    a.overwrite = racing_overwrite
    with pytest.raises(ConcurrentWriteError):
        a.upsert("violations", _violation(spark, "from_a"), on=["id"])

    ids = sorted(r.id for r in a.read("violations").collect())
    assert ids == ["from_b", "seed"]  # B's merge intact, A's discarded
    assert _no_inflight(base)


def test_blind_overwrite_version_race(spark, tmp_path):
    """Two overwrites racing the same version slot: the loser's rename
    hits the winner's non-empty v-dir and fails cleanly."""
    base = str(tmp_path / "results")
    a, b = ResultsStore(spark, base), ResultsStore(spark, base)
    a.overwrite("violations", _violation(spark, "x"))

    orig = a.overwrite
    fired = []

    def racing(table, df, expect_version=None):
        if not fired:
            fired.append(True)
            b.overwrite("violations", _violation(spark, "b_won"))
        return orig(table, df, expect_version=expect_version)

    a.overwrite = racing
    with pytest.raises(ConcurrentWriteError):
        # expect_version pins A to the version it believes is current
        a.overwrite("violations", _violation(spark, "a_lost"), expect_version=0)
    assert [r.id for r in a.read("violations").collect()] == ["b_won"]
    assert _no_inflight(base)


def test_partitioned_interleaved_upserts(spark, tmp_path):
    base = str(tmp_path / "alerts")
    a = PartitionedResultsStore(spark, base)
    b = PartitionedResultsStore(spark, base)
    t = dt.datetime(2024, 3, 1, 12)

    def frame(vid, suppressed=None):
        return _violation(spark, vid, suppressed=suppressed, t=t)

    a.append("violations", frame("seed"))

    on = lambda tgt, src: F.col("id") == F.col("src_id")
    orig = a._publish
    fired = []

    def racing_publish(table, date, df, expect_version=None):
        if not fired:
            fired.append(True)
            b.upsert("violations", frame("from_b"), on=on)
        return orig(table, date, df, expect_version=expect_version)

    a._publish = racing_publish
    with pytest.raises(ConcurrentWriteError):
        a.upsert("violations", frame("from_a"), on=on)

    ids = sorted(r.id for r in a.read("violations").collect())
    assert ids == ["from_b", "seed"]
    assert _no_inflight(base)


def test_rerun_after_conflict_succeeds(spark, tmp_path):
    """The documented recovery: the losing merge re-runs on top of the
    winner's state and lands."""
    base = str(tmp_path / "results")
    a, b = ResultsStore(spark, base), ResultsStore(spark, base)
    a.upsert("violations", _violation(spark, "seed"), on=["id"])

    orig = a.overwrite
    fired = []

    def racing(table, df, expect_version=None):
        if not fired:
            fired.append(True)
            b.upsert("violations", _violation(spark, "from_b"), on=["id"])
        return orig(table, df, expect_version=expect_version)

    a.overwrite = racing
    with pytest.raises(ConcurrentWriteError):
        a.upsert("violations", _violation(spark, "from_a"), on=["id"])
    a.overwrite = orig  # retry without the race
    n = a.upsert("violations", _violation(spark, "from_a"), on=["id"])
    assert n["inserted"] == 1
    ids = sorted(r.id for r in a.read("violations").collect())
    assert ids == ["from_a", "from_b", "seed"]
