"""Multi-block hamming search schedule (Manku et al. WWW'07): the
scheduled shapes must produce BIT-IDENTICAL output to the gate
banding on the same corpus (the schedule only changes candidate
volume), planted recall must survive every shape, and the schedule
invariants (pigeonhole, key widths) are pinned."""

from __future__ import annotations

import pytest

from snowalert_spark.functions import dedup as DD
from snowalert_spark.functions import multimodal as M

SF = "/root/testdata/sf0.01"


def _pairs(df):
    return sorted((r[0], r[1], r[2]) for r in df.collect())


def test_schedule_invariants():
    # pigeonhole holds at every step: blocks - combo >= 3
    for n in (1, DD.MEDIA_GATE_N, DD.MEDIA_GATE_N + 1, 1 << 26, (1 << 26) + 1, 1 << 34):
        b, r = DD.hamming_block_schedule(n)
        assert b - r >= 3, (n, b, r)
    assert DD.hamming_block_schedule(DD.MEDIA_GATE_N) == (4, 1)
    assert DD.hamming_block_schedule(DD.MEDIA_GATE_N + 1) == (6, 3)
    assert DD.hamming_block_schedule((1 << 26) + 1) == (8, 5)
    # larger thresholds need wider shapes than these — refuse loudly
    with pytest.raises(ValueError, match="t=3"):
        DD.hamming_block_schedule(100, ham_t=4)
    with pytest.raises(ValueError, match="loses recall"):
        DD.hamming_pairs_multiblock(None, 4, blocks=4, combo=1)


@pytest.mark.parametrize("shape", [(6, 3), (8, 5)])
def test_scheduled_shapes_match_gate_output_image(spark, shape):
    """Image tier: (6,3) and (8,5) composite keys emit exactly the
    gate banding's verified pairs — including all 50 plants."""
    from snowalert_spark.workload.scalar import (
        DHASH_HAM_T,
        _media_with_variants,
    )

    h = M.image_dhash(_media_with_variants(spark, SF), decode="fake")
    h = h.localCheckpoint()  # hash once, compare three shapes
    gate = _pairs(DD.hamming_pairs_multiblock(h, DHASH_HAM_T, 4, 1))
    sched = _pairs(DD.hamming_pairs_multiblock(h, DHASH_HAM_T, *shape))
    assert sched == gate
    plants = {(a, b) for a, b, _ in gate if b == a + 1000000}
    assert len(plants) == 50


def test_scheduled_shape_matches_gate_output_audio(spark):
    from snowalert_spark.workload.scalar import _audio_media_with_variants

    h = M.audio_fingerprint(
        _audio_media_with_variants(spark, SF), decode="fake"
    ).localCheckpoint()
    gate = _pairs(DD.hamming_pairs_multiblock(h, M.AFP_HAM_T, 4, 1))
    sched = _pairs(DD.hamming_pairs_multiblock(h, M.AFP_HAM_T, 6, 3))
    assert sched == gate
    assert sum(1 for a, b, _ in gate if b == a + 1000000) == 17


def test_video_dedup_scheduled_end_to_end(spark, monkeypatch):
    """Force the schedule through the workload query itself (the
    count() sizing picks (6,3) once the gate ceiling drops): the
    sequence-aware near-dup output must equal the gate run's, with
    all 17 planted segment-blip variants recalled."""
    from snowalert_spark import workload

    q = workload.queries(include_local=True)["dedup_video_framehash"]
    gate_rows = sorted(tuple(r) for r in q(spark, SF).collect())
    monkeypatch.setattr(DD, "MEDIA_GATE_N", 0)
    sched_rows = sorted(tuple(r) for r in q(spark, SF).collect())
    assert sched_rows == gate_rows
    plants = [r for r in gate_rows if r[1] == r[0] + 1000000]
    assert len(plants) == 17


def test_scheduled_image_dedup_no_cartesian(spark, monkeypatch):
    """The scheduled candidate stage stays an equi-join on
    (combo, key) — never a product join of media rows."""
    from snowalert_spark import workload

    monkeypatch.setattr(DD, "MEDIA_GATE_N", 0)
    df = workload.queries(include_local=True)["dedup_image_dhash"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
