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


def test_exact_collapse_classes_match_bruteforce(spark):
    """The r10 exact-collapse pre-pass: corpora with LARGE exact-
    duplicate hash classes (the sf10 re-upload shape that used to fill
    the disk) must emit exactly the brute-force pair set — all
    C(m,2) in-class pairs at hamming 0 plus every cross-class member
    pair at its reps' hamming — in every shape."""
    import itertools
    import random

    rng = random.Random(424242)
    hashes = {}
    mid = 0
    base_a = rng.getrandbits(64)
    base_b = base_a ^ (1 << 5) ^ (1 << 40)  # hamming 2 from class A
    base_c = rng.getrandbits(64)  # far from both
    for h, members in ((base_a, 9), (base_b, 7), (base_c, 5)):
        for _ in range(members):  # exact-duplicate classes
            hashes[mid] = h
            mid += 1
    for _ in range(10):  # singletons
        hashes[mid] = rng.getrandbits(64)
        mid += 1
    rows = [
        (i, *[(h >> (8 * (7 - r))) & 0xFF for r in range(8)])
        for i, h in hashes.items()
    ]
    df = spark.createDataFrame(
        rows, "media_id long, " + ", ".join(f"band_{r} int" for r in range(8))
    )
    brute = sorted(
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    )
    # sanity: the fixture really has in-class and cross-class pairs
    assert sum(1 for *_, h in brute if h == 0) == 36 + 21 + 10
    assert sum(1 for *_, h in brute if h == 2) == 9 * 7
    for shape in ((4, 1), (6, 3), (8, 5)):
        got = sorted(
            (r.media_id, r.dup_of, r.hamming)
            for r in DD.hamming_pairs_multiblock(df, 3, *shape).collect()
        )
        assert got == brute, shape


def test_multiblock_matches_bruteforce_randomized(spark):
    """Property check: for randomized 64-bit hashes with planted
    close pairs, every (blocks, combo) shape returns EXACTLY the
    brute-force hamming<=3 pair set — candidate generation is
    recall-lossless and verify-exact, so shape can never change the
    answer."""
    import itertools
    import random

    rng = random.Random(90210)
    rows = []
    hashes = {}
    mid = 0
    for _ in range(30):
        h = rng.getrandbits(64)
        hashes[mid] = h
        mid += 1
        if rng.random() < 0.5:  # plant a close variant (<= 3 flips)
            v = h
            for _ in range(rng.randint(0, 3)):
                v ^= 1 << rng.randrange(64)
            hashes[mid] = v
            mid += 1
    for i, h in hashes.items():
        rows.append((i, *[(h >> (8 * (7 - r))) & 0xFF for r in range(8)]))
    df = spark.createDataFrame(
        rows, "media_id long, " + ", ".join(f"band_{r} int" for r in range(8))
    )
    brute = sorted(
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    )
    assert brute, "the plant generator must produce at least one pair"
    for shape in ((4, 1), (6, 3), (8, 5)):
        got = sorted(
            (r.media_id, r.dup_of, r.hamming)
            for r in DD.hamming_pairs_multiblock(df, 3, *shape).collect()
        )
        assert got == brute, shape
