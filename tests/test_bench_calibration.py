"""The bench harness's interleaved calibration sampler (r9 verdict
item 4): samples must interleave with the measured queries at the
documented cadence, the divisor must be the floor (min — host-noise
outliers are always slow, never fast), and the artifact must expose
per-position samples + dispersion so a mid-sweep noise burst is
localizable instead of poisoning a bracket."""

from __future__ import annotations

import bench


def test_interleaved_sampling_cadence(monkeypatch):
    vals = iter([9.9] + [round(1.5 + 0.01 * i, 4) for i in range(50)])
    monkeypatch.setattr(bench, "_calibration_once", lambda spark: next(vals))
    cal = bench._Calibration(spark=None, n_queries=64)  # every = 8
    assert cal.positions == [0]  # warm-up discarded, opening sample kept
    for q in range(1, 25):
        cal.tick(q)
    # one sample after queries 8, 16, 24
    assert cal.positions == [0, 8, 16, 24]
    cal.sample(25)  # closing sample
    rep = cal.report()
    assert rep["spec"] == bench.CALIBRATION_SPEC
    assert rep["floor"] == min(rep["samples"]) == 1.5  # 9.9 warm-up excluded
    assert rep["median"] == sorted(rep["samples"])[len(rep["samples"]) // 2]
    assert rep["dispersion_max_over_min"] == round(
        max(rep["samples"]) / rep["floor"], 3
    )
    assert len(rep["samples"]) == len(rep["positions"]) == 5


def test_outlier_slows_dispersion_not_floor(monkeypatch):
    """A 10x host-noise outlier mid-sweep (the r9 failure mode) must
    surface in the dispersion report without moving the floor the
    normalized totals divide by."""
    # warm-up, opening sample, 3 ticks (every=1), closing sample
    vals = iter([2.0, 1.5, 14.8, 1.6, 1.55, 1.58])
    monkeypatch.setattr(bench, "_calibration_once", lambda spark: next(vals))
    cal = bench._Calibration(spark=None, n_queries=8)  # every = 1
    for q in range(1, 4):
        cal.tick(q)
    cal.sample(4)
    rep = cal.report()
    assert rep["floor"] == 1.5
    assert rep["dispersion_max_over_min"] == round(14.8 / 1.5, 3)
    assert 14.8 in rep["samples"] and rep["positions"][1] == 1
