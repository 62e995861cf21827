"""Ports of the last three R baseline modules (login,
violations_linear_prediction, violations_closeout_date) — deterministic
fixtures with known trends."""

from __future__ import annotations

import datetime as dt

import pytest

from snowalert_spark.runners.baselines import (
    login_baseline,
    violations_closeout_date,
    violations_daily_counts,
    violations_linear_prediction,
)

TODAY = dt.date(2024, 6, 1)
START = dt.date(2024, 5, 1)


def test_login_baseline(spark):
    rows = []
    for d in range(10):
        day = (START + dt.timedelta(days=d)).isoformat()
        # alice logs in daily, succeeds; bob every other day, half fail
        rows.append((f"{day} 09:00:00", day, 1, "Success", "alice"))
        if d % 2 == 0:
            rows.append((f"{day} 10:00:00", day, 2, "Success", "bob"))
            rows.append((f"{day} 10:05:00", day, 2, "Failed", "bob"))
    df = spark.createDataFrame(
        rows,
        "event_time string, day string, user_id int, login_status string, "
        "pivot string",
    )
    out = {r.pivot: r for r in login_baseline(df).collect()}
    assert out["alice"].num_logins == 10
    assert out["alice"].num_days == 10 and out["alice"].percent_of_days == 1.0
    assert out["alice"].average_per_day_when_active == 1.0
    assert out["bob"].num_logins == 10 and out["bob"].num_successful_logins == 5
    assert out["bob"].num_days == 5 and out["bob"].percent_of_days == 0.5
    assert out["bob"].average_per_day_overall == 0.5


@pytest.fixture()
def violations(spark):
    rows = []
    for d in range(30):
        day = START + dt.timedelta(days=d)
        # q_declining: 30 violations shrinking by one per day (with a
        # gap on day 10 that the spine must zero-fill)
        if d != 10:
            for k in range(30 - d):
                rows.append(("q_declining", "Declining rule", day, f"k{k}"))
        # q_growing: one new violation key per day, cumulative
        for k in range(d + 1):
            rows.append(("q_growing", "Growing rule", day, f"g{k}"))
    return spark.createDataFrame(
        rows, "query_id string, title string, current_day date, unique_keys string"
    )


def test_daily_counts_zero_fill(spark, violations):
    daily = violations_daily_counts(violations)
    rows = {(r.query_id, r.current_day): r.counts for r in daily.collect()}
    assert rows[("q_declining", START)] == 30
    assert rows[("q_declining", START + dt.timedelta(days=10))] == 0  # gap filled
    assert rows[("q_growing", START + dt.timedelta(days=29))] == 30
    assert len(rows) == 2 * 30


def test_linear_prediction_trends(spark, violations):
    daily = violations_daily_counts(violations)
    pred = violations_linear_prediction(daily, today=TODAY).collect()
    by_q = {}
    for r in pred:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.current_day)
        assert len(rs) == 30 + 100  # history + horizon
        assert all(r.confidence_low <= r.fitted <= r.confidence_high for r in rs)
    decl = by_q["q_declining"]
    # declining trend: the fit crosses zero within the horizon
    assert decl[0].fitted > 20 and decl[-1].fitted < 0
    grow = by_q["q_growing"]
    assert grow[-1].fitted > grow[0].fitted


def test_closeout_date(spark, violations):
    daily = violations_daily_counts(violations)
    pred = violations_linear_prediction(daily, today=TODAY)
    out = {r.query_id: r for r in violations_closeout_date(pred).collect()}
    decl = out["q_declining"]
    assert decl.unknown_end is False
    # ~30 counts declining ~1/day from May 1 → zero crossing near day 30
    assert dt.date(2024, 5, 25) <= decl.closeout_date <= dt.date(2024, 6, 10)
    grow = out["q_growing"]
    # growing trend never reaches zero: |fitted| minimal at spine start,
    # certainly not flagged as a future closeout
    assert grow.closeout_date < START + dt.timedelta(days=3)
    assert grow.title == "Growing rule"
