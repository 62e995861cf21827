"""Partitioned landing + freshness views: the 100 TB read path for the
pack corpus. Proves (a) the landing root partitions by day, (b) the
freshness view's partition bound reaches the FileScan as a
PartitionFilter, and (c) a verbatim pack view over the freshness view
scans only fresh partitions while returning correct results."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from snowalert_spark import packs
from snowalert_spark.rules import RuleRegistry
from snowalert_spark.sources.landing import register_landing_view, write_landing


@pytest.fixture()
def pricing_landing(spark, tmp_path):
    J = json.dumps
    now = dt.datetime.utcnow()
    rows = [
        # fresh rows: one violating, one clean
        ("t1", "sub1", "SecurityCenterFree", "typ",
         J({"pricingTier": "Free"}), now),
        ("t1", "sub2", "SecurityCenterFree", "typ",
         J({"pricingTier": "Standard"}), now),
    ] + [
        # a year of stale history that must never be scanned
        ("t1", "sub1", "SecurityCenterFree", "typ",
         J({"pricingTier": "Free"}), now - dt.timedelta(days=d))
        for d in range(30, 42)
    ]
    df = spark.createDataFrame(
        rows,
        "tenant_id string, subscription_id string, name string, type string, "
        "properties string, recorded_at timestamp",
    )
    path = str(tmp_path / "azure_collect_pricings")
    write_landing(df, path)
    return path


def test_landing_partitions_by_day(spark, pricing_landing):
    parts = [p for p in os.listdir(pricing_landing) if p.startswith("p_date=")]
    assert len(parts) == 13  # today + 12 stale days


def test_freshness_view_prunes_partitions(spark, pricing_landing):
    df = register_landing_view(
        spark, "data_azure_collect_pricings", pricing_landing, retention_days=2
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "p_date" in plan
    assert df.count() == 2  # only the fresh rows


@pytest.mark.skipif(
    not os.path.isdir(packs.PACKS_DIR), reason="reference packs dir unavailable"
)
def test_pack_view_over_partitioned_landing(spark, pricing_landing):
    register_landing_view(
        spark, "data_azure_collect_pricings", pricing_landing, retention_days=2
    )
    reg = RuleRegistry()
    packs.register_pack_rules(
        reg, f"{packs.PACKS_DIR}/cis_azure_pack.sql",
        only={"AZURE_CIS_2_1_VIOLATION_QUERY"})
    df = reg.rules["AZURE_CIS_2_1_VIOLATION_QUERY"].df(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the verbatim rule's scan carries the partition bound
    assert "PartitionFilters: [" in plan and "p_date" in plan
    rows = df.collect()
    assert len(rows) == 1
    assert json.loads(rows[0].identity)["subscription_id"] == "sub1"


def test_full_history_view_for_backfills(spark, pricing_landing):
    df = register_landing_view(
        spark, "pricings_history", pricing_landing, retention_days=None
    )
    assert df.count() == 14
