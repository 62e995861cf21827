"""Run every oracle-backed workload query against DuckDB, exactly as
the driver's correctness gate does (sf configurable; default sf0.001
for speed, set ORACLE_SF_DIR=/root/testdata/sf0.01 for the gate's SF).
"""

from __future__ import annotations

import os

import pytest

from snowalert_spark import workload
from tests.oracle_harness import compare

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = workload.queries(include_local=True)
_ORACLES = workload.oracle_sql(include_local=True)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle(spark, name):
    fn = _QUERIES[name]
    df = fn(spark, SF_DIR)
    if name not in _ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    compare(df, _ORACLES[name], SF_DIR, name)


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() >= 0
    assert set(_ORACLES) <= set(_QUERIES), "oracle without a query"
