"""bpe_encode_1k's corpus-adaptive oracle (r11 verdict item 2): the
row's body (bpe_encode_budget) must RUN on a vocabulary-rich corpus —
no guard-raise — and agree with the DuckDB training-replay oracle
parameterized by the ACTUAL trained depth.

The registered 128-round oracle stays exact on the driver corpora
(vocabulary exhausts at ~89 merges; post-exhaustion rounds are
identity — test_oracle.py covers that side). Here the zipf sidecar
slice never exhausts, so the replay must run exactly budget rounds:
a real >BPE_FOLD_MAX, >128 depth the r11 guard used to refuse. The
full 1,024-round DuckDB unroll is planner-infeasible (measured
~0.55 s/round superlinear), so the cross-engine check runs at 160
real merges and the 1,024-budget run is pinned shape-only.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from snowalert_spark.functions import bpe as B
from snowalert_spark.sources.zipf_corpus import ensure_zipf_corpus
from snowalert_spark.workload import textops

DOCS = 8
DEPTH = 160  # > BPE_MERGES_128, real merges throughout (no exhaustion)


@pytest.fixture(scope="module")
def zipf_slice(spark):
    path = ensure_zipf_corpus()
    d = spark.read.parquet(f"{path}/documents.parquet").filter(
        F.col("doc_id") < DOCS
    )
    return path, d


def test_budget_row_runs_and_matches_depth_oracle(spark, zipf_slice):
    path, d = zipf_slice
    out = textops.bpe_encode_budget(
        spark, f"zipf_budget_oracle_d{DOCS}", d, DEPTH
    ).toPandas()
    assert len(out) == DOCS

    merges = B.trained_merges(
        spark, f"zipf_budget_oracle_d{DOCS}", d, DEPTH
    )
    assert len(merges) == DEPTH, "slice must not exhaust below budget"

    src = (
        f"(SELECT * FROM read_parquet('{path}/documents.parquet') "
        f"WHERE doc_id < {DOCS})"
    )
    con = duckdb.connect()
    con.sql("SET max_expression_depth TO 20000")
    oracle = con.sql(
        textops._bpe_encode_oracle_sql(DEPTH, source=src)
    ).fetchdf()
    cols = sorted(out.columns)
    assert sorted(oracle.columns) == cols
    s = sorted(map(str, out[cols].itertuples(index=False, name=None)))
    o = sorted(map(str, oracle[cols].itertuples(index=False, name=None)))
    assert s == o


def test_full_budget_runs_on_rich_corpus(spark, zipf_slice):
    """The exact regime the r11 guard refused: a corpus supporting
    >= 128 merges at the full 1,024 budget. Shape-only pin (the
    1,024-round DuckDB replay is infeasible): row runs, one row per
    doc, and the deeper table tokenizes no worse than the 160-merge
    one."""
    _, d = zipf_slice
    deep = textops.bpe_encode_budget(
        spark, f"zipf_budget_oracle_full_d{DOCS}", d, textops.BPE_BUDGET_1K
    ).toPandas().set_index("doc_id")
    assert len(deep) == DOCS
    shallow = textops.bpe_encode_budget(
        spark, f"zipf_budget_oracle_d{DOCS}", d, DEPTH
    ).toPandas().set_index("doc_id")
    assert (deep["n_bpe_tokens"] <= shallow["n_bpe_tokens"]).all()
    assert (deep["n_words"] == shallow["n_words"]).all()
