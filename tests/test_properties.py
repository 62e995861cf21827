"""Property-based tests (hypothesis) — a layer the reference lacks
(SURVEY §5 notes the absence):

- quantize is engine-invariant: Spark, DuckDB and Python compute the
  exact same quantized double for arbitrary inputs (the foundation of
  every oracle comparison in this repo).
- canonical JSON identity: object_construct matches Python's
  sorted-compact json.dumps for arbitrary string payloads → the
  violation MD5 is reproducible client-side.
- upsert is a faithful MERGE: any sequence of keyed upserts matches a
  dict model.
"""

from __future__ import annotations

import json
import math

import duckdb
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from snowalert_spark.functions.numeric import quantize, quantize_sql
from snowalert_spark.functions.variant import object_construct

FINITE = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(FINITE, min_size=1, max_size=50))
def test_quantize_engine_invariant(spark, xs):
    scale = 10000.0
    py = [math.floor(x * scale + 0.5) / scale for x in xs]
    du = [
        duckdb.sql(
            f"SELECT {quantize_sql('CAST(? AS DOUBLE)')}", params=[x]
        ).fetchone()[0]
        for x in xs
    ]
    sp = [
        r.q
        for r in spark.createDataFrame([(x,) for x in xs], "x double")
        .select(quantize(F.col("x")).alias("q"))
        .collect()
    ]
    assert py == du, "python vs duckdb quantize"
    # spark preserves input order in a single partition? no — compare as multisets
    assert sorted(sp) == sorted(py), "spark vs python quantize"


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.from_regex(r"[a-zA-Z][a-zA-Z0-9_]{0,10}", fullmatch=True),
        # stress JSON escaping: quotes, backslashes, braces, unicode
        st.text(alphabet=list('abc xyz123"\\{}:,\néü'), max_size=20),
        min_size=1,
        max_size=5,
    )
)
def test_canonical_json_matches_python(spark, kv):
    doc = (
        spark.range(1)
        .select(
            object_construct(**{k: F.lit(v) for k, v in kv.items()}).alias("doc")
        )
        .collect()[0]
        .doc
    )
    expected = json.dumps(kv, separators=(",", ":"), sort_keys=True, ensure_ascii=False)
    assert json.loads(doc) == json.loads(expected)
    assert doc == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from("abcde"), st.integers(1, 5)),
        min_size=1,
        max_size=6,
    )
)
def test_upsert_matches_dict_model(spark, tmp_path_factory, ops):
    import datetime as dt

    from snowalert_spark.store import ResultsStore

    store = ResultsStore(spark, str(tmp_path_factory.mktemp("prop")))
    model: dict[str, int] = {}
    t = dt.datetime(2024, 1, 1)
    for key, _counter in ops:
        store.upsert(
            "violations",
            spark.createDataFrame(
                [("{}", key, t, None, None, None)],
                "result string, id string, alert_time timestamp, ticket string, "
                "suppressed boolean, suppression_rule string",
            ),
            on=["id"],
        )
        model[key] = model.get(key, 0) + 1
    rows = store.read("violations").collect()
    assert sorted(r.id for r in rows) == sorted(model.keys()), (
        "one row per distinct key regardless of upsert order/multiplicity"
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(1, 500), st.integers(1, 10)),
        min_size=1,
        max_size=6,
    )
)
def test_mixture_plan_invariants(spark, strata):
    """For any stratum sizes and weights: target fractions sum to 1,
    rates stay in [0, 100], planned docs never exceed the stratum, and
    a stratum with the max weight-to-size ratio is never downsampled
    below its proportional entitlement."""
    from snowalert_spark.functions.sampling import mixture_plan

    rows = [
        (f"s{i}_{j}", i)
        for i, (n, _w) in enumerate(strata)
        for j in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    wmap = {str(i): w for i, (_n, w) in enumerate(strata)}
    wcol = F.element_at(
        F.create_map(*[F.lit(x) for kv in wmap.items() for x in kv]),
        F.col("source"),
    ).cast("long")
    out = mixture_plan(df, "source", wcol).collect()
    assert len(out) == len(strata)
    assert abs(sum(r["target_frac"] for r in out) - 1.0) < 1e-4
    for r in out:
        assert 0 <= r["rate_pct"] <= 100
        assert 0 <= r["planned_docs"] <= r["n_docs"]
    # the most over-entitled stratum (highest weight per doc) always
    # keeps everything: its fair share exceeds its size
    best = max(out, key=lambda r: r["weight"] / r["n_docs"])
    total_w = sum(r["weight"] for r in out)
    total_n = sum(r["n_docs"] for r in out)
    if best["weight"] / total_w * total_n >= best["n_docs"]:
        assert best["rate_pct"] == 100
