"""Unit tests for the Snowflake→Spark SQL compat layer, exercised
end-to-end through spark.sql over fixture data."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from snowalert_spark import compat


def test_qualify_rewrite_text():
    sql = (
        "SELECT user_id, ts FROM events "
        "QUALIFY 1 = ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC)"
    )
    out = compat.rewrite_qualify(sql)
    assert "QUALIFY" not in out.upper().replace("__Q", "")
    assert out.startswith("SELECT * EXCEPT (__q) FROM")


def test_qualify_preserves_order_limit():
    out = compat.rewrite_qualify(
        "SELECT a FROM t QUALIFY 1=ROW_NUMBER() OVER (ORDER BY a) ORDER BY a LIMIT 5"
    )
    assert out.endswith("ORDER BY a LIMIT 5")


def test_variant_path():
    out = compat.rewrite_variant_paths("SELECT raw:a.b['k space'][0]::string FROM t")
    assert "get_json_object(raw, '$.a.b.k space[0]')" in out
    assert out.count("CAST(") == 1


def test_plain_cast():
    assert compat.rewrite_casts("SELECT x::string FROM t") == (
        "SELECT CAST(x AS STRING) FROM t"
    )
    assert compat.rewrite_casts("SELECT f(x)::int FROM t") == (
        "SELECT CAST(f(x) AS INT) FROM t"
    )


def test_function_renames():
    out = compat.transpile(
        "SELECT IFF(a>1, 'x', 'y'), ZEROIFNULL(n), DATEADD('minute', -90, ts), "
        "REGEXP_SUBSTR(s, 'p.*t'), REGEXP_SUBSTR(s, 'x(y)', 1, 1, 'ie') FROM t"
    )
    assert "if(a>1" in out
    assert "coalesce(n, 0)" in out
    assert "timestampadd(minute, -90, ts)" in out
    assert "regexp_extract(s, 'p.*t', 0)" in out
    assert "regexp_extract(s, '(?i)x(y)', 1)" in out


def test_alias_in_where_inline_expansion():
    out = compat.transpile(
        "SELECT UPPER(a) AS obj, b FROM t WHERE c = 1 AND obj ILIKE '%x%'"
    )
    assert "WHERE c = 1 AND (UPPER(a)) ILIKE '%x%'" in out


def test_transpiled_rule_runs(spark):
    """The reference's latest-snapshot-per-key idiom (packs/okta.sql:28-31
    shape) transpiled and executed by Catalyst."""
    from snowalert_spark.tables import register

    register(spark, "/root/testdata/sf0.001", "events")
    rule = """
    SELECT user_id, event_type, ts,
           props:k::int AS k
    FROM events
    QUALIFY 1 = ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
    """
    df = spark.sql(compat.transpile(rule))
    rows = df.collect()
    n_users = spark.table("events").select("user_id").distinct().count()
    assert len(rows) == n_users
    assert all(r.k is not None for r in rows)


def test_transpiled_dateadd_window(spark):
    from snowalert_spark.tables import register

    register(spark, "/root/testdata/sf0.001", "events")
    rule = """
    SELECT COUNT(*) AS n FROM events
    WHERE ts BETWEEN DATEADD('hour', -100000, CURRENT_TIMESTAMP()) AND CURRENT_TIMESTAMP()
    """
    n = spark.sql(compat.transpile(rule)).collect()[0].n
    assert n == spark.table("events").count()


def test_try_and_timezone_functions(spark):
    out = compat.transpile(
        "SELECT TRY_TO_TIMESTAMP_LTZ(s), CONVERT_TIMEZONE('America/Los_Angeles', ts) FROM t"
    )
    assert "try_to_timestamp(s)" in out
    assert "from_utc_timestamp(ts, 'America/Los_Angeles')" in out
    spark.createDataFrame(
        [("2024-06-01 12:00:00", "garbage")], "ts string, s string"
    ).createOrReplaceTempView("t")
    row = spark.sql(compat.transpile(
        "SELECT TRY_TO_TIMESTAMP(s) AS bad, "
        "CONVERT_TIMEZONE('America/Los_Angeles', ts::timestamp) AS la FROM t"
    )).collect()[0]
    assert row.bad is None
    assert row.la.hour == 5  # PDT = UTC-7 in June
