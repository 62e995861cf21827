"""Core relational operators over the TPC-H-ish test tables.

Each query exercises rows of the SURVEY.md §2 inventory (noted per
query). Spark side is DataFrame API (Catalyst plans: pushdown, pruning,
broadcast joins); oracle side is ANSI SQL for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from snowalert_spark.functions.numeric import DEC, dsum, quantize, quantize_sql
from snowalert_spark.tables import table

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


DSUM_SQL = "CAST(SUM(CAST({x} AS DECIMAL(25,6))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Aggregations (A1, A2, A13) — TPC-H Q1 shape; SURVEY §2.4
# ---------------------------------------------------------------------------
@_q(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM_SQL.format(x='l_quantity')} AS sum_qty,
           {DSUM_SQL.format(x='l_extendedprice')} AS sum_base_price,
           {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc).alias("sum_disc_price"),
        dsum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Inner equi-join + broadcast dims (J1) — SURVEY §2.3
# ---------------------------------------------------------------------------
@_q(
    "join_revenue_by_nation",
    f"""
    SELECT n_name,
           {DSUM_SQL.format(x='o_totalprice')} AS revenue,
           COUNT(*) AS n_orders
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum("o_totalprice").alias("revenue"), F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Multi-join stress (J1 composition, join reordering left to Catalyst)
# ---------------------------------------------------------------------------
@_q(
    "q3_shipping_priority",
    f"""
    SELECT o_orderkey,
           {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(disc).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@_q(
    "q5_supplier_volume_by_nation",
    f"""
    SELECT n_name,
           {DSUM_SQL.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_supplier_volume_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(disc).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Left-anti join idiom (J3: "left outer + IS NULL") — SURVEY §2.3
# ---------------------------------------------------------------------------
@_q(
    "anti_join_parts_no_bulk_orders",
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= 45)
    """,
)
def anti_join_parts_no_bulk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts never ordered in bulk — the 'users with no login in 90d'
    idiom (cis_aws_pack.sql:78-97) with a non-empty result set."""
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return p.join(l, p.p_partkey == l.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


# ---------------------------------------------------------------------------
# Left-semi join (EXISTS idiom) — SURVEY §2.3
# ---------------------------------------------------------------------------
@_q(
    "semi_join_suppliers_big_lots",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
    """,
)
def semi_join_suppliers_big_lots(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


# ---------------------------------------------------------------------------
# NOT IN subquery (P7) — SURVEY §2.2; aws_query_pack.sql:144-146 analog
# ---------------------------------------------------------------------------
@_q(
    "not_in_subquery_orders",
    """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    GROUP BY o_orderstatus
    """,
)
def not_in_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    neg = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    # c_custkey is non-null → NOT IN ≡ anti-join (Catalyst would plan the
    # same null-aware anti join from SQL).
    return (
        o.join(neg, o.o_custkey == neg.c_custkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Latest-per-key: ROW_NUMBER + QUALIFY (W1, *the* SnowAlert idiom)
# packs/okta.sql:28-31 analog — SURVEY §2.5
# ---------------------------------------------------------------------------
@_q(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, ts, event_type
    FROM events
    QUALIFY 1 = ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC)
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


# ---------------------------------------------------------------------------
# Top-k with deterministic tiebreak (O1-O3) — SURVEY §2.6
# ---------------------------------------------------------------------------
@_q(
    "top_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # TakeOrderedAndProject: per-partition top-k, no full sort/shuffle.
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100).select(
        "o_orderkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# UNION ALL + DISTINCT (U1, A4) — SURVEY §2.7
# ---------------------------------------------------------------------------
@_q(
    "union_dedupe_nationkeys",
    """
    SELECT DISTINCT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
)
def union_dedupe_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


# ---------------------------------------------------------------------------
# GROUP BY + HAVING (A8) — SURVEY §2.4
# ---------------------------------------------------------------------------
@_q(
    "group_having_active_users",
    """
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events
    GROUP BY user_id, event_type
    HAVING COUNT(*) > 20
    """,
)
def group_having_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 20)
    )


# ---------------------------------------------------------------------------
# COUNT(DISTINCT) (A3) + global agg (A14) — SURVEY §2.4
# ---------------------------------------------------------------------------
@_q(
    "count_distinct_users_by_type",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def count_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@_q(
    "global_agg_events",
    f"""
    SELECT COUNT(*) AS n,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           {DSUM_SQL.format(x='value')} AS total_value
    FROM events
    """,
)
def global_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.agg(
        F.count("*").alias("n"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        dsum("value").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# VARIANT/JSON path access (§2.8: col:path::int) over events.props
# ---------------------------------------------------------------------------
@_q(
    "json_path_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    GROUP BY event_type
    """,
)
def json_path_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.filter(k > 50)
        .groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Zero-filled counts via outer join (J4) — percentiles.py:124-139 analog
# ---------------------------------------------------------------------------
@_q(
    "zerofill_customers_per_nation",
    """
    SELECT n_name, COALESCE(cnt, 0) AS n_customers
    FROM nation
    LEFT JOIN (SELECT c_nationkey, COUNT(*) AS cnt
               FROM customer GROUP BY c_nationkey) c
           ON n_nationkey = c_nationkey
    """,
)
def zerofill_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    cnt = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("cnt"))
    )
    return n.join(cnt, n.n_nationkey == cnt.c_nationkey, "left").select(
        "n_name", F.coalesce("cnt", F.lit(0)).alias("n_customers")
    )


# ---------------------------------------------------------------------------
# Full outer join (J5) — data-views.sql.fmt:76-92 analog
# ---------------------------------------------------------------------------
@_q(
    "full_outer_nation_presence",
    """
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(c.c_cnt, 0) AS c_cnt,
           COALESCE(s.s_cnt, 0) AS s_cnt
    FROM (SELECT c_nationkey AS k, COUNT(*) AS c_cnt FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS s_cnt FROM supplier GROUP BY 1) s
    USING (k)
    """,
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("c_cnt"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("s_cnt"))
    )
    return c.join(s, "k", "full_outer").select(
        F.col("k").alias("nationkey"),
        F.coalesce("c_cnt", F.lit(0)).alias("c_cnt"),
        F.coalesce("s_cnt", F.lit(0)).alias("s_cnt"),
    )


# ---------------------------------------------------------------------------
# Cross join matrix (J6) — percentiles.py:126-137 analog
# ---------------------------------------------------------------------------
@_q(
    "cross_join_region_type_matrix",
    """
    SELECT r_name, event_type
    FROM region
    CROSS JOIN (SELECT DISTINCT event_type FROM events)
    """,
)
def cross_join_region_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").select("r_name")
    t = table(spark, sf_dir, "events").select("event_type").distinct()
    return r.crossJoin(t)


# ---------------------------------------------------------------------------
# Range join → regular-grid binning rewrite (J7) — percentiles.py:68-75.
# The oracle states the semantics as a naive interval join against a
# generated hourly grid; the Spark plan uses the scale-path rewrite
# (date_trunc binning): equivalent on a regular grid, no O(n·slices)
# non-equi join, no shuffle beyond the final aggregation.
# ---------------------------------------------------------------------------
@_q(
    "range_join_hourly_counts",
    """
    WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo, MAX(ts) AS hi FROM events),
    slices AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slice_start
               FROM bounds)
    SELECT s.slice_start, e.event_type, COUNT(*) AS n
    FROM slices s
    JOIN events e ON e.ts >= s.slice_start
                 AND e.ts < s.slice_start + INTERVAL 1 HOUR
    GROUP BY s.slice_start, e.event_type
    """,
)
def range_join_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("slice_start"),
            "event_type",
        ).agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Sliding 24h trailing frame (W2) — percentiles.py:200-205
# ---------------------------------------------------------------------------
@_q(
    "sliding_24h_trailing_sum",
    """
    SELECT slice_start, event_type, n,
           CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY slice_start
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trailing_24h
    FROM (SELECT date_trunc('hour', ts) AS slice_start, event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2)
    """,
)
def sliding_24h_trailing_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("slice_start"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("slice_start").rowsBetween(-24, -1)
    return hourly.select(
        "slice_start", "event_type", "n", F.sum("n").over(w).alias("trailing_24h")
    )


# ---------------------------------------------------------------------------
# Exact percentiles (A10 analog; exact so the oracle matches) — §2.4
# ---------------------------------------------------------------------------
@_q(
    "percentiles_by_type",
    f"""
    SELECT event_type,
           {quantize_sql('quantile_cont(value, 0.25)')} AS p25,
           {quantize_sql('quantile_cont(value, 0.50)')} AS p50,
           {quantize_sql('quantile_cont(value, 0.75)')} AS p75
    FROM events
    GROUP BY event_type
    """,
)
def percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        quantize(F.expr("percentile(value, 0.25)")).alias("p25"),
        quantize(F.expr("percentile(value, 0.50)")).alias("p50"),
        quantize(F.expr("percentile(value, 0.75)")).alias("p75"),
    )


# ---------------------------------------------------------------------------
# collect_set / ARRAY_AGG(DISTINCT) (A6) + bool_or (A7) — string-encoded
# for stable cross-engine hashing
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# GROUP BY ordinals + HAVING through the SQL surface (A8) —
# snowflake_security_monitoring.sql:106-107 idiom
# ---------------------------------------------------------------------------
@_q(
    "group_by_ordinals_sql",
    """
    SELECT event_type, user_id, COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    HAVING COUNT(*) > 15
    """,
)
def group_by_ordinals_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type, user_id, COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
        HAVING COUNT(*) > 15
        """
    )


# ---------------------------------------------------------------------------
# Approximate aggregates (A10/A11 real approx form) — engine-specific
# sketches (HLL++, t-digest) can never hash-match another engine's, so
# the checkable contract is the *error bound*: the plan computes the
# real approx aggregates AND exact anchors, and emits booleans
# asserting the sketch landed within its documented bounds (HLL++
# rsd≈0.05 → 10% + 5-absolute slack; approx p50 inside the exact
# p25..p75 bracket; the quantile vector monotone). The oracle states
# the same invariants as literals over the exact anchor — a real
# hash-match, not a rows-only waiver. tests/test_approx.py additionally
# bounds the numeric error vs exact.
# ---------------------------------------------------------------------------
@_q(
    "approx_aggregates",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS users_within_bound,
           TRUE AS p50_within_bracket,
           TRUE AS quantiles_monotonic
    FROM events
    GROUP BY event_type
    """,
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id").alias("_approx_users"),
        F.percentile_approx("value", 0.5).alias("_approx_p50"),
        F.expr("percentile(value, 0.25)").alias("_exact_p25"),
        F.expr("percentile(value, 0.75)").alias("_exact_p75"),
        F.percentile_approx(
            "value", [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]
        ).alias("_approx_quantiles"),
    )
    return agg.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.col("_approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(5.0), F.col("exact_users") * 0.10)
        ).alias("users_within_bound"),
        # all-NULL value groups: percentile/percentile_approx return
        # NULL and the checks would yield NULL while the oracle states
        # TRUE — coalesce with the exact side's nullness so both
        # engines agree (data-independent)
        F.coalesce(
            F.col("_approx_p50").between(
                F.col("_exact_p25"), F.col("_exact_p75")
            ),
            F.col("_exact_p25").isNull(),
        ).alias("p50_within_bracket"),
        F.coalesce(
            F.col("_approx_quantiles") == F.array_sort("_approx_quantiles"),
            F.col("_approx_quantiles").isNull(),
        ).alias("quantiles_monotonic"),
    )


@_q(
    "user_profile_rollup",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
           BOOL_OR(event_type = 'error') AS has_error,
           COUNT(*) AS n
    FROM events
    GROUP BY user_id
    """,
)
def user_profile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types"),
        F.max(F.col("event_type") == "error").alias("has_error"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Skew-mitigated join (SURVEY §4 scale design; operators/skew.py):
# ~90% of fact rows share one hot key — the noisy-actor shape — and the
# join runs through salted_join (big side salted, small side
# replicated), restoring a uniform shuffle. The oracle is the plain
# unsalted join: the mitigation must be result-invariant. LOCAL_ONLY
# (driver cap); also a bench.py headline query.
# ---------------------------------------------------------------------------
@_q(
    "skew_salted_join",
    f"""
    WITH fact AS (
        SELECT *,
               CASE WHEN event_id % 10 < 9 THEN 'hot-actor'
                    ELSE 'actor-' || CAST(event_id % 997 AS VARCHAR) END AS k
        FROM events
    ),
    dim AS (
        SELECT DISTINCT k,
               CASE WHEN k = 'hot-actor' THEN 'T0' ELSE 'T1' END AS actor_tier
        FROM fact
    )
    SELECT actor_tier, COUNT(*) AS n,
           {DSUM_SQL.format(x='value')} AS total_value
    FROM fact JOIN dim USING (k)
    GROUP BY actor_tier
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from snowalert_spark.operators.skew import salted_join

    e = table(spark, sf_dir, "events")
    fact = e.withColumn(
        "k",
        F.when(F.col("event_id") % 10 < 9, F.lit("hot-actor")).otherwise(
            F.concat(F.lit("actor-"), (F.col("event_id") % 997).cast("string"))
        ),
    )
    dim = (
        fact.select("k")
        .distinct()
        .withColumn(
            "actor_tier",
            F.when(F.col("k") == "hot-actor", "T0").otherwise("T1"),
        )
    )
    return (
        salted_join(fact, dim, on="k")
        .groupBy("actor_tier")
        .agg(
            F.count("*").alias("n"),
            dsum(F.col("value")).alias("total_value"),
        )
    )
