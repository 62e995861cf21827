"""SnowAlert-pipeline-shaped queries over the ``events`` table.

These mirror the reference engine's core semantics (SURVEY §3) as pure
queries so the driver's DuckDB oracle can check them:

- alert projection (alert_queries_runner.py:36-61 analog)
- dedupe/merge grouping (alert_queries_runner.py:64-94 analog)
- suppression flagging (alert_suppressions_runner.py:24-38 analog)
- correlation sessionization (alert_processor.py:10-31, set-based)
- violation MD5 identity (helpers/db.py:465-492 analog)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

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


# The rule's time window (P2): every alert rule is wrapped in
# `event_time BETWEEN {from} AND {to}` — fixed literals here so the
# result is deterministic per scale factor.
WINDOW_FROM = "2024-01-01 00:00:00"
WINDOW_TO = "2024-01-03 00:00:00"


def _alert_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared rule body: project raw events into the alert vocabulary."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("ts").between(
                F.lit(WINDOW_FROM).cast("timestamp"),
                F.lit(WINDOW_TO).cast("timestamp"),
            )
            & F.col("event_type").isin("error", "login", "purchase")
            & (F.col("value") > 50)
        )
        .select(
            F.col("event_id").alias("alert_id"),
            F.lit("suspicious_activity_alert_query").alias("query_name"),
            F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("actor"),
            F.col("event_type").alias("action"),
            F.concat(F.lit("host-"), (F.col("event_id") % 7).cast("string")).alias(
                "object"
            ),
            F.concat(F.lit("Suspicious "), F.col("event_type")).alias("title"),
            F.col("ts").alias("event_time"),
            F.when(F.col("value") > 150, "high").otherwise("low").alias("severity"),
            F.col("props").alias("event_data"),
            F.col("value"),
        )
    )


_PROJECTION_SQL = f"""
    SELECT event_id AS alert_id,
           'suspicious_activity_alert_query' AS query_name,
           'user:' || CAST(user_id AS VARCHAR) AS actor,
           event_type AS action,
           'host-' || CAST(event_id % 7 AS VARCHAR) AS object,
           'Suspicious ' || event_type AS title,
           ts AS event_time,
           CASE WHEN value > 150 THEN 'high' ELSE 'low' END AS severity,
           props AS event_data,
           value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{WINDOW_FROM}' AND TIMESTAMP '{WINDOW_TO}'
      AND event_type IN ('error', 'login', 'purchase')
      AND value > 50
"""


@_q("alert_projection", _PROJECTION_SQL)
def alert_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P4: rule projection into the fixed alert vocabulary."""
    return _alert_projection(spark, sf_dir)


@_q(
    "alert_dedupe_groups",
    f"""
    SELECT object, title,
           COUNT(*) AS counter,
           MIN(event_time) AS first_event,
           MAX(event_time) AS last_event,
           MIN(alert_id) AS repr_alert_id
    FROM ({_PROJECTION_SQL})
    GROUP BY object, title
    """,
)
def alert_dedupe_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A9+J8 analog: the MERGE-dedupe grouping — one output alert per
    (OBJECT, DESCRIPTION) group with summed counter and min times;
    deterministic representative via MIN(alert_id)."""
    return (
        _alert_projection(spark, sf_dir)
        .groupBy("object", "title")
        .agg(
            F.count("*").alias("counter"),
            F.min("event_time").alias("first_event"),
            F.max("event_time").alias("last_event"),
            F.min("alert_id").alias("repr_alert_id"),
        )
    )


@_q(
    "alert_suppression_flags",
    f"""
    WITH alerts AS ({_PROJECTION_SQL}),
    noisy AS (SELECT actor FROM alerts GROUP BY actor HAVING COUNT(*) > 50)
    SELECT a.alert_id, a.actor, a.action,
           n.actor IS NOT NULL AS suppressed,
           CASE WHEN n.actor IS NOT NULL
                THEN 'noisy_actor_alert_suppression' END AS suppression_rule
    FROM alerts a
    LEFT JOIN noisy n ON a.actor = n.actor
    """,
)
def alert_suppression_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 analog: suppression rule marks matching alerts (merge-update
    semi-join), everything else defaults to suppressed=false."""
    alerts = _alert_projection(spark, sf_dir)
    noisy = (
        alerts.groupBy("actor")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 50)
        .select("actor", F.lit(True).alias("is_noisy"))
    )
    return alerts.join(F.broadcast(noisy), "actor", "left").select(
        "alert_id",
        "actor",
        "action",
        F.coalesce("is_noisy", F.lit(False)).alias("suppressed"),
        F.when(
            F.col("is_noisy").isNotNull(), "noisy_actor_alert_suppression"
        ).alias("suppression_rule"),
    )


@_q(
    "correlation_sessions",
    """
    SELECT event_id, actor, ts,
           actor || '-' || CAST(MIN(event_id) OVER (PARTITION BY actor, sess)
                                AS VARCHAR) AS correlation_id
    FROM (
        SELECT event_id, actor, ts,
               SUM(is_new) OVER (PARTITION BY actor ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess
        FROM (
            SELECT event_id, 'user:' || CAST(user_id AS VARCHAR) AS actor, ts,
                   CASE WHEN epoch_us(ts) / 1000000.0
                             - LAG(epoch_us(ts) / 1000000.0, 1, epoch_us(ts) / 1000000.0)
                               OVER (PARTITION BY 'user:' || CAST(user_id AS VARCHAR)
                                     ORDER BY ts, event_id)
                             > 3600.0
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    )
    """,
)
def correlation_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10/W analog of alert_processor correlation: the reference walks
    alerts row-at-a-time in the driver, linking an alert to the most
    recent correlated alert for the same ACTOR within 60 minutes. The
    distributed equivalent is gap-based sessionization per actor: a new
    correlation id starts when the gap to the previous alert exceeds 60
    min; the id is actor + first event of the session (deterministic).
    """
    e = table(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("actor"),
        "ts",
    )
    w = W.partitionBy("actor").orderBy("ts", "event_id")
    # NTZ-tolerant: cast-to-double is illegal on TIMESTAMP_NTZ, legal
    # (and a no-op hop) via TIMESTAMP.
    secs = F.col("ts").cast("timestamp").cast("double")
    is_new = (secs - F.lag(secs, 1, None).over(w) > 3600.0).cast("int")
    sess = F.sum(F.coalesce(is_new, F.lit(0))).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    wsess = W.partitionBy("actor", "sess")
    return (
        e.withColumn("is_new", F.coalesce(is_new, F.lit(0)))
        .withColumn("sess", sess)
        .withColumn(
            "correlation_id",
            F.concat(
                F.col("actor"), F.lit("-"), F.min("event_id").over(wsess).cast("string")
            ),
        )
        .select("event_id", "actor", "ts", "correlation_id")
    )


@_q(
    "violation_md5_identity",
    """
    SELECT md5('security_violation' || '|' || CAST(event_id AS VARCHAR)
                || '|' || event_type) AS id,
           'host-' || CAST(event_id % 7 AS VARCHAR) AS object,
           'Violation: ' || event_type AS title,
           ts AS alert_time
    FROM events
    WHERE event_type = 'error' AND value > 180
    """,
)
def violation_md5_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation insert analog (db.py:465-492): content-addressed id via
    MD5 over the identity fields — stable across runs for cross-day
    dedupe/suppression."""
    e = table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "error") & (F.col("value") > 180)
    )
    return e.select(
        F.md5(
            F.concat_ws(
                "|",
                F.lit("security_violation"),
                F.col("event_id").cast("string"),
                F.col("event_type"),
            )
        ).alias("id"),
        F.concat(F.lit("host-"), (F.col("event_id") % 7).cast("string")).alias(
            "object"
        ),
        F.concat(F.lit("Violation: "), F.col("event_type")).alias("title"),
        F.col("ts").alias("alert_time"),
    )
