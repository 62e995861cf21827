"""Installer analog (reference: src/scripts/install.py +
installer-queries/data-views.sql.fmt).

Creates the engine-owned results tables (via ResultsStore's lazy
schemas), registers the ``data.*`` projection views over them, the
rule_tags view, and the sample rules. On a cluster these would be
catalog views; locally they are temp views on the driver session.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from snowalert_spark import samples
from snowalert_spark.rules import RuleRegistry
from snowalert_spark.store import ResultsStore


def register_data_views(spark: SparkSession, store: ResultsStore) -> None:
    """data.alerts / data.violations projection views
    (data-views.sql.fmt:27-74): flatten the alert document to typed
    columns for ad-hoc querying and suppression rules."""
    alerts = store.read("alerts")
    alerts.createOrReplaceTempView("data_alerts")
    alerts.select(
        F.col("alert.ALERT_ID").alias("alert_id"),
        F.col("alert.QUERY_NAME").alias("query_name"),
        F.col("alert.QUERY_ID").alias("query_id"),
        F.col("alert.ENVIRONMENT").alias("environment"),
        F.col("alert.SOURCES").alias("sources"),
        F.col("alert.ACTOR").alias("actor"),
        F.col("alert.OBJECT").alias("object"),
        F.col("alert.ACTION").alias("action"),
        F.col("alert.TITLE").alias("title"),
        F.col("alert.EVENT_TIME").alias("event_time"),
        F.col("alert.ALERT_TIME").alias("alert_time"),
        F.col("alert.DESCRIPTION").alias("description"),
        F.col("alert.DETECTOR").alias("detector"),
        F.col("alert.EVENT_DATA").alias("event_data"),
        F.col("alert.SEVERITY").alias("severity"),
        F.col("alert.HANDLERS").alias("handlers"),
        "ticket",
        "suppressed",
        "suppression_rule",
        "counter",
        "correlation_id",
        "handled",
    ).createOrReplaceTempView("data_alerts_v")
    store.read("violations").createOrReplaceTempView("data_violations")
    for t in ("query_metadata", "run_metadata", "ingestion_metadata"):
        store.read(t).createOrReplaceTempView(f"data_{t}")


def register_metadata_views(spark: SparkSession, store: ResultsStore) -> None:
    """Run-observability views (data-views.sql.fmt:95-291): per-rule
    run summaries and error listings over query_metadata."""
    md = store.read("query_metadata")
    runs = md.select(
        "event_time",
        F.get_json_object("v", "$.RUN_ID").alias("run_id"),
        F.get_json_object("v", "$.QUERY_NAME").alias("query_name"),
        F.get_json_object("v", "$.RUN_TYPE").alias("run_type"),
        F.get_json_object("v", "$.START_TIME").alias("start_time"),
        F.get_json_object("v", "$.DURATION").cast("double").alias("duration_s"),
        F.get_json_object("v", "$.ROW_COUNT.inserted").cast("long").alias("inserted"),
        F.get_json_object("v", "$.ROW_COUNT.updated").cast("long").alias("updated"),
        F.get_json_object("v", "$.ROW_COUNT.suppressed").cast("long").alias(
            "suppressed"
        ),
        F.get_json_object("v", "$.ERROR.EXCEPTION_ONLY").alias("error"),
    )
    runs.createOrReplaceTempView("data_rule_runs")
    # alert_query_rule_run_errors analog (:209-239): most recent first
    runs.filter(F.col("error").isNotNull()).orderBy(
        F.col("event_time").desc()
    ).createOrReplaceTempView("data_rule_run_errors")


def register_rule_tags(spark: SparkSession, registry: RuleRegistry) -> None:
    """data.rule_tags view (data-views.sql.fmt:1-25)."""
    tags = registry.rule_tags()
    if tags:
        spark.createDataFrame(
            [(t["type"], t["rule_name"], t["rule_id"], t["tag"]) for t in tags],
            "type string, rule_name string, rule_id string, tag string",
        ).createOrReplaceTempView("data_rule_tags")
    else:
        spark.createDataFrame(
            [], "type string, rule_name string, rule_id string, tag string"
        ).createOrReplaceTempView("data_rule_tags")


def install(
    spark: SparkSession,
    store: ResultsStore,
    registry: RuleRegistry,
    sf_dir: str | None = None,
    with_samples: bool = True,
) -> None:
    if with_samples:
        if sf_dir:
            samples.register_fixture_views(spark, sf_dir)
        samples.register(registry)
    register_data_views(spark, store)
    register_metadata_views(spark, store)
    register_rule_tags(spark, registry)
