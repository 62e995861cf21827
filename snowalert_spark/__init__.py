"""snowalert_spark — a PySpark-native security-analytics engine.

Re-provides the query semantics and orchestration pipeline of
snowflakedb/SnowAlert (reference: /root/reference, studied for behavior
only) on Apache Spark: rules are declarative Spark SQL / DataFrame
plans executed by Catalyst; results (alerts, violations, metadata) live
in Parquet-backed tables with a join-based upsert writer standing in
for warehouse MERGE.

Layout
------
- ``session``    : SparkSession factory tuned for local + cluster use
- ``compat``     : Snowflake-SQL → Spark-SQL compatibility layer
- ``schema``     : StructTypes for results/landing tables
- ``store``      : results store (append / overwrite / upsert)
- ``rules``      : rule registry (suffix convention, metadata)
- ``runners``    : alert / violation / connector / baseline pipelines
- ``operators``  : reusable relational operators (latest-per-key,
                   range-join binning, zero-filled counts, ...)
- ``functions``  : scalar/table function library (variant/JSON, time
                   slices, text analysis, dedup, similarity)
- ``sources``    : file/REST landing-table ingestion
- ``streaming``  : incremental / Structured Streaming ingest helpers
- ``handlers``   : alert dispatch sinks (jira/slack/... stubs)
"""

__version__ = "0.1.0"

from snowalert_spark.session import get_session  # noqa: F401
