"""File-based connectors (reference: aws_cloudtrail.py, aws_flow_log.py).

The reference wires S3 stage → pipe → stream → task; the Spark analog
is a declarative file scan (batch, or file-source streaming in
snowalert_spark.streaming). File formats map directly
(SURVEY §1.3): JSON w/ STRIP_OUTER_ARRAY ≈ multiLine JSON array; CSV
w/ field_delimiter/skip_header/null_if ≈ sep/header/nullValue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# aws_cloudtrail.py:50-92 — representative subset of the 41-column
# landing projection (paths per :204-250); raw preserved as JSON.
CLOUDTRAIL_LANDING_COLS: dict[str, str] = {
    "event_time": "r.eventTime",
    "aws_region": "r.awsRegion",
    "event_id": "r.eventID",
    "event_name": "r.eventName",
    "event_source": "r.eventSource",
    "event_type": "r.eventType",
    "event_version": "r.eventVersion",
    "error_code": "r.errorCode",
    "error_message": "r.errorMessage",
    "recipient_account_id": "r.recipientAccountId",
    "request_id": "r.requestId",
    "source_ip_address": "r.sourceIPAddress",
    "user_agent": "r.userAgent",
    "user_identity_type": "r.userIdentity.type",
    "user_identity_arn": "r.userIdentity.arn",
    "user_identity_username": "r.userIdentity.userName",
    "user_identity_accountid": "r.userIdentity.accountId",
    "read_only": "r.readOnly",
}


def _safe_path(schema: T.StructType, dotted: str):
    """Resolve ``a.b.c`` against a struct schema; absent fields project
    as NULL (CloudTrail records are schema-on-read — files routinely
    omit error/identity fields)."""
    cur: T.DataType = schema
    for part in dotted.split("."):
        if not isinstance(cur, T.StructType) or part not in cur.fieldNames():
            return F.lit(None)
        cur = cur[part].dataType
    return F.expr(dotted)


def read_cloudtrail_json(spark: SparkSession, path: str) -> DataFrame:
    """CloudTrail dump files: JSON objects with a ``Records`` array
    (aws_cloudtrail.py:122-131: COPY + FLATTEN(v:Records)).
    multiLine handles outer-array/pretty files; explode = FLATTEN."""
    raw = spark.read.option("multiLine", "true").json(path)
    rec = raw.select(F.explode("Records").alias("r"))
    cols = [
        _safe_path(rec.schema, src).cast(
            "boolean" if name == "read_only" else "string"
        ).alias(name)
        for name, src in CLOUDTRAIL_LANDING_COLS.items()
    ]
    return rec.select(
        F.current_timestamp().alias("insert_time"),
        F.to_json("r").alias("raw"),
        F.xxhash64(F.to_json("r")).alias("hash_raw"),  # HASH(v) dedupe key
        *cols,
    ).withColumn(
        "event_time",
        F.coalesce(
            F.try_to_timestamp(F.col("event_time")), F.current_timestamp()
        ),  # aws_cloudtrail.py:207-212 late/garbled coercion
    )


# aws_flow_log.py:49-64
FLOW_LOG_SCHEMA = T.StructType(
    [
        T.StructField("version", T.IntegerType()),
        T.StructField("account_id", T.StringType()),
        T.StructField("interface_id", T.StringType()),
        T.StructField("srcaddr", T.StringType()),
        T.StructField("dstaddr", T.StringType()),
        T.StructField("srcport", T.IntegerType()),
        T.StructField("dstport", T.IntegerType()),
        T.StructField("protocol", T.IntegerType()),
        T.StructField("packets", T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("start_time", T.LongType()),
        T.StructField("end_time", T.LongType()),
        T.StructField("action", T.StringType()),
        T.StructField("log_status", T.StringType()),
    ]
)


def read_flow_log_csv(spark: SparkSession, path: str) -> DataFrame:
    """VPC flow logs: space-delimited CSV, header row, '-' as NULL
    (aws_flow_log.py:40-46); epoch seconds → timestamps."""
    df = (
        spark.read.schema(FLOW_LOG_SCHEMA)
        .option("sep", " ")
        .option("header", "true")
        .option("nullValue", "-")
        .csv(path)
    )
    return df.withColumn(
        "start_time", F.timestamp_seconds("start_time")
    ).withColumn("end_time", F.timestamp_seconds("end_time"))
