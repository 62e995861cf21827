"""File-based connectors (reference: aws_cloudtrail.py, aws_flow_log.py).

The reference wires S3 stage → pipe → stream → task; the Spark analog
is a declarative file scan (batch, or file-source streaming in
snowalert_spark.streaming). File formats map directly
(SURVEY §1.3): JSON w/ STRIP_OUTER_ARRAY ≈ multiLine JSON array; CSV
w/ field_delimiter/skip_header/null_if ≈ sep/header/nullValue.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# aws_cloudtrail.py:50-92 — the full landing projection (paths per
# :204-250); raw preserved as JSON. VARIANT-typed landing columns
# (request_parameters, user_identity, …) serialize to JSON text so
# pack SQL's col:path access works over them.
CLOUDTRAIL_LANDING_COLS: dict[str, str] = {
    "event_time": "r.eventTime",
    "aws_region": "r.awsRegion",
    "event_id": "r.eventID",
    "event_name": "r.eventName",
    "event_source": "r.eventSource",
    "event_type": "r.eventType",
    "event_version": "r.eventVersion",
    "recipient_account_id": "r.recipientAccountId",
    "request_id": "r.requestID",
    "request_parameters": "r.requestParameters",
    "response_elements": "r.responseElements",
    "source_ip_address": "r.sourceIPAddress",
    "user_agent": "r.userAgent",
    "user_identity": "r.userIdentity",
    "user_identity_type": "r.userIdentity.type",
    "user_identity_principal_id": "r.userIdentity.principalId",
    "user_identity_arn": "r.userIdentity.arn",
    "user_identity_accountid": "r.userIdentity.accountId",
    "user_identity_invokedby": "r.userIdentity.invokedBy",
    "user_identity_access_key_id": "r.userIdentity.accessKeyId",
    "user_identity_username": "r.userIdentity.userName",
    "user_identity_session_context_attributes_mfa_authenticated":
        "r.userIdentity.sessionContext.attributes.mfaAuthenticated",
    "user_identity_session_context_attributes_creation_date":
        "r.userIdentity.sessionContext.attributes.creationDate",
    "user_identity_session_context_session_issuer_type":
        "r.userIdentity.sessionContext.sessionIssuer.type",
    "user_identity_session_context_session_issuer_principal_id":
        "r.userIdentity.sessionContext.sessionIssuer.principalId",
    "user_identity_session_context_session_issuer_arn":
        "r.userIdentity.sessionContext.sessionIssuer.arn",
    "user_identity_session_context_session_issuer_account_id":
        "r.userIdentity.sessionContext.sessionIssuer.accountId",
    "user_identity_session_context_session_issuer_user_name":
        "r.userIdentity.sessionContext.sessionIssuer.userName",
    "error_code": "r.errorCode",
    "error_message": "r.errorMessage",
    "additional_event_data": "r.additionalEventData",
    "api_version": "r.apiVersion",
    "read_only": "r.readOnly",
    "resources": "r.resources",
    "service_event_details": "r.serviceEventDetails",
    "shared_event_id": "r.sharedEventId",
    "vpc_endpoint_id": "r.vpcEndpointId",
}

# VARIANT in the reference DDL (aws_cloudtrail.py:53-92): JSON-text here
_CLOUDTRAIL_VARIANT_COLS = {
    "request_parameters", "response_elements", "user_identity",
    "additional_event_data", "resources",
}
_CLOUDTRAIL_BOOL_COLS = {
    "read_only", "user_identity_session_context_attributes_mfa_authenticated",
}


def _path_type(schema: T.StructType, dotted: str) -> T.DataType | None:
    """Resolved DataType of ``a.b.c`` against a struct schema, or None
    when any segment is absent."""
    cur: T.DataType = schema
    for part in dotted.split("."):
        if not isinstance(cur, T.StructType) or part not in cur.fieldNames():
            return None
        cur = cur[part].dataType
    return cur


def _safe_path(schema: T.StructType, dotted: str):
    """Resolve ``a.b.c`` against a struct schema; absent fields project
    as NULL (CloudTrail records are schema-on-read — files routinely
    omit error/identity fields)."""
    return F.lit(None) if _path_type(schema, dotted) is None else F.expr(dotted)


def read_cloudtrail_json(spark: SparkSession, path: str) -> DataFrame:
    """CloudTrail dump files: JSON objects with a ``Records`` array
    (aws_cloudtrail.py:122-131: COPY + FLATTEN(v:Records)).
    multiLine handles outer-array/pretty files; explode = FLATTEN."""
    raw = spark.read.option("multiLine", "true").json(path)
    rec = raw.select(F.explode("Records").alias("r"))

    def land(name, src):
        col, dtype = _safe_path(rec.schema, src), _path_type(rec.schema, src)
        if name in _CLOUDTRAIL_VARIANT_COLS and isinstance(
            dtype, (T.StructType, T.ArrayType, T.MapType)
        ):
            # VARIANT in the reference DDL → JSON text here, so pack
            # SQL's col:path access works over the landed column
            return F.to_json(col).alias(name)
        return col.cast(
            "boolean" if name in _CLOUDTRAIL_BOOL_COLS else "string"
        ).alias(name)

    cols = [land(name, src) for name, src in CLOUDTRAIL_LANDING_COLS.items()]
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


# aws_flow_log.py:65-76 — data.network_protocol_mapping dimension
# (IANA protocol number → keyword/name), uploaded from
# connectors/protocol_table.csv at connect time (PUT + COPY, :108-114).
# The CSV is a connect-time input artifact, read at run time like the
# pack SQL (packs.PACKS_DIR) rather than vendored.
PROTOCOL_MAPPING_CSV = os.environ.get(
    "SNOWALERT_PROTOCOL_CSV",
    "/root/reference/src/connectors/protocol_table.csv",
)

PROTOCOL_MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("protocol_id", T.IntegerType()),
        T.StructField("protocol_keyword", T.StringType()),
        T.StructField("protocol_name", T.StringType()),
        T.StructField("protocol_ipv6_extension_header", T.StringType()),
    ]
)


def read_protocol_mapping_csv(
    spark: SparkSession, path: str = PROTOCOL_MAPPING_CSV
) -> DataFrame:
    """The ``data.network_protocol_mapping`` dimension table
    (aws_flow_log.py:65-76 DDL, :44-46 file format: CSV, skip_header=1,
    comma, empty-as-NULL). The Y/N extension-header flag lands as the
    DDL's BOOLEAN. ~150 rows — a broadcast dimension for rule views
    that decode ``flow_log.protocol`` numbers into names."""
    df = (
        spark.read.schema(PROTOCOL_MAPPING_SCHEMA)
        .option("sep", ",")
        .option("header", "true")
        .option("nullValue", "")
        .csv(path)
    )
    return df.withColumn(
        "protocol_ipv6_extension_header",
        F.col("protocol_ipv6_extension_header") == F.lit("Y"),
    )


def connect_flow_log(
    spark: SparkSession,
    log_path: str,
    connection_name: str = "default",
    protocol_csv: str = PROTOCOL_MAPPING_CSV,
) -> dict[str, DataFrame]:
    """Flow-log connect (aws_flow_log.py:86-135): register the typed
    landing view AND the ``data.network_protocol_mapping`` dimension —
    the reference creates both at connect time, so rule views can join
    protocol numbers to names immediately. View names follow the
    catalog-flattening convention (``data.x`` → ``data_x``). The
    mapping is created once per session (``ifnotexists=True`` parity:
    re-connecting another flow-log connection reuses it)."""
    landing = read_flow_log_csv(spark, log_path)
    view = f"data_aws_vpc_flow_log_{connection_name}_connection"
    landing.createOrReplaceTempView(view)
    mapping_view = "data_network_protocol_mapping"
    if not spark.catalog.tableExists(mapping_view):
        read_protocol_mapping_csv(spark, protocol_csv).createOrReplaceTempView(
            mapping_view
        )
    return {
        "landing": spark.table(view),
        "network_protocol_mapping": spark.table(mapping_view),
    }


# aws_config.py:49-65 — the landing DDL; item paths per the ingest
# task's SELECT (:172-193). The reference SELECT has a stray alias
# (`value:resourceType::STRING aws_region`, :184) — the INSERT's
# column list (:174-176) is what binds, landing resourceType as
# resource_type; this projection follows the DDL.
CONFIG_LANDING_COLS: dict[str, str] = {
    "configuration_item_capture_time": "r.configurationItemCaptureTime",
    "account_id": "r.awsAccountId",
    "aws_region": "r.awsRegion",
    "resource_type": "r.resourceType",
    "arn": "r.ARN",
    "availability_zone": "r.availabilityZone",
    "resource_creation_time": "r.resourceCreationTime",
    "resource_name": "r.resourceName",
    "resource_id": "r.resourceId",
    "relationships": "r.relationships",
    "configuration": "r.configuration",
    "tags": "r.tags",
}

_CONFIG_VARIANT_COLS = {"relationships", "configuration", "tags"}
_CONFIG_TIMESTAMP_COLS = {
    "configuration_item_capture_time",
    "resource_creation_time",
}

# aws_config.py:166-169 — the snapshot filename carries the delivery
# timestamp (…20190225T093000Z…); REGEXP_REPLACE to ISO-8601 then cast
_CONFIG_FILENAME_TS = r".+(\d{4})(\d{2})(\d{2})T(\d{2})(\d{2})(\d{2})Z.*"


def read_config_json(spark: SparkSession, path: str) -> DataFrame:
    """AWS Config snapshot/history files: JSON objects whose
    ``configurationItems`` array holds one row per resource state
    (aws_config.py:172-195: COPY + LATERAL FLATTEN(v:configurationItems)
    WHERE ARRAY_SIZE > 0 — explode drops empty/missing arrays the same
    way). ``event_time`` is parsed from the FILE NAME's
    ``yyyymmddThhmmssZ`` stamp (:166-169), matching the reference; a
    file named without one lands a NULL event_time instead of garbage.
    VARIANT columns (relationships/configuration/tags) land as JSON
    text so pack SQL's col:path access works over them."""
    raw = spark.read.option("multiLine", "true").json(path)
    if (
        "configurationItems" not in raw.columns
        or not isinstance(
            _path_type(raw.schema, "configurationItems"), T.ArrayType
        )
        or not isinstance(
            _path_type(raw.schema, "configurationItems").elementType,
            T.StructType,
        )
    ):
        # no items anywhere in the batch (ARRAY_SIZE > 0 lands nothing):
        # schema inference had no element to type, so project the empty
        # landing shape explicitly
        ts = ", ".join(f"{c} timestamp" for c in _CONFIG_TIMESTAMP_COLS)
        strs = ", ".join(
            f"{c} string"
            for c in CONFIG_LANDING_COLS
            if c not in _CONFIG_TIMESTAMP_COLS
        )
        return spark.createDataFrame(
            [], f"raw string, hash_raw long, event_time timestamp, {ts}, {strs}"
        ).select(
            "raw", "hash_raw", "event_time", *CONFIG_LANDING_COLS
        )
    rec = raw.select(
        F.explode("configurationItems").alias("r"),
        F.input_file_name().alias("_fname"),
    )

    def land(name, src):
        col, dtype = _safe_path(rec.schema, src), _path_type(rec.schema, src)
        if name in _CONFIG_VARIANT_COLS and isinstance(
            dtype, (T.StructType, T.ArrayType, T.MapType)
        ):
            return F.to_json(col).alias(name)
        if name in _CONFIG_TIMESTAMP_COLS:
            return F.try_to_timestamp(col.cast("string")).alias(name)
        return col.cast("string").alias(name)

    cols = [land(name, src) for name, src in CONFIG_LANDING_COLS.items()]
    fname_ts = F.when(
        F.col("_fname").rlike(_CONFIG_FILENAME_TS),
        F.regexp_replace(
            F.col("_fname"), _CONFIG_FILENAME_TS, r"$1-$2-$3T$4:$5:$6Z"
        ),
    )
    return rec.select(
        F.to_json("r").alias("raw"),
        F.xxhash64(F.to_json("r")).alias("hash_raw"),  # HASH(value) dedupe key
        F.try_to_timestamp(fname_ts).alias("event_time"),
        *cols,
    )


def _jget(col: str, path: str, cast: str | None = None):
    """Variant path over a raw-JSON text column; optional cast."""
    e = F.get_json_object(F.col(col), f"$.{path}")
    return e.cast(cast) if cast else e


def _nullif_dash(c):
    return F.nullif(c, F.lit("-"))


def read_osquery_log_json(spark: SparkSession, path: str) -> DataFrame:
    """osquery result logs, JSON-lines (osquery_log.py:48-63 landing,
    :216-223 COPY projection): raw + HASH + typed paths; event_time is
    the row's unixTime."""
    raw = spark.read.text(path).withColumnRenamed("value", "raw")
    return raw.select(
        "raw",
        F.xxhash64("raw").alias("hash_raw"),
        F.timestamp_seconds(_jget("raw", "unixTime", "long")).alias("event_time"),
        _jget("raw", "action").alias("action"),
        _jget("raw", "calendarTime").alias("calendartime"),
        _jget("raw", "columns").alias("columns"),
        _jget("raw", "counter", "long").alias("counter"),
        _jget("raw", "epoch", "long").alias("epoch"),
        _jget("raw", "hostIdentifier").alias("hostidentifier"),
        _jget("raw", "instance_id").alias("instance_id"),
        _jget("raw", "name").alias("name"),
        F.timestamp_seconds(_jget("raw", "unixTime", "long")).alias("unixtime"),
        _jget("raw", "decorations").alias("decorations"),
    )


def _last_of_chains(col_expr):
    """nginx upstream chains: `a : b, c` → the final hop's value
    (nginx_log.py:225-228 array_slice/split idiom)."""
    last_colon = F.element_at(F.split(col_expr, " : "), -1)
    return F.nullif(F.element_at(F.split(last_colon, ", "), -1), F.lit("-"))


def read_nginx_log_json(spark: SparkSession, path: str) -> DataFrame:
    """nginx access logs, JSON-lines (nginx_log.py:48-80 landing,
    :216-231 COPY projection): request-id extraction, '-'-as-NULL
    normalization, host/user-agent derivations, and final-hop upstream
    parsing."""
    raw = spark.read.text(path).withColumnRenamed("value", "raw")
    req = _jget("raw", "request")
    host_header = _jget("raw", "host_header")
    ua = _jget("raw", "http_user_agent")
    up_status = _jget("raw", "upstream_status")
    return raw.select(
        "raw",
        F.xxhash64("raw").alias("hash_raw"),
        F.regexp_extract(req, r".*request_?[iI]+d=([^&\s]+)", 1).alias("request_id"),
        _jget("raw", "time", "timestamp").alias("event_time"),
        _jget("raw", "bytes_sent", "long").alias("bytes_sent"),
        _jget("raw", "connection", "long").alias("connection"),
        _jget("raw", "connection_requests", "long").alias("connection_requests"),
        _nullif_dash(_jget("raw", "deployment_cluster")).alias("deployment_cluster"),
        _nullif_dash(_jget("raw", "gzip_ratio")).cast("double").alias("gzip_ratio"),
        host_header.alias("host_header"),
        F.upper(F.element_at(F.split(host_header, r"\."), 1)).alias("host_name"),
        _nullif_dash(
            F.element_at(F.split(F.element_at(F.split(ua, r"\("), 1), "/"), 1)
        ).alias("user_agent"),
        _nullif_dash(ua).alias("http_user_agent"),
        _nullif_dash(_jget("raw", "http_xff")).alias("http_xff"),
        _nullif_dash(_jget("raw", "http_referer")).alias("http_referer"),
        F.regexp_extract(req, r"^([A-Z]{3,4})\s+.*", 1).alias("http_method"),
        _jget("raw", "instance_id").alias("instance_id"),
        _jget("raw", "redirect_counter", "long").alias("redirect_counter"),
        _jget("raw", "remote_address").alias("remote_address"),
        req.alias("request"),
        _jget("raw", "request_time", "double").alias("request_time"),
        _jget("raw", "requests_length", "long").alias("requests_length"),
        _nullif_dash(_jget("raw", "ssl_session_id")).alias("ssl_session_id"),
        _nullif_dash(_jget("raw", "ssl_session_reused")).alias("ssl_session_reused"),
        _jget("raw", "status", "long").alias("status"),
        (
            F.regexp_count(up_status, F.lit(" : "))
            + F.regexp_count(up_status, F.lit(", "))
            + F.lit(1)
        ).alias("upstream_count"),
        _last_of_chains(_jget("raw", "upstream_address")).alias("upstream_address"),
        _last_of_chains(_jget("raw", "upstream_response_length"))
        .cast("long")
        .alias("upstream_response_length"),
        _last_of_chains(_jget("raw", "upstream_response_time"))
        .cast("double")
        .alias("upstream_response_time"),
        _last_of_chains(up_status).cast("long").alias("upstream_status"),
    )


def read_nginx_error_log_json(spark: SparkSession, path: str) -> DataFrame:
    """nginx error logs (nginx_log.py:82-90 landing, :242-245 COPY)."""
    raw = spark.read.text(path).withColumnRenamed("value", "raw")
    return raw.select(
        "raw",
        F.xxhash64("raw").alias("hash_raw"),
        _jget("raw", "instance_id").alias("instance_id"),
        _jget("raw", "log_level").alias("log_level"),
        _jget("raw", "message").alias("message"),
        _jget("raw", "time", "timestamp").alias("event_time"),
        _jget("raw", "pid", "long").alias("pid"),
        _jget("raw", "tid", "long").alias("tid"),
    )


def read_azure_log_json(
    spark: SparkSession, path: str, connection_type: str = "operation"
) -> DataFrame:
    """Azure activity/audit logs, JSON-lines of event records
    (azure_log.py:73-124 landing, :318-352 merge projections).
    ``operation`` and ``audit`` connection types; dedupe-on-raw is the
    store's upsert concern (the reference MERGEs ON a.raw = b.value).
    """
    raw = spark.read.text(path).withColumnRenamed("value", "raw")
    if connection_type == "operation":
        return raw.select(
            "raw",
            F.xxhash64("raw").alias("hash_raw"),
            _jget("raw", "callerIpAddress").alias("caller_ip_address"),
            _jget("raw", "category").alias("category"),
            _jget("raw", "correlationId").alias("correlation_id"),
            _jget("raw", "durationMs", "long").alias("duration_ms"),
            _jget("raw", "identity").alias("identity"),
            _jget("raw", "identity.authorization").alias("identity_authorization"),
            _jget("raw", "identity.claims").alias("identity_claims"),
            _jget("raw", "level").alias("level"),
            _jget("raw", "location").alias("location"),
            _jget("raw", "operationName").alias("operation_name"),
            _jget("raw", "properties").alias("properties"),
            _jget("raw", "properties.ancestors").alias("properties_ancestors"),
            _jget("raw", "properties.isComplianceCheck").alias(
                "properties_is_compliance_check"
            ),
            _jget("raw", "properties.policies").alias("properties_policies"),
            _jget("raw", "properties.resourceLocation").alias(
                "properties_resource_location"
            ),
            _jget("raw", "resourceId").alias("resource_id"),
            _jget("raw", "resultSignature").alias("result_signature"),
            _jget("raw", "resultType").alias("result_type"),
            _jget("raw", "time", "timestamp").alias("event_time"),
            F.current_timestamp().alias("loaded_on"),
        )
    if connection_type == "audit":
        return raw.select(
            "raw",
            F.xxhash64("raw").alias("hash_raw"),
            _jget("raw", "callerIpAddress").alias("caller_ip_address"),
            _jget("raw", "category").alias("category"),
            _jget("raw", "correlationId").alias("correlation_id"),
            _jget("raw", "durationMs", "long").alias("duration_ms"),
            _jget("raw", "level").alias("level"),
            _jget("raw", "operationName").alias("operation_name"),
            _jget("raw", "operationVersion").alias("operation_version"),
            _jget("raw", "properties").alias("properties"),
            _jget("raw", "properties.activityDateTime", "timestamp").alias(
                "properties_activity_date_time"
            ),
            _jget("raw", "properties.activityDisplayName").alias(
                "properties_activity_display_name"
            ),
            _jget("raw", "properties.additionalDetails").alias(
                "properties_additional_details"
            ),
            _jget("raw", "properties.category").alias("properties_category"),
            _jget("raw", "properties.id").alias("properties_id"),
            _jget("raw", "properties.initiatedBy").alias("properties_initiated_by"),
            _jget("raw", "properties.loggedByService").alias(
                "properties_logged_by_service"
            ),
            _jget("raw", "properties.operationType").alias(
                "properties_operation_type"
            ),
            _jget("raw", "properties.result").alias("properties_result"),
            _jget("raw", "properties.resultReason").alias("properties_result_reason"),
            _jget("raw", "properties.targetResources").alias(
                "properties_target_resources"
            ),
            _jget("raw", "resourceId").alias("resource_id"),
            _jget("raw", "resultSignature").alias("result_signature"),
            _jget("raw", "tenantId").alias("tenant_id"),
            _jget("raw", "time", "timestamp").alias("event_time"),
            F.current_timestamp().alias("loaded_on"),
        )
    if connection_type == "signin":
        # azure_log.py signin projection (:318-352) — camelCase path →
        # landing column pairs; typed columns cast, VARIANT stays text
        paths = [
            ("Level", "level", "long"),
            ("callerIpAddress", "caller_ip_address", None),
            ("category", "category", None),
            ("correlationId", "correlation_id", None),
            ("durationMs", "duration_ms", "long"),
            ("identity", "identity", None),
            ("location", "location", None),
            ("operationName", "operation_name", None),
            ("operationVersion", "operation_version", None),
            ("properties", "properties", None),
            ("properties.appDisplayName", "properties_app_display_name", None),
            ("properties.appId", "properties_app_id", None),
            ("properties.appliedConditionalAccessPolicies",
             "properties_applied_conditional_acess_policies", None),
            ("properties.authenticationMethodsUsed",
             "properties_authentication_methods_used", None),
            ("properties.authenticationProcessingDetails",
             "properties_authentication_processing_details", None),
            ("properties.clientAppUsed", "properties_client_app_used", None),
            ("properties.conditionalAccessStatus",
             "properties_conditional_access_status", None),
            ("properties.createdDateTime", "properties_created_date_time",
             "timestamp"),
            ("properties.deviceDetail", "properties_device_detail", None),
            ("properties.id", "properties_id", None),
            ("properties.ipAddress", "properties_ip_address", None),
            ("properties.isInteractive", "properties_is_interactive", "boolean"),
            ("properties.location", "properties_location", None),
            ("properties.mfaDetail", "properties_mfa_detail", None),
            ("properties.networkLocationDetails",
             "properties_network_location", None),
            ("properties.processingTimeInMilliseconds",
             "properties_processing_time_in_milliseconds", "long"),
            ("properties.resourceDisplayName",
             "properties_resource_display_name", None),
            ("properties.resourceId", "properties_resource_id", None),
            ("properties.riskDetail", "properties_risk_detail", None),
            ("properties.riskEventTypes", "properties_risk_event_types", None),
            ("properties.riskLevelAggregated",
             "properties_risk_level_aggregated", None),
            ("properties.riskLevelDuringSignIn",
             "properties_risk_level_during_signin", None),
            ("properties.riskState", "properties_risk_state", None),
            ("properties.status", "properties_status", None),
            ("properties.tokenIssuerType", "properties_token_issuer_type", None),
            ("properties.userDisplayName", "properties_user_display_name", None),
            ("properties.userId", "properties_user_id", None),
            ("properties.userPrincipalName",
             "properties_user_principal_name", None),
            ("resourceId", "resource_id", None),
            ("resultDescription", "result_description", None),
            ("resultSignature", "result_signature", None),
            ("resultType", "result_type", None),
            ("tenantId", "tenant_id", None),
            ("time", "event_time", "timestamp"),
        ]
        return raw.select(
            "raw",
            F.xxhash64("raw").alias("hash_raw"),
            *[_jget("raw", p, cast).alias(col) for p, col, cast in paths],
            F.current_timestamp().alias("loaded_on"),
        )
    raise ValueError(f"unsupported azure_log connection type {connection_type!r}")


# github_webhooks_s3.py:207-214 — the webhook COPY's path projection
GITHUB_WEBHOOK_PATHS = [
    "ref", "before", "after", "created", "deleted", "forced", "base_ref",
    "compare", "commits", "head_commit", "repository", "pusher",
    "organization", "sender", "action", "check_run", "check_suite", "number",
    "pull_request", "label", "requested_team", "ref_type", "master_branch",
    "description", "pusher_type", "review", "changes", "comment", "issue",
    "id", "sha", "name", "target_url", "context", "state", "commit",
    "branches", "created_at", "updated_at", "assignee", "release",
    "membership", "alert", "scope", "member", "requested_reviewer", "team",
    "starred_at", "pages", "project_card", "build", "deployment_status",
    "deployment", "forkee", "milestone", "key", "project_column", "status",
    "avatar_url",
]


def read_github_webhooks_json(spark: SparkSession, path: str) -> DataFrame:
    """GitHub webhook payload dumps, JSON-lines
    (github_webhooks_s3.py:60-130 landing, :207-214 COPY): insert
    time + raw + HASH + one column per top-level webhook path."""
    raw = spark.read.text(path).withColumnRenamed("value", "raw")
    return raw.select(
        F.current_timestamp().alias("insert_time"),
        "raw",
        F.xxhash64("raw").alias("hash_raw"),
        *[
            F.get_json_object(F.col("raw"), f"$.{p}").alias(p)
            for p in GITHUB_WEBHOOK_PATHS
        ],
    )


# ldap_log.py:49-58
LDAP_SCHEMA = T.StructType(
    [
        T.StructField("group_name", T.StringType()),
        T.StructField("display_name", T.StringType()),
        T.StructField("sam", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("account_created", T.TimestampType()),
        T.StructField("account_last_modified", T.TimestampType()),
        T.StructField("password_last_set", T.TimestampType()),
        T.StructField("password_expires", T.TimestampType()),
    ]
)


def read_ldap_log_csv(spark: SparkSession, path: str) -> DataFrame:
    """LDAP group exports: comma CSV, header row, optionally-quoted
    fields (ldap_log.py:45-58)."""
    return (
        spark.read.schema(LDAP_SCHEMA)
        .option("sep", ",")
        .option("header", "true")
        .option("quote", '"')
        .csv(path)
    )
