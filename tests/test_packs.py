"""Pack-rule parity: representative rules from each reference pack
family, re-expressed with the same semantics (cited per rule) and run
through the compat layer over synthesized fixture views.

Covers the dialect features the packs lean on: alias-reuse in WHERE,
REGEXP_SUBSTR with flags 'ie', OBJECT_CONSTRUCT envs, IN lists over
connector landing tables, QUALIFY latest-per-key over raw VARIANT
paths, and the umbrella full-outer range-join ratio rule.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from snowalert_spark import compat


def _sql(spark, q):
    return spark.sql(compat.transpile(q))


# ---------------------------------------------------------------------------
# snowflake_query_pack.sql:1-22 — ADMIN role grant monitor
# ---------------------------------------------------------------------------
def test_admin_role_grant_rule(spark):
    rows = [
        ("q1", "GRANT ROLE securityadmin TO USER evil;", "GRANT", "SUCCESS",
         "alice", "SYSADMIN", "2024-01-01 10:00:00"),
        ("q2", "GRANT ROLE analyst TO USER bob;", "GRANT", "SUCCESS",
         "carol", "SYSADMIN", "2024-01-01 11:00:00"),
        ("q3", "SELECT 1", "SELECT", "SUCCESS", "dan", "PUBLIC",
         "2024-01-01 12:00:00"),
    ]
    spark.createDataFrame(
        rows,
        "query_id string, query_text string, query_type string, "
        "execution_status string, user_name string, role_name string, "
        "start_time string",
    ).withColumn("start_time", F.col("start_time").cast("timestamp")
    ).createOrReplaceTempView("query_history")

    out = _sql(
        spark,
        """
        SELECT OBJECT_CONSTRUCT('cloud', 'Snowflake',
                                'account', CURRENT_ACCOUNT()) AS environment,
               REGEXP_SUBSTR(query_text, '\\\\s([^\\\\s]+)\\\\sto\\\\s', 1, 1, 'ie') AS object,
               'Snowflake ADMIN Role Granted' AS title,
               start_time AS event_time,
               user_name AS actor
        FROM query_history
        WHERE query_type = 'GRANT'
          AND execution_status = 'SUCCESS'
          AND (object ILIKE '%securityadmin%' OR object ILIKE '%accountadmin%')
        """,
    ).collect()
    assert len(out) == 1
    assert out[0].object == "securityadmin"
    assert out[0].actor == "alice"
    env = json.loads(out[0].environment)
    assert env == {"cloud": "Snowflake", "account": "spark_account"}


# ---------------------------------------------------------------------------
# aws_query_pack.sql:25-30 — audit-log configuration changes over the
# CloudTrail landing table produced by our JSON connector
# ---------------------------------------------------------------------------
def test_cloudtrail_config_changes_rule(spark, tmp_path):
    from snowalert_spark.sources.files import read_cloudtrail_json

    def rec(eid, name):
        return {
            "eventTime": "2024-03-01T12:00:00Z", "awsRegion": "us-east-1",
            "eventID": eid, "eventName": name,
            "eventSource": "cloudtrail.amazonaws.com",
            "eventType": "AwsApiCall", "eventVersion": "1.08",
            "recipientAccountId": "123", "requestId": "r",
            "sourceIPAddress": "9.9.9.9", "userAgent": "cli",
            "userIdentity": {"type": "IAMUser", "arn": "arn:user/x",
                              "userName": "x", "accountId": "123"},
            "readOnly": False,
        }

    p = tmp_path / "ct.json"
    p.write_text(json.dumps({
        "Records": [rec("1", "StopLogging"), rec("2", "DescribeTrails"),
                    rec("3", "DeleteTrail"), rec("4", "UpdateTrail")]
    }))
    read_cloudtrail_json(spark, str(p)).createOrReplaceTempView("cloudtrail_v")
    out = _sql(
        spark,
        """
        SELECT OBJECT_CONSTRUCT('cloud', 'AWS',
                                'account', recipient_account_id) AS environment,
               user_identity_arn AS object,
               'Audit Log Configuration Changes' AS title,
               event_time, source_ip_address AS actor, event_name AS action,
               'high' AS severity
        FROM cloudtrail_v
        WHERE event_name IN ('StopLogging', 'UpdateTrail', 'DeleteTrail')
        """,
    ).collect()
    assert {r.action for r in out} == {"StopLogging", "UpdateTrail", "DeleteTrail"}


# ---------------------------------------------------------------------------
# umbrella_query_pack.sql:19-36 — C2 activity ratio: full-outer range
# join of malware events onto per-host time slices, zero-bin ratio
# ---------------------------------------------------------------------------
def test_umbrella_c2_ratio_rule(spark):
    events = [
        ("u1", "2024-01-01 00:10:00", "h1", "Malware", "Allowed"),
        ("u2", "2024-01-01 01:10:00", "h1", "Malware", "Allowed"),
        ("u3", "2024-01-01 02:10:00", "h1", "Malware", "Allowed"),
        ("u4", "2024-01-01 00:20:00", "h2", "Malware", "Allowed"),
        ("u5", "2024-01-01 01:20:00", "h2", "Ads", "Blocked"),
    ]
    spark.createDataFrame(
        events, "uuid string, timestamp string, host string, categories string, action string"
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp")
    ).createOrReplaceTempView("umbrella")
    slices = [
        (f"2024-01-01 0{h}:00:00", f"2024-01-01 0{h}:59:59", host)
        for h in range(3)
        for host in ("h1", "h2")
    ]
    spark.createDataFrame(
        slices, "slice_start string, slice_end string, host string"
    ).select(
        F.col("slice_start").cast("timestamp").alias("slice_start"),
        F.col("slice_end").cast("timestamp").alias("slice_end"),
        "host",
    ).createOrReplaceTempView("latest_umbrella_slices")

    out = _sql(
        spark,
        """
        SELECT hostname AS object, c2_activity_ratio
        FROM (
          SELECT MAX(slice_end) AS event_timestamp,
                 SUM(IFF(bin_count = 0, 0, 1)) / COUNT(*) AS c2_activity_ratio,
                 hostname
          FROM (
            SELECT slice.slice_start, slice.slice_end, slice.host AS hostname,
                   COUNT(uuid) AS bin_count
            FROM (
              SELECT uuid, timestamp, host FROM umbrella AS event_data
              WHERE event_data.categories = 'Malware'
                AND event_data.action = 'Allowed'
            ) AS event_data
            FULL JOIN latest_umbrella_slices AS slice
              ON event_data.timestamp BETWEEN slice.slice_start AND slice.slice_end
             AND event_data.host = slice.host
            GROUP BY slice.slice_start, slice.slice_end, slice.host
          )
          WHERE hostname IS NOT NULL
          GROUP BY hostname
        )
        """,
    ).collect()
    ratios = {r.object: r.c2_activity_ratio for r in out}
    assert ratios["h1"] == pytest.approx(1.0)  # all 3 slices active
    assert ratios["h2"] == pytest.approx(1 / 3)  # 1 of 3 slices active


# ---------------------------------------------------------------------------
# packs/okta.sql:3-31 — users projection over raw VARIANT + QUALIFY
# latest-snapshot-per-id
# ---------------------------------------------------------------------------
def test_okta_users_latest_snapshot(spark):
    def user(uid, status, ts):
        return (json.dumps({"id": uid, "status": status,
                            "profile": {"login": f"{uid}@x.io"},
                            "lastLogin": "2024-01-01T00:00:00Z"}), ts)

    rows = [
        user("u1", "ACTIVE", "2024-01-02 00:00:00"),
        user("u1", "STAGED", "2024-01-01 00:00:00"),  # older snapshot
        user("u2", "SUSPENDED", "2024-01-01 12:00:00"),
    ]
    spark.createDataFrame(rows, "raw string, event_time string").withColumn(
        "event_time", F.col("event_time").cast("timestamp")
    ).createOrReplaceTempView("okta_users_connection")

    out = _sql(
        spark,
        """
        SELECT raw:id::string AS id,
               raw:status::string AS status,
               raw:profile.login::string AS login,
               event_time AS snapshot_at
        FROM okta_users_connection
        QUALIFY 1 = ROW_NUMBER() OVER (PARTITION BY raw:id
                                       ORDER BY event_time DESC)
        """,
    ).collect()
    got = {r.id: (r.status, r.login) for r in out}
    assert got == {"u1": ("ACTIVE", "u1@x.io"), "u2": ("SUSPENDED", "u2@x.io")}


# ---------------------------------------------------------------------------
# cis_aws_pack.sql:532,846 / cis_azure_pack.sql:197-217 — LATERAL
# FLATTEN over policy-document arrays + BOOLOR_AGG path predicate
# ---------------------------------------------------------------------------
def test_policy_flatten_booleans_rule(spark):
    policies = [
        ("123", "admin-policy",
         '[{"Effect": "Allow", "Action": "*", "Resource": "*"},'
         ' {"Effect": "Deny", "Action": "iam:*", "Resource": "*"}]'),
        ("123", "readonly-policy",
         '[{"Effect": "Allow", "Action": "s3:Get*", "Resource": "*"}]'),
    ]
    spark.createDataFrame(
        policies, "account_id string, policy_name string, statements string"
    ).createOrReplaceTempView("iam_policies")

    out = _sql(
        spark,
        """
        SELECT account_id, policy_name,
               BOOLOR_AGG(f.value:Effect::string = 'Allow'
                          AND f.value:Action::string = '*') AS allows_all
        FROM iam_policies, LATERAL FLATTEN(input => statements) f
        GROUP BY account_id, policy_name
        """,
    ).collect()
    got = {r.policy_name: r.allows_all for r in out}
    assert got == {"admin-policy": True, "readonly-policy": False}


# ---------------------------------------------------------------------------
# cis_azure_pack.sql:192-217 — FLATTEN(recursive => true) + BOOLOR_AGG
# path predicates (AZ CIS 1.3: role definitions assignable to root
# scope that permit all actions)
# ---------------------------------------------------------------------------
def test_flatten_recursive_rule(spark):
    docs = [
        ("rd1", '{"assignableScopes": ["/"], '
                '"permissions": [{"actions": ["*"]}], "type": "CustomRole"}'),
        ("rd2", '{"assignableScopes": ["/subscriptions/abc-123"], '
                '"permissions": [{"actions": ["Microsoft.Compute/read"]}], '
                '"type": "CustomRole"}'),
    ]
    spark.createDataFrame(docs, "id string, properties string") \
        .createOrReplaceTempView("role_definitions")

    out = _sql(
        spark,
        r"""
        SELECT
          id,
          BOOLOR_AGG(
            path RLIKE '^assignableScopes\\[[0-9]+\\]$'
            AND (value = '/' OR value RLIKE '^/subscriptions/[0-9a-f-]+$')
          ) AS root_scope,
          BOOLOR_AGG(
            path RLIKE '^permissions\\[[0-9]+\\].actions\\[[0-9]+\\]'
            AND value = '*'
          ) AS all_actions
        FROM role_definitions
           , LATERAL FLATTEN(input => properties, recursive => true)
        GROUP BY id
        """,
    ).collect()
    got = {r.id: (r.root_scope, r.all_actions) for r in out}
    assert got == {"rd1": (True, True), "rd2": (True, False)}
