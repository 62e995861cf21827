"""Sample rules (reference: installer-queries/sample-alert-queries.sql.fmt).

The installer ships SNOWFLAKE_LOGIN_WITHOUT_MFA_ALERT_QUERY over
data.successful_snowflake_logins_v (FIXTURES.md F1). Here the fixture
view is synthesized from the driver's ``events`` table so the sample
runs out of the box: ``signup`` events become login records, odd-valued
ones lacking a second factor.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from snowalert_spark import compat
from snowalert_spark.rules import RuleRegistry
from snowalert_spark.tables import table


def register_fixture_views(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark.sql(
        compat.transpile(
            """
        SELECT 'ev-' || event_id::string AS event_id,
               ts AS event_timestamp,
               'user-' || user_id::string AS user_name,
               '10.0.0.' || (event_id % 255)::string AS client_ip,
               'SNOWFLAKE_UI' AS reported_client_type,
               'PASSWORD' AS first_authentication_factor,
               IFF(event_id % 2 = 0, 'DUO_PUSH', NULL) AS second_authentication_factor,
               'YES' AS is_success, NULL AS error_code, NULL AS error_message
        FROM events WHERE event_type = 'signup'
        """
        )
    ).createOrReplaceTempView("successful_snowflake_logins_v")


def register(reg: RuleRegistry) -> None:
    # sample-alert-queries.sql.fmt:6-23 (body near-verbatim, Snowflake
    # dialect — the compat layer does the rest)
    reg.create(
        "SNOWFLAKE_LOGIN_WITHOUT_MFA_ALERT_QUERY",
        sql="""
        SELECT 'Snowflake' AS environment,
               ARRAY_CONSTRUCT('successful_snowflake_logins') AS sources,
               user_name AS object,
               'Snowflake Login Without MFA' AS title,
               event_timestamp AS event_time,
               CURRENT_TIMESTAMP() AS alert_time,
               reported_client_type || ' logging in as ' || user_name
                   || ' from ' || client_ip AS description,
               'SnowAlert' AS detector,
               'low' AS severity,
               user_name AS actor,
               'login' AS action
        FROM successful_snowflake_logins_v
        WHERE second_authentication_factor IS NULL
        """,
        comment="Snowflake Login Without MFA\n@id snowflake_login_without_mfa\n@tags snowflake, mfa",
    )
