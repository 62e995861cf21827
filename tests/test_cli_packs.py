"""CLI --packs: register a reference pack verbatim and run the full
alert pipeline (queries → suppressions → processor → dispatcher) over
it end-to-end."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from snowalert_spark import packs
from snowalert_spark.run import main

pytestmark = pytest.mark.skipif(
    not os.path.isdir(packs.PACKS_DIR), reason="reference packs dir unavailable"
)


def test_cli_runs_snowflake_query_pack(spark, tmp_path):
    # landing fixture the pack's three alert views read
    spark.createDataFrame(
        [
            ("q1", "GRANT ROLE accountadmin TO USER evil;", "GRANT", "SUCCESS",
             "mallory", "SYSADMIN", dt.datetime.utcnow() - dt.timedelta(hours=1),
             None, None),
        ],
        "query_id string, query_text string, query_type string, "
        "execution_status string, user_name string, role_name string, "
        "start_time timestamp, error_code int, error_message string",
    ).createOrReplaceTempView("snowflake_account_usage_query_history")
    spark.createDataFrame(
        [],
        "event_id string, event_timestamp timestamp, user_name string, "
        "client_ip string, reported_client_type string, error_code int, "
        "error_message string, is_success string, "
        "first_authentication_factor string, second_authentication_factor string",
    ).createOrReplaceTempView("snowflake_account_usage_login_history")

    store_dir = str(tmp_path / "results")
    rc = main(["alerts", "--store", store_dir,
               "--packs", "snowflake_query_pack.sql"])
    assert rc == 0

    from snowalert_spark.store import ResultsStore

    alerts = ResultsStore(spark, store_dir).read("alerts").collect()
    assert len(alerts) == 1
    a = alerts[0]
    assert a.alert.ACTOR == "mallory"
    assert a.alert.TITLE == "Snowflake ADMIN Role Granted"
    # the pack view itself sets query_name as a lowercase literal
    # (snowflake_query_pack.sql:17) — the runner must preserve it
    assert a.alert.QUERY_NAME == "snowflake_admin_role_grant_monitor_alert_query"
    assert a.correlation_id is not None  # processor ran
    assert a.handled is not None  # dispatcher ran (memory jira handler)
