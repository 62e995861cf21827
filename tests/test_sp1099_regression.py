"""SP1099 regression (reference:
tests/regression/SP1099_missing_jira_env_vars.py): with Jira
unconfigured, the full alert flow — queries → suppressions →
processor → dispatcher — must complete without errors, landing the
alert with TICKET still NULL. The rule body is the reference test's
own view text (through create_from_ddl), which also re-exercises the
SP1513 array OBJECT/SOURCES handling."""

from __future__ import annotations

import pytest

from snowalert_spark import handlers as H
from snowalert_spark.handlers.jira import JiraHandler
from snowalert_spark.rules import RuleRegistry
from snowalert_spark.runners import (
    alert_dispatcher,
    alert_processor,
    alert_queries,
    alert_suppressions,
)
from snowalert_spark.store import ResultsStore

TEST_ALERT = """
CREATE OR REPLACE VIEW rules.simple_alert_query COPY GRANTS
  COMMENT='Simple Alert Query creates one test alert
  @tags plain-test-tag'
AS
SELECT OBJECT_CONSTRUCT('account', 'account_test', 'cloud', 'cloud_test') AS environment
    , ARRAY_CONSTRUCT('obj1', 'obj2') AS object
    , 'simple_alert_query' AS title
    , 'This is a simple alert query' AS description
    , 'SnowAlert' AS detector
    , 'Test Actor' AS actor
    , 'test action' AS action
    , 'test_query_id' AS query_id
    , 'low' AS severity
    , ARRAY_CONSTRUCT('source') AS sources
    , OBJECT_CONSTRUCT('data', 'test data') AS event_data
    , CURRENT_TIMESTAMP() AS event_time
    , CURRENT_TIMESTAMP() AS alert_time
FROM (SELECT 1 AS test_data)
WHERE 1=1
  AND test_data=1
"""


def test_missing_jira_config_regression(spark, tmp_path):
    reg = RuleRegistry()
    # the reference rule lacks the _ALERT_QUERY suffix casing the
    # registry requires only by case — upcasing makes it match
    rule = reg.create_from_ddl(TEST_ALERT)
    assert rule.name == "SIMPLE_ALERT_QUERY"

    store = ResultsStore(spark, str(tmp_path))
    # unconfigured Jira: no project → handler declines, flow continues
    H.register("jira", JiraHandler(client=None, project="").handle)
    try:
        alert_queries.main(spark, store, reg)
        alert_suppressions.main(spark, store, reg)
        alert_processor.main(spark, store)
        alert_dispatcher.main(spark, store)
    finally:
        H.register("jira", H.MemoryTicketHandler().handle)

    rows = [
        r for r in store.read("alerts").collect()
        if r.alert.QUERY_ID == "test_query_id" and not r.suppressed
    ]
    assert len(rows) == 1
    assert rows[0].ticket is None
    # SP1513: array OBJECT/SOURCES JSON-stringify through the pipeline
    assert rows[0].alert.OBJECT == '["obj1","obj2"]'
    assert rows[0].alert.SOURCES == ["source"]
