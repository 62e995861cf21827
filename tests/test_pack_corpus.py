"""Pack corpus: every non-azure reference pack statement runs verbatim
(original SQL text loaded from the reference checkout, transpiled by
the compat layer) over synthetic landing fixtures with planted
violations, and each view's output is pinned by a golden assertion.

Covers: cis_aws_pack.sql (22 views), aws_query_pack.sql (4),
snowflake_query_pack.sql (3), osquery_query_pack.sql (1),
umbrella_query_pack.sql (1), okta.sql (5 data views),
snowflake_security_monitoring.sql (7 queries),
snowflake_cost_management.sql (4 queries).
cis_azure_pack.sql is exercised in test_pack_corpus_azure.py.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from snowalert_spark import compat, packs
from snowalert_spark.rules import RuleRegistry

pytestmark = pytest.mark.skipif(
    not os.path.isdir(packs.PACKS_DIR), reason="reference packs dir unavailable"
)


def ago(hours: float = 0, days: float = 0) -> dt.datetime:
    return dt.datetime.utcnow() - dt.timedelta(hours=hours, days=days)


def _df(spark, rows, schema, name):
    spark.createDataFrame(rows, schema).createOrReplaceTempView(name)


@pytest.fixture(scope="module")
def corpus(spark):
    """Landing fixtures + the full non-azure rule registry."""
    J = json.dumps

    # ---- CloudTrail (cis_aws raw landing + aws_query_pack projection)
    _df(spark, [
        # CIS 1.1 violation: root activity not via support
        (J({"eventName": "ConsoleLogin"}), ago(days=1), "Root", "root", None,
         "111", "1.2.3.4", None),
        # excluded: root via support endpoint
        (J({}), ago(days=2), "Root", "root", None, "111",
         "support.amazonaws.com", None),
        # CIS 1.3: bob has a recent signin, alice doesn't
        (J({}), ago(days=5), "IAMUser", "bob", None, "111", "9.9.9.9",
         "signin.amazonaws.com"),
    ], "raw string, event_time timestamp, user_identity_type string, "
       "user_identity_username string, user_identity_access_key_id string, "
       "recipient_account_id string, source_ip_address string, "
       "user_identity_invokedby string",
       "data_cloudtrail")

    _df(spark, [
        ("111", "acme", ago(hours=1)),
        ("222", "beta", ago(hours=1)),
    ], "account_id string, account_alias string, recorded_at timestamp",
       "data_aws_collect_iam_list_account_aliases")

    _df(spark, [
        ("alice", "111", ago(hours=2)),
        ("bob", "111", ago(hours=2)),
        ("carl", "111", ago(days=3)),  # outside the 1-day recording window
    ], "user_name string, account_id string, recorded_at timestamp",
       "data_aws_collect_iam_get_login_profile")

    _df(spark, [
        ("111", "carol", ago(days=100), "Active"),   # CIS 1.4 violation
        ("111", "dan", ago(days=10), "Active"),
        ("111", "eve", ago(days=120), "Inactive"),
    ], "account_id string, user_name string, create_date timestamp, status string",
       "data_aws_collect_iam_list_access_keys")

    _df(spark, [
        # acct 111 fails every password-policy check (CIS 1.5-1.11)
        ("111", "false", None, "false", "false", 8, 5, 120, "false"),
        ("222", "true", "true", "true", "true", 14, 24, 90, "true"),
    ], "account_id string, require_uppercase_characters string, "
       "require_lowercase_characters string, require_symbols string, "
       "require_numbers string, minimum_password_length int, "
       "password_reuse_prevention int, max_password_age int, expire_passwords string",
       "data_aws_collect_iam_get_account_password_policy")

    _df(spark, [
        ("111", ago(hours=1), J([
            {"arn": "arn:aws:iam::111:root", "user": "<root_account>",
             "access_key_1_active": True, "access_key_2_active": False},
            {"arn": "arn:aws:iam::111:user/alice", "user": "alice",
             "access_key_1_active": True, "access_key_2_active": False},
        ])),
        # stale report where root had no key: must be ignored (latest wins)
        ("111", ago(days=2), J([
            {"arn": "arn:aws:iam::111:root", "user": "<root_account>",
             "access_key_1_active": False, "access_key_2_active": False},
        ])),
    ], "account_id string, recorded_at timestamp, content_csv_parsed string",
       "data_aws_collect_iam_get_credential_report")

    _df(spark, [("111", "Acme Inc", ago(hours=1))],
        "id string, name string, recorded_at timestamp",
        "data_aws_collect_organizations_list_accounts_connection")

    _df(spark, [
        ("111", ago(hours=1), "0"),   # CIS 1.13 violation (latest row)
        ("111", ago(days=2), "1"),    # stale, must lose to the row above
        ("222", ago(hours=1), "1"),
    ], "account_id string, recorded_at timestamp, account_mfa_enabled string",
       "data_aws_collect_iam_get_account_summary")

    _df(spark, [("arn:aws:iam::111:mfa/root-device",)],
        "serial_number string",
        "data_aws_collect_iam_list_virtual_mfa_devices")

    _df(spark, [
        # CIS 1.16 violation: policy attached directly to a user
        ("111", "arn:aws:iam::111:policy/p1", "alice", "AID1", None, None,
         ago(hours=1)),
        # group-attached: clean
        ("111", "arn:aws:iam::111:policy/p2", None, None, "admins", None,
         ago(hours=1)),
        # CIS 1.20 violation: support policy attached to nothing
        ("111", "arn:aws:iam::aws:policy/AWSSupportAccess", None, None, None,
         None, ago(hours=1)),
    ], "account_id string, policy_arn string, user_name string, user_id string, "
       "group_name string, role_name string, recorded_at timestamp",
       "data_aws_collect_iam_list_entities_for_policy")

    _df(spark, [
        # CIS 1.22 violation: star-action star-resource allow
        ("111", "arn:aws:iam::111:policy/too-broad", ago(hours=1),
         J({"Statement": [{"Effect": "Allow", "Action": "*", "Resource": "*"}]})),
        # whitelisted AWS-managed admin policy
        ("111", "arn:aws:iam::aws:policy/AdministratorAccess", ago(hours=1),
         J({"Statement": [{"Effect": "Allow", "Action": "*", "Resource": "*"}]})),
        # scoped policy: clean
        ("111", "arn:aws:iam::111:policy/scoped", ago(hours=1),
         J({"Statement": [{"Effect": "Allow", "Action": "s3:Get*",
                           "Resource": "arn:aws:s3:::b/*"}]})),
    ], "account_id string, policy_arn string, recorded_at timestamp, document string",
       "data_aws_collect_iam_get_policy_version")

    _df(spark, [
        ("111", "trail1", ago(hours=1), "FALSE", "bkt1"),  # CIS 2.2 violation
        ("111", "trail2", ago(hours=1), "TRUE", "bkt2"),
    ], "account_id string, name string, recorded_at timestamp, "
       "log_file_validation_enabled string, s3_bucket_name string",
       "data_aws_collect_cloudtrail_describe_trails")

    _df(spark, [
        # CIS 2.3 violation: trail bucket open to any principal
        ("111", "bkt1", J({"Statement": [
            {"Effect": "Allow", "Principal": "*", "Action": "s3:GetObject",
             "Resource": "*"}]}), ago(hours=1)),
        # scoped principal: clean
        ("111", "bkt2", J({"Statement": [
            {"Effect": "Allow", "Principal": {"AWS": "arn:aws:iam::111:root"},
             "Action": "s3:GetObject", "Resource": "*"}]}), ago(hours=1)),
    ], "account_id string, bucket string, policy string, recorded_at timestamp",
       "data_aws_collect_s3_get_bucket_policy")

    _df(spark, [
        # acct 111 records everything; acct 222 has no recorder → CIS 2.5
        ("111", J({"allSupported": True, "includeGlobalResourceTypes": True})),
    ], "account_id string, recording_group string",
       "data_aws_collect_config_describe_configuration_recorders")

    _df(spark, [
        # CIS 4.1 violation: ssh open to the world
        ("111", "sg-1", "open-ssh", "allows ssh", ago(hours=1), J([
            {"IpProtocol": "tcp", "FromPort": 22, "ToPort": 22,
             "IpRanges": [{"CidrIp": "0.0.0.0/0"}], "Ipv6Ranges": []}])),
        # internal-only: clean (NB 10.0.0.0/8 would match the rule's
        # substring LIKE '%0.0.0.0%' — in Snowflake too)
        ("111", "sg-2", "internal", "intranet", ago(hours=1), J([
            {"IpProtocol": "tcp", "FromPort": 22, "ToPort": 22,
             "IpRanges": [{"CidrIp": "10.1.2.0/24"}], "Ipv6Ranges": []}])),
        # CIS 4.2 violation: udp range covering 3389 open to the world
        ("111", "sg-3", "rdp-ish", "udp wide", ago(hours=1), J([
            {"IpProtocol": "udp", "FromPort": 3000, "ToPort": 4000,
             "IpRanges": [{"CidrIp": "0.0.0.0/0"}], "Ipv6Ranges": []}])),
        # CIS 4.3 violation: default group with a non-"-1" rule
        ("111", "sg-4", "default", "default sg", ago(hours=1), J([
            {"IpProtocol": "tcp", "FromPort": 80, "ToPort": 80,
             "IpRanges": [{"CidrIp": "10.0.0.0/8"}], "Ipv6Ranges": []}])),
    ], "account_id string, group_id string, group_name string, "
       "description string, recorded_at timestamp, ip_permissions string",
       "data_aws_collect_ec2_describe_security_groups")

    # ---- aws_query_pack landing (projected CloudTrail)
    _df(spark, [
        # audit-log config change
        ("prod", "111", J({"requestParameters": {"name": "trail9"}}),
         ago(hours=2), "DeleteTrail", "frank", "arn:aws:iam::111:user/frank",
         None, None, "IAMUser", "1.2.3.4", None, J({"accountId": "111"}),
         "corp-data"),
        # permission modification denied
        ("prod", "111", J({}), ago(hours=2), "CreateUser", "grace",
         "arn:aws:iam::111:user/grace", "AccessDenied", "not authorized",
         "IAMUser", "1.2.3.4", None, J({"accountId": "111"}), "corp-data"),
        # root account activity
        ("prod", "111", J({}), ago(hours=2), "ConsoleLogin", None, None, None,
         None, "Root", "5.6.7.8", None, J({"accountId": "111"}), "corp-data"),
        # internal bucket access from an unknown account
        ("prod", "111", J({}), ago(hours=2), "GetObject", None,
         "arn:aws:iam::999:user/ext", None, None, "IAMUser", "8.8.8.8",
         J({"bucketName": "secret-bkt"}), J({"accountId": "999"}),
         "corp-data"),
        # same shape but a public bucket: excluded by affectedobject filter
        ("prod", "111", J({}), ago(hours=2), "GetObject", None,
         "arn:aws:iam::999:user/ext", None, None, "IAMUser", "8.8.8.8",
         J({"bucketName": "www-bkt"}), J({"accountId": "999"}),
         "assets-public"),
    ], "deployment string, recipient_account_id string, raw string, "
       "event_time timestamp, event_name string, "
       "user_identity_session_context_session_issuer_user_name string, "
       "user_identity_arn string, error_code string, error_message string, "
       "user_identity_type string, source_ip_address string, "
       "request_parameters string, user_identity string, affectedobject string",
       "data_cloudtrail_v")

    _df(spark, [("111",), ("222",)], "account_id string", "prod_aws_account_map")

    # ---- snowflake account_usage
    _df(spark, [
        # days=3: outside the spike query's 2-day window so these
        # one-off users don't trip its 10x-of-average check
        ("q1", "GRANT ROLE securityadmin TO USER evil;", "GRANT", "SUCCESS",
         "mallory", "SYSADMIN", ago(days=3), None, None),
        ("q2", "GRANT ROLE analyst TO USER bob;", "GRANT", "SUCCESS",
         "carol", "SYSADMIN", ago(days=3), None, None),
        ("q3", "SELECT 1", "SELECT", "FAILED", "dave", "PUBLIC",
         ago(days=3), 3001, "not authorized to view table"),
        ("q4", "ALTER USER admin_joe SET PASSWORD='x'", "ALTER_USER",
         "SUCCESS", "eve", "SECURITYADMIN", ago(days=3), None, None),
        ("q5", "CREATE USER newbie", "CREATE_USER", "SUCCESS", "frank",
         "USERADMIN", ago(days=3), None, None),
    ] + [
        (f"qa{i}", "SELECT 1", "SELECT", "SUCCESS", "alice", "PUBLIC",
         ago(days=5), None, None) for i in range(2)
    ] + [
        (f"qb{i}", "SELECT 1", "SELECT", "SUCCESS", "alice", "PUBLIC",
         ago(days=1), None, None) for i in range(30)
    ] + [
        (f"qc{i}", "SELECT 1", "SELECT", "SUCCESS", "bob", "PUBLIC",
         ago(days=5), None, None) for i in range(10)
    ] + [
        ("qd0", "SELECT 1", "SELECT", "SUCCESS", "bob", "PUBLIC",
         ago(days=1), None, None)
    ], "query_id string, query_text string, query_type string, "
       "execution_status string, user_name string, role_name string, "
       "start_time timestamp, error_code int, error_message string",
       "snowflake_account_usage_query_history")

    _df(spark, [
        ("e1", ago(hours=1), "hank", "1.1.1.1", "SNOWFLAKE_UI", None, None,
         "NO", "PASSWORD", None),
    ] + [
        (f"ip{i}", ago(hours=2), f"user{i}", "6.6.6.6", "JDBC_DRIVER", 390100,
         "bad password", "NO", "PASSWORD", None) for i in range(6)
    ] + [
        (f"us{i}", ago(hours=2), "ursula", f"7.7.7.{i}", "JDBC_DRIVER", 390100,
         "bad password", "NO", "PASSWORD", None) for i in range(4)
    ] + [
        ("ok1", ago(hours=1), "ian", "2.2.2.2", "SNOWFLAKE_UI", None, None,
         "YES", "PASSWORD", "MFA_TOKEN"),
    ], "event_id string, event_timestamp timestamp, user_name string, "
       "client_ip string, reported_client_type string, error_code int, "
       "error_message string, is_success string, "
       "first_authentication_factor string, second_authentication_factor string",
       "snowflake_account_usage_login_history")

    # ---- osquery + inventory
    _df(spark, [
        (ago(hours=0.5),
         J({"InstanceId": "i-123", "Tags": "[]", "State": {"Name": "running"}}),
         "acct1"),
        (ago(hours=0.5),
         J({"InstanceId": "i-456", "Tags": "[]", "State": {"Name": "running"}}),
         "acct1"),
        (ago(hours=0.5),
         J({"InstanceId": "i-789", "Tags": "[]", "State": {"Name": "stopped"}}),
         "acct1"),
    ], "snapshot_at timestamp, data string, accountid string",
       "aws_inventory_snapshots_instances")

    _df(spark, [("i-456", ago(hours=0.2))],
        "instance_id string, event_time timestamp", "data_osquery_v")

    _df(spark, [("acct1", "prod", "acme")],
        "account_id string, deployment string, account_alias string",
        "aws_inventory_snapshots_aws_account_map")

    # ---- umbrella
    slices = []
    events = []
    for h in range(4):
        for host in ("evil.com", "ok.com"):
            slices.append((ago(hours=h + 1), ago(hours=h), host))
    # evil.com: malware-allowed lookups in 2 of 4 slices (ratio 0.5)
    events += [(f"u{h}", ago(hours=h + 0.5), "evil.com", "Malware", "Allowed")
               for h in (0, 1)]
    # ok.com: 1 of 4 (ratio 0.25, under threshold)
    events += [("u9", ago(hours=0.5), "ok.com", "Malware", "Allowed")]
    _df(spark, events,
        "uuid string, timestamp timestamp, host string, categories string, "
        "action string", "data_umbrella")
    _df(spark, slices,
        "slice_start timestamp, slice_end timestamp, host string",
        "data_latest_umbrella_slices")

    # ---- okta landing connections
    def okta_user(uid, status, t):
        return (t, J({"id": uid, "status": status,
                      "created": "2023-01-01T00:00:00.000Z",
                      "activated": "2023-01-02T00:00:00.000Z",
                      "statusChanged": "2023-06-01T00:00:00.000Z",
                      "lastLogin": "2024-01-01T10:00:00.000Z",
                      "lastUpdated": "2024-01-01T10:00:00.000Z",
                      "passwordChanged": "2023-06-01T00:00:00.000Z",
                      "profile": {"login": f"{uid}@x.io"},
                      "credentials": {"provider": "OKTA"},
                      "_links": {"self": f"https://okta/{uid}"}}))

    _df(spark, [
        okta_user("u1", "SUSPENDED", ago(days=2)),
        okta_user("u1", "ACTIVE", ago(hours=1)),
        okta_user("u2", "ACTIVE", ago(hours=1)),
    ], "event_time timestamp, raw string", "data_okta_users_connection")

    _df(spark, [
        (ago(days=2), J({"id": "g1", "created": "2023-01-01T00:00:00.000Z",
                         "lastUpdated": "2023-01-01T00:00:00.000Z",
                         "lastMembershipUpdated": "2023-01-01T00:00:00.000Z",
                         "objectClass": ["okta:user_group"], "type": "OKTA_GROUP",
                         "profile": {"name": "old-name"}, "_links": {},
                         "users": [], "apps": []})),
        (ago(hours=1), J({"id": "g1", "created": "2023-01-01T00:00:00.000Z",
                          "lastUpdated": "2024-01-01T00:00:00.000Z",
                          "lastMembershipUpdated": "2024-01-01T00:00:00.000Z",
                          "objectClass": ["okta:user_group"], "type": "OKTA_GROUP",
                          "profile": {"name": "new-name"}, "_links": {},
                          "users": [], "apps": []})),
    ], "event_time timestamp, raw string", "data_okta_groups_connection")

    _df(spark, [
        (ago(hours=1), J({"uuid": "ev-1", "published": "2024-01-01T10:00:00.000Z",
                          "eventType": "user.session.start", "version": "0",
                          "severity": "INFO", "legacyEventType": "core.user_auth",
                          "displayMessage": "User login",
                          "actor": {"id": "u1"}, "client": {"ip": "1.2.3.4"},
                          "request": {}, "outcome": {"result": "SUCCESS"},
                          "target": [], "transaction": {"id": "t1"},
                          "debugContext": {}, "authenticationContext": {},
                          "securityContext": {}})),
    ], "event_time timestamp, raw string", "data_okta_system_log_connection")

    # ---- registry: every non-azure rules.* view + okta data views
    reg = RuleRegistry()
    counts = {}
    for f in ("cis_aws_pack.sql", "aws_query_pack.sql",
              "snowflake_query_pack.sql", "osquery_query_pack.sql",
              "umbrella_query_pack.sql"):
        counts[f] = len(packs.register_pack_rules(reg, f"{packs.PACKS_DIR}/{f}"))
    packs.create_pack_data_views(spark, f"{packs.PACKS_DIR}/okta.sql")
    return reg, counts


def _objects(spark, corpus, name):
    reg, _ = corpus
    rows = reg.rules[name].df(spark).collect()
    return rows, {r.object for r in rows}


# ---------------------------------------------------------------------------
# cis_aws_pack.sql — all 22 views
# ---------------------------------------------------------------------------
CIS_AWS_GOLDENS = {
    "VQ_QBYAC8Z2RBF_VIOLATION_QUERY": {"root in account acme"},          # 1.1
    "VQ_GVR3N9WQLGG_VIOLATION_QUERY": {"alice at acme"},                 # 1.3
    "VQ_WM00E51BLCE_VIOLATION_QUERY": {"carol at acme"},                 # 1.4
    "VQ_F85S78KK42_VIOLATION_QUERY": {"acme"},                           # 1.5
    "VQ_NUNJCFNQ13_VIOLATION_QUERY": {"acme"},                           # 1.6
    "VQ_ASQCIZO9VC_VIOLATION_QUERY": {"acme"},                           # 1.7
    "VQ_SKNR99XCFYS_VIOLATION_QUERY": {"acme"},                          # 1.8
    "VQ_NDHSGN5MT9L_VIOLATION_QUERY": {"acme"},                          # 1.9
    "VQ_A80WZDM7JP_VIOLATION_QUERY": {"acme"},                           # 1.10
    "VQ_SAVBJIUB6OH_VIOLATION_QUERY": {"acme"},                          # 1.11
    "VQ_YO2KZE2JCG9_VIOLATION_QUERY": {"root user at account 111"},      # 1.12
    "VQ_NLDRNE9GIQB_VIOLATION_QUERY": {"acme"},                          # 1.13
    # 1.14: a root-labeled virtual MFA device exists, so the verbatim
    # cross-join logic flags every latest account row
    "VQ_ZDIAEIEAMP_VIOLATION_QUERY": {"acme", "beta"},
    "VQ_ASKJ865AQ9_VIOLATION_QUERY": {"arn:aws:iam::111:policy/p1"},     # 1.16
    "VQ_ZIXF9ISIDDB_VIOLATION_QUERY": {"acme"},                          # 1.20
    "VQ_1PZWDBTHHVS_VIOLATION_QUERY": {"arn:aws:iam::111:policy/too-broad"},  # 1.22
    "VQ_G8HQTE899ZL_VIOLATION_QUERY": {"trail1"},                        # 2.2
    "VQ_0XADVOX2M5CQ_VIOLATION_QUERY": {"bkt1"},                         # 2.3
    "VQ_PWXDLM6H16_VIOLATION_QUERY": {"beta"},                           # 2.5
    "VQ_JW0HBLN2EW_VIOLATION_QUERY": {"sg-1"},                           # 4.1
    "VQ_M6Y4F1UEW3P_VIOLATION_QUERY": {"sg-3"},                          # 4.2
    "VQ_P7QZMWJ6Z0O_VIOLATION_QUERY": {"sg-4"},                          # 4.3
}


@pytest.mark.parametrize("view", sorted(CIS_AWS_GOLDENS))
def test_cis_aws_view(spark, corpus, view):
    rows, objects = _objects(spark, corpus, view)
    assert objects == CIS_AWS_GOLDENS[view]
    for r in rows:
        assert r.query_id and r.title and r.description
        env = json.loads(r.environment)
        assert env.get("cloud") == "aws"


def test_cis_aws_registers_all_22(corpus):
    _, counts = corpus
    assert counts["cis_aws_pack.sql"] == 22


# ---------------------------------------------------------------------------
# aws_query_pack.sql
# ---------------------------------------------------------------------------
def test_aws_audit_log_configuration_changes(spark, corpus):
    rows, objects = _objects(
        spark, corpus, "AWS_AUDIT_LOG_CONFIGURATION_CHANGES_ALERT_QUERY")
    assert objects == {"trail9"}
    assert rows[0].actor == "frank"
    assert "DeleteTrail" in rows[0].description


def test_aws_permission_modification_denied(spark, corpus):
    rows, objects = _objects(
        spark, corpus, "AWS_PERMISSION_MODIFICATION_DENIED_ALERT_QUERY")
    assert objects == {"arn:aws:iam::111:user/grace"}
    assert rows[0].action == "CreateUser"


def test_aws_root_account_activity(spark, corpus):
    rows, objects = _objects(spark, corpus, "AWS_ROOT_ACCOUNT_ACTIVITY_ALERT_QUERY")
    assert objects == {"111"}
    assert rows[0].actor == "Root"


def test_aws_internal_bucket_access(spark, corpus):
    rows, objects = _objects(spark, corpus, "AWS_INTERNAL_BUCKET_ACCESS_ALERT_QUERY")
    assert objects == {"secret-bkt"}
    assert rows[0].actor == "999"


# ---------------------------------------------------------------------------
# snowflake_query_pack.sql
# ---------------------------------------------------------------------------
def test_snowflake_admin_role_grant_monitor(spark, corpus):
    rows, objects = _objects(
        spark, corpus, "SNOWFLAKE_ADMIN_ROLE_GRANT_MONITOR_ALERT_QUERY")
    assert len(rows) == 1 and rows[0].actor == "mallory"
    assert "securityadmin" in rows[0].object


def test_snowflake_authorization_error(spark, corpus):
    rows, objects = _objects(
        spark, corpus, "SNOWFLAKE_AUTHORIZATION_ERROR_ALERT_QUERY")
    assert len(rows) == 1 and rows[0].actor == "dave"


def test_snowflake_authentication_failure(spark, corpus):
    rows, _ = _objects(spark, corpus, "SNOWFLAKE_AUTHENTICATION_FAILURE_ALERT_QUERY")
    # hank + 6 ip-spray + 4 ursula failures
    assert len(rows) == 11
    actors = {r.actor for r in rows}
    assert "hank" in actors and "ursula" in actors


# ---------------------------------------------------------------------------
# osquery + umbrella
# ---------------------------------------------------------------------------
def test_osquery_missing_server(spark, corpus):
    rows, objects = _objects(spark, corpus, "MISSING_SERVER_OSQUERY_LOGS_VIOLATION_QUERY")
    # i-123 ships no osquery logs; i-456 does; i-789 is stopped
    assert objects == {"i-123"}
    env = json.loads(rows[0].environment)
    assert env == {"cloud": "aws", "deployment": "prod", "account": "acme"}


def test_umbrella_recurring_c2(spark, corpus):
    rows, objects = _objects(spark, corpus, "RECURRING_C2_ACTIVITY_RATIO_ALERT_QUERY")
    assert objects == {"evil.com"}


# ---------------------------------------------------------------------------
# okta.sql data views
# ---------------------------------------------------------------------------
def test_okta_users_latest(spark, corpus):
    users = {r.id: r for r in spark.sql("SELECT * FROM data_okta_users").collect()}
    assert set(users) == {"u1", "u2"}
    assert users["u1"].status == "ACTIVE"  # latest snapshot wins
    assert json.loads(users["u1"].profile)["login"] == "u1@x.io"
    snaps = spark.sql("SELECT * FROM data_okta_users_snapshots").collect()
    assert len(snaps) == 3
    assert users["u1"].last_login == dt.datetime(2024, 1, 1, 10, 0, 0)


def test_okta_groups_latest(spark, corpus):
    groups = {r.id: r for r in spark.sql("SELECT * FROM data_okta_groups").collect()}
    assert set(groups) == {"g1"}
    assert json.loads(groups["g1"].profile)["name"] == "new-name"
    assert len(spark.sql("SELECT * FROM data_okta_groups_snapshots").collect()) == 2


def test_okta_system_logs(spark, corpus):
    logs = spark.sql("SELECT * FROM data_okta_system_logs").collect()
    assert len(logs) == 1
    ev = logs[0]
    assert ev.uuid == "ev-1" and ev.event_type == "user.session.start"
    assert json.loads(ev.actor) == {"id": "u1"}
    assert ev.published == dt.datetime(2024, 1, 1, 10, 0, 0)


# ---------------------------------------------------------------------------
# snowflake_security_monitoring.sql + snowflake_cost_management.sql
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def monitoring(spark, corpus):
    qs = packs.monitoring_queries(f"{packs.PACKS_DIR}/snowflake_security_monitoring.sql")
    qs.update(packs.monitoring_queries(f"{packs.PACKS_DIR}/snowflake_cost_management.sql"))

    # cost-management landing fixtures
    J_rows = [
        (1, "big_table", 11.0, ago(hours=1)),
        (2, "small_table", 2.0, ago(hours=1)),
        (3, "old_table", 50.0, ago(hours=30)),
    ]
    sch = "{} long, {} string, credits_used double, end_time timestamp"
    _df(spark, J_rows, sch.format("table_id", "table_name"),
        "snowflake_account_usage_automatic_clustering_history")
    _df(spark, J_rows, sch.format("table_id", "table_name"),
        "snowflake_account_usage_materialized_view_refresh_history")
    _df(spark, [
        (1, "busy_pipe", 15.0, ago(hours=2)),
        (2, "quiet_pipe", 1.0, ago(hours=2)),
    ], "pipe_id long, pipe_name string, credits_used double, end_time timestamp",
        "snowflake_account_usage_pipe_usage_history")
    _df(spark, [
        (1, "wh1", 1.0, ago(days=d)) for d in range(3, 28)
    ] + [
        (1, "wh1", 30.0, ago(days=1)),
        (2, "wh2", 1.0, ago(days=1)),
    ] + [
        (2, "wh2", 1.0, ago(days=d)) for d in range(3, 28)
    ], "warehouse_id long, warehouse_name string, credits_used double, "
       "start_time timestamp",
       "snowflake_account_usage_warehouse_metering_history")

    def run(name):
        return spark.sql(compat.transpile(qs[name])).collect()

    return run


def test_monitoring_bad_logins_by_ip(spark, monitoring):
    rows = monitoring("too_many_bad_logins_by_a_single_ip")
    assert len(rows) == 1 and rows[0].client_ip == "6.6.6.6" and rows[0].counts == 6


def test_monitoring_bad_logins_by_user(spark, monitoring):
    rows = monitoring("too_many_bad_logins_by_a_single_user")
    assert len(rows) == 1 and rows[0].user_name == "ursula" and rows[0].counts == 4


def test_monitoring_sensitive_role_mods(spark, monitoring):
    rows = monitoring("modifications_to_sensitive_roles")
    assert [r.query_id for r in rows] == ["q4"]


def test_monitoring_password_changes(spark, monitoring):
    rows = monitoring("password_changes")
    assert [r.query_id for r in rows] == ["q4"]


def test_monitoring_new_users(spark, monitoring):
    rows = monitoring("new_users_created")
    assert [r.query_id for r in rows] == ["q5"]


def test_monitoring_no_mfa(spark, monitoring):
    rows = monitoring("user_not_using_multi_factor_authentication")
    assert {r.user_name for r in rows} == {"hank"}


def test_monitoring_query_spike(spark, monitoring):
    rows = monitoring("suspicious_increase_in_queries_by_a_user")
    assert len(rows) == 1
    assert rows[0].user_name == "alice" and rows[0].ld_queries == 30


def test_cost_clustering_spend(spark, monitoring):
    rows = monitoring("automatic_clustering_spend")
    assert [r.table_name for r in rows] == ["big_table"] and rows[0].credits == 11.0


def test_cost_mv_spend(spark, monitoring):
    rows = monitoring("materialized_view_spend")
    assert [r.table_name for r in rows] == ["big_table"]


def test_cost_snowpipe_spend(spark, monitoring):
    rows = monitoring("snowpipe_spend")
    assert [r.pipe_name for r in rows] == ["busy_pipe"]


def test_cost_warehouse_spike(spark, monitoring):
    rows = monitoring("warehouse_spending_spike")
    assert len(rows) == 1 and rows[0].warehouse_name == "wh1"
    assert rows[0].ld_credits_used == 30.0


def test_corpus_plans_product_free(spark, corpus):
    """Scale health across the whole non-azure corpus: no pack view may
    compile to a cartesian/nested-loop product — except CIS 1.14, whose
    reference SQL is a deliberate three-way comma cross join
    (cis_aws_pack.sql:631-648)."""
    reg, _ = corpus
    allowed = {"VQ_ZDIAEIEAMP_VIOLATION_QUERY"}
    offenders = {}
    for rule in reg.rules.values():
        plan = rule.df(spark)._jdf.queryExecution().executedPlan().toString()
        prods = [op for op in ("CartesianProduct", "BroadcastNestedLoopJoin")
                 if op in plan]
        if prods and rule.name not in allowed:
            offenders[rule.name] = prods
    assert offenders == {}
