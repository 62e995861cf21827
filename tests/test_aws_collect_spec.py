"""aws_collect spec fidelity: the reference's table-driven
request/response cases (src/connectors/tests/test_aws_collect.py:17-216)
ported against the real AWS_API_SPEC — error quarantine, list-of-
entities with child tasks, list-of-strings, parsed-column (csv),
repeat-field + multi-child fan-out, and parameter echo."""

from __future__ import annotations

import datetime as dt
import json
from collections import namedtuple

import pytest

from snowalert_spark.sources.aws_collect_spec import AWS_API_SPEC
from snowalert_spark.sources.collect import CollectTask, DBEntry, process_response

NOW = dt.datetime(2020, 1, 1)

Sample = namedtuple("Sample", ["task", "response", "entities", "subrequests"])


def run(sample):
    entities, children = [], []
    for item in process_response(AWS_API_SPEC, sample.task, sample.response, now=NOW):
        (entities if isinstance(item, DBEntry) else children).append(item)
    return entities, children


META = {"ResponseMetadata": {"HTTPStatusCode": 200,
                             "HTTPHeaders": {"date": "2020-01-01T00:00:00"}}}


def _e(method, **cols):
    return DBEntry(
        method.replace(".", "_"),
        {"account_id": "1", "recorded_at": NOW, **cols},
    )


SAMPLES = [
    # error quarantine (reference case 1)
    Sample(
        CollectTask("1", "iam.list_account_aliases", ()),
        ConnectionError("An unspecified error occurred"),
        [_e("iam.list_account_aliases",
            error=json.dumps({
                "exceptionName": "ConnectionError",
                "exceptionArgs": ["An unspecified error occurred"],
                "message": "An unspecified error occurred",
            }))],
        [],
    ),
    # list-of-entities + child tasks (reference case 2)
    Sample(
        CollectTask("1", "kms.list_keys", ()),
        {"Keys": [{"KeyId": "id1", "KeyArn": "arn1"},
                  {"KeyId": "id2", "KeyArn": "arn2"}], **META},
        [_e("kms.list_keys", key_id="id1", key_arn="arn1"),
         _e("kms.list_keys", key_id="id2", key_arn="arn2")],
        [CollectTask("1", "kms.get_key_rotation_status", (("KeyId", "arn1"),)),
         CollectTask("1", "kms.get_key_rotation_status", (("KeyId", "arn2"),))],
    ),
    # list-of-strings (reference case 3)
    Sample(
        CollectTask("1", "iam.list_account_aliases", ()),
        {"AccountAliases": ["one", "two"], **META},
        [_e("iam.list_account_aliases", account_alias="one"),
         _e("iam.list_account_aliases", account_alias="two")],
        [],
    ),
    # single entity with csv ParsedCol (reference case 4)
    Sample(
        CollectTask("1", "iam.get_credential_report", ()),
        {"Content": "col1,col2\nval11,val12\nval21,val22",
         "ReportFormat": "csv", "GeneratedTime": "2019-11-30T12:13:14Z", **META},
        [_e("iam.get_credential_report",
            content="col1,col2\nval11,val12\nval21,val22",
            content_csv_parsed=[{"col1": "val11", "col2": "val12"},
                                {"col1": "val21", "col2": "val22"}],
            report_format="csv", generated_time="2019-11-30T12:13:14Z")],
        [],
    ),
    # repeat-field list + 3-way child fan-out (reference case 5)
    Sample(
        CollectTask("1", "s3.list_buckets", ()),
        {"Owner": {"DisplayName": "dn1", "ID": "oid1"},
         "Buckets": [{"Name": "name1", "CreationDate": "date1"},
                     {"Name": "name2", "CreationDate": "date2"}], **META},
        [_e("s3.list_buckets", owner_display_name="dn1", owner_id="oid1",
            bucket_name="name1", bucket_creation_date="date1"),
         _e("s3.list_buckets", owner_display_name="dn1", owner_id="oid1",
            bucket_name="name2", bucket_creation_date="date2")],
        [CollectTask("1", "s3.get_bucket_acl", (("Bucket", "name1"),)),
         CollectTask("1", "s3.get_bucket_policy", (("Bucket", "name1"),)),
         CollectTask("1", "s3.get_bucket_logging", (("Bucket", "name1"),)),
         CollectTask("1", "s3.get_bucket_acl", (("Bucket", "name2"),)),
         CollectTask("1", "s3.get_bucket_policy", (("Bucket", "name2"),)),
         CollectTask("1", "s3.get_bucket_logging", (("Bucket", "name2"),))],
    ),
    # parameter echo into the landing row (reference case 6)
    Sample(
        CollectTask("1", "kms.get_key_rotation_status", (("KeyId", "arn1"),)),
        {"KeyRotationEnabled": True, **META},
        [_e("kms.get_key_rotation_status", key_arn="arn1",
            key_rotation_enabled=True)],
        [],
    ),
    # nested single-entity map (SummaryMap): mapped-but-absent keys
    # land as NULL columns (reference process_response_items semantics);
    # the full 33-key reference map (aws_collect.py:573-611)
    Sample(
        CollectTask("1", "iam.get_account_summary", ()),
        {"SummaryMap": {"AccountMFAEnabled": 1, "Users": 12,
                        "UsersQuota": 5000}, **META},
        [_e("iam.get_account_summary",
            **{**{col: None
                  for col in AWS_API_SPEC["iam.get_account_summary"]
                  ["response"]["SummaryMap"].values()},
               "account_mfa_enabled": 1, "users": 12, "users_quota": 5000})],
        [],
    ),
    # users → six-way posture fan-out per user (aws_collect.py:740-768)
    Sample(
        CollectTask("1", "iam.list_users", ()),
        {"Users": [{"Arn": "arn:u1", "Path": "/", "CreateDate": "d1",
                    "UserId": "uid1", "UserName": "u1",
                    "PasswordLastUsed": "d2", "Tags": []}], **META},
        [_e("iam.list_users", arn="arn:u1", path="/", create_date="d1",
            user_id="uid1", user_name="u1", password_last_used="d2",
            permissions_boundary=None, tags=[])],
        [CollectTask("1", m, (("UserName", "u1"),))
         for m in ("iam.get_login_profile", "iam.list_mfa_devices",
                   "iam.list_access_keys", "iam.list_groups_for_user",
                   "iam.list_user_policies",
                   "iam.list_attached_user_policies")],
    ),
    # nested PermissionsBoundary dict inside a list item + role-policy
    # child (aws_collect.py:838-862)
    Sample(
        CollectTask("1", "iam.list_roles", ()),
        {"Roles": [{"RoleName": "r1", "RoleId": "rid1", "Arn": "arn:r1",
                    "Path": "/", "CreateDate": "d1",
                    "AssumeRolePolicyDocument": {"Version": "2012-10-17"},
                    "MaxSessionDuration": 3600,
                    "PermissionsBoundary": {
                        "PermissionsBoundaryType": "Policy",
                        "PermissionsBoundaryArn": "arn:pb"}}], **META},
        [_e("iam.list_roles", role_name="r1", role_id="rid1", arn="arn:r1",
            path="/", create_date="d1",
            assume_role_policy_document={"Version": "2012-10-17"},
            description=None, max_session_duration=3600,
            permissions_boundary_type="Policy",
            permissions_boundary_arn="arn:pb", tags=None,
            role_last_used=None)],
        [CollectTask("1", "iam.list_role_policies", (("RoleName", "r1"),))],
    ),
    # two-child fan-out with differing arg bindings per child
    # (aws_collect.py:878-903)
    Sample(
        CollectTask("1", "iam.list_policies", ()),
        {"Policies": [{"PolicyName": "p1", "PolicyId": "pid1",
                       "Arn": "arn:p1", "Path": "/",
                       "DefaultVersionId": "v3", "AttachmentCount": 2,
                       "IsAttachable": True, "CreateDate": "d1",
                       "UpdateDate": "d2"}], **META},
        [_e("iam.list_policies", policy_name="p1", policy_id="pid1",
            arn="arn:p1", path="/", default_version_id="v3",
            attachment_count=2, permissions_boundary_usage_count=None,
            is_attachable=True, description=None, create_date="d1",
            update_date="d2")],
        [CollectTask("1", "iam.get_policy_version",
                     (("PolicyArn", "arn:p1"), ("VersionId", "v3"))),
         CollectTask("1", "iam.list_entities_for_policy",
                     (("PolicyArn", "arn:p1"),))],
    ),
    # multi-list response: one row per attached group/user/role, each
    # echoing the policy_arn param (aws_collect.py:915-922)
    Sample(
        CollectTask("1", "iam.list_entities_for_policy",
                    (("PolicyArn", "arn:p1"),)),
        {"PolicyGroups": [{"GroupName": "g1", "GroupId": "gid1"}],
         "PolicyUsers": [{"UserName": "u1", "UserId": "uid1"}],
         "PolicyRoles": [{"RoleName": "r1", "RoleId": "rid1"}], **META},
        [_e("iam.list_entities_for_policy", policy_arn="arn:p1",
            group_name="g1", group_id="gid1"),
         _e("iam.list_entities_for_policy", policy_arn="arn:p1",
            user_name="u1", user_id="uid1"),
         _e("iam.list_entities_for_policy", policy_arn="arn:p1",
            role_name="r1", role_id="rid1")],
        [],
    ),
    # per-grant rows with param echo (aws_collect.py:954-962)
    Sample(
        CollectTask("1", "s3.get_bucket_acl", (("Bucket", "b1"),)),
        {"Owner": {"DisplayName": "dn1", "ID": "oid1"},
         "Grants": [{"Grantee": {"Type": "Group"}, "Permission": "READ"},
                    {"Grantee": {"Type": "CanonicalUser"},
                     "Permission": "FULL_CONTROL"}], **META},
        [_e("s3.get_bucket_acl", bucket="b1", owner_display_name="dn1",
            owner_id="oid1", grants_grantee={"Type": "Group"},
            grants_permission="READ"),
         _e("s3.get_bucket_acl", bucket="b1", owner_display_name="dn1",
            owner_id="oid1", grants_grantee={"Type": "CanonicalUser"},
            grants_permission="FULL_CONTROL")],
        [],
    ),
    # trail → status + event-selector children (aws_collect.py:977-1007)
    Sample(
        CollectTask("1", "cloudtrail.describe_trails", ()),
        {"trailList": [{"Name": "t1", "TrailARN": "arn:t1",
                        "IsMultiRegionTrail": True, "HomeRegion": "us-east-1",
                        "S3BucketName": "bkt",
                        "LogFileValidationEnabled": True}], **META},
        [_e("cloudtrail.describe_trails", name="t1", trail_arn="arn:t1",
            is_multi_region_trail=True, home_region="us-east-1",
            s3_bucket_name="bkt", s3_key_prefix=None, sns_topic_name=None,
            sns_topic_arn=None, include_global_service_events=None,
            log_file_validation_enabled=True,
            cloud_watch_logs_log_group_arn=None,
            cloud_watch_logs_role_arn=None, kms_key_id=None,
            has_custom_event_selectors=None, has_insight_selectors=None,
            is_organization_trail=None)],
        [CollectTask("1", "cloudtrail.get_trail_status",
                     (("Name", "arn:t1"),)),
         CollectTask("1", "cloudtrail.get_event_selectors",
                     (("TrailName", "arn:t1"),))],
    ),
    # required_args gate: empty findingArns spawns NO describe child
    # (aws_collect.py:1060-1064)
    Sample(
        CollectTask("1", "inspector.list_findings", ()),
        {"findingArns": [], **META},
        [_e("inspector.list_findings", finding_arns=[])],
        [],
    ),
    # non-empty findingArns spawns the child with a hashable tuple arg
    Sample(
        CollectTask("1", "inspector.list_findings", ()),
        {"findingArns": ["arn:f1", "arn:f2"], **META},
        [_e("inspector.list_findings", finding_arns=["arn:f1", "arn:f2"])],
        [CollectTask("1", "inspector.describe_findings",
                     (("findingArns", ("arn:f1", "arn:f2")),))],
    ),
]


@pytest.mark.parametrize("sample", SAMPLES,
                         ids=[s.task.method + ("_err" if isinstance(s.response, Exception)
                                               else "") for s in SAMPLES])
def test_process_aws_response(sample):
    entities, children = run(sample)
    assert entities == sample.entities
    assert children == sample.subrequests


def test_spec_covers_all_reference_methods():
    """Every key of the reference's API_METHOD_SPECS
    (aws_collect.py:556-1110) is encoded — all 37 API methods."""
    assert len(AWS_API_SPEC) == 37
    for service in ("organizations", "iam", "ec2", "config", "kms", "s3",
                    "cloudtrail", "inspector"):
        assert any(m.startswith(service + ".") for m in AWS_API_SPEC), service
    # every child method referenced by a parent is itself spec'd
    for m, spec in AWS_API_SPEC.items():
        for child in spec.get("children", []):
            for cm in child.get("methods", [child.get("method")]):
                assert cm in AWS_API_SPEC, f"{m} -> {cm}"


def test_collect_walks_iam_role_policy_chain():
    """Three-level DAG: list_roles → list_role_policies →
    get_role_policy, policy documents landing with full param echo."""
    from snowalert_spark.sources.collect import collect

    def fetch(task):
        if task.method == "iam.list_roles":
            return {"Roles": [{"RoleName": "r1", "Arn": "arn:r1"}]}
        if task.method == "iam.list_role_policies":
            return {"PolicyNames": ["pol1", "pol2"]}
        assert task.method == "iam.get_role_policy"
        return {"PolicyDocument": {"Statement": task.args_dict["PolicyName"]}}

    rows = collect(AWS_API_SPEC, fetch, [CollectTask("1", "iam.list_roles", ())],
                   rate_per_second=1000)
    by_table = {}
    for r in rows:
        by_table.setdefault(r.table, []).append(r.entity)
    docs = sorted(
        (e["role_name"], e["policy_name"], e["policy_document"]["Statement"])
        for e in by_table["iam_get_role_policy"]
    )
    assert docs == [("r1", "pol1", "pol1"), ("r1", "pol2", "pol2")]


def test_collect_walks_inspector_chain_with_list_arg():
    """findingArns is a list-valued child binding — the task must stay
    hashable through the BFS seen-set, and the describe call must get
    the whole batch."""
    from snowalert_spark.sources.collect import collect

    def fetch(task):
        if task.method == "inspector.list_findings":
            return {"findingArns": ["arn:f1", "arn:f2"]}
        assert tuple(task.args_dict["findingArns"]) == ("arn:f1", "arn:f2")
        return {"failedItems": {}, "findings": [
            {"arn": "arn:f1", "severity": "High"},
            {"arn": "arn:f2", "severity": "Low"},
        ]}

    rows = collect(AWS_API_SPEC, fetch,
                   [CollectTask("1", "inspector.list_findings", ())],
                   rate_per_second=1000)
    sev = sorted(
        (r.entity["arn"], r.entity["severity"])
        for r in rows if r.table == "inspector_describe_findings"
    )
    assert sev == [("arn:f1", "High"), ("arn:f2", "Low")]


def test_collect_walks_kms_chain():
    """End-to-end DAG: list_keys seed → rotation-status children, all
    landing rows tabled under the method name."""
    from snowalert_spark.sources.collect import collect

    def fetch(task):
        if task.method == "kms.list_keys":
            return {"Keys": [{"KeyId": "id1", "KeyArn": "arn1"}]}
        if task.method == "kms.get_key_rotation_status":
            return {"KeyRotationEnabled": False}
        raise AssertionError(task.method)

    rows = collect(AWS_API_SPEC, fetch, [CollectTask("1", "kms.list_keys", ())],
                   rate_per_second=1000)
    by_table = {}
    for r in rows:
        by_table.setdefault(r.table, []).append(r.entity)
    assert [e["key_arn"] for e in by_table["kms_list_keys"]] == ["arn1"]
    assert by_table["kms_get_key_rotation_status"][0]["key_rotation_enabled"] is False
    assert by_table["kms_get_key_rotation_status"][0]["key_arn"] == "arn1"
