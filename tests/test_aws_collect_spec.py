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
    # land as NULL columns (reference process_response_items semantics)
    Sample(
        CollectTask("1", "iam.get_account_summary", ()),
        {"SummaryMap": {"AccountMFAEnabled": 1, "Users": 12,
                        "UsersQuota": 5000}, **META},
        [_e("iam.get_account_summary", account_mfa_enabled=1,
            account_access_keys_present=None,
            account_signing_certificates_present=None,
            users=12, users_quota=5000, groups=None, groups_quota=None,
            roles=None, roles_quota=None, policies=None, policies_quota=None,
            mfa_devices=None, mfa_devices_in_use=None, providers=None,
            global_endpoint_token_version=None)],
        [],
    ),
]


@pytest.mark.parametrize("sample", SAMPLES,
                         ids=[s.task.method + ("_err" if isinstance(s.response, Exception)
                                               else "") for s in SAMPLES])
def test_process_aws_response(sample):
    entities, children = run(sample)
    assert entities == sample.entities
    assert children == sample.subrequests


def test_spec_covers_twelve_plus_methods():
    assert len(AWS_API_SPEC) >= 12


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
