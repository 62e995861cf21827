"""Log-file connector tests (reference: osquery_log.py, nginx_log.py,
azure_log.py COPY projections) over JSON-lines fixtures written to
tmp_path — including the osquery landing feeding the osquery pack view
columns."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from snowalert_spark.sources.files import (
    read_azure_log_json,
    read_nginx_error_log_json,
    read_nginx_log_json,
    read_osquery_log_json,
)


def _write(tmp_path, name, rows):
    p = tmp_path / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def test_osquery_log_projection(spark, tmp_path):
    path = _write(tmp_path, "osq.jsonl", [
        {"name": "pack_incident-response_mounts", "hostIdentifier": "web-1",
         "calendarTime": "Wed May  1 10:00:00 2024 UTC", "unixTime": 1714557600,
         "epoch": 0, "counter": 3, "action": "added",
         "instance_id": "i-123",
         "columns": {"device": "/dev/sda1", "path": "/"},
         "decorations": {"env": "prod"}},
    ])
    row = read_osquery_log_json(spark, path).collect()[0]
    assert row.action == "added" and row.hostidentifier == "web-1"
    assert row.instance_id == "i-123" and row.counter == 3
    assert row.event_time == dt.datetime(2024, 5, 1, 10, 0)
    assert row.unixtime == row.event_time
    assert json.loads(row.columns)["device"] == "/dev/sda1"
    assert row.hash_raw is not None


def test_nginx_access_log_projection(spark, tmp_path):
    path = _write(tmp_path, "nginx.jsonl", [
        {"time": "2024-05-01T10:00:00Z", "bytes_sent": 512, "connection": 7,
         "connection_requests": 2, "deployment_cluster": "-",
         "gzip_ratio": "2.5", "host_header": "api.example.com",
         "http_user_agent": "curl/8.0 (x86_64)", "http_xff": "-",
         "http_referer": "https://ref",
         "request": "GET /v1/items?request_id=abc123&x=1 HTTP/1.1",
         "instance_id": "i-9", "redirect_counter": 0,
         "remote_address": "1.2.3.4", "request_time": "0.02",
         "requests_length": 140, "ssl_session_id": "-",
         "ssl_session_reused": "r", "status": 200,
         "upstream_address": "10.0.0.1:80 : 10.0.0.2:80, 10.0.0.3:80",
         "upstream_response_length": "100 : 200, 300",
         "upstream_response_time": "0.1 : 0.2, 0.3",
         "upstream_status": "502 : 200, 204"},
    ])
    row = read_nginx_log_json(spark, path).collect()[0]
    assert row.request_id == "abc123"
    assert row.http_method == "GET"
    assert row.host_name == "API"
    assert row.user_agent == "curl"
    assert row.deployment_cluster is None and row.http_xff is None
    assert row.gzip_ratio == 2.5
    # final-hop upstream parsing: last of ' : ' chain, last of ', ' list
    assert row.upstream_address == "10.0.0.3:80"
    assert row.upstream_response_length == 300
    assert row.upstream_response_time == 0.3
    assert row.upstream_status == 204
    assert row.upstream_count == 3
    assert row.event_time == dt.datetime(2024, 5, 1, 10, 0)


def test_nginx_error_log_projection(spark, tmp_path):
    path = _write(tmp_path, "err.jsonl", [
        {"time": "2024-05-01T10:00:00Z", "instance_id": "i-9",
         "log_level": "error", "message": "upstream timed out",
         "pid": 1234, "tid": 9},
    ])
    row = read_nginx_error_log_json(spark, path).collect()[0]
    assert row.log_level == "error" and row.pid == 1234
    assert row.event_time == dt.datetime(2024, 5, 1, 10, 0)


def test_azure_operation_log_projection(spark, tmp_path):
    path = _write(tmp_path, "azop.jsonl", [
        {"time": "2024-05-01T10:00:00Z", "callerIpAddress": "4.5.6.7",
         "category": "Administrative", "correlationId": "c-1",
         "durationMs": 12, "identity": {"authorization": {"scope": "/subs/s1"},
                                        "claims": {"appid": "a1"}},
         "level": "Information", "location": "global",
         "operationName": "Microsoft.Compute/virtualMachines/write",
         "properties": {"ancestors": "rg1", "isComplianceCheck": "False",
                        "policies": [], "resourceLocation": "eastus"},
         "resourceId": "/subs/s1/vm1", "resultSignature": "Started.",
         "resultType": "Start"},
    ])
    row = read_azure_log_json(spark, path, "operation").collect()[0]
    assert row.operation_name.endswith("virtualMachines/write")
    assert json.loads(row.identity_authorization)["scope"] == "/subs/s1"
    assert row.properties_resource_location == "eastus"
    assert row.event_time == dt.datetime(2024, 5, 1, 10, 0)


def test_azure_audit_log_projection(spark, tmp_path):
    path = _write(tmp_path, "azaud.jsonl", [
        {"time": "2024-05-01T10:00:00Z", "callerIpAddress": "4.5.6.7",
         "category": "AuditLogs", "correlationId": "c-2", "durationMs": 5,
         "level": 4, "operationName": "Add member to role",
         "operationVersion": "1.0",
         "properties": {"activityDateTime": "2024-05-01T09:59:58Z",
                        "activityDisplayName": "Add member to role",
                        "category": "RoleManagement", "id": "Directory_x",
                        "initiatedBy": {"user": {"id": "u1"}},
                        "loggedByService": "Core Directory",
                        "operationType": "Assign", "result": "success",
                        "targetResources": [{"id": "u2"}]},
         "resourceId": "/t/x", "resultSignature": "None", "tenantId": "t1"},
    ])
    row = read_azure_log_json(spark, path, "audit").collect()[0]
    assert row.properties_category == "RoleManagement"
    assert row.properties_result == "success"
    assert row.properties_activity_date_time == dt.datetime(2024, 5, 1, 9, 59, 58)
    assert json.loads(row.properties_initiated_by)["user"]["id"] == "u1"
    assert row.tenant_id == "t1"
    with pytest.raises(ValueError):
        read_azure_log_json(spark, path, "metrics")


def test_azure_signin_log_projection(spark, tmp_path):
    path = _write(tmp_path, "azsign.jsonl", [
        {"time": "2024-05-01T10:00:00Z", "Level": 4,
         "callerIpAddress": "4.5.6.7", "category": "SignInLogs",
         "correlationId": "c-3", "durationMs": 0, "identity": "Kim A",
         "operationName": "Sign-in activity", "operationVersion": "1.0",
         "properties": {"appDisplayName": "Azure Portal", "appId": "ap-1",
                        "clientAppUsed": "Browser",
                        "conditionalAccessStatus": "success",
                        "createdDateTime": "2024-05-01T09:59:59Z",
                        "deviceDetail": {"operatingSystem": "MacOs"},
                        "id": "s-1", "ipAddress": "4.5.6.7",
                        "isInteractive": True,
                        "processingTimeInMilliseconds": 321,
                        "riskLevelDuringSignIn": "none",
                        "status": {"errorCode": 0},
                        "userDisplayName": "Kim A", "userId": "u-9",
                        "userPrincipalName": "kim@x.io"},
         "resourceId": "/t/x", "resultType": "0", "tenantId": "t1"},
    ])
    row = read_azure_log_json(spark, path, "signin").collect()[0]
    assert row.level == 4 and row.properties_is_interactive is True
    assert row.properties_app_display_name == "Azure Portal"
    assert row.properties_processing_time_in_milliseconds == 321
    assert row.properties_created_date_time == dt.datetime(2024, 5, 1, 9, 59, 59)
    assert json.loads(row.properties_status) == {"errorCode": 0}
    assert row.properties_user_principal_name == "kim@x.io"


def test_osquery_landing_feeds_pack_shape(spark, tmp_path):
    """The reader's landing shape projects into data.osquery_v's
    columns (instance_id + event_time), which the osquery pack view
    consumes."""
    path = _write(tmp_path, "osq2.jsonl", [
        {"unixTime": 1714557600, "instance_id": "i-123", "name": "n",
         "action": "added", "hostIdentifier": "h", "calendarTime": "x",
         "epoch": 0, "counter": 1, "columns": {}, "decorations": {}},
    ])
    df = read_osquery_log_json(spark, path).select("instance_id", "event_time")
    assert df.collect()[0].instance_id == "i-123"


def test_github_webhooks_projection(spark, tmp_path):
    from snowalert_spark.sources.files import read_github_webhooks_json

    path = _write(tmp_path, "gh.jsonl", [
        {"ref": "refs/heads/main", "before": "aaa", "after": "bbb",
         "created": False, "deleted": False, "forced": True,
         "repository": {"full_name": "org/repo"},
         "pusher": {"name": "kim"}, "sender": {"login": "kim"},
         "commits": [{"id": "bbb"}]},
        {"action": "opened", "number": 7,
         "pull_request": {"title": "fix"}, "sender": {"login": "lee"}},
    ])
    rows = read_github_webhooks_json(spark, path).collect()
    push, pr = rows
    assert push.ref == "refs/heads/main" and push.forced == "true"
    assert json.loads(push.repository)["full_name"] == "org/repo"
    assert pr.action == "opened" and pr.number == "7"
    assert pr.ref is None
    assert push.hash_raw is not None and push.insert_time is not None


def test_ldap_log_csv(spark, tmp_path):
    from snowalert_spark.sources.files import read_ldap_log_csv

    p = tmp_path / "ldap.csv"
    p.write_text(
        "group_name,display_name,sam,email,account_created,"
        "account_last_modified,password_last_set,password_expires\n"
        'admins,"Kim, A.",kima,kim@x.io,2023-01-01 00:00:00,'
        "2024-01-01 00:00:00,2024-02-01 00:00:00,2024-08-01 00:00:00\n"
    )
    row = read_ldap_log_csv(spark, str(p)).collect()[0]
    assert row.group_name == "admins" and row.display_name == "Kim, A."
    assert row.password_last_set == dt.datetime(2024, 2, 1)
