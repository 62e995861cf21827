"""collect → land → cis_aws pack views, end-to-end.

A fake two-account AWS world is crawled through the full spec DAG
(``collect`` with every child task spawned by the spec itself), the
resulting DBEntry rows are landed as ``data_aws_collect_*`` views via
``land_entries``, and all 22 cis_aws_pack.sql views (verbatim reference
SQL through the transpiler) run over those collector-landed rows —
not planted fixtures. Complements test_pack_corpus.py, which
golden-pins all 22 views on hand-planted landings.

Planted violations (account 111 "acme" dirty, 222 "beta" clean except
a missing Config recorder; CloudTrail lands through the FILE connector
while the aws_collect tables land through the API collector):
CIS 1.1 root activity; 1.3 stale console credentials;
1.4 old active access key; 1.5-1.11 weak password policy; 1.12
root access key in the credential report; 1.13 root MFA disabled;
1.14 root virtual MFA device; 1.16 user-attached policy; 1.20
unattached support policy; 1.22 star-action star-resource policy;
2.2 trail without log validation; 2.3 world-open trail bucket; 2.5
missing Config recorder; 4.1/4.2/4.3 open security groups.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from snowalert_spark import packs
from snowalert_spark.rules import RuleRegistry
from snowalert_spark.sources.aws_collect_spec import AWS_API_SPEC
from snowalert_spark.sources.collect import CollectTask, collect, land_entries

pytestmark = pytest.mark.skipif(
    not os.path.isdir(packs.PACKS_DIR), reason="reference packs dir unavailable"
)

J = json.dumps
NOW = dt.datetime.utcnow()


def days_ago(n: float) -> dt.datetime:
    return NOW - dt.timedelta(days=n)


STAR_DOC = {"Statement": [{"Effect": "Allow", "Action": "*", "Resource": "*"}]}
SCOPED_DOC = {
    "Statement": [
        {"Effect": "Allow", "Action": "s3:Get*", "Resource": "arn:aws:s3:::b/*"}
    ]
}

POLICIES_111 = [
    ("p1", "arn:aws:iam::111:policy/p1", SCOPED_DOC,
     {"PolicyUsers": [{"UserName": "alice", "UserId": "AID1"}]}),
    ("p2", "arn:aws:iam::111:policy/p2", SCOPED_DOC,
     {"PolicyGroups": [{"GroupName": "admins", "GroupId": "GID1"}]}),
    ("AWSSupportAccess", "arn:aws:iam::aws:policy/AWSSupportAccess", SCOPED_DOC,
     {}),  # attached to nothing → CIS 1.20
    ("too-broad", "arn:aws:iam::111:policy/too-broad", STAR_DOC,
     {"PolicyGroups": [{"GroupName": "admins", "GroupId": "GID1"}]}),
    ("AdministratorAccess", "arn:aws:iam::aws:policy/AdministratorAccess",
     STAR_DOC,  # star doc but whitelisted by the 1.22 rule
     {"PolicyGroups": [{"GroupName": "admins", "GroupId": "GID1"}]}),
    ("scoped", "arn:aws:iam::111:policy/scoped", SCOPED_DOC,
     {"PolicyGroups": [{"GroupName": "admins", "GroupId": "GID1"}]}),
]

ACCESS_KEYS = {
    "carol": ("Active", days_ago(100)),   # CIS 1.4 violation
    "dan": ("Active", days_ago(10)),
    "eve": ("Inactive", days_ago(120)),
}

SG_111 = [
    ("sg-1", "open-ssh", [{"IpProtocol": "tcp", "FromPort": 22, "ToPort": 22,
                           "IpRanges": [{"CidrIp": "0.0.0.0/0"}],
                           "Ipv6Ranges": []}]),
    ("sg-2", "internal", [{"IpProtocol": "tcp", "FromPort": 22, "ToPort": 22,
                           "IpRanges": [{"CidrIp": "10.1.2.0/24"}],
                           "Ipv6Ranges": []}]),
    ("sg-3", "rdp-ish", [{"IpProtocol": "udp", "FromPort": 3000,
                          "ToPort": 4000,
                          "IpRanges": [{"CidrIp": "0.0.0.0/0"}],
                          "Ipv6Ranges": []}]),
    ("sg-4", "default", [{"IpProtocol": "tcp", "FromPort": 80, "ToPort": 80,
                          "IpRanges": [{"CidrIp": "10.0.0.0/8"}],
                          "Ipv6Ranges": []}]),
]

CSV_REPORT = {
    "111": ("user,arn,access_key_1_active,access_key_2_active\n"
            "<root_account>,arn:aws:iam::111:root,true,false\n"
            "alice,arn:aws:iam::111:user/alice,true,false"),
    "222": ("user,arn,access_key_1_active,access_key_2_active\n"
            "<root_account>,arn:aws:iam::222:root,false,false"),
}


def fake_aws(task: CollectTask):
    """Deterministic two-account world answering every spec method."""
    acct, m, args = task.account_id, task.method, task.args_dict
    if m == "organizations.list_accounts":
        return {"Accounts": [
            {"Id": "111", "Arn": "arn:aws:organizations::111", "Name": "Acme Inc",
             "Status": "ACTIVE"},
            {"Id": "222", "Arn": "arn:aws:organizations::222", "Name": "Beta LLC",
             "Status": "ACTIVE"},
        ]}
    if m == "iam.list_account_aliases":
        return {"AccountAliases": ["acme" if acct == "111" else "beta"]}
    if m == "iam.get_account_summary":
        return {"SummaryMap": {"AccountMFAEnabled": 0 if acct == "111" else 1}}
    if m == "iam.get_account_password_policy":
        if acct == "111":  # fails every CIS 1.5-1.11 check
            return {"PasswordPolicy": {
                "RequireUppercaseCharacters": False,
                "RequireLowercaseCharacters": False,
                "RequireSymbols": False, "RequireNumbers": False,
                "MinimumPasswordLength": 8, "PasswordReusePrevention": 5,
                "MaxPasswordAge": 120, "ExpirePasswords": False,
                "AllowUsersToChangePassword": True, "HardExpiry": False,
            }}
        return {"PasswordPolicy": {
            "RequireUppercaseCharacters": True,
            "RequireLowercaseCharacters": True,
            "RequireSymbols": True, "RequireNumbers": True,
            "MinimumPasswordLength": 14, "PasswordReusePrevention": 24,
            "MaxPasswordAge": 90, "ExpirePasswords": True,
            "AllowUsersToChangePassword": True, "HardExpiry": False,
        }}
    if m == "iam.list_users":
        if acct != "111":
            return {"Users": []}
        return {"Users": [
            {"Arn": f"arn:aws:iam::111:user/{u}", "Path": "/",
             "CreateDate": days_ago(200), "UserId": f"UID-{u}", "UserName": u}
            for u in ACCESS_KEYS
        ]}
    if m == "iam.list_access_keys":
        status, created = ACCESS_KEYS[args["UserName"]]
        return {"AccessKeyMetadata": [
            {"UserName": args["UserName"], "AccessKeyId": "AKIA1",
             "Status": status, "CreateDate": created}
        ]}
    if m == "iam.get_login_profile":
        return {"LoginProfile": {"UserName": args["UserName"],
                                 "CreateDate": days_ago(200),
                                 "PasswordResetRequired": False}}
    if m == "iam.list_mfa_devices":
        return {"MFADevices": []}
    if m == "iam.list_groups_for_user":
        return {"Groups": []}
    if m == "iam.list_user_policies":
        return {"PolicyNames": []}
    if m == "iam.list_attached_user_policies":
        return {"AttachedPolicies": []}
    if m == "iam.list_policies":
        if acct != "111":
            return {"Policies": []}
        return {"Policies": [
            {"PolicyName": name, "PolicyId": f"PID-{name}", "Arn": arn,
             "Path": "/", "DefaultVersionId": "v1", "AttachmentCount": 1,
             "IsAttachable": True}
            for name, arn, _, _ in POLICIES_111
        ]}
    if m == "iam.get_policy_version":
        doc = next(d for _, a, d, _ in POLICIES_111 if a == args["PolicyArn"])
        return {"PolicyVersion": {"Document": doc, "VersionId": "v1",
                                  "IsDefaultVersion": True}}
    if m == "iam.list_entities_for_policy":
        ents = next(e for _, a, _, e in POLICIES_111 if a == args["PolicyArn"])
        return {"PolicyGroups": [], "PolicyUsers": [], "PolicyRoles": [], **ents}
    if m == "iam.get_credential_report":
        return {"Content": CSV_REPORT[acct], "ReportFormat": "csv",
                "GeneratedTime": NOW.isoformat()}
    if m == "iam.list_virtual_mfa_devices":
        if acct != "111":
            return {"VirtualMFADevices": []}
        return {"VirtualMFADevices": [
            {"SerialNumber": "arn:aws:iam::111:mfa/root-device"}
        ]}
    if m == "ec2.describe_security_groups":
        if acct != "111":
            return {"SecurityGroups": []}
        return {"SecurityGroups": [
            {"GroupId": gid, "GroupName": gname, "Description": gname,
             "OwnerId": acct, "IpPermissions": perms, "IpPermissionsEgress": [],
             "VpcId": "vpc-1"}
            for gid, gname, perms in SG_111
        ]}
    if m == "cloudtrail.describe_trails":
        if acct != "111":
            return {"trailList": []}
        return {"trailList": [
            {"Name": "trail1", "TrailARN": "arn:aws:cloudtrail::111:trail/t1",
             "S3BucketName": "bkt1", "LogFileValidationEnabled": False,
             "IsMultiRegionTrail": True, "HomeRegion": "us-east-1"},
            {"Name": "trail2", "TrailARN": "arn:aws:cloudtrail::111:trail/t2",
             "S3BucketName": "bkt2", "LogFileValidationEnabled": True,
             "IsMultiRegionTrail": True, "HomeRegion": "us-east-1"},
        ]}
    if m == "cloudtrail.get_trail_status":
        return {"IsLogging": True}
    if m == "cloudtrail.get_event_selectors":
        return {"TrailARN": args["TrailName"], "EventSelectors": []}
    if m == "s3.list_buckets":
        if acct != "111":
            return {"Buckets": [], "Owner": {"DisplayName": "beta", "ID": "o2"}}
        return {"Buckets": [
            {"Name": "bkt1", "CreationDate": days_ago(300)},
            {"Name": "bkt2", "CreationDate": days_ago(300)},
        ], "Owner": {"DisplayName": "acme", "ID": "o1"}}
    if m == "s3.get_bucket_acl":
        return {"Owner": {"DisplayName": "acme", "ID": "o1"}, "Grants": []}
    if m == "s3.get_bucket_policy":
        open_doc = {"Statement": [{"Effect": "Allow", "Principal": "*",
                                   "Action": "s3:GetObject", "Resource": "*"}]}
        scoped = {"Statement": [{"Effect": "Allow",
                                 "Principal": {"AWS": "arn:aws:iam::111:root"},
                                 "Action": "s3:GetObject", "Resource": "*"}]}
        return {"Policy": J(open_doc if args["Bucket"] == "bkt1" else scoped)}
    if m == "s3.get_bucket_logging":
        return {}
    if m == "config.describe_configuration_recorders":
        if acct != "111":
            return {"ConfigurationRecorders": []}  # CIS 2.5 → beta flagged
        return {"ConfigurationRecorders": [
            {"name": "default", "roleARN": "arn:aws:iam::111:role/cfg",
             "recordingGroup": {"allSupported": True,
                                "includeGlobalResourceTypes": True}}
        ]}
    raise AssertionError(f"unexpected method {m} for account {acct}")


PER_ACCOUNT_SEEDS = [
    "iam.list_account_aliases",
    "iam.get_account_summary",
    "iam.get_account_password_policy",
    "iam.list_users",
    "iam.list_policies",
    "iam.get_credential_report",
    "iam.list_virtual_mfa_devices",
    "ec2.describe_security_groups",
    "cloudtrail.describe_trails",
    "s3.list_buckets",
    "config.describe_configuration_recorders",
]


def _iso(d: dt.datetime) -> str:
    return d.strftime("%Y-%m-%dT%H:%M:%SZ")


CLOUDTRAIL_RECORDS = {"Records": [
    # CIS 1.1: root activity not via the support endpoint
    {"eventTime": _iso(days_ago(1)), "eventName": "ConsoleLogin",
     "awsRegion": "us-east-1", "eventID": "e1",
     "recipientAccountId": "111", "sourceIPAddress": "1.2.3.4",
     "userIdentity": {"type": "Root", "userName": "root"}},
    # excluded: root via support
    {"eventTime": _iso(days_ago(2)), "eventName": "ConsoleLogin",
     "awsRegion": "us-east-1", "eventID": "e2",
     "recipientAccountId": "111",
     "sourceIPAddress": "support.amazonaws.com",
     "userIdentity": {"type": "Root", "userName": "root"}},
    # CIS 1.3: dan and eve have recent console signins, carol does not
    {"eventTime": _iso(days_ago(5)), "eventName": "ConsoleLogin",
     "awsRegion": "us-east-1", "eventID": "e3",
     "recipientAccountId": "111", "sourceIPAddress": "9.9.9.9",
     "userIdentity": {"type": "IAMUser", "userName": "dan",
                      "invokedBy": "signin.amazonaws.com"}},
    {"eventTime": _iso(days_ago(6)), "eventName": "ConsoleLogin",
     "awsRegion": "us-east-1", "eventID": "e4",
     "recipientAccountId": "111", "sourceIPAddress": "9.9.9.8",
     "userIdentity": {"type": "IAMUser", "userName": "eve",
                      "invokedBy": "signin.amazonaws.com"}},
]}


@pytest.fixture(scope="module")
def landed(spark, tmp_path_factory):
    seeds = [CollectTask("111", "organizations.list_accounts", ())] + [
        CollectTask(a, m, ()) for a in ("111", "222") for m in PER_ACCOUNT_SEEDS
    ]
    rows = collect(AWS_API_SPEC, fake_aws, seeds, rate_per_second=100000)
    views = land_entries(spark, rows, spec=AWS_API_SPEC)

    # the CloudTrail landing comes from the FILE connector, not the API
    # collector: a dump file through read_cloudtrail_json feeds the two
    # activity views (1.1/1.3) — the full ingest surface in one e2e
    from snowalert_spark.sources.files import read_cloudtrail_json

    trail = tmp_path_factory.mktemp("trail") / "dump.json"
    trail.write_text(json.dumps(CLOUDTRAIL_RECORDS))
    ct = read_cloudtrail_json(spark, str(trail))
    ct.createOrReplaceTempView("data_cloudtrail")
    views["data_cloudtrail"] = ct

    reg = RuleRegistry()
    packs.register_pack_rules(reg, f"{packs.PACKS_DIR}/cis_aws_pack.sql")
    return views, reg


def _objects(spark, landed, name):
    _, reg = landed
    return {r.object for r in reg.rules[name].df(spark).collect()}


CIS_EXPECTED = {
    "VQ_QBYAC8Z2RBF_VIOLATION_QUERY": {"root in account acme"},          # 1.1
    "VQ_GVR3N9WQLGG_VIOLATION_QUERY": {"carol at acme"},                 # 1.3
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
    # a root-labeled virtual MFA device exists → verbatim cross-join
    # logic flags every latest account row
    "VQ_ZDIAEIEAMP_VIOLATION_QUERY": {"acme", "beta"},                   # 1.14
    "VQ_ASKJ865AQ9_VIOLATION_QUERY": {"arn:aws:iam::111:policy/p1"},     # 1.16
    "VQ_ZIXF9ISIDDB_VIOLATION_QUERY": {"acme"},                          # 1.20
    "VQ_1PZWDBTHHVS_VIOLATION_QUERY":
        {"arn:aws:iam::111:policy/too-broad"},                           # 1.22
    "VQ_G8HQTE899ZL_VIOLATION_QUERY": {"trail1"},                        # 2.2
    "VQ_0XADVOX2M5CQ_VIOLATION_QUERY": {"bkt1"},                         # 2.3
    "VQ_PWXDLM6H16_VIOLATION_QUERY": {"beta"},                           # 2.5
    "VQ_JW0HBLN2EW_VIOLATION_QUERY": {"sg-1"},                           # 4.1
    "VQ_M6Y4F1UEW3P_VIOLATION_QUERY": {"sg-3"},                          # 4.2
    "VQ_P7QZMWJ6Z0O_VIOLATION_QUERY": {"sg-4"},                          # 4.3
}


@pytest.mark.parametrize("view", sorted(CIS_EXPECTED))
def test_cis_view_over_collector_rows(spark, landed, view):
    assert _objects(spark, landed, view) == CIS_EXPECTED[view]


def test_crawl_landed_every_pack_table(landed):
    """The DAG crawl itself produced every data.aws_collect_* table
    these views read — no hand-planted rows."""
    views, _ = landed
    for t in (
        "data_aws_collect_organizations_list_accounts_connection",
        "data_aws_collect_iam_list_account_aliases",
        "data_aws_collect_iam_get_account_summary",
        "data_aws_collect_iam_get_account_password_policy",
        "data_aws_collect_iam_list_access_keys",
        "data_aws_collect_iam_get_credential_report",
        "data_aws_collect_iam_list_virtual_mfa_devices",
        "data_aws_collect_iam_get_policy_version",
        "data_aws_collect_iam_list_entities_for_policy",
        "data_aws_collect_ec2_describe_security_groups",
        "data_aws_collect_cloudtrail_describe_trails",
        "data_aws_collect_s3_get_bucket_policy",
        "data_aws_collect_config_describe_configuration_recorders",
    ):
        assert t in views, t


def test_distributed_collect_matches_bfs_on_real_spec(spark):
    """The 100 TB path: the same real-spec crawl through
    collect_distributed (mapInPandas levels) lands the same rows as
    the driver BFS walk. World is nested so cloudpickle ships it by
    value to executor workers."""

    def fetch(task):
        m, args = task.method, task.args_dict
        if m == "kms.list_keys":
            return {"Keys": [{"KeyId": "id1", "KeyArn": "arn1"},
                             {"KeyId": "id2", "KeyArn": "arn2"}]}
        if m == "kms.get_key_rotation_status":
            return {"KeyRotationEnabled": args["KeyId"] == "arn1"}
        if m == "s3.list_buckets":
            return {"Owner": {"DisplayName": "dn", "ID": "o1"},
                    "Buckets": [{"Name": "b1", "CreationDate": "d1"}]}
        if m == "s3.get_bucket_acl":
            return {"Owner": {"DisplayName": "dn", "ID": "o1"}, "Grants": []}
        if m == "s3.get_bucket_policy":
            return {"Policy": '{"Statement": []}'}
        if m == "s3.get_bucket_logging":
            return {}
        raise AssertionError(m)

    from snowalert_spark.sources.collect import collect_distributed

    seeds = [CollectTask("1", "kms.list_keys", ()),
             CollectTask("1", "s3.list_buckets", ())]
    rows_json, levels = collect_distributed(spark, AWS_API_SPEC, fetch, seeds)
    assert levels == 2  # parents, then rotation-status + bucket children

    bfs = collect(AWS_API_SPEC, fetch, seeds, rate_per_second=100000)

    def normalize(table, entity):
        e = {k: v for k, v in entity.items() if k != "recorded_at"}
        return (table, tuple(sorted((k, json.dumps(v, default=str))
                                    for k, v in e.items())))

    dist = sorted(normalize(d["table"], d["entity"])
                  for d in map(json.loads, rows_json))
    ref = sorted(normalize(r.table, r.entity) for r in bfs)
    assert dist == ref
    # the policy ParsedCol parsed on the worker too
    pol = [d for d in map(json.loads, rows_json)
           if d["table"] == "s3_get_bucket_policy"]
    assert pol[0]["entity"]["policy_json_parsed"] == {"Statement": []}


def test_collector_rows_through_partitioned_landing(spark, landed, tmp_path):
    """Scale-true landing for collector output: the crawled
    password-policy rows append into a date-partitioned landing root,
    the freshness view carries the partition bound into the FileScan,
    and the verbatim CIS 1.5 view over it still flags acme."""
    from snowalert_spark.sources.landing import (
        register_landing_view,
        write_landing,
    )

    views, reg = landed
    path = str(tmp_path / "aws_collect_iam_get_account_password_policy")
    write_landing(views["data_aws_collect_iam_get_account_password_policy"], path)
    fresh = register_landing_view(
        spark, "data_aws_collect_iam_get_account_password_policy", path,
        retention_days=2,
    )
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "p_date" in plan
    try:
        rows = reg.rules["VQ_F85S78KK42_VIOLATION_QUERY"].df(spark).collect()
        assert {r.object for r in rows} == {"acme"}
    finally:
        # restore the in-memory view for other tests in this module
        views["data_aws_collect_iam_get_account_password_policy"
              ].createOrReplaceTempView(
            "data_aws_collect_iam_get_account_password_policy")
