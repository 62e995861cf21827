"""AWS Config connector (reference src/connectors/aws_config.py) and
the flow-log connect's network_protocol_mapping dimension
(aws_flow_log.py:65-76,108-114) — the two S8-family gaps the r12
verdict named.

Pins:
1. read_config_json flattens configurationItems to the reference
   landing DDL (aws_config.py:49-65), with event_time parsed from the
   snapshot FILE NAME's yyyymmddThhmmssZ stamp (:166-169) and VARIANT
   columns landed as JSON text;
2. files without the filename stamp land NULL event_time; files with
   an empty/missing configurationItems array land zero rows
   (WHERE ARRAY_SIZE > 0 parity);
3. hash_raw is a per-item dedupe key (HASH(value) parity);
4. the protocol_table.csv dimension lands typed (Y/N → BOOLEAN,
   skip_header, empty-as-NULL) and connect_flow_log registers BOTH the
   landing view and data_network_protocol_mapping, once per session;
5. a pack-style rule view joins flow-log protocol numbers through the
   mapping (the reference's stated purpose for the table).
"""

from __future__ import annotations

import datetime as dt
import json

from snowalert_spark.sources.files import (
    connect_flow_log,
    read_config_json,
    read_protocol_mapping_csv,
)

ITEM = {
    "configurationItemCaptureTime": "2019-02-25T09:29:52.103Z",
    "awsAccountId": "123456789012",
    "awsRegion": "us-east-1",
    "resourceType": "AWS::EC2::SecurityGroup",
    "ARN": "arn:aws:ec2:us-east-1:123456789012:security-group/sg-01",
    "availabilityZone": "Not Applicable",
    "resourceCreationTime": "2018-11-02T04:42:49.000Z",
    "resourceName": "web-sg",
    "resourceId": "sg-01",
    "relationships": [
        {"resourceId": "vpc-1", "resourceType": "AWS::EC2::VPC",
         "name": "Is contained in Vpc"}
    ],
    "configuration": {"groupId": "sg-01", "ipPermissions": [
        {"fromPort": 22, "toPort": 22, "ipProtocol": "tcp"}]},
    "tags": {"team": "infra"},
}


def _write_snapshot(tmp_path, name, items):
    p = tmp_path / name
    p.write_text(json.dumps({
        "fileVersion": "1.0",
        "configSnapshotId": "snap-1",
        "configurationItems": items,
    }))
    return str(p)


def test_config_landing_projection(spark, tmp_path):
    item2 = dict(ITEM, resourceId="sg-02", resourceName=None,
                 resourceType="AWS::EC2::Instance")
    path = _write_snapshot(
        tmp_path, "123456789012_Config_us-east-1_ConfigSnapshot_"
        "20190225T093000Z_abcd.json", [ITEM, item2])
    df = read_config_json(spark, path)
    rows = {r.resource_id: r for r in df.collect()}
    assert set(rows) == {"sg-01", "sg-02"}
    r = rows["sg-01"]
    # filename stamp -> event_time (aws_config.py:166-169)
    assert r.event_time == dt.datetime(2019, 2, 25, 9, 30, 0)
    assert r.configuration_item_capture_time == dt.datetime(
        2019, 2, 25, 9, 29, 52, 103000)
    assert r.resource_creation_time == dt.datetime(2018, 11, 2, 4, 42, 49)
    assert r.account_id == "123456789012"
    assert r.aws_region == "us-east-1"
    assert r.resource_type == "AWS::EC2::SecurityGroup"
    assert r.arn.endswith("security-group/sg-01")
    assert r.availability_zone == "Not Applicable"
    assert r.resource_name == "web-sg"
    # VARIANT columns land as JSON text usable by col:path access
    assert json.loads(r.relationships)[0]["resourceId"] == "vpc-1"
    assert json.loads(r.configuration)["groupId"] == "sg-01"
    assert json.loads(r.tags) == {"team": "infra"}
    assert json.loads(r.raw)["resourceId"] == "sg-01"
    # hash_raw = per-item dedupe key: distinct items, distinct hashes
    assert rows["sg-01"].hash_raw != rows["sg-02"].hash_raw
    assert rows["sg-02"].resource_name is None


def test_config_filename_without_stamp_and_empty_items(spark, tmp_path):
    p1 = _write_snapshot(tmp_path, "manual-export.json", [ITEM])
    df = read_config_json(spark, p1)
    assert df.collect()[0].event_time is None
    # ARRAY_SIZE(configurationItems) > 0 parity: empty array -> no rows
    p2 = _write_snapshot(tmp_path, "empty_20190225T093000Z.json", [])
    assert read_config_json(spark, p2).count() == 0


def test_protocol_mapping_lands_typed(spark):
    m = read_protocol_mapping_csv(spark)
    rows = {r.protocol_id: r for r in m.collect()}
    assert len(rows) > 100  # the IANA table
    assert rows[6].protocol_keyword == "TCP"
    assert rows[17].protocol_keyword == "UDP"
    assert rows[0].protocol_ipv6_extension_header is True  # HOPOPT Y
    assert rows[6].protocol_ipv6_extension_header is False
    assert m.schema["protocol_id"].dataType.simpleString() == "int"


def test_connect_flow_log_creates_mapping_and_landing(spark, tmp_path):
    p = tmp_path / "flow.log"
    p.write_text(
        "version account-id interface-id srcaddr dstaddr srcport dstport "
        "protocol packets bytes start end action log-status\n"
        "2 123456789012 eni-1 10.0.0.1 10.0.0.2 43210 22 6 10 840 "
        "1714557600 1714557660 ACCEPT OK\n"
        "2 123456789012 eni-1 10.0.0.3 10.0.0.2 999 53 17 2 120 "
        "1714557600 1714557660 ACCEPT OK\n"
    )
    out = connect_flow_log(spark, str(p), connection_name="t1")
    assert out["landing"].count() == 2
    assert spark.catalog.tableExists(
        "data_aws_vpc_flow_log_t1_connection")
    assert spark.catalog.tableExists("data_network_protocol_mapping")
    # re-connect under another name reuses the mapping (ifnotexists)
    before = spark.table("data_network_protocol_mapping")
    connect_flow_log(spark, str(p), connection_name="t2")
    assert spark.table("data_network_protocol_mapping").count() == before.count()

    # pack-style rule view: decode protocol numbers through the mapping
    decoded = spark.sql(
        """SELECT f.srcaddr, f.dstport, m.protocol_keyword
           FROM data_aws_vpc_flow_log_t1_connection f
           JOIN data_network_protocol_mapping m
             ON f.protocol = m.protocol_id"""
    ).collect()
    got = {(r.srcaddr, r.protocol_keyword) for r in decoded}
    assert got == {("10.0.0.1", "TCP"), ("10.0.0.3", "UDP")}
