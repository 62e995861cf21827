"""AWS API method specs at reference fidelity (aws_collect.py:556-760).

Fourteen real API methods re-encoded for sources/collect.py's
spec-driven collector: the account fan-out seed
(organizations.list_accounts), the IAM account posture set the
cis_aws pack consumes, EC2/Config inventory, the KMS parent→child
rotation-status chain, the credential report with its csv ParsedCol,
and the S3 bucket chain with three follow-up methods per bucket.

Tuple values are parsed columns: ``(parser, raw_col, parsed_col)``
(ParsedCol, aws_collect.py:76). Response keys and landing column names
match the reference's API_METHOD_SPECS / SUPPLEMENTARY_TABLES
byte-for-byte so the cis_aws pack views read these tables unchanged.
"""

from __future__ import annotations

AWS_API_SPEC: dict[str, dict] = {
    # aws_collect.py:557-571
    "organizations.list_accounts": {
        "response": {
            "Accounts": [
                {
                    "Id": "id",
                    "Arn": "arn",
                    "Email": "email",
                    "Name": "name",
                    "Status": "status",
                    "JoinedMethod": "joined_method",
                    "JoinedTimestamp": "joined_timestamp",
                }
            ]
        }
    },
    # aws_collect.py:572
    "iam.list_account_aliases": {"response": {"AccountAliases": ["account_alias"]}},
    # aws_collect.py:573-611 (summary map keys abbreviated to the ones
    # the pack rules read, plus quota counters)
    "iam.get_account_summary": {
        "response": {
            "SummaryMap": {
                "AccountMFAEnabled": "account_mfa_enabled",
                "AccountAccessKeysPresent": "account_access_keys_present",
                "AccountSigningCertificatesPresent":
                    "account_signing_certificates_present",
                "Users": "users",
                "UsersQuota": "users_quota",
                "Groups": "groups",
                "GroupsQuota": "groups_quota",
                "Roles": "roles",
                "RolesQuota": "roles_quota",
                "Policies": "policies",
                "PoliciesQuota": "policies_quota",
                "MFADevices": "mfa_devices",
                "MFADevicesInUse": "mfa_devices_in_use",
                "Providers": "providers",
                "GlobalEndpointTokenVersion": "global_endpoint_token_version",
            }
        }
    },
    # aws_collect.py:612-627
    "iam.get_account_password_policy": {
        "response": {
            "PasswordPolicy": {
                "MinimumPasswordLength": "minimum_password_length",
                "RequireSymbols": "require_symbols",
                "RequireNumbers": "require_numbers",
                "RequireUppercaseCharacters": "require_uppercase_characters",
                "RequireLowercaseCharacters": "require_lowercase_characters",
                "AllowUsersToChangePassword": "allow_users_to_change_password",
                "ExpirePasswords": "expire_passwords",
                "MaxPasswordAge": "max_password_age",
                "PasswordReusePrevention": "password_reuse_prevention",
                "HardExpiry": "hard_expiry",
            }
        }
    },
    # aws_collect.py:628-640
    "ec2.describe_instances": {
        "response": {
            "Reservations": [
                {
                    "Groups": "groups",
                    "Instances": "instances",
                    "OwnerId": "owner_id",
                    "RequesterId": "requester_id",
                    "ReservationId": "reservation_id",
                }
            ]
        }
    },
    # aws_collect.py:641-655
    "ec2.describe_route_tables": {
        "response": {
            "RouteTables": [
                {
                    "Associations": "associations",
                    "PropagatingVgws": "propagating_vgws",
                    "RouteTableId": "route_table_id",
                    "Routes": "routes",
                    "Tags": "tags",
                    "VpcId": "vpc_id",
                    "OwnerId": "owner_id",
                }
            ]
        }
    },
    # aws_collect.py:656-672
    "ec2.describe_security_groups": {
        "response": {
            "SecurityGroups": [
                {
                    "Description": "description",
                    "GroupName": "group_name",
                    "IpPermissions": "ip_permissions",
                    "OwnerId": "owner_id",
                    "GroupId": "group_id",
                    "IpPermissionsEgress": "ip_permissions_egress",
                    "Tags": "tags",
                    "VpcId": "vpc_id",
                }
            ]
        }
    },
    # aws_collect.py:673-700 (region pin list elided — the collector's
    # seeding layer owns region fan-out)
    "config.describe_configuration_recorders": {
        "response": {
            "ConfigurationRecorders": [
                {
                    "name": "name",
                    "roleARN": "role_arn",
                    "recordingGroup": "recording_group",
                }
            ]
        }
    },
    # aws_collect.py:701-706: parent → per-key rotation-status child
    "kms.list_keys": {
        "response": {"Keys": [{"KeyId": "key_id", "KeyArn": "key_arn"}]},
        "children": [
            {"method": "kms.get_key_rotation_status", "args": {"KeyId": "key_arn"}}
        ],
    },
    # aws_collect.py:707-710
    "kms.get_key_rotation_status": {
        "params": {"KeyId": "key_arn"},
        "response": {"KeyRotationEnabled": "key_rotation_enabled"},
    },
    # aws_collect.py:711-713
    "iam.generate_credential_report": {
        "response": {"State": "state", "Description": "description"}
    },
    # aws_collect.py:714-720: ParsedCol csv → content + content_csv_parsed
    "iam.get_credential_report": {
        "response": {
            "Content": ("csv", "content", "content_csv_parsed"),
            "ReportFormat": "report_format",
            "GeneratedTime": "generated_time",
        }
    },
    # aws_collect.py s3.list_buckets (+ its three follow-ups per bucket)
    "s3.list_buckets": {
        "response": {
            "Owner": {"DisplayName": "owner_display_name", "ID": "owner_id"},
            "Buckets": [
                {"Name": "bucket_name", "CreationDate": "bucket_creation_date"}
            ],
        },
        "children": [
            {
                "methods": [
                    "s3.get_bucket_acl",
                    "s3.get_bucket_policy",
                    "s3.get_bucket_logging",
                ],
                "args": {"Bucket": "bucket_name"},
            }
        ],
    },
    "s3.get_bucket_acl": {
        "params": {"Bucket": "bucket"},
        "response": {
            "Grants": "grants",
            "Owner": {"DisplayName": "owner_display_name", "ID": "owner_id"},
        },
    },
    "s3.get_bucket_policy": {
        "params": {"Bucket": "bucket"},
        "response": {"Policy": ("json", "policy", "policy_json_parsed")},
    },
    "s3.get_bucket_logging": {
        "params": {"Bucket": "bucket"},
        "response": {
            "LoggingEnabled": {
                "TargetBucket": "target_bucket",
                "TargetGrants": "target_grants",
                "TargetPrefix": "target_prefix",
            }
        },
    },
}
