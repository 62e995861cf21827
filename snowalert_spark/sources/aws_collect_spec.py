"""AWS API method specs at reference fidelity (aws_collect.py:556-1110).

All forty reference API methods re-encoded for sources/collect.py's
spec-driven collector: the account fan-out seed
(organizations.list_accounts), the full IAM posture set (account
summary/password policy/credential report, the users→login-profile/
mfa/access-keys/groups/policies fan-out, groups→attached policies,
roles→role-policies→policy-documents, managed policies→versions/
entities, virtual MFA devices), EC2/Config inventory, the KMS
parent→child rotation-status chain, the S3 bucket chain with three
follow-up methods per bucket, the CloudTrail trail→status/selectors
chain, and the Inspector findings chain (with its ``required_args``
gate).

Tuple values are parsed columns: ``(parser, raw_col, parsed_col)``
(ParsedCol, aws_collect.py:76). ``regions`` pin lists (the reference's
boto3 describe-regions workaround, aws_collect.py:674-688, 1042-1056)
are carried for parity; the collector's seeding layer owns region
fan-out. Response keys and landing column names match the reference's
API_METHOD_SPECS / SUPPLEMENTARY_TABLES byte-for-byte so the cis_aws
pack views read these tables unchanged.
"""

from __future__ import annotations

# aws_collect.py:674-688: Config/Inspector clients can't describe
# regions (reference-documented boto3 bug) — static pin list.
_PINNED_REGIONS = [
    "us-east-1",
    "us-east-2",
    "us-west-1",
    "us-west-2",
    "ap-south-1",
    "ap-northeast-2",
    "ap-southeast-2",
    "ap-northeast-1",
    "eu-central-1",
    "eu-west-1",
    "eu-west-2",
    "eu-north-1",
]

AWS_API_SPEC: dict[str, dict] = {
    # aws_collect.py:557-571; lands into the `_connection`-suffixed
    # seed table (aws_collect.py:1114-1117 landing_table naming)
    "organizations.list_accounts": {
        "table": "organizations_list_accounts_connection",
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
    # aws_collect.py:573-611 — full 33-key summary map
    "iam.get_account_summary": {
        "response": {
            "SummaryMap": {
                "GroupPolicySizeQuota": "group_policy_size_quota",
                "InstanceProfilesQuota": "instance_profiles_quota",
                "Policies": "policies",
                "GroupsPerUserQuota": "groups_per_user_quota",
                "InstanceProfiles": "instance_profiles",
                "AttachedPoliciesPerUserQuota": "attached_policies_per_user_quota",
                "Users": "users",
                "PoliciesQuota": "policies_quota",
                "Providers": "providers",
                "AccountMFAEnabled": "account_mfa_enabled",
                "AccessKeysPerUserQuota": "access_keys_per_user_quota",
                "AssumeRolePolicySizeQuota": "assume_role_policy_size_quota",
                "PolicyVersionsInUseQuota": "policy_versions_in_use_quota",
                "GlobalEndpointTokenVersion": "global_endpoint_token_version",
                "VersionsPerPolicyQuota": "versions_per_policy_quota",
                "AttachedPoliciesPerGroupQuota": "attached_policies_per_group_quota",
                "PolicySizeQuota": "policy_size_quota",
                "Groups": "groups",
                "AccountSigningCertificatesPresent":
                    "account_signing_certificates_present",
                "UsersQuota": "users_quota",
                "ServerCertificatesQuota": "server_certificates_quota",
                "MFADevices": "mfa_devices",
                "UserPolicySizeQuota": "user_policy_size_quota",
                "PolicyVersionsInUse": "policy_versions_in_use",
                "ServerCertificates": "server_certificates",
                "Roles": "roles",
                "RolesQuota": "roles_quota",
                "SigningCertificatesPerUserQuota":
                    "signing_certificates_per_user_quota",
                "MFADevicesInUse": "mfa_devices_in_use",
                "RolePolicySizeQuota": "role_policy_size_quota",
                "AttachedPoliciesPerRoleQuota": "attached_policies_per_role_quota",
                "AccountAccessKeysPresent": "account_access_keys_present",
                "GroupsQuota": "groups_quota",
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
    # aws_collect.py:673-700
    "config.describe_configuration_recorders": {
        "regions": _PINNED_REGIONS,
        "response": {
            "ConfigurationRecorders": [
                {
                    "name": "name",
                    "roleARN": "role_arn",
                    "recordingGroup": "recording_group",
                }
            ]
        },
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
    # aws_collect.py:721-739: groups → attached managed policies
    "iam.list_groups": {
        "response": {
            "Groups": [
                {
                    "Arn": "arn",
                    "Path": "path",
                    "CreateDate": "create_date",
                    "GroupId": "group_id",
                    "GroupName": "group_name",
                }
            ]
        },
        "children": [
            {
                "method": "iam.list_attached_group_policies",
                "args": {"GroupName": "group_name"},
            }
        ],
    },
    # aws_collect.py:740-768: users → 6-way posture fan-out
    "iam.list_users": {
        "response": {
            "Users": [
                {
                    "Arn": "arn",
                    "Path": "path",
                    "CreateDate": "create_date",
                    "UserId": "user_id",
                    "UserName": "user_name",
                    "PasswordLastUsed": "password_last_used",
                    "PermissionsBoundary": "permissions_boundary",
                    "Tags": "tags",
                }
            ]
        },
        "children": [
            {
                "methods": [
                    "iam.get_login_profile",
                    "iam.list_mfa_devices",
                    "iam.list_access_keys",
                    "iam.list_groups_for_user",
                    "iam.list_user_policies",
                    "iam.list_attached_user_policies",
                ],
                "args": {"UserName": "user_name"},
            }
        ],
    },
    # aws_collect.py:769-782
    "iam.list_groups_for_user": {
        "params": {"UserName": "user_name"},
        "response": {
            "Groups": [
                {
                    "Path": "path",
                    "GroupName": "group_name",
                    "GroupId": "group_id",
                    "Arn": "arn",
                    "CreateDate": "create_date",
                }
            ]
        },
    },
    # aws_collect.py:783-795
    "iam.list_access_keys": {
        "params": {"UserName": "user_name"},
        "response": {
            "AccessKeyMetadata": [
                {
                    "UserName": "user_name",
                    "AccessKeyId": "access_key_id",
                    "Status": "status",
                    "CreateDate": "create_date",
                }
            ]
        },
    },
    # aws_collect.py:796-805 (a missing profile is an error page — the
    # quarantine path — or a None LoginProfile, which lands NULLs)
    "iam.get_login_profile": {
        "params": {"UserName": "user_name"},
        "response": {
            "LoginProfile": {
                "UserName": "user_name",
                "CreateDate": "create_date",
                "PasswordResetRequired": "password_reset_required",
            }
        },
    },
    # aws_collect.py:806-817
    "iam.list_mfa_devices": {
        "params": {"UserName": "user_name"},
        "response": {
            "MFADevices": [
                {
                    "UserName": "user_name",
                    "SerialNumber": "serial_number",
                    "EnableDate": "enable_date",
                }
            ]
        },
    },
    # aws_collect.py:818-821
    "iam.list_user_policies": {
        "params": {"UserName": "user_name"},
        "response": {"PolicyNames": ["policy_name"]},
    },
    # aws_collect.py:822-829
    "iam.list_attached_user_policies": {
        "params": {"UserName": "user_name"},
        "response": {
            "AttachedPolicies": [
                {"PolicyName": "policy_name", "PolicyArn": "policy_arn"}
            ]
        },
    },
    # aws_collect.py:830-837
    "iam.list_attached_group_policies": {
        "params": {"GroupName": "group_name"},
        "response": {
            "AttachedPolicies": [
                {"PolicyName": "policy_name", "PolicyArn": "policy_arn"}
            ]
        },
    },
    # aws_collect.py:838-862: roles → inline role policies
    "iam.list_roles": {
        "response": {
            "Roles": [
                {
                    "Path": "path",
                    "RoleName": "role_name",
                    "RoleId": "role_id",
                    "Arn": "arn",
                    "CreateDate": "create_date",
                    "AssumeRolePolicyDocument": "assume_role_policy_document",
                    "Description": "description",
                    "MaxSessionDuration": "max_session_duration",
                    "PermissionsBoundary": {
                        "PermissionsBoundaryType": "permissions_boundary_type",
                        "PermissionsBoundaryArn": "permissions_boundary_arn",
                    },
                    "Tags": "tags",
                    "RoleLastUsed": "role_last_used",
                }
            ]
        },
        "children": [
            {"method": "iam.list_role_policies", "args": {"RoleName": "role_name"}}
        ],
    },
    # aws_collect.py:863-873: role policy names → policy documents
    "iam.list_role_policies": {
        "params": {"RoleName": "role_name"},
        "response": {"PolicyNames": ["policy_name"]},
        "children": [
            {
                "method": "iam.get_role_policy",
                "args": {"RoleName": "role_name", "PolicyName": "policy_name"},
            }
        ],
    },
    # aws_collect.py:874-877
    "iam.get_role_policy": {
        "params": {"RoleName": "role_name", "PolicyName": "policy_name"},
        "response": {"PolicyDocument": "policy_document"},
    },
    # aws_collect.py:878-903: managed policies → default version doc +
    # attached entities
    "iam.list_policies": {
        "response": {
            "Policies": [
                {
                    "PolicyName": "policy_name",
                    "PolicyId": "policy_id",
                    "Arn": "arn",
                    "Path": "path",
                    "DefaultVersionId": "default_version_id",
                    "AttachmentCount": "attachment_count",
                    "PermissionsBoundaryUsageCount":
                        "permissions_boundary_usage_count",
                    "IsAttachable": "is_attachable",
                    "Description": "description",
                    "CreateDate": "create_date",
                    "UpdateDate": "update_date",
                }
            ]
        },
        "children": [
            {
                "method": "iam.get_policy_version",
                "args": {"PolicyArn": "arn", "VersionId": "default_version_id"},
            },
            {"method": "iam.list_entities_for_policy", "args": {"PolicyArn": "arn"}},
        ],
    },
    # aws_collect.py:904-914
    "iam.get_policy_version": {
        "params": {"PolicyArn": "policy_arn"},
        "response": {
            "PolicyVersion": {
                "Document": "document",
                "VersionId": "version_id",
                "CreateDate": "create_date",
                "IsDefaultVersion": "is_default_version",
            }
        },
    },
    # aws_collect.py:915-922: one row per attached group/user/role
    "iam.list_entities_for_policy": {
        "params": {"PolicyArn": "policy_arn"},
        "response": {
            "PolicyGroups": [{"GroupName": "group_name", "GroupId": "group_id"}],
            "PolicyUsers": [{"UserName": "user_name", "UserId": "user_id"}],
            "PolicyRoles": [{"RoleName": "role_name", "RoleId": "role_id"}],
        },
    },
    # aws_collect.py:923-935
    "iam.list_virtual_mfa_devices": {
        "response": {
            "VirtualMFADevices": [
                {
                    "SerialNumber": "serial_number",
                    "Base32StringSeed": "base32_string_seed",
                    "QRCodePNG": "qr_code_png",
                    "User": "user",
                    "EnableDate": "enable_date",
                }
            ]
        }
    },
    # aws_collect.py:936-953: bucket chain (+3 follow-ups per bucket)
    "s3.list_buckets": {
        "response": {
            "Buckets": [
                {"Name": "bucket_name", "CreationDate": "bucket_creation_date"}
            ],
            "Owner": {"DisplayName": "owner_display_name", "ID": "owner_id"},
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
    # aws_collect.py:954-962: one row per grant
    "s3.get_bucket_acl": {
        "params": {"Bucket": "bucket"},
        "response": {
            "Owner": {"DisplayName": "owner_display_name", "ID": "owner_id"},
            "Grants": [
                {"Grantee": "grants_grantee", "Permission": "grants_permission"}
            ],
        },
    },
    # aws_collect.py:963-966
    "s3.get_bucket_policy": {
        "params": {"Bucket": "bucket"},
        "response": {"Policy": ("json", "policy", "policy_json_parsed")},
    },
    # aws_collect.py:967-976
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
    # aws_collect.py:977-1007: trails → status + event selectors
    "cloudtrail.describe_trails": {
        "response": {
            "trailList": [
                {
                    "Name": "name",
                    "S3BucketName": "s3_bucket_name",
                    "S3KeyPrefix": "s3_key_prefix",
                    "SnsTopicName": "sns_topic_name",
                    "SnsTopicARN": "sns_topic_arn",
                    "IncludeGlobalServiceEvents": "include_global_service_events",
                    "IsMultiRegionTrail": "is_multi_region_trail",
                    "HomeRegion": "home_region",
                    "TrailARN": "trail_arn",
                    "LogFileValidationEnabled": "log_file_validation_enabled",
                    "CloudWatchLogsLogGroupArn": "cloud_watch_logs_log_group_arn",
                    "CloudWatchLogsRoleArn": "cloud_watch_logs_role_arn",
                    "KmsKeyId": "kms_key_id",
                    "HasCustomEventSelectors": "has_custom_event_selectors",
                    "HasInsightSelectors": "has_insight_selectors",
                    "IsOrganizationTrail": "is_organization_trail",
                }
            ]
        },
        "children": [
            {"method": "cloudtrail.get_trail_status", "args": {"Name": "trail_arn"}},
            {
                "method": "cloudtrail.get_event_selectors",
                "args": {"TrailName": "trail_arn"},
            },
        ],
    },
    # aws_collect.py:1008-1029
    "cloudtrail.get_trail_status": {
        "params": {"Name": "trail_arn"},
        "response": {
            "IsLogging": "is_logging",
            "LatestDeliveryError": "latest_delivery_error",
            "LatestNotificationError": "latest_notification_error",
            "LatestDeliveryTime": "latest_delivery_time",
            "LatestNotificationTime": "latest_notification_time",
            "StartLoggingTime": "start_logging_time",
            "StopLoggingTime": "stop_logging_time",
            "LatestCloudWatchLogsDeliveryError":
                "latest_cloud_watch_logs_delivery_error",
            "LatestCloudWatchLogsDeliveryTime":
                "latest_cloud_watch_logs_delivery_time",
            "LatestDigestDeliveryTime": "latest_digest_delivery_time",
            "LatestDigestDeliveryError": "latest_digest_delivery_error",
            "LatestDeliveryAttemptTime": "latest_delivery_attempt_time",
            "LatestNotificationAttemptTime": "latest_notification_attempt_time",
            "LatestNotificationAttemptSucceeded":
                "latest_notification_attempt_succeeded",
            "LatestDeliveryAttemptSucceeded": "latest_delivery_attempt_succeeded",
            "TimeLoggingStarted": "time_logging_started",
            "TimeLoggingStopped": "time_logging_stopped",
        },
    },
    # aws_collect.py:1030-1040
    "cloudtrail.get_event_selectors": {
        "response": {
            "TrailARN": "trail_arn",
            "EventSelectors": [
                {
                    "ReadWriteType": "read_write_type",
                    "IncludeManagementEvents": "include_management_events",
                    "DataResources": "data_resources",
                    "ExcludeManagementEventSources":
                        "exclude_management_event_sources",
                }
            ],
        }
    },
    # aws_collect.py:1041-1068: findings chain; required_args gates the
    # child so empty regions don't spawn describe calls
    "inspector.list_findings": {
        "regions": _PINNED_REGIONS,
        "response": {"findingArns": "finding_arns"},
        "children": [
            {
                "method": "inspector.describe_findings",
                "args": {"findingArns": "finding_arns"},
                "required_args": ["finding_arns"],
            }
        ],
    },
    # aws_collect.py:1069-1110 (reference dict literal repeats keys;
    # encoded once each)
    "inspector.describe_findings": {
        "params": {"findingArns": "finding_arns"},
        "response": {
            "failedItems": "failed_items",
            "findings": [
                {
                    "arn": "arn",
                    "schemaVersion": "schema_version",
                    "service": "service",
                    "serviceAttributes": "service_attributes",
                    "assetType": "asset_type",
                    "assetAttributes": "asset_attributes",
                    "id": "id",
                    "title": "title",
                    "description": "description",
                    "recommendation": "recommendation",
                    "severity": "severity",
                    "numericSeverity": "numeric_severity",
                    "confidence": "confidence",
                    "indicatorOfCompromise": "indicator_of_compromise",
                    "attributes": "attributes",
                    "userAttributes": "user_attributes",
                    "createdAt": "created_at",
                    "updatedAt": "updated_at",
                }
            ],
        },
    },
}
