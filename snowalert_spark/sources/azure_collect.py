"""Azure inventory collector (reference: src/connectors/azure_collect.py).

The reference walks the Azure management/Graph APIs as a spec-driven
DAG: each *kind* has a request (path template + api-version + per-cloud
host), a flat response map (api field → landing column, with the
specials ``headerDate``/``tenantId``/``error`` and ``'*' → raw``), and
children whose args bind from emitted rows (azure_collect.py:753-1790).
``GET`` follows ``nextLink``/``@odata.nextLink`` pagination, shapes
empty pages as empty rows and error payloads as error rows
(azure_collect.py:1793-1910).

This module re-expresses that engine with an injectable transport
(``(url, headers) -> TransportPage``) and encodes **all 37 reference
kinds** — landing columns match the reference's API_SPECS
byte-for-byte so the cis_azure pack reads these tables unchanged. The
strict-map contract is kept: an unmapped response key raises KeyError
unless the spec carries ``'*'`` (azure_collect.py:1901-1909's
documented behavior). ``auth_audience`` / ``rate_limit`` / ``rate_by``
are carried for spec parity; pacing is the transport's concern here
(the reference paces queue_services at 0.1/s per subscription,
azure_collect.py:1734-1736).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from urllib.parse import urlencode

MGMT_HOSTS = {"azure": "management.azure.com", "usgov": "management.usgovcloudapi.net"}
GRAPH_HOSTS = {"azure": "graph.microsoft.com", "usgov": "graph.microsoft.us"}

_SUB = "/subscriptions/{subscriptionId}"

# shared shorthand for the standard mgmt-resource response head
def _mgmt(**extra):
    return {
        "headerDate": "recorded_at",
        "tenantId": "tenant_id",
        "subscriptionId": "subscription_id",
        "error": "error",
        **extra,
    }


API_SPECS: dict[str, dict] = {
    # azure_collect.py:754-810 — full 19-child fan-out
    "subscriptions": {
        "request": {"path": "/subscriptions", "api-version": "2019-06-01"},
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "error": "error",
            "id": "id",
            "subscriptionId": "subscription_id",
            "displayName": "display_name",
            "state": "state",
            "subscriptionPolicies": "subscription_policies",
            "authorizationSource": "authorization_source",
            "managedByTenants": "managed_by_tenants",
        },
        "children": [
            {"kind": k, "args": {"subscriptionId": "subscription_id"}}
            for k in (
                "virtual_machines", "disks", "sql_servers", "role_definitions",
                "role_assignments", "pricings", "auto_provisioning_settings",
                "policy_assignments", "security_contacts",
                "activity_log_alerts", "vaults", "network_watchers",
                "network_security_groups", "log_profiles",
                "hosting_environments", "resource_groups",
                "subscriptions_locations", "managed_clusters",
                "storage_accounts",
            )
        ],
    },
    # azure_collect.py:812-830
    "reports_credential_user_registration_details": {
        "request": {
            "path": "/beta/reports/credentialUserRegistrationDetails",
            "host": GRAPH_HOSTS,
        },
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "error": "error",
            "id": "id",
            "userPrincipalName": "user_principal_name",
            "userDisplayName": "user_display_name",
            "authMethods": "auth_methods",
            "isRegistered": "is_registered",
            "isEnabled": "is_enabled",
            "isCapable": "is_capable",
            "isMfaRegistered": "is_mfa_registered",
            "*": "raw",
        },
    },
    # azure_collect.py:831-882
    "service_principals": {
        "request": {"path": "/beta/servicePrincipals", "host": GRAPH_HOSTS},
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "error": "error",
            "id": "id",
            "api": "api",
            "accountEnabled": "account_enabled",
            "alternativeNames": "alternative_names",
            "appDescription": "app_description",
            "appDisplayName": "app_display_name",
            "appId": "app_id",
            "appRoleAssignmentRequired": "app_role_assignment_required",
            "appRoles": "app_roles",
            "applicationTemplateId": "application_template_id",
            "appOwnerOrganizationId": "app_owner_organization_id",
            "deletedDateTime": "deleted",
            "description": "description",
            "displayName": "display_name",
            "errorUrl": "error_url",
            "homepage": "homepage",
            "loginUrl": "login_url",
            "notes": "notes",
            "notificationEmailAddresses": "notification_email_addresses",
            "publishedPermissionScopes": "published_permission_scopes",
            "preferredSingleSignOnMode": "preferred_single_sign_on_mode",
            "preferredTokenSigningKeyEndDateTime": "preferred_token_signing_key_end",
            "samlSingleSignOnSettings": "saml_single_sign_on_settings",
            "servicePrincipalType": "service_principal_type",
            "signInAudience": "sign_in_audience",
            "tokenEncryptionKeyId": "token_encryption_key_id",
            "addIns": "add_ins",
            "info": "info",
            "keyCredentials": "key_credentials",
            "logoutUrl": "logout_url",
            "oauth2Permissions": "oauth2_permissions",
            "passwordCredentials": "password_credentials",
            "preferredTokenSigningKeyThumbprint":
                "preferred_token_signing_key_thumbprint",
            "publisherName": "publisher_name",
            "replyUrls": "reply_urls",
            "samlMetadataUrl": "saml_metadata_url",
            "servicePrincipalNames": "service_principal_names",
            "tags": "tags",
            "verifiedPublisher": "verified_publisher",
            "isAuthorizationServiceEnabled": "is_authorization_service_enabled",
            "*": "raw",
        },
    },
    # azure_collect.py:883-934
    "groups": {
        "request": {"path": "/v1.0/groups", "host": GRAPH_HOSTS},
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "error": "error",
            "allowExternalSenders": "allow_external_senders",
            "assignedLicenses": "assigned_licenses",
            "autoSubscribeNewMembers": "auto_subscribe_new_members",
            "classification": "classification",
            "createdDateTime": "created",
            "creationOptions": "creation_options",
            "deletedDateTime": "deleted",
            "description": "description",
            "displayName": "display_name",
            "expirationDateTime": "expiration",
            "groupTypes": "group_types",
            "hasMembersWithLicenseErrors": "has_members_with_license_errors",
            "id": "id",
            "isAssignableToRole": "is_assignable_to_role",
            "isSubscribedByMail": "is_subscribed_by_mail",
            "licenseProcessingState": "license_processing_state",
            "mail": "mail",
            "mailEnabled": "mail_enabled",
            "mailNickname": "mail_nickname",
            "membershipRule": "membership_rule",
            "membershipRuleProcessingState": "membership_rule_processing_state",
            "onPremisesDomainName": "on_premises_domain_name",
            "onPremisesNetBiosName": "on_premises_net_bios_name",
            "onPremisesSamAccountName": "on_premises_sam_account_name",
            "resourceBehaviorOptions": "resource_behavior_options",
            "resourceProvisioningOptions": "resource_provisioning_options",
            "onPremisesLastSyncDateTime": "on_premises_last_sync",
            "onPremisesProvisioningErrors": "on_premises_provisioning_errors",
            "onPremisesSecurityIdentifier": "on_premises_security_identifier",
            "onPremisesSyncEnabled": "on_premises_sync_enabled",
            "preferredDataLocation": "preferred_data_location",
            "preferredLanguage": "preferred_language",
            "proxyAddresses": "proxy_addresses",
            "renewedDateTime": "renewed",
            "securityEnabled": "security_enabled",
            "securityIdentifier": "security_identifier",
            "theme": "theme",
            "unseenCount": "unseen_count",
            "visibility": "visibility",
            "*": "raw",
        },
        "children": [{"kind": "groups_members", "args": {"groupId": "id"}}],
    },
    # azure_collect.py:935-949
    "groups_members": {
        "request": {"path": "/v1.0/groups/{groupId}/members", "host": GRAPH_HOSTS},
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "groupId": "group_id",
            "error": "error",
            "id": "id",
            "@odata.type": "odata_type",
            "*": "raw",
        },
    },
    # azure_collect.py:950-1049 — full field map; the request $select
    # restricts what Graph returns, the map covers every mappable field
    "users": {
        "request": {
            "path": "/v1.0/users",
            "host": GRAPH_HOSTS,
            "params": {
                "$select": (
                    "accountEnabled,businessPhones,city,country,"
                    "createdDateTime,department,displayName,employeeId,"
                    "faxNumber,givenName,jobTitle,mail,id,"
                    "lastPasswordChangeDateTime,mobilePhone,officeLocation,"
                    "preferredLanguage,surname,passwordPolicies,"
                    "passwordProfile,userPrincipalName,userType"
                )
            },
        },
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "error": "error",
            "aboutMe": "about_me",
            "accountEnabled": "account_enabled",
            "ageGroup": "age_group",
            "assignedLicenses": "assigned_licenses",
            "assignedPlans": "assigned_plans",
            "birthday": "birthday",
            "businessPhones": "business_phones",
            "city": "city",
            "companyName": "company_name",
            "consentProvidedForMinor": "consent_provided_for_minor",
            "country": "country",
            "createdDateTime": "created",
            "department": "department",
            "displayName": "display_name",
            "employeeId": "employee_id",
            "faxNumber": "fax_number",
            "givenName": "given_name",
            "hireDate": "hire_date",
            "id": "id",
            "imAddresses": "im_addresses",
            "interests": "interests",
            "isResourceAccount": "is_resource_account",
            "jobTitle": "job_title",
            "lastPasswordChangeDateTime": "last_password_change",
            "legalAgeGroupClassification": "legal_age_group_classification",
            "licenseAssignmentStates": "license_assignment_states",
            "mail": "mail",
            "mailboxSettings": "mailbox_settings",
            "mailNickname": "mail_nickname",
            "mobilePhone": "mobile_phone",
            "mySite": "my_site",
            "officeLocation": "office_location",
            "onPremisesDistinguishedName": "on_premises_distinguished_name",
            "onPremisesDomainName": "on_premises_domain_name",
            "onPremisesExtensionAttributes": "on_premises_extension_attributes",
            "onPremisesImmutableId": "on_premises_immutable_id",
            "onPremisesLastSyncDateTime": "on_premises_last_sync",
            "onPremisesProvisioningErrors": "on_premises_provisioning_errors",
            "onPremisesSamAccountName": "on_premises_sam_account_name",
            "onPremisesSecurityIdentifier": "on_premises_security_identifier",
            "onPremisesSyncEnabled": "on_premises_sync_enabled",
            "onPremisesUserPrincipalName": "on_premises_user_principal_name",
            "otherMails": "other_mails",
            "passwordPolicies": "password_policies",
            "passwordProfile": "password_profile",
            "pastProjects": "past_projects",
            "postalCode": "postal_code",
            "preferredDataLocation": "preferred_data_location",
            "preferredLanguage": "preferred_language",
            "preferredName": "preferred_name",
            "provisionedPlans": "provisioned_plans",
            "proxyAddresses": "proxy_addresses",
            "responsibilities": "responsibilities",
            "schools": "schools",
            "showInAddressList": "show_in_address_list",
            "skills": "skills",
            "signInSessionsValidFromDateTime": "sign_in_sessions_valid_from",
            "state": "state",
            "streetAddress": "street_address",
            "surname": "surname",
            "usageLocation": "usage_location",
            "userPrincipalName": "user_principal_name",
            "userType": "user_type",
        },
    },
    # azure_collect.py:1050-1108
    "managed_devices": {
        "request": {
            "path": "/v1.0/deviceManagement/managedDevices",
            "host": GRAPH_HOSTS,
        },
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "error": "error",
            "id": "id",
            "userId": "user_id",
            "deviceName": "device_name",
            "managedDeviceOwnerType": "managed_device_owner_type",
            "deviceActionResults": "device_action_results",
            "enrolledDateTime": "enrolled",
            "lastSyncDateTime": "last_sync",
            "operatingSystem": "operating_system",
            "complianceState": "compliance_state",
            "jailBroken": "jail_broken",
            "managementAgent": "management_agent",
            "osVersion": "os_version",
            "easActivated": "eas_activated",
            "easDeviceId": "eas_device_id",
            "easActivationDateTime": "eas_activation",
            "azureADRegistered": "azure_a_d_registered",
            "deviceEnrollmentType": "device_enrollment_type",
            "activationLockBypassCode": "activation_lock_bypass_code",
            "emailAddress": "email_address",
            "azureADDeviceId": "azure_a_d_device_id",
            "deviceRegistrationState": "device_registration_state",
            "deviceCategoryDisplayName": "device_category_display_name",
            "isSupervised": "is_supervised",
            "exchangeLastSuccessfulSyncDateTime": "exchange_last_successful_sync",
            "exchangeAccessState": "exchange_access_state",
            "exchangeAccessStateReason": "exchange_access_state_reason",
            "remoteAssistanceSessionUrl": "remote_assistance_session_url",
            "remoteAssistanceSessionErrorDetails":
                "remote_assistance_session_error_details",
            "isEncrypted": "is_encrypted",
            "userPrincipalName": "user_principal_name",
            "model": "model",
            "manufacturer": "manufacturer",
            "imei": "imei",
            "complianceGracePeriodExpirationDateTime":
                "compliance_grace_period_expiration",
            "serialNumber": "serial_number",
            "phoneNumber": "phone_number",
            "androidSecurityPatchLevel": "android_security_patch_level",
            "userDisplayName": "user_display_name",
            "configurationManagerClientEnabledFeatures":
                "configuration_manager_client_enabled_features",
            "wiFiMacAddress": "wi_fi_mac_address",
            "deviceHealthAttestationState": "device_health_attestation_state",
            "subscriberCarrier": "subscriber_carrier",
            "meid": "meid",
            "totalStorageSpaceInBytes": "total_storage_space_in_bytes",
            "freeStorageSpaceInBytes": "free_storage_space_in_bytes",
            "managedDeviceName": "managed_device_name",
            "partnerReportedThreatState": "partner_reported_threat_state",
            "*": "raw",
        },
    },
    # azure_collect.py:1109-1125
    "subscriptions_locations": {
        "request": {"path": _SUB + "/locations", "api-version": "2019-06-01"},
        "response": _mgmt(
            displayName="display_name", id="id", latitude="latitude",
            longitude="longitude", name="name",
        ),
    },
    # azure_collect.py:1126-1151
    "virtual_machines": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Compute/virtualMachines",
            "api-version": "2019-03-01",
        },
        "response": _mgmt(
            id="id", identity="identity", location="location", name="name",
            plan="plan", properties="properties", resources="resources",
            tags="tags", type="type", zones="zones",
        ),
        "children": [
            {"kind": "virtual_machines_instance_view", "args": {"vmId": "id"}},
            {"kind": "virtual_machines_extensions", "args": {"vmId": "id"}},
        ],
    },
    # azure_collect.py:1152-1173
    "virtual_machines_instance_view": {
        "request": {"path": "{vmId}/instanceView", "api-version": "2019-07-01"},
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "vmId": "vm_id",
            "error": "error",
            "bootDiagnostics": "boot_diagnostics",
            "computerName": "computer_name",
            "disks": "disks",
            "extensions": "extensions",
            "hyperVGeneration": "hyper_v_generation",
            "maintenanceRedeployStatus": "maintenance_redeploy_status",
            "osName": "os_name",
            "osVersion": "os_version",
            "platformFaultDomain": "platform_fault_domain",
            "platformUpdateDomain": "platform_update_domain",
            "rdpThumbPrint": "rdp_thumb_print",
            "statuses": "statuses",
            "vmAgent": "vm_agent",
        },
    },
    # azure_collect.py:1174-1188
    "virtual_machines_extensions": {
        "request": {"path": "{vmId}/extensions", "api-version": "2019-07-01"},
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "vmId": "vm_id",
            "error": "error",
            "id": "id",
            "location": "location",
            "name": "name",
            "properties": "properties",
            "tags": "tags",
            "type": "type",
        },
    },
    # azure_collect.py:1189-1207
    "managed_clusters": {
        "request": {
            "path": _SUB + "/providers/Microsoft.ContainerService/managedClusters",
            "api-version": "2019-08-01",
        },
        "response": _mgmt(
            id="id", identity="identity", location="location", name="name",
            properties="properties", tags="tags", type="type",
        ),
    },
    # azure_collect.py:1208-1230
    "vaults": {
        "request": {
            "path": _SUB + "/resources",
            "params": {"$filter": "resourceType eq 'Microsoft.KeyVault/vaults'"},
            "api-version": "2019-11-01",
        },
        "response": _mgmt(
            id="id", location="location", name="name", tags="tags", type="type",
        ),
        "children": [
            {"kind": "vaults_keys", "args": {"vaultName": "name"}},
            {"kind": "vaults_secrets", "args": {"vaultName": "name"}},
            {"kind": "diagnostic_settings", "args": {"resourceUri": "id"}},
        ],
    },
    # azure_collect.py:1231-1255
    "vaults_keys": {
        "request": {
            "host": {
                "azure": "{vaultName}.vault.azure.net",
                "usgov": "{vaultName}.vault.usgovcloudapi.net",
            },
            "auth_audience": {
                "azure": "vault.azure.net",
                "usgov": "vault.usgovcloudapi.net",
            },
            "path": "/keys",
            "params": {"maxresults": "25"},
            "api-version": "7.0",
        },
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "vaultName": "vault_name",
            "error": "error",
            "attributes": "attributes",
            "kid": "kid",
            "managed": "managed",
            "tags": "tags",
        },
    },
    # azure_collect.py:1256-1281
    "vaults_secrets": {
        "request": {
            "host": {
                "azure": "{vaultName}.vault.azure.net",
                "usgov": "{vaultName}.vault.usgovcloudapi.net",
            },
            "auth_audience": {
                "azure": "vault.azure.net",
                "usgov": "vault.usgovcloudapi.net",
            },
            "path": "/secrets",
            "params": {"maxresults": "25"},
            "api-version": "7.0",
        },
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "vaultName": "vault_name",
            "error": "error",
            "attributes": "attributes",
            "contentType": "content_type",
            "id": "id",
            "managed": "managed",
            "tags": "tags",
        },
    },
    # azure_collect.py:1282-1300
    "resource_groups": {
        "request": {
            "path": _SUB + "/resourcegroups",
            "api-version": "2019-08-01",
        },
        "response": _mgmt(
            id="id", location="location", managedBy="managed_by", name="name",
            properties="properties", tags="tags", type="type",
        ),
    },
    # azure_collect.py:1301-1331 — note the callable arg binding:
    # resourceGroupName comes from properties.resourceGroup
    "hosting_environments": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Web/hostingEnvironments",
            "api-version": "2019-08-01",
        },
        "response": _mgmt(
            id="id", kind="kind", location="location", name="name",
            properties="properties", tags="tags", type="type",
        ),
        "children": [
            {
                "kind": "webapps",
                "args": {
                    "subscriptionId": "subscription_id",
                    "resourceGroupName": lambda row: (
                        (row.get("properties") or {}).get("resourceGroup")
                    ),
                    "name": "name",
                },
            }
        ],
    },
    # azure_collect.py:1332-1355
    "webapps": {
        "request": {
            "path": (
                _SUB + "/resourceGroups/{resourceGroupName}"
                "/providers/Microsoft.Web/hostingEnvironments/{name}/sites"
            ),
            "api-version": "2019-08-01",
        },
        "response": _mgmt(
            id="id", kind="kind", location="location", name="name",
            properties="properties", tags="tags", type="type",
        ),
    },
    # azure_collect.py:1356-1401
    "storage_accounts": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Storage/storageAccounts",
            "api-version": "2019-06-01",
        },
        "response": _mgmt(
            id="id", identity="identity", kind="kind", location="location",
            name="name", properties="properties", sku="sku", tags="tags",
            type="type",
        ),
        "children": [
            {
                "kind": "storage_accounts_containers",
                "args": {"subscriptionId": "subscription_id",
                         "accountName": "name"},
            },
            {
                "kind": "queue_services",
                "args": {"subscriptionId": "subscription_id",
                         "accountFullId": "id", "accountName": "name"},
            },
            {
                "kind": "queue_services_properties",
                "args": {"subscriptionId": "subscription_id",
                         "accountFullId": "id", "accountName": "name"},
            },
        ],
    },
    # azure_collect.py:1402-1424 — XML-shaped listing (upper-case keys)
    "storage_accounts_containers": {
        "request": {
            "path": "/",
            "params": {"comp": "list"},
            "host": {
                "azure": "{accountName}.blob.core.windows.net",
                "usgov": "{accountName}.blob.core.usgovcloudapi.net",
            },
            "auth_audience": "storage.azure.com",
            "api-version": "2019-02-02",
        },
        "response_value_key": "EnumerationResults.Containers.Container",
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "subscriptionId": "subscription_id",
            "accountName": "account_name",
            "error": "error",
            "Error": "error",
            "Name": "name",
            "Properties": "properties",
        },
    },
    # azure_collect.py:1425-1447
    "log_profiles": {
        "request": {
            "path": _SUB + "/providers/microsoft.insights/logprofiles",
            "api-version": "2016-03-01",
        },
        "response": _mgmt(
            id="id", identity="identity", kind="kind", location="location",
            name="name", properties="properties", tags="tags", type="type",
        ),
    },
    # azure_collect.py:1448-1470
    "disks": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Compute/disks",
            "api-version": "2019-07-01",
        },
        "response": _mgmt(
            id="id", location="location", managedBy="managed_by", name="name",
            properties="properties", sku="sku", tags="tags", type="type",
            zones="zones",
        ),
    },
    # azure_collect.py:1471-1490
    "role_definitions": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Authorization/roleDefinitions",
            "api-version": "2015-07-01",
        },
        "response": _mgmt(
            displayName="display_name", id="id", name="name",
            properties="properties", type="type",
        ),
    },
    # azure_collect.py:1491-1509
    "role_assignments": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Authorization/roleAssignments",
            "api-version": "2015-07-01",
        },
        "response": _mgmt(
            id="id", name="name", properties="properties", type="type",
        ),
    },
    # azure_collect.py:1510-1531
    "network_security_groups": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Network/networkSecurityGroups",
            "api-version": "2019-09-01",
        },
        "response": _mgmt(
            etag="etag", id="id", location="location", name="name",
            properties="properties", tags="tags", type="type",
        ),
    },
    # azure_collect.py:1532-1553
    "network_watchers": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Network/networkWatchers",
            "api-version": "2019-09-01",
        },
        "response": _mgmt(
            etag="etag", id="id", location="location", name="name",
            properties="properties", tags="tags", type="type",
        ),
    },
    # azure_collect.py:1554-1572
    "pricings": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Security/pricings",
            "api-version": "2018-06-01",
        },
        "response": _mgmt(
            id="id", name="name", properties="properties", type="type",
        ),
    },
    # azure_collect.py:1573-1592
    "auto_provisioning_settings": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Security/autoProvisioningSettings",
            "api-version": "2017-08-01-preview",
        },
        "response": {
            **_mgmt(id="id", name="name", properties="properties", type="type"),
            "*": "raw",
        },
    },
    # azure_collect.py:1593-1614
    "policy_assignments": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Authorization/policyAssignments",
            "api-version": "2019-09-01",
        },
        "response": _mgmt(
            id="id", identity="identity", location="location", name="name",
            properties="properties", sku="sku", type="type",
        ),
    },
    # azure_collect.py:1615-1635
    "security_contacts": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Security/securityContacts",
            "api-version": "2017-08-01-preview",
        },
        "response": {
            **_mgmt(id="id", name="name", type="type", properties="properties",
                    etag="etag"),
            "*": "raw",
        },
    },
    # azure_collect.py:1636-1656
    "diagnostic_settings": {
        "request": {
            "path": "{resourceUri}/providers/microsoft.insights/diagnosticSettings",
            "api-version": "2017-05-01-preview",
        },
        "response": {
            "headerDate": "recorded_at",
            "resourceUri": "resource_uri",
            "tenantId": "tenant_id",
            "error": "error",
            "id": "id",
            "location": "location",
            "kind": "kind",
            "name": "name",
            "type": "type",
            "tags": "tags",
            "identity": "identity",
            "properties": "properties",
            "*": "raw",
        },
    },
    # azure_collect.py:1657-1678
    "workflows": {
        "request": {
            "path": (
                _SUB + "/resourcegroups/{rgName}/providers/microsoft.logic"
                "/workflows"
            ),
            "api-version": "2016-06-01",
        },
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "subscriptionId": "subscription_id",
            "rgName": "resource_group_name",
            "error": "error",
            "id": "id",
            "name": "name",
            "type": "type",
            "properties": "properties",
        },
    },
    # azure_collect.py:1679-1702
    "activity_log_alerts": {
        "request": {
            "path": _SUB + "/providers/microsoft.insights/activityLogAlerts",
            "api-version": "2017-04-01",
        },
        "response": _mgmt(
            id="id", location="location", name="name", properties="properties",
            tags="tags", type="type", kind="kind", identity="identity",
        ),
    },
    # azure_collect.py:1703-1722 — reference paces this at 0.1/s per
    # subscription (rate_limit/rate_by carried for parity)
    "queue_services": {
        "request": {
            "path": "{accountFullId}/queueServices",
            "api-version": "2019-06-01",
        },
        "rate_limit": "0.1/s",
        "rate_by": "subscriptionId",
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "subscriptionId": "subscription_id",
            "accountFullId": "account_full_id",
            "accountName": "account_name",
            "error": "error",
            "id": "id",
            "name": "name",
            "type": "type",
            "properties": "properties",
        },
    },
    # azure_collect.py:1723-1748 — XML storage-service properties; the
    # api-version rides a header (x-ms-version), not the query string
    "queue_services_properties": {
        "request": {
            "path": "/",
            "params": {"restype": "service", "comp": "properties"},
            "host": {
                "azure": "{accountName}.queue.core.windows.net",
                "usgov": "{accountName}.queue.core.usgovcloudapi.net",
            },
            "auth_audience": "storage.azure.com",
            "api-version-header": "2019-12-12",
        },
        "response_value_key": "StorageServiceProperties",
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "subscriptionId": "subscription_id",
            "accountFullId": "account_full_id",
            "accountName": "account_name",
            "Error": "error",
            "Cors": "cors",
            "Logging": "logging",
            "MinuteMetrics": "minute_metrics",
            "HourMetrics": "hour_metrics",
            "*": "raw",
        },
    },
    # azure_collect.py:1749-1772
    "sql_servers": {
        "request": {
            "path": _SUB + "/providers/Microsoft.Sql/servers",
            "api-version": "2019-06-01-preview",
        },
        "response": {
            **_mgmt(id="id", identity="identity", kind="kind",
                    location="location", name="name", properties="properties",
                    tags="tags", type="type"),
            "*": "raw",
        },
        "children": [
            {"kind": "sql_servers_auditing_settings",
             "args": {"serverFullId": "id"}}
        ],
    },
    # azure_collect.py:1773-1790
    "sql_servers_auditing_settings": {
        "request": {
            "path": "{serverFullId}/auditingSettings/default",
            "api-version": "2017-03-01-preview",
        },
        "response": {
            "headerDate": "recorded_at",
            "tenantId": "tenant_id",
            "serverFullId": "server_full_id",
            "error": "error",
            "id": "id",
            "name": "name",
            "type": "type",
            "properties": "properties",
            "*": "raw",
        },
    },
}

# the reference seeds these kinds per credential (azure_collect.py:1922-1931)
SEED_KINDS = (
    "reports_credential_user_registration_details",
    "users",
    "groups",
    "service_principals",
    "managed_devices",
    "subscriptions",
)


def landing_table(kind: str, prefix: str = "data_azure_collect_") -> str:
    """Reference landing naming (azure_collect.py:1936-1938): the
    subscriptions seed lands into the ``_connection`` table."""
    return prefix + ("connection" if kind == "subscriptions" else kind)


@dataclass
class TransportPage:
    status: int
    body: dict | list  # parsed JSON payload
    header_date: dt.datetime | None = None


Transport = Callable[[str, dict], TransportPage]


def build_url(kind: str, params: dict, cloud: str = "azure") -> str:
    """azure_collect.py:1794-1822: path template + per-cloud host
    (itself a template for vault/storage data-plane hosts) +
    api-version/query params."""
    req = API_SPECS[kind]["request"]
    path = req["path"].format(**params)
    host = req.get("host", MGMT_HOSTS)
    if isinstance(host, dict):
        host = host[cloud]
    host = host.format(**params)
    api_version = req.get("api-version")
    query = urlencode(
        {**({"api-version": api_version} if api_version else {}),
         **req.get("params", {})}
    )
    return f"https://{host}{path}" + (f"?{query}" if query else "")


def request_headers(kind: str) -> dict:
    """Accept JSON everywhere; storage-style endpoints version via the
    x-ms-version header instead of a query param."""
    req = API_SPECS[kind]["request"]
    headers = {"Accept": "application/json"}
    if "api-version-header" in req:
        headers["x-ms-version"] = req["api-version-header"]
    return headers


def _response_values(spec: dict, result) -> list:
    """azure_collect.py:1859-1875: list → items; dict → single row;
    scalar/None → error row; empty list → one empty row."""
    for vk in spec.get("response_value_key", "value").split("."):
        if result is None or not isinstance(result, dict) or vk not in result:
            break
        result = result[vk]
    return (
        result
        if type(result) is list
        else [result]
        if type(result) is dict
        else [{"error": result}]
    ) or [{}]


def map_row(kind: str, value: dict) -> dict:
    """Strict response-map application (azure_collect.py:1898-1909):
    unmapped keys raise KeyError unless the spec has ``'*'``."""
    response_spec = API_SPECS[kind]["response"]
    return {
        response_spec[k]: (value if k == "*" else value.get(k))
        for k in value.keys() | response_spec.keys()
        if k in response_spec or "*" not in response_spec
    }


def get_pages(
    kind: str,
    params: dict,
    transport: Transport,
    tenant: str,
    cloud: str = "azure",
    now: dt.datetime | None = None,
) -> Iterator[dict]:
    """One mapped landing row per response value, across all pages
    (nextLink / @odata.nextLink chains)."""
    url = build_url(kind, params, cloud)
    while url:
        page = transport(url, request_headers(kind))
        result = page.body
        if not isinstance(result, (dict, list)):
            result = {
                "error": {"type": "JSONDecodeError", "status_code": page.status,
                          "response_text": str(result)}
            }
        for v in _response_values(API_SPECS[kind], result):
            value = {
                **v,
                **params,
                "headerDate": page.header_date or now or dt.datetime.utcnow(),
                "tenantId": tenant,
            }
            yield map_row(kind, value)
        url = ""
        if isinstance(result, dict):
            url = result.get("nextLink") or result.get("@odata.nextLink") or ""


def child_tasks(kind: str, row: dict) -> Iterator[tuple[str, dict]]:
    """DAG edges: child kinds with args bound from the emitted row —
    string sources read a column, callables compute from the whole row
    (the reference's lambda bindings, azure_collect.py:1325-1328)."""
    for child in API_SPECS[kind].get("children", []):
        ck = child["kind"]
        if ck not in API_SPECS:
            continue
        args = {
            arg: (src(row) if callable(src) else row.get(src))
            for arg, src in child["args"].items()
        }
        if any(v is None for v in args.values()):
            continue
        yield ck, args


def land_batches(spark, batches: Iterator[tuple[str, list[dict]]]):
    """Land ``ingest`` output as temp views the cis_azure pack reads.

    Rows of one kind are uniform (the strict map emits every spec
    column, absent → None), so the schema is derived per kind from the
    spec column order; nested dicts/lists (variant-typed in the
    reference DDL, azure_collect.py:70-741) are JSON-serialized so
    ``col:path`` access works unchanged. Each kind registers under its
    reference landing name (``data_azure_collect_*`` /
    ``data_azure_collect_connection``) plus the bare ``azure_collect_*``
    alias two pack views use verbatim (cis_azure_pack.sql:2186,2226).

    Scale note: sized to collector output (inventory snapshots); the
    100 TB landing is a partitioned parquet append with this view shape.
    """
    import datetime as _dt
    import json as _json

    from pyspark.sql import types as T

    by_kind: dict[str, list[dict]] = {}
    for kind, rows in batches:
        by_kind.setdefault(kind, []).extend(rows)

    def conv(v):
        return _json.dumps(v, default=str) if isinstance(v, (dict, list)) else v

    out = {}
    for kind, rows in by_kind.items():
        cols = list(dict.fromkeys(API_SPECS[kind]["response"].values()))
        data = [[conv(r.get(c)) for c in cols] for r in rows]
        fields = []
        for i, c in enumerate(cols):
            sample = next((row[i] for row in data if row[i] is not None), None)
            if isinstance(sample, bool):
                t = T.BooleanType()
            elif isinstance(sample, int):
                t = T.LongType()
            elif isinstance(sample, float):
                t = T.DoubleType()
            elif isinstance(sample, _dt.datetime):
                t = T.TimestampType()
            else:
                t = T.StringType()
            fields.append(T.StructField(c, t))
        df = spark.createDataFrame(data, T.StructType(fields))
        for view in (landing_table(kind), f"azure_collect_{kind}"):
            df.createOrReplaceTempView(view)
        out[landing_table(kind)] = df
    return out


def ingest(
    options: dict,
    transport: Transport,
    kinds: tuple[str, ...] = SEED_KINDS,
) -> Iterator[tuple[str, list[dict]]]:
    """Walk the collection DAG from the seed kinds, yielding
    ``(kind, rows)`` batches for the ``data.azure_collect_{kind}``
    landing tables (azure_collect.py:1912-2040 shape)."""
    tenant = options["tenant"]
    cloud = options.get("cloud", "azure")
    queue: list[tuple[str, dict]] = [(k, {}) for k in kinds]
    seen = set()
    while queue:
        kind, params = queue.pop(0)
        key = (kind, tuple(sorted(params.items())))
        if key in seen:
            continue
        seen.add(key)
        rows = list(get_pages(kind, params, transport, tenant, cloud))
        yield kind, rows
        for row in rows:
            queue.extend(child_tasks(kind, row))
