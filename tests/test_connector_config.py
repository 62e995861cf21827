"""Connector configuration contract tests (webui data.py:57-100
semantics over the concrete okta module and a synthetic option spec)."""

from __future__ import annotations

from snowalert_spark.sources import okta
from snowalert_spark.sources.config import configure, validate_options

SPEC = [
    {"name": "host", "title": "API Host", "type": "str", "required": True},
    {"name": "org_id", "title": "Org Id", "type": "int", "required": True},
    {"name": "subjects", "title": "Subjects", "type": "list"},
    {"name": "api_key", "title": "API Token", "type": "str", "secret": True,
     "required": True},
]


def test_missing_required_error_shape():
    out = validate_options(SPEC, {"host": "x"})
    assert out["success"] is False
    assert out["errorMessage"].startswith(
        "Missing required configuration options:")
    assert "  - Org Id" in out["errorMessage"]
    assert "  - API Token" in out["errorMessage"]
    assert "API Host" not in out["errorMessage"]


def test_coercions_and_secret_hook():
    out = validate_options(
        SPEC,
        {"host": "x", "org_id": "77", "subjects": "a@x.io,b@x.io",
         "api_key": "k"},
        encrypt=lambda v: f"enc({v})",
    )
    assert out["org_id"] == 77
    assert out["subjects"] == ["a@x.io", "b@x.io"]
    assert out["api_key"] == "enc(k)"
    assert out["host"] == "x"


def test_list_already_parsed_passes_through():
    out = validate_options(SPEC, {"host": "x", "org_id": 1,
                                  "subjects": ["a"], "api_key": "k"})
    assert out["subjects"] == ["a"]


def test_configure_drives_okta_connect():
    out = configure(okta, "default", {"subdomain": "acme", "api_key": "k"})
    assert out["newStage"] == "finalized"
    assert out["tables"][0] == "data.okta_system_log_connection"
    missing = configure(okta, "default", {"subdomain": "acme"})
    assert missing["success"] is False and "API Token" in missing["errorMessage"]
