"""Transpiler robustness properties (hypothesis): the string-level
rewrites must never corrupt literal content, must be stable on
already-Spark SQL, and the pack loader must parse synthetic pack text
per its documented contract."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from snowalert_spark import compat, packs

# literal content that historically trips string-level rewriters:
# variant-path-ish colons, regex braces, comment markers, keywords
# NB a literal ending in a backslash ('\') is unterminated in
# Snowflake (backslash escapes inside string literals), so the
# generator never produces one — the masker mirrors that semantics.
TRICKY_LITERALS = st.lists(
    st.sampled_from(
        list("abc:{}[]().*\\- ") + ["QUALIFY", "AND", "--", "::", "=>"]
    ),
    min_size=0,
    max_size=12,
).map(lambda parts: "".join(parts).rstrip("\\"))


@given(lits=st.lists(TRICKY_LITERALS, min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_literal_bytes_survive_transpile(lits):
    """Everything between quotes must come out byte-identical — no
    rewrite may fire inside a string literal (RLIKE patterns are the
    one documented exception and take a dedicated position)."""
    sql = "SELECT " + ", ".join(
        f"'{lit}' AS c{i}" for i, lit in enumerate(lits)
    ) + " FROM t"
    out = compat.transpile(sql)
    assert re.findall(r"'((?:[^'])*)'", out) == lits


@given(lits=st.lists(TRICKY_LITERALS, min_size=1, max_size=3))
@settings(max_examples=100, deadline=None)
def test_mask_unmask_roundtrip(lits):
    sql = " WHERE x = " + " AND y = ".join(f"'{lit}'" for lit in lits)
    masked, found = compat._mask_literals(sql)
    assert "'" not in masked
    assert compat._unmask_literals(masked, found) == sql


def test_transpile_stable_on_spark_sql():
    """Already-Spark SQL (no Snowflake constructs) passes through with
    at most whitespace-neutral changes."""
    q = (
        "SELECT a, count(*) AS n FROM t WHERE a > 1 AND b LIKE '%x%' "
        "GROUP BY a HAVING count(*) > 2 ORDER BY n DESC LIMIT 5"
    )
    assert compat.transpile(q) == q


@pytest.mark.parametrize("item,expected", [
    ("id disk_id", ("id", "disk_id")),
    ("MAX(recorded_at) recorded_last", ("MAX(recorded_at)", "recorded_last")),
    ("t1.account_id AS id", ("t1.account_id", "id")),
    ("properties:enc::STRING key_source", ("properties:enc::STRING", "key_source")),
    ("a || b", None),               # operand, not an alias
    ("user_name", None),            # single token: unaliased
    ("results.account_id", None),   # qualified ref: unaliased
    ("x + y", None),
    ("CASE WHEN a THEN 1 ELSE 2 END foo", ("CASE WHEN a THEN 1 ELSE 2 END", "foo")),
    ("DISTINCT x", None),           # keyword tail
])
def test_split_alias_table(item, expected):
    assert compat._split_alias(item) == expected


def test_bool_conjunct_wrap_only_bare_identifiers():
    out = compat.rewrite_bool_conjuncts(
        "SELECT * FROM t WHERE 1=1 AND enabled AND expires IS NULL"
    )
    assert "CAST(enabled AS BOOLEAN)" in out
    assert "expires IS NULL" in out and "CAST(expires" not in out
    # no bare conjuncts → unchanged
    q = "SELECT * FROM t WHERE a = 1 AND b LIKE 'x'"
    assert compat.rewrite_bool_conjuncts(q) == q


def test_pack_parser_contract(tmp_path):
    """Synthetic pack text: GRANTs skipped, comments captured with
    quote unescaping, monitoring queries named from lead comments,
    trailing smoke selects dropped."""
    p = tmp_path / "synthetic_pack.sql"
    p.write_text(
        "CREATE OR REPLACE VIEW rules.demo_ALERT_QUERY COPY GRANTS\n"
        "  COMMENT='It''s a demo\n  @id d1\n  @tags a, b'\n"
        "AS\nSELECT 1 AS one\n;\n"
        "GRANT SELECT ON view rules.demo_ALERT_QUERY TO ROLE snowalert;\n"
        "-- Named Monitoring Query\n"
        "SELECT count(*) FROM data.things\n;\n"
        "SELECT * FROM data.things;\n"
    )
    sts = packs.load_pack(str(p))
    assert [s.kind for s in sts] == ["view", "query"]
    view, query = sts
    assert view.name == "DEMO_ALERT_QUERY"
    assert view.comment.startswith("It's a demo")
    assert query.name == "named_monitoring_query"
    assert "data_things" in query.body  # schema flattening applied


def test_pack_fixup_drift_detection(tmp_path):
    """A FIXUP whose target text vanished must fail loudly, not rot."""
    p = tmp_path / "osquery_query_pack.sql"
    p.write_text(
        "CREATE OR REPLACE VIEW rules.missing_server_osquery_logs_violation_query\n"
        "  COMMENT='x'\nAS\nSELECT 1 AS one\n;\n"
    )
    with pytest.raises(AssertionError, match="fixup target drifted"):
        packs.load_pack(str(p))
