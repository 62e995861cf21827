"""Rule registry: the reference stores rules as warehouse views in
schema ``rules`` discovered by name suffix (db.py:271-299,
config.py:54-57); metadata travels in view comments (@id/@tags —
data-views.sql.fmt:1-25). Here a rule is a registered SQL body
(transpiled through the compat layer) or a DataFrame-producing
callable, with the same suffix convention, validation and discovery
semantics.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from snowalert_spark import compat

ALERT_QUERY = "_ALERT_QUERY"
ALERT_SUPPRESSION = "_ALERT_SUPPRESSION"
VIOLATION_QUERY = "_VIOLATION_QUERY"
VIOLATION_SUPPRESSION = "_VIOLATION_SUPPRESSION"
POLICY_DEFINITION = "_POLICY_DEFINITION"

RULE_SUFFIXES = (
    ALERT_QUERY,
    ALERT_SUPPRESSION,
    VIOLATION_QUERY,
    VIOLATION_SUPPRESSION,
    POLICY_DEFINITION,
)

_ID_RE = re.compile(r"^\s*@id (\S+)", re.M)
_TAGS_RE = re.compile(r"^\s*@tags (.*)", re.M)


@dataclass
class Rule:
    name: str
    sql: str | None = None
    fn: Callable[[SparkSession], DataFrame] | None = None
    comment: str = ""

    @property
    def type(self) -> str:
        for s in RULE_SUFFIXES:
            if self.name.endswith(s):
                return s
        raise ValueError(f"rule {self.name} has no valid suffix")

    @property
    def title(self) -> str:
        return self.comment.split("\n", 1)[0].strip()

    @property
    def rule_id(self) -> str | None:
        m = _ID_RE.search(self.comment)
        return m.group(1) if m else None

    @property
    def tags(self) -> list[str]:
        m = _TAGS_RE.search(self.comment)
        return [t.strip() for t in m.group(1).split(",")] if m else []

    def df(self, spark: SparkSession) -> DataFrame:
        if self.fn is not None:
            return self.fn(spark)
        # driver sessions are vanilla (no get_session): make sure the
        # SQL helpers the transpiler emits (sa_rflatten) exist
        from snowalert_spark.functions.variant import register_sql_functions

        register_sql_functions(spark)
        return spark.sql(compat.transpile(self.sql))


@dataclass
class RuleRegistry:
    rules: dict[str, Rule] = field(default_factory=dict)

    def create(
        self,
        name: str,
        sql: str | None = None,
        fn: Callable[[SparkSession], DataFrame] | None = None,
        comment: str = "",
    ) -> Rule:
        # db.py:271-283: \w+ names with a recognized suffix only
        if not re.match(r"^\w+$", name):
            raise ValueError(f"invalid rule name {name!r}")
        if not any(name.endswith(s) for s in RULE_SUFFIXES):
            raise ValueError(f"rule {name!r} lacks a type suffix")
        if (sql is None) == (fn is None):
            raise ValueError("exactly one of sql/fn required")
        r = Rule(name=name, sql=sql, fn=fn, comment=comment)
        self.rules[name] = r
        return r

    _DDL_RE = re.compile(
        r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+"
        r"(?:\w+\.)*(?P<name>\w+)"
        r"(?:\s+COPY\s+GRANTS)?"
        r"(?:\s+COMMENT\s*=\s*'(?P<comment>(?:\\'|[^'])*)')?"
        r"\s+AS\s+(?P<body>.*)$",
        re.I | re.S,
    )

    def create_from_ddl(self, ddl: str) -> Rule:
        """WebUI create path (webui/api/rules.py:68-95): accept the
        full ``CREATE OR REPLACE VIEW rules.<name> … COMMENT='…' AS
        <body>`` text the frontend sends, peel the DDL envelope, and
        register the body under the view's own name."""
        m = self._DDL_RE.match(ddl.strip())
        if m is None:
            raise ValueError("not a CREATE VIEW statement")
        comment = (m.group("comment") or "").replace("\\'", "'")
        return self.create(
            m.group("name").upper(), sql=m.group("body"), comment=comment
        )

    def rename(self, name: str, new_name: str) -> Rule:
        """webui/api/rules.py:151-178 analog."""
        rule = self.rules.pop(name)
        if not re.match(r"^\w+$", new_name) or not any(
            new_name.endswith(s) for s in RULE_SUFFIXES + ("_DELETED",)
        ):
            self.rules[name] = rule
            raise ValueError(f"invalid rule name {new_name!r}")
        rule.name = new_name
        self.rules[new_name] = rule
        return rule

    def drop(self, name: str) -> None:
        """The reference "deletes" by renaming with a _DELETED suffix so
        the body stays recoverable (webui/api/rules.py:121-148)."""
        if name in self.rules:
            self.rename(name, f"{name}_DELETED")

    def load_rules(self, suffix: str) -> list[Rule]:
        """Discovery by suffix, '_' collating after letters (db.py:290)."""
        names = [n for n in self.rules if n.endswith(suffix)]
        names.sort(key=lambda n: n.replace("_", "{"))
        return [self.rules[n] for n in names]

    def rule_tags(self) -> list[dict]:
        """data.rule_tags analog (data-views.sql.fmt:1-25)."""
        out = []
        for r in self.rules.values():
            for t in r.tags:
                out.append(
                    {"type": r.type, "rule_name": r.name, "rule_id": r.rule_id, "tag": t}
                )
        return out
