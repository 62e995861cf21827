"""Snowflake-SQL → Spark-SQL compatibility layer (SURVEY §4, §7.2-2).

The reference's entire workload is Snowflake SQL text (rule views in
``packs/*.sql`` + engine-emitted statements). This module rewrites the
dialect differences so rule bodies run near-verbatim under Catalyst:

- ``QUALIFY <pred>``           → window-in-subquery + WHERE rewrite
- ``col:a.b['k'][0]::type``   → CAST(get_json_object(col,'$.…') AS t)
- function renames             → IFF→if, ZEROIFNULL→coalesce, DATEADD/
                                 DATEDIFF→timestampadd/timestampdiff,
                                 REGEXP_SUBSTR→regexp_extract, RLIKE
                                 with flags → inline (?flags), …
- ``OBJECT_CONSTRUCT(*)``      → to_json(struct(*))
- ``ARRAY_CONSTRUCT``          → array
- ``SELECT-alias reuse in WHERE`` is NOT auto-rewritten (Snowflake
  extension); rules using it are wrapped explicitly at registration.

String-level rewriting is deliberate: no SQL parser dependency, and
the rewrites are all local token substitutions except QUALIFY, which
splits at top level (paren/quote-aware).
"""

from __future__ import annotations

import re

_TYPE_MAP = {
    "string": "STRING",
    "varchar": "STRING",
    "number": "DECIMAL(38,0)",
    "integer": "INT",
    "int": "INT",
    "float": "DOUBLE",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "timestamp_ltz": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "variant": "STRING",
    "array": "ARRAY<STRING>",
}


def _split_top_level(sql: str, keyword: str) -> tuple[str, str] | None:
    """Split at the first top-level (outside parens/quotes) occurrence
    of ``keyword`` (word-bounded, case-insensitive). Returns
    (before, after) without the keyword, or None."""
    depth = 0
    i = 0
    n = len(sql)
    kw = keyword.upper()
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 2 if sql[i] == "\\" else 1
        elif c == '"':
            i += 1
            while i < n and sql[i] != '"':
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and sql[i : i + len(kw)].upper() == kw:
            before_ok = i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
            j = i + len(kw)
            after_ok = j >= n or not (sql[j].isalnum() or sql[j] == "_")
            if before_ok and after_ok:
                return sql[:i], sql[j:]
        i += 1
    return None


def rewrite_qualify(sql: str) -> str:
    """``SELECT <sel> FROM <rest> QUALIFY p [ORDER BY …] [LIMIT …]`` →
    ``SELECT * EXCEPT (__q) FROM (SELECT <sel>, (p) AS __q FROM <rest>)
    WHERE __q …``

    The predicate is injected into the *same* select level so it can
    reference base-table columns that the select list projects away
    (Snowflake QUALIFY scoping)."""
    parts = _split_top_level(sql, "QUALIFY")
    if parts is None:
        return sql
    inner, rest = parts
    # peel trailing ORDER BY / LIMIT off the qualify predicate
    tail = ""
    for kw in ("ORDER BY", "LIMIT"):
        sp = _split_top_level(rest, kw)
        if sp is not None:
            rest, after = sp
            tail += f" {kw} {after.strip()}"
    pred = rest.strip()
    inner = inner.strip()
    split_from = _split_top_level(inner, "FROM")
    if split_from is None:
        raise ValueError("QUALIFY without FROM")
    sel, from_rest = split_from
    return (
        f"SELECT * EXCEPT (__q) FROM ({sel.strip()}, ({pred}) AS __q "
        f"FROM {from_rest.strip()}) WHERE __q{tail}"
    )


_PATH_RE = re.compile(
    r"""
    (?P<col>\b\w+(?:\.\w+)?\b)     # col or qualifier.col (f.value:…)
    :
    (?P<path>
        \w+
        (?: \.\w+ | \['[^']+'\] | \[\d+\] )*
    )
    (?: ::(?P<cast>\w+) )?
    """,
    re.VERBOSE,
)


_FLATTEN_RE = re.compile(
    r",?\s*LATERAL\s+FLATTEN\s*\(\s*input\s*=>\s*(?P<arg>[^)]+)\)\s*(?:AS\s+)?(?P<alias>\w+)",
    re.I,
)


def rewrite_flatten(sql: str) -> str:
    """``FROM t, LATERAL FLATTEN(input => x) f`` →
    ``FROM t LATERAL VIEW posexplode(from_json(x, 'array<string>')) f
    AS index, value`` — array elements surface as raw JSON text
    (f.value, f.index; f.value:path::t then resolves via the variant
    rewrite). ``recursive => true`` is not SQL-expressible here — use
    functions.variant.recursive_flatten (DataFrame API)."""
    if re.search(r"\brecursive\s*=>\s*true", sql, re.I):
        raise ValueError(
            "FLATTEN(recursive=>true) needs variant.recursive_flatten"
        )

    def sub(m: re.Match) -> str:
        return (
            f" LATERAL VIEW posexplode(from_json({m.group('arg').strip()}, "
            f"'array<string>')) {m.group('alias')} AS index, value"
        )

    return _FLATTEN_RE.sub(sub, sql)


def _path_to_jsonpath(path: str) -> str:
    out = "$"
    for m in re.finditer(r"\.?(\w+)|\['([^']+)'\]|\[(\d+)\]", path):
        word, quoted, idx = m.groups()
        if word is not None:
            out += f".{word}"
        elif quoted is not None:
            out += f".{quoted}"
        else:
            out += f"[{idx}]"
    return out


def rewrite_variant_paths(sql: str) -> str:
    """``raw:a.b['k'][0]::string`` → CAST(get_json_object(raw, '$.a.b.k[0]') AS STRING)."""

    def sub(m: re.Match) -> str:
        col, path, cast = m.group("col"), m.group("path"), m.group("cast")
        expr = f"get_json_object({col}, '{_path_to_jsonpath(path)}')"
        if cast:
            t = _TYPE_MAP.get(cast.lower(), cast.upper())
            expr = f"CAST({expr} AS {t})"
        return expr

    return _PATH_RE.sub(sub, sql)


# cast-only rewrites for ::type on plain expressions (x::string)
_CAST_RE = re.compile(r"(\))\s*::(\w+)|(\b[\w.]+\b)::(\w+)")


def rewrite_casts(sql: str) -> str:
    def sub(m: re.Match) -> str:
        if m.group(1):
            # handled by caller context: `(expr)::type` — we can't see
            # the opening paren here, leave in place for _fn rewrites
            t = _TYPE_MAP.get(m.group(2).lower(), m.group(2).upper())
            return f") AS __CAST_{t}__"  # placeholder, fixed below
        t = _TYPE_MAP.get(m.group(4).lower(), m.group(4).upper())
        return f"CAST({m.group(3)} AS {t})"

    out = _CAST_RE.sub(sub, sql)
    # fix (expr) AS __CAST_T__ placeholders: find matching open paren
    while "__CAST_" in out:
        i = out.index(") AS __CAST_")
        j = out.index("__", i + 12)
        t = out[i + len(") AS __CAST_") : j]
        # walk back to the matching '(' …
        depth = 0
        k = i
        while k >= 0:
            if out[k] == ")":
                depth += 1
            elif out[k] == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        # … and include a preceding function-call name (f(x)::t, a.b(x)::t)
        while k > 0 and (out[k - 1].isalnum() or out[k - 1] in "_."):
            k -= 1
        out = out[:k] + f"CAST({out[k:i + 1]} AS {t})" + out[j + 2 :]
    return out


_SIMPLE_FN = [
    (re.compile(r"\bIFF\s*\(", re.I), "if("),
    (re.compile(r"\bZEROIFNULL\s*\(", re.I), "coalesce(0, "),  # fixed below
    (re.compile(r"\bUUID_STRING\s*\(\s*\)", re.I), "uuid()"),
    (re.compile(r"\bSEQ4\s*\(\s*\)", re.I), "monotonically_increasing_id()"),
    (re.compile(r"\bARRAY_CONSTRUCT\s*\(", re.I), "array("),
    (re.compile(r"\bARRAY_SIZE\s*\(", re.I), "size("),
    (re.compile(r"\bOBJECT_CONSTRUCT\s*\(\s*\*\s*\)", re.I), "to_json(struct(*))"),
    (re.compile(r"\bPARSE_JSON\s*\(", re.I), "("),  # JSON stays a string
    (re.compile(r"\bTO_VARCHAR\s*\(", re.I), "string("),
    (re.compile(r"\bCURRENT_ACCOUNT\s*\(\s*\)", re.I), "'spark_account'"),
    (re.compile(r"\bCURRENT_TIMESTAMP\s*\(\s*\)", re.I), "current_timestamp()"),
    (re.compile(r"\bREGEXP_SUBSTR\s*\(", re.I), "__regexp_substr__("),
    (re.compile(r"\bDATEADD\s*\(", re.I), "timestampadd("),
    # DATEDIFF counts date-part *boundary crossings* in Snowflake
    # (DATEDIFF(DAY,'01-01 23:59','01-02 00:01') = 1), while Spark's
    # timestampdiff counts complete elapsed units (= 0). Deferred to a
    # dedicated arg rewrite in transpile() that truncates both sides.
    (re.compile(r"\bDATEDIFF\s*\(", re.I), "__datediff__("),
    (re.compile(r"\bBOOLOR_AGG\s*\(", re.I), "bool_or("),
    (re.compile(r"\bANY_VALUE\s*\(", re.I), "any_value("),
    (re.compile(r"\bTRY_TO_TIMESTAMP(?:_LTZ|_NTZ)?\s*\(", re.I), "try_to_timestamp("),
    # CONVERT_TIMEZONE(tz, ts): engine time is UTC → wall-clock in tz
    (re.compile(r"\bCONVERT_TIMEZONE\s*\(", re.I), "__convert_tz__("),
]


def rewrite_functions(sql: str) -> str:
    out = sql
    # ZEROIFNULL(x) → coalesce(x, 0): plain rename then arg fix
    out = re.sub(r"\bZEROIFNULL\s*\(", "__zeroifnull__(", out, flags=re.I)
    out = _fix_one_arg(out, "__zeroifnull__", lambda a: f"coalesce({a}, 0)")
    for pat, rep in _SIMPLE_FN:
        if rep.startswith("coalesce(0"):
            continue
        out = pat.sub(rep, out)
    # OBJECT_CONSTRUCT(k1, v1, …) → compact JSON document string
    out = re.sub(r"\bOBJECT_CONSTRUCT\s*\(", "__object_construct__(", out, flags=re.I)
    out = _fix_one_arg(out, "__object_construct__", lambda a: f"to_json(named_struct({a}))")
    # DATEADD('minute', n, t) → timestampadd(minute, n, t): unquote unit
    out = re.sub(
        r"\b(timestampadd|timestampdiff)\(\s*'(\w+)'",
        lambda m: f"{m.group(1)}({m.group(2)}",
        out,
        flags=re.I,
    )
    return out


def _regexp_substr_args(args: str) -> str:
    """REGEXP_SUBSTR(s, p[, pos[, occ[, flags]]]) → regexp_extract:
    i/s flags fold into the literal pattern as (?is); flag 'e' means
    "return first capture group" (snowflake_query_pack.sql:5: 'ie').
    Runs post-unmask so the pattern literal is visible."""
    parts = [p.strip() for p in _split_select_items(args)]
    s, p = parts[0], parts[1]
    group = 0
    if len(parts) >= 5:
        flags = parts[4].strip("'").lower()
        inline = "".join(f for f in flags if f in "ism")
        if inline and p.startswith("'"):
            p = f"'(?{inline})" + p[1:]
        if "e" in flags:
            group = 1
    if len(parts) >= 3 and parts[2] != "1":
        raise ValueError("REGEXP_SUBSTR position != 1 unsupported")
    return f"regexp_extract({s}, {p}, {group})"


def _datediff_args(args: str) -> str:
    """DATEDIFF(unit, a, b) → boundary-count semantics: truncate both
    operands to the unit before diffing, so crossing a unit boundary
    counts 1 regardless of elapsed time (Snowflake semantics; the
    reference packs gate their windows on this, e.g.
    snowflake_security_monitoring.sql 'DATEDIFF(HOUR, ts, NOW) < 24')."""
    parts = [p.strip() for p in _split_select_items(args)]
    if len(parts) != 3:
        raise ValueError(f"DATEDIFF expects 3 args, got {len(parts)}: {args!r}")
    unit = parts[0].strip("'\"").lower()
    a, b = parts[1], parts[2]
    return (
        f"timestampdiff({unit}, date_trunc('{unit}', {a}),"
        f" date_trunc('{unit}', {b}))"
    )


def _convert_tz_args(args: str) -> str:
    """CONVERT_TIMEZONE(tz, ts) → wall-clock in tz (engine time is
    UTC); CONVERT_TIMEZONE(src, tgt, ts) → reinterpret wall-clock ts
    from src and render in tgt."""
    parts = [p.strip() for p in _split_select_items(args)]
    if len(parts) == 2:
        tz, ts = parts
        return f"from_utc_timestamp({ts}, {tz})"
    if len(parts) == 3:
        src, tgt, ts = parts
        return f"from_utc_timestamp(to_utc_timestamp({ts}, {src}), {tgt})"
    raise ValueError(f"CONVERT_TIMEZONE expects 2 or 3 args: {args!r}")


def _fix_one_arg(sql: str, marker: str, build) -> str:
    """Replace ``marker(<args>)`` with ``build(<args>)`` where <args>
    spans to the matching close paren."""
    while marker in sql:
        i = sql.index(marker)
        j = i + len(marker)
        assert sql[j] == "("
        depth = 0
        k = j
        while k < len(sql):
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        args = sql[j + 1 : k]
        sql = sql[:i] + build(args) + sql[k + 1 :]
    return sql


def _split_select_items(sel: str) -> list[str]:
    """Split an expression list on top-level (paren- and quote-aware)
    commas."""
    items, depth, cur = [], 0, []
    i, n = 0, len(sel)
    while i < n:
        ch = sel[i]
        if ch == "'":
            cur.append(ch)
            i += 1
            while i < n:
                cur.append(sel[i])
                if sel[i] == "'":
                    break
                i += 1
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        items.append("".join(cur))
    return items


_ALIAS_RE = re.compile(r"\s+AS\s+(\w+)\s*$", re.I)


def rewrite_alias_in_where(sql: str) -> str:
    """Snowflake allows WHERE to reference a SELECT alias
    (packs/snowflake_query_pack.sql:5,22); ANSI/Spark does not. Expand
    alias references in the top-level WHERE predicate to their select
    expressions inline — exactly Snowflake's observable semantics.

    Limitation (documented): an alias that shadows a same-named source
    column resolves to the source column in Snowflake but to the alias
    expression here; the packs don't do that."""
    masked, lits = _mask_literals(sql)
    parts = _split_top_level(masked, "WHERE")
    if parts is None:
        return sql
    head, pred_tail = parts
    sp = _split_top_level(head, "SELECT")
    if sp is None or sp[0].strip():
        return sql
    from_split = _split_top_level(sp[1], "FROM")
    if from_split is None:
        return sql
    exprs: dict[str, str] = {}
    for item in _split_select_items(from_split[0]):
        m = _ALIAS_RE.search(item.rstrip())
        if m:
            exprs[m.group(1).lower()] = item.rstrip()[: m.start()].strip()
    if not exprs:
        return sql
    # split the predicate off trailing clauses
    pred = pred_tail
    tail = ""
    for kw in ("GROUP BY", "ORDER BY", "LIMIT"):
        spl = _split_top_level(pred, kw)
        if spl is not None:
            pred, after = spl
            tail += f" {kw} {after.strip()}"

    hit = False

    def sub(m: re.Match) -> str:
        nonlocal hit
        e = exprs.get(m.group(0).lower())
        if e is None:
            return m.group(0)
        hit = True
        return f"({e})"

    names = "|".join(re.escape(a) for a in exprs)
    new_pred = re.sub(rf"(?<![.\w])(?:{names})\b", sub, pred, flags=re.I)
    if not hit:
        return sql
    out = f"{head}WHERE {new_pred.strip()}{tail}"
    return _unmask_literals(out, lits)


_LIT_RE = re.compile(r"'(?:[^'\\]|\\.)*'")


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    """Replace string literals with placeholders so token-level
    rewrites can't fire inside them (e.g. ``12:00`` in a timestamp
    literal looking like a variant path)."""
    lits: list[str] = []

    def sub(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"__STRLIT{len(lits) - 1}X__"

    return _LIT_RE.sub(sub, sql), lits


def _unmask_literals(sql: str, lits: list[str]) -> str:
    for i, lit in enumerate(lits):
        sql = sql.replace(f"__STRLIT{i}X__", lit)
    return sql


def transpile(sql: str) -> str:
    """Full Snowflake→Spark rewrite pipeline for a rule body."""
    out = rewrite_qualify(sql)
    out = rewrite_alias_in_where(out)
    out = rewrite_flatten(out)
    out, lits = _mask_literals(out)
    out = rewrite_variant_paths(out)
    out = rewrite_casts(out)
    out = rewrite_functions(out)
    out = _unmask_literals(out, lits)
    out = _fix_one_arg(out, "__regexp_substr__", _regexp_substr_args)
    out = _fix_one_arg(out, "__convert_tz__", _convert_tz_args)
    out = _fix_one_arg(out, "__datediff__", _datediff_args)
    # DATEADD('minute', n, t) → timestampadd(minute, n, t): unquote unit
    out = re.sub(
        r"\b(timestampadd|timestampdiff)\(\s*'(\w+)'",
        lambda m: f"{m.group(1)}({m.group(2)}",
        out,
        flags=re.I,
    )
    return out
