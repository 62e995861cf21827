"""sources/synth.py: the generic spec-derived landings must let every
one of the 92 pack-corpus statements analyze and execute (row
semantics are golden-pinned elsewhere — this is the bench harness's
foundation, so a spec/schema drift that breaks a view surfaces here,
not as a silent bench error row).
"""

from __future__ import annotations

import os

import pytest

from snowalert_spark import compat, packs
from snowalert_spark.rules import RuleRegistry
from snowalert_spark.sources import synth

pytestmark = pytest.mark.skipif(
    not os.path.isdir(packs.PACKS_DIR), reason="reference packs dir unavailable"
)


@pytest.fixture(scope="module")
def landings(spark):
    return synth.synth_all_pack_landings(spark, misc_n=20, collect_n=5)


def test_landing_counts(landings):
    assert len(landings["misc"]) == len(synth.MISC_LANDINGS)
    # every collector table/kind landed a view
    assert len(landings["aws"]) >= 30
    assert len(landings["azure"]) >= 30


@pytest.mark.parametrize("fname", packs.PACK_FILES)
def test_every_pack_statement_runs_over_synth(spark, landings, fname):
    sts = packs.load_pack(f"{packs.PACKS_DIR}/{fname}")
    kinds = {s.kind for s in sts}
    n = 0
    if kinds == {"query"}:
        for q in packs.monitoring_queries(f"{packs.PACKS_DIR}/{fname}").values():
            spark.sql(compat.transpile(q)).write.format("noop").mode(
                "overwrite"
            ).save()
            n += 1
    elif fname == "okta.sql":
        for v in packs.create_pack_data_views(spark, f"{packs.PACKS_DIR}/{fname}"):
            spark.table(v).write.format("noop").mode("overwrite").save()
            n += 1
    else:
        reg = RuleRegistry()
        packs.register_pack_rules(reg, f"{packs.PACKS_DIR}/{fname}")
        for r in reg.rules.values():
            r.df(spark).write.format("noop").mode("overwrite").save()
            n += 1
    assert n == len(sts)
