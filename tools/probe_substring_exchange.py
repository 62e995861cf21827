"""A/B probe: substring-family exchange strategies at a given SF.

Times (noop sink, warm-up + N runs, min reported) the current operators
and, via a monkeypatched `_salted_exchange`, a variant that feeds the
per-hash totals aggregate and the position probe directly from the
fingerprint stream (no explicit full-stream repartition) — the totals
skew is absorbed by map-side partial aggregation, the probe join by
AQE (broadcast when totals is small, skew-split SMJ otherwise).

Also times the auto-prefilter probe overhead in isolation.

Usage: python tools/probe_substring_exchange.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from snowalert_spark.functions import dedup as DD
from snowalert_spark.session import get_session
from snowalert_spark.tables import table


def t_noop(df, runs: int = 3) -> list[float]:
    out = []
    for _ in range(runs + 1):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 4))
    return out[1:]  # drop warm-up


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session(app_name="probe_substring_exchange")
    d = table(spark, sf_dir, "documents")
    res: dict = {"sf_dir": sf_dir}

    sc = spark.sparkContext

    # --- auto-probe overhead in isolation -----------------------------
    sc.setJobDescription("substring: auto-probe decision only")
    t0 = time.perf_counter()
    scan, used, frac = DD._resolve_substring_scan(d, 40, "doc_id", "text", "auto")
    res["auto_probe_first_s"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    DD._resolve_substring_scan(d, 40, "doc_id", "text", "auto")
    res["auto_probe_warm_s"] = round(time.perf_counter() - t0, 4)
    res["auto_used_prefilter"] = used
    res["auto_hit_frac"] = frac

    orig = DD._salted_exchange

    def passthrough(wins):
        return wins

    for mode, fn in (("salted", orig), ("direct", passthrough)):
        DD._salted_exchange = fn
        for name, build in (
            ("spans", lambda: DD.repeated_substring_spans(d, prefilter=False)),
            ("removal", lambda: DD.remove_repeated_substrings(d, prefilter=False)),
            ("full", lambda: DD.dedupe_substrings(d, prefilter=False)),
        ):
            sc.setJobDescription(f"substring {name} [{mode}]")
            res[f"{name}_{mode}"] = t_noop(build(), runs)
    DD._salted_exchange = orig

    # bit-identity check of the direct variant (full op, hardest output)
    DD._salted_exchange = passthrough
    direct_rows = {
        r["doc_id"]: tuple(r) for r in DD.dedupe_substrings(d, prefilter=False).collect()
    }
    DD._salted_exchange = orig
    salted_rows = {
        r["doc_id"]: tuple(r) for r in DD.dedupe_substrings(d, prefilter=False).collect()
    }
    res["bit_identical"] = direct_rows == salted_rows

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
