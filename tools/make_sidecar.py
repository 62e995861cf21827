"""Run bench.py at two scale dirs and emit a ratio sidecar JSON.

The scale proof for a round: run the identical headline harness at a
base SF and a (usually 10x larger) target SF, and record the per-query
wall-time ratio. Linear scaling on 10x data would be ratio 10.0; the
graded bound is 2x-of-linear (20.0). Each bench.py invocation is a
fresh subprocess (own JVM) so the two runs can't share caches.

Usage:
  python tools/make_sidecar.py BASE_DIR TARGET_DIR OUT.json [data_ratio]
e.g.
  python tools/make_sidecar.py /tmp/sf1 /tmp/sf10 BENCH_r07_sf10.json 10
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    # bench.py prints the FULL document line followed by a compact
    # tail-safe summary line (r13); the sidecar wants the full one —
    # identified by its calibration section (the compact line carries
    # only the floor) — falling back to any JSON line
    fallback = None
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        doc = json.loads(line)
        if isinstance(doc.get("calibration"), dict):
            return doc
        fallback = fallback or doc
    if fallback is not None:
        return fallback
    raise RuntimeError(f"no JSON line in bench output for {sf_dir}:\n"
                       f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main(base_dir: str, target_dir: str, out_path: str,
         data_ratio: float = 10.0) -> None:
    data_ratio = float(data_ratio)
    base = run_bench(base_dir)
    target = run_bench(target_dir)
    shared = [q for q in base["queries"] if q in target["queries"]]
    ratios = {
        q: round(target["queries"][q] / max(base["queries"][q], 1e-9), 2)
        for q in shared
    }
    worst = max(ratios, key=ratios.get) if ratios else None
    passes = os.environ.get("SPARK_GRAFT_BENCH_PASSES", "1")
    prov = (
        f" Provenance: this file's note, bases and ratios all come from "
        f"the SAME run of tools/make_sidecar.py (one base subprocess, one "
        f"target subprocess, each sweeping "
        f"SPARK_GRAFT_BENCH_PASSES={passes} identical pass(es) with "
        f"per-row min-of-passes reported; pass_dispersion below is the "
        f"same-HEAD noise measured IN this run)."
        if passes != "1" else
        f" Provenance: note, bases and ratios from one run of "
        f"tools/make_sidecar.py (single pass per dir)."
    )
    out = {
        "note": (
            f"scale sidecar: identical bench.py harness at {base_dir} vs "
            f"{target_dir} ({data_ratio:g}x the data). 'ratio' is "
            f"target/base wall per query; linear scaling would be "
            f"{data_ratio:g}, the 2x-of-linear bound is {2 * data_ratio:g}."
            + prov
        ),
        "base_dir": base_dir,
        "target_dir": target_dir,
        "data_ratio": data_ratio,
        "base": {"total_sec": base["value"], "queries": base["queries"],
                 "runs": base.get("runs", {})},
        "target": {"total_sec": target["value"],
                   "queries": target["queries"],
                   "runs": target.get("runs", {})},
        "ratio": ratios,
        "total_ratio": round(target["value"] / max(base["value"], 1e-9), 2),
        "max_ratio": {"query": worst, "ratio": ratios.get(worst)}
        if worst else None,
        "within_2x_linear": all(r <= 2 * data_ratio for r in ratios.values()),
    }
    for side, res in (("base", base), ("target", target)):
        if res.get("errors"):
            out[f"{side}_errors"] = res["errors"]
        # two-pass bench artifacts: keep the same-HEAD noise evidence
        # next to the ratios it qualifies
        for k in ("pass_dispersion", "passes"):
            if res.get(k):
                out.setdefault(f"{side}_{k}", res[k])
        if res.get("calibration"):
            out[f"{side}_calibration"] = {
                kk: res["calibration"][kk]
                for kk in ("floor", "median", "dispersion_max_over_min")
            }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "total_ratio": out["total_ratio"],
        "max_ratio": out["max_ratio"],
        "within_2x_linear": out["within_2x_linear"],
        "errors": {k: v for k, v in out.items() if k.endswith("_errors")},
    }))


if __name__ == "__main__":
    main(*sys.argv[1:])
