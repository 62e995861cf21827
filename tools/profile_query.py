"""Per-job wall-clock breakdown for one workload query (guide §1.1).

Runs <query> once warm + once measured with the Spark event log on,
then prints every job of the measured run: wall, gap since the
previous job ended (driver think-time), task count, and the job
group/description. The inter-job GAP column is the scheduler/driver
latency that per-stage metrics never show — the thing that dominates
iterative operators (k-means, connected components) at gate SF.

Usage: python tools/profile_query.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = tempfile.mkdtemp(prefix="spark_events_")

    # the engine's tuned session (same confs as bench.py), plus the
    # event log — a vanilla session's defaults (200 shuffle partitions,
    # 1g driver) inflate exactly the job/gap structure this tool measures
    from snowalert_spark.session import get_session

    spark = get_session(
        app_name="profile_query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from snowalert_spark import workload

    qs = workload.queries(include_local=True)
    fn = qs[name]

    def once() -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    w = once()  # warm-up: codegen + any train-once model caches
    spark.sparkContext.setJobDescription(f"measured:{name}")
    mark = time.time() * 1000  # ms epoch: jobs after this are measured
    m = once()
    spark.sparkContext.setJobDescription(None)
    print(f"{name}: warm {w:.3f}s measured {m:.3f}s")

    app_id = spark.sparkContext.applicationId
    spark.stop()

    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        path = next(
            (os.path.join(evdir, f) for f in os.listdir(evdir)), None
        )
    # Spark 4 event logs are rolling DIRECTORIES of events_* files
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        files = [path]
    lines = []
    for fp in files:
        with open(fp) as f:
            lines.extend(f)
    jobs: dict[int, dict] = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                infos = ev.get("Stage Infos", [])
                site = ""
                if infos:
                    last = max(infos, key=lambda s: s.get("Stage ID", 0))
                    site = last.get("Stage Name", "")
                    det = (last.get("Details") or "").splitlines()
                    fr = next(
                        (
                            l.strip()
                            for l in det
                            if "snowalert_spark" in l or "workload" in l
                        ),
                        "",
                    )
                    site = f"{site} | {fr[-70:]}"
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": site,
                    "stages": len(ev.get("Stage IDs", [])),
                    "tasks": sum(
                        s.get("Number of Tasks", 0) for s in infos
                    ),
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

    measured = {
        j: d
        for j, d in jobs.items()
        if d["start"] >= mark - 50 and "end" in d
    }
    print(f"\nmeasured-run jobs: {len(measured)}")
    print(f"{'job':>4} {'wall_ms':>8} {'gap_ms':>7} {'stages':>6} {'tasks':>6}  desc")
    prev_end = None
    tot_wall = tot_gap = 0.0
    for j in sorted(measured):
        d = measured[j]
        wall = d["end"] - d["start"]
        gap = (d["start"] - prev_end) if prev_end is not None else 0
        prev_end = d["end"]
        tot_wall += wall
        tot_gap += max(0, gap)
        print(
            f"{j:>4} {wall:>8} {gap:>7} {d['stages']:>6} {d['tasks']:>6}  "
            f"{d['desc'][:110]}"
        )
    print(
        f"\ntotal job wall {tot_wall/1000:.3f}s + inter-job gaps "
        f"{tot_gap/1000:.3f}s vs measured {m:.3f}s"
    )
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
