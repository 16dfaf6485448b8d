#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

Runs named queries (or all) in isolation with the noop sink, best-of-N,
captures ``explain("formatted")`` to plans/<round>/<name>_<tag>.txt, and —
via the Spark event log — reports per-query job/stage counts and the top
stages by duration so optimization effort targets the real cost.

Usage:
  python scripts/profile_query.py [--sf DIR] [--runs N] [--tag before]
                                  [--round r13] [--plans] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphsense_ethereum_etl_spark.queries import REGISTRY  # noqa: E402
from graphsense_ethereum_etl_spark.session import get_spark  # noqa: E402


def _eventlog_lines(path: Path):
    """Yield JSON lines from a Spark event log — either a single file or a
    Spark 4 rolling directory (eventlog_v2_<appid>/events_*)."""
    files = sorted(path.glob("events_*")) if path.is_dir() else [path]
    for f in files:
        with open(f) as fh:
            yield from fh


def parse_eventlog(path: Path, t_lo: float, t_hi: float):
    """Stage rows from the event log whose submission falls in [t_lo, t_hi]
    (epoch ms). Returns (n_jobs, [(stage_id, name, n_tasks, dur_ms)])."""
    stages, jobs = [], 0
    for line in _eventlog_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart" and t_lo <= ev.get("Submission Time", 0) <= t_hi:
            jobs += 1
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            if sub is None or not (t_lo <= sub <= t_hi):
                continue
            dur = (si.get("Completion Time", sub) - sub)
            stages.append((si["Stage ID"], si["Stage Name"].split("\n")[0][:80],
                           si["Number of Tasks"], dur))
    return jobs, stages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tag", default=None, help="write plans/<round>/<name>_<tag>.txt")
    ap.add_argument("--round", default="r14")
    ap.add_argument("--top", type=int, default=8, help="top stages to print")
    args = ap.parse_args()
    if args.runs < 1:
        sys.exit("--runs must be >= 1 (each query needs at least one timed run)")

    names = args.names or sorted(REGISTRY)
    bad = [n for n in names if n not in REGISTRY]
    if bad:
        sys.exit(f"unknown queries: {bad}")

    evdir = Path("/tmp/spark-events")
    evdir.mkdir(exist_ok=True)
    spark = get_spark(app_name="profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": str(evdir),
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # codegen warmup
    app_id = spark.sparkContext.applicationId

    def drop_persisted() -> None:
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd_id in list(jmap.keySet().toArray()):
            jmap.get(rdd_id).unpersist()

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / args.round
    if args.tag:
        plans_dir.mkdir(parents=True, exist_ok=True)

    results = {}
    for name in names:
        best, best_win = float("inf"), None
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0_ms = time.time() * 1000
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            el = time.perf_counter() - t0
            t1_ms = time.time() * 1000
            if el < best:
                best, best_win = el, (t0_ms, t1_ms)
            drop_persisted()
        spark.sparkContext.setJobDescription(None)
        if args.tag:
            df = REGISTRY[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan)
            drop_persisted()
        results[name] = {"sec": round(best, 4), "win": best_win}
        print(f"{name}: {best:.3f}s", flush=True)

    spark.stop()
    time.sleep(1)

    # event-log breakdown for the best run of each query
    logs = sorted(evdir.glob(f"*{app_id}*"), key=lambda p: p.stat().st_mtime)
    if logs:
        ev = logs[-1]
        for name in names:
            lo, hi = results[name]["win"]
            jobs, stages = parse_eventlog(ev, lo, hi)
            stages.sort(key=lambda s: -s[3])
            tot = sum(s[3] for s in stages)
            print(f"\n== {name}: {results[name]['sec']:.3f}s wall, {jobs} jobs, "
                  f"{len(stages)} stages, {tot/1000:.2f}s stage-time")
            for sid, sname, ntasks, dur in stages[: args.top]:
                print(f"  stage {sid:>4} {dur/1000:6.2f}s  {ntasks:>3}t  {sname}")

    print("\n" + json.dumps({n: r["sec"] for n, r in results.items()}))


if __name__ == "__main__":
    main()
