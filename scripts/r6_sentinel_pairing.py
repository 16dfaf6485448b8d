"""One-off (r8, VERDICT r7 item 6): same-session pairing of the r6 code
tree with today's contention sentinel.

The r6→r7 "regression" diagnosis (uniform machine slowdown, not code)
rested on distribution-shape inference because r6 predates the sentinel.
This script kills that ambiguity retroactively: it checks out the r6
round-end commit in a temp worktree, and in TODAY'S environment runs (a)
the r7 bench sentinel (fixed pure-CPU probe, code-independent) and (b)
ten representative r6-registry queries at sf0.1 with the exact bench.py
method (best-of-2, noop sink, cache cleared between runs). Pairing the
r6-code-today times against the r6-recorded times (BENCH_r06.json) gives
a direct machine-drift factor per query, with the sentinel anchoring
what "today" costs; any residual per-query ratio is code-attributable.

Results go into SCALE.md's appendix by hand; the JSON lands in
/tmp (one-off calibration, not a round artifact).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
R6_COMMIT = "845ed0a"

# spread across the r7 verdict's cost spectrum: trivial/constant, python
# worker startup, broadcast join, heavy LSH/graph/dedup, TPC-H analog
QUERIES = [
    "p11_topics_json",
    "q1_pricing_summary",
    "j1_enrich_orders",
    "t5_bpe_token_counts",
    "mm2_png_roundtrip",
    "dd2_ngram_jaccard",
    "dd7_passjoin_pairs",
    "cc1_dup_clusters",
    "sim3_lsh_ann",
    "g5_sssp_bf3",
]

WORKER = r'''
import json, sys, time
sys.path.insert(0, sys.argv[1])
from graphsense_ethereum_etl_spark.queries import REGISTRY
from graphsense_ethereum_etl_spark.session import get_spark

spark = get_spark(app_name="r6-pairing")
spark.range(1_000_000).selectExpr("sum(id)").collect()

sentinel = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr(
        "sum(id * 3 % 7)", "count(distinct id % 1024)"
    ).collect()
    sentinel = min(sentinel, time.perf_counter() - t0)

def drop():
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd_id in list(jmap.keySet().toArray()):
        jmap.get(rdd_id).unpersist()

names = json.loads(sys.argv[2])
timings = {}
for name in names:
    if name not in REGISTRY:
        timings[name] = None
        continue
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.1")
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
        drop()
    timings[name] = round(best, 4)
print(json.dumps({"sentinel_sec": round(sentinel, 4), "queries": timings}))
spark.stop()
'''


def main() -> None:
    wt = "/tmp/r6_pairing_wt"
    shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(["git", "worktree", "add", "--detach", wt, R6_COMMIT],
                   cwd=REPO, check=True, capture_output=True)
    try:
        env = dict(os.environ, PYTHONPATH=wt)
        out = subprocess.run(
            [sys.executable, "-c", WORKER, wt, json.dumps(QUERIES)],
            capture_output=True, text=True, cwd=wt, env=env,
        )
        if out.returncode != 0:
            print(out.stderr[-3000:], file=sys.stderr)
            raise SystemExit("r6 worker failed")
        r6_today = json.loads(out.stdout.strip().splitlines()[-1])
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)

    # r6's recorded quiet-run numbers live at the r6 commit itself
    # (BENCH_full_latest.json, the 86.2 s / 151-query artifact)
    r6_then = json.loads(
        subprocess.run(
            ["git", "show", f"{R6_COMMIT}:BENCH_full_latest.json"],
            cwd=REPO, check=True, capture_output=True, text=True,
        ).stdout
    )["queries"]
    pairing = {
        "r6_commit": R6_COMMIT,
        "sentinel_today_sec": r6_today["sentinel_sec"],
        "queries": {
            n: {
                "r6_code_today_sec": r6_today["queries"][n],
                "r6_recorded_sec": r6_then.get(n),
                "machine_drift": (
                    round(r6_today["queries"][n] / r6_then[n], 2)
                    if r6_today["queries"][n] and r6_then.get(n)
                    else None
                ),
            }
            for n in QUERIES
        },
    }
    print(json.dumps(pairing, indent=1))
    with open("/tmp/r6_pairing.json", "w") as f:
        json.dump(pairing, f, indent=1)


if __name__ == "__main__":
    main()
