#!/usr/bin/env python
"""Shuffle-BYTE scale audit (r8): the sf~1 wall-time probe's blind spot is
machine noise — a 2.2x time ratio at 10x data could be a healthy plan on a
loaded box or a superlinear plan on an idle one. Bytes don't lie: this
script re-runs the probe's query list at sf0.1 and the sf~1 replica tier
and, for each run, harvests the ACTUAL per-stage metrics from the Spark UI
REST API (shuffle write bytes, shuffle write records, scan input bytes),
then reports the 10x-data growth ratio of each. The metrics are
deterministic per plan+data (unlike time), so one run per tier suffices
and round-over-round diffs are exact.

Reading the ratios:
  - shuffle_ratio ~<= 10 on 10x data  → the plan's shuffle volume is
    at-or-below linear: safe to extrapolate to the 100-TB tier.
  - shuffle_ratio >> 10               → candidate blow-up or a lost
    broadcast: the exact defect class the dd8/lm1 chases found, now
    visible as bytes the round it appears.
  - input_ratio >> 10                 → lost pruning/pushdown (a scan
    reading what it used to skip) — OR re-reads of PERSISTED blocks:
    Spark counts block-manager reads of localCheckpoint/cache partitions
    as inputBytes too, so iterative queries that legitimately re-read a
    checkpointed edge set each round inflate this column with node-local
    memory traffic. Treat shuffle_ratio as the verdict and input_ratio
    as the pointer to WHERE to look.
Zero-byte baselines (fully map-only or broadcast-only plans at sf0.1)
report ratio null and are listed separately — "no shuffle at either tier"
is itself the strongest posture.

Writes SHUFFLE_r{N}.json next to SCALE_r{N}.json and prints a markdown
table for SCALE.md. Usage: python scripts/shuffle_audit.py [n_queries].
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphsense_ethereum_etl_spark.queries import REGISTRY  # noqa: E402
from graphsense_ethereum_etl_spark.session import get_spark  # noqa: E402
from scripts.sf1_scale_probe import (  # noqa: E402
    ALWAYS_PROBE,
    DST,
    SRC,
    build,
)

UI_PORT = int(os.environ.get("SHUFFLE_AUDIT_UI_PORT", "4062"))


def _api(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=30) as fh:
        return json.load(fh)


def _stage_metrics(app_id: str) -> dict:
    """(stageId, attemptId) -> the three counters we audit."""
    out = {}
    for st in _api(f"applications/{app_id}/stages?status=complete"):
        out[(st["stageId"], st["attemptId"])] = (
            st["shuffleWriteBytes"],
            st["shuffleWriteRecords"],
            st["inputBytes"],
        )
    return out


def measure(spark, app_id: str, name: str, sf_dir: str) -> dict:
    before = _stage_metrics(app_id)
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd_id in list(jmap.keySet().toArray()):
        jmap.get(rdd_id).unpersist()
    after = _stage_metrics(app_id)
    new = [v for k, v in after.items() if k not in before]
    return {
        "shuffle_write_bytes": sum(v[0] for v in new),
        "shuffle_write_records": sum(v[1] for v in new),
        "input_bytes": sum(v[2] for v in new),
        "n_stages": len(new),
    }


def main():
    # Force the scale regime of the size-gated iterative hints
    # (plans/hints.py): the gate legitimately broadcasts vertex-sized
    # evolving sides at small tiers, but a plan that broadcasts at 1x and
    # shuffles at 10x would make the byte RATIO meaningless. The audit's
    # job is the 100-TB plan, so measure shuffle_hash at both tiers.
    from graphsense_ethereum_etl_spark.plans.hints import FORCE_SHUFFLE_ENV

    os.environ[FORCE_SHUFFLE_ENV] = "1"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    repo = Path(__file__).resolve().parent.parent
    base = json.load(open(repo / "BENCH_full_latest.json"))
    names = [k for k, _ in sorted(base["queries"].items(), key=lambda kv: -kv[1])[:n]]
    # the iterative-graph family and the LSH path ride along every round
    # regardless of bench rank — the r8 finds (g5 49x, sim3 35x) were in
    # exactly this class, and byte regressions here are silent in wall time
    for extra in ALWAYS_PROBE + [
        "g4_pagerank_2iter",
        "g5_sssp_bf3",
        "g6_kcore_peel2",
        "g7_label_propagation",
        "g8_bipartite_projection",  # 13.6x at r8 — the degree-cap candidate term, watched
        "cc1_dup_clusters",
        "sim3_lsh_ann",
    ]:
        if extra not in names and extra in REGISTRY:
            names.append(extra)
    # r8 VERDICT #6: rotate byte coverage through the WHOLE registry by
    # auditing the round's certification window (the same 50 queries the
    # external harness certifies) on top of the slowest-N and the standing
    # iterative/LSH list — 148 queries had never had their bytes read.
    cert = repo / "CERTIFICATION.json"
    if cert.exists():
        ledger = json.load(open(cert))
        for name in ledger["registry_order"][: ledger["window"]]:
            if name not in names and name in REGISTRY:
                names.append(name)
    # r9 VERDICT #5: beyond the window rotation, seat every query whose
    # shuffle bytes have NEVER been read in any prior round — one audit
    # retires a query from this list forever, so the set shrinks to empty
    # and stays there as new queries land and get audited the same round.
    audited: set[str] = set()
    for p in glob.glob(str(repo / "SHUFFLE_r*.json")):
        try:
            audited.update(json.load(open(p)).get("queries", {}).keys())
        except (OSError, json.JSONDecodeError):
            pass
    never = [q for q in REGISTRY if q not in audited and q not in names]
    names.extend(never)
    print(f"never-audited seats this round: {len(never)}", file=sys.stderr)
    spark = get_spark(
        app_name="shuffle-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            # keep the full stage history for the whole audit run
            "spark.ui.retainedStages": "100000",
        },
    )
    app_id = _api("applications")[0]["id"]
    build(spark)
    rows = []
    for name in names:
        m01 = measure(spark, app_id, name, SRC)
        m1 = measure(spark, app_id, name, DST)
        ratio = (
            round(m1["shuffle_write_bytes"] / m01["shuffle_write_bytes"], 1)
            if m01["shuffle_write_bytes"]
            else None
        )
        in_ratio = (
            round(m1["input_bytes"] / m01["input_bytes"], 1)
            if m01["input_bytes"]
            else None
        )
        rows.append((name, m01, m1, ratio, in_ratio))
        print(
            f"{name:32s} shuffle {m01['shuffle_write_bytes']:>12,} -> "
            f"{m1['shuffle_write_bytes']:>13,} B  x{ratio if ratio is not None else '—'}"
            f"   input x{in_ratio if in_ratio is not None else '—'}",
            file=sys.stderr,
        )
    print("| query | sf0.1 shuffle B | sf~1 shuffle B | shuffle ratio | input ratio |")
    print("|---|---|---|---|---|")
    for name, m01, m1, ratio, in_ratio in rows:
        print(
            f"| {name} | {m01['shuffle_write_bytes']:,} | "
            f"{m1['shuffle_write_bytes']:,} | "
            f"{ratio if ratio is not None else '— (0 at sf0.1)'} | "
            f"{in_ratio if in_ratio is not None else '—'} |"
        )
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(str(repo / "CORRECTNESS_r*.json"))
    ]
    rnd = max(rounds, default=0) + 1
    stamp = {
        "round": rnd,
        "base_sf": 0.1,
        "replica_tier": "sf~1 (10x, decorrelated — scripts/sf1_scale_probe.py)",
        "queries": {
            name: {
                "sf0_1": m01,
                "sf1": m1,
                "shuffle_bytes_ratio": ratio,
                "input_bytes_ratio": in_ratio,
            }
            for name, m01, m1, ratio, in_ratio in rows
        },
    }
    with open(repo / f"SHUFFLE_r{rnd:02d}.json", "w") as f:
        json.dump(stamp, f, indent=1)
        f.write("\n")
    print(f"wrote SHUFFLE_r{rnd:02d}.json", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
