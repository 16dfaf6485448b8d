"""One-off historical seed for CERTIFICATION.json (run once in r8).

The mechanized rotation needs, per query, the fingerprint its code had at
its LAST external certification. Going forward regen_certification.py
records that at round start (new CORRECTNESS lands → current tree IS the
certified tree). For rounds 1-7 the ledger didn't exist yet, so this
script reconstructs it from git: each round's certified code is the
"round N: verdict/advice/correctness/bench" commit (the driver's artifact
commit on the round's final code). For every round that certified at
least one query it creates a temp worktree at that commit, copies the
CURRENT fingerprint algorithm in (hashes are algorithm-stable source
digests, so old-tree and new-tree fingerprints are comparable), computes
fingerprints there in a subprocess, and records each query's fingerprint
at its last certified round.

Kept in-repo for audit; after the seed, regen_certification.py owns the
ledger.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def round_commits() -> dict[int, str]:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"], cwd=REPO, capture_output=True, text=True
    ).stdout
    commits = {}
    for line in out.splitlines():
        m = re.match(r"([0-9a-f]+) round (\d+): verdict", line)
        if m:
            commits[int(m.group(2))] = m.group(1)
    return commits


def certified_rounds() -> dict[str, list[int]]:
    cert: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnum = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            snap = json.load(f)
        for q, row in snap.items():
            if all(row.get(k) for k in ("rows_match", "schema_match", "hash_match")):
                cert.setdefault(q, []).append(rnum)
    return cert


def fingerprints_at(commit: str) -> dict[str, str]:
    wt = f"/tmp/seed_wt_{commit[:8]}"
    shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, commit],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        os.makedirs(f"{wt}/scripts", exist_ok=True)
        shutil.copy(f"{REPO}/scripts/query_fingerprints.py", f"{wt}/scripts/")
        out = subprocess.run(
            [sys.executable, f"{wt}/scripts/query_fingerprints.py"],
            capture_output=True, text=True, cwd="/tmp", check=True,
        ).stdout
        return json.loads(out)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO,
                       capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)


def main() -> None:
    commits = round_commits()
    cert = certified_rounds()
    need_rounds = sorted({rs[-1] for rs in cert.values()})
    print(f"rounds needing historical fingerprints: {need_rounds}")
    fp_at: dict[int, dict[str, str]] = {}
    for r in need_rounds:
        if r not in commits:
            raise SystemExit(f"no round-{r} commit found")
        print(f"computing fingerprints at round {r} commit {commits[r][:8]} ...")
        fp_at[r] = fingerprints_at(commits[r])
    ledger = {}
    for q, rounds in sorted(cert.items()):
        last = rounds[-1]
        ledger[q] = {
            "certified_rounds": rounds,
            "last_certified_round": last,
            "fingerprint": fp_at[last].get(q),
        }
    out = os.path.join(REPO, "CERTIFICATION.json")
    with open(out, "w") as f:
        json.dump({"window": 50, "queries": ledger, "registry_order": []}, f, indent=1)
    missing = [q for q, rec in ledger.items() if rec["fingerprint"] is None]
    print(f"wrote {out}: {len(ledger)} certified queries, "
          f"{len(missing)} missing historical fingerprint: {missing}")


if __name__ == "__main__":
    main()
