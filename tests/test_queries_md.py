"""QUERIES.md freshness — the generated registry index must match the
live registry exactly (the CERTIFICATION.md discipline: a query added or
renamed without regenerating the index fails the suite)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "scripts") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_queries_md_is_fresh():
    from gen_queries_md import build

    with open(os.path.join(REPO, "QUERIES.md")) as f:
        committed = f.read()
    assert committed == build(), (
        "QUERIES.md is stale — run scripts/gen_queries_md.py"
    )


def test_queries_md_covers_registry():
    from graphsense_ethereum_etl_spark.queries import REGISTRY

    with open(os.path.join(REPO, "QUERIES.md")) as f:
        text = f.read()
    missing = [n for n in REGISTRY if f"| {n} |" not in text]
    assert not missing, missing
