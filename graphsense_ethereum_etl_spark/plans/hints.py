"""Size-gated join hint for the evolving side of iterative algorithms.

The iterative-graph family (connected components, label propagation,
PageRank, k-core, SSSP) joins a pinned-partitioned STATIC edge relation
against a small EVOLVING one (labels / ranks / keep-sets) every round. Two
plans exist for that join and each is catastrophic at the wrong scale:

- Let Catalyst choose / broadcast: at demo scale the evolving side is tiny
  and broadcasting it keeps the edges entirely in place — zero per-round
  exchange. But Catalyst's size ESTIMATES for mid-plan aggregates are
  unreliable, and at 100 TB both sides are corpus-sized: the r8
  shuffle-byte audit caught AQE alternately re-shuffling and broadcasting
  the full edge set once the frontier outgrew the threshold (g5: 49x bytes
  at 10x data, one OOM at sf~1).
- Unconditional ``shuffle_hash`` on the evolving side: scale-safe by
  construction (nothing is ever broadcast; edges never move thanks to the
  pinned checkpoint), but at demo scale it trades a kilobyte broadcast for
  a per-round edge-sized shuffle where the join key differs from the pin
  key — the r8→r7 regression on g6 (1.77 s → 5.12 s) and g4.

``evolving_hint`` picks per-run using a MEASURED row bound the caller
already has (a one-off count of the vertex set — the evolving side of
every round is vertex-sized or smaller, so one bound covers all rounds):
broadcast under the threshold, ``shuffle_hash`` at-or-over it. The
threshold is rows, not bytes, because the evolving relations are narrow
(2-3 integer columns, ≲ 32 B/row): the 4M-row default caps the broadcast
at ~128 MB — comfortably inside executor memory, far above any demo tier,
far below any 100-TB vertex set. The decision is DETERMINISTIC given the
data (no AQE estimate involved), so plans stay reproducible and the
shuffle-byte audit can pin each regime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Audit escape hatch: the shuffle-byte scale audit compares a query's
#: shuffle volume at 1x and 10x data, and a gate that broadcasts at one
#: tier but shuffles at the other would make that ratio meaningless
#: (broadcast exchanges write zero shuffle files). Setting this env var
#: forces the shuffle_hash regime everywhere so the audit measures the
#: 100-TB plan at BOTH tiers.
FORCE_SHUFFLE_ENV = "SPARK_GRAFT_FORCE_SHUFFLE_HINT"

#: Evolving sides with at most this many rows are broadcast; larger ones
#: get the scale-safe shuffle_hash hint. ~32 B/row ⇒ ≲ 128 MB broadcast.
BROADCAST_MAX_ROWS = 4_000_000


def evolving_hint(
    df: DataFrame,
    n_rows_bound: int | None,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Hint ``df`` as the evolving side of an iterative join:
    ``broadcast`` when ``n_rows_bound`` (an UPPER bound on df's row count,
    measured once by the caller — e.g. the vertex count) is under
    ``broadcast_max_rows``, else ``shuffle_hash``.

    ``n_rows_bound=None`` means "unknown / don't measure" and resolves to
    ``shuffle_hash`` — the scale-safe default is the one you get by
    omission. ``FORCE_SHUFFLE_ENV`` overrides the gate for the byte
    audit."""
    if os.environ.get(FORCE_SHUFFLE_ENV):
        return df.hint("shuffle_hash")
    if n_rows_bound is not None and n_rows_bound <= broadcast_max_rows:
        return F.broadcast(df)
    return df.hint("shuffle_hash")
