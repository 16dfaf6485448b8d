"""Vector column operators over ``array<float>`` embedding columns.

All are sequential left-folds in double precision (``F.aggregate`` /
``F.zip_with``) — JVM-side Catalyst expressions, Arrow-free, no UDFs. The
sequential fold order is what makes the scores reproducible against the
DuckDB oracle (which sums with the same left-to-right order via list_sum).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product of two float arrays."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """L2 norm in double precision."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision. Zero-norm inputs score 0.0
    (no direction → similar to nothing; the unguarded division is an ANSI
    DIVIDE_BY_ZERO crash) — the same convention as the numpy GEMM kernels
    in operators/similarity.py."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom).otherwise(F.lit(0.0))
