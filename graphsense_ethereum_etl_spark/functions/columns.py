"""Scalar/column operators P5-P11 from the reference's transform pipelines
(SURVEY.md §2.2), each as a composable ``Column``-returning function.

All are pure Catalyst expressions — they stay inside whole-stage codegen,
vectorize, and push down; none require Python execution. The single
exception is the uint256↔binary codec pair at the bottom (Arrow-vectorized
pandas UDFs — a codec-boundary op per the §2.11 policy, since base-256
arbitrary-precision digit extraction has no Catalyst expression).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def block_bucket(block_id: Column | str, bucket_size: int = 1000) -> Column:
    """P5 — range bucket ``block_id_group = block_id // bucket_size``.

    Reference: eth_cassandra_streaming.py:344,395,455 (constant :34).
    Python ``//`` on non-negative ints equals ``floor(a/b)``; block ids are
    non-negative by construction (asserted in pipelines).
    """
    c = F.col(block_id) if isinstance(block_id, str) else block_id
    return F.floor(c / F.lit(bucket_size)).cast("bigint")


def hex_prefix(hex_str: Column | str, length: int = 5) -> Column:
    """P6 — ``tx_hash_prefix``: skip the ``0x``, take ``length`` hex chars.

    Reference: eth_cassandra_streaming.py:428-429 (``hash[2:2+5]``); length 5
    is authoritative (call site :634, recorded in configuration :653-656).
    Spark substring is 1-based: position 3 == Python index 2.
    """
    c = F.col(hex_str) if isinstance(hex_str, str) else hex_str
    return F.substring(c, 3, length)


def hex_to_bin(hex_str: Column | str) -> Column:
    """P7 — ``0x…`` hex string → bytes, None-safe.

    Reference: hex_to_bytearray, eth_cassandra_streaming.py:183-186.
    ``unhex(NULL) = NULL`` preserves the reference's None-safety; ``"0x"``
    (empty payload) decodes to ``b""`` exactly as bytearray.fromhex("") does.
    """
    c = F.col(hex_str) if isinstance(hex_str, str) else hex_str
    return F.unhex(F.substring(c, 3, 2_147_483_647))


def array_join_sep(arr: Column | str, sep: str = ",") -> Column:
    """P8 — serialize ``trace_address`` list<int> to a delimited string.

    Reference: ","-joined for the Cassandra sink
    (eth_cassandra_streaming.py:456-460) vs "|"-joined for CSV
    (eth_csv_export.py:311-315) — separator is a dialect parameter.
    None-safe: returns NULL for NULL input (matches reference's None check).
    """
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.when(c.isNotNull(), F.array_join(F.transform(c, lambda x: x.cast("string")), sep))


def topic0_with_default(topics: Column | str, default: str | None = "0x") -> Column:
    """P9 — ``topic0 = topics[0]`` if non-empty else a sink-dependent default.

    Reference: Cassandra dialect defaults to the literal string "0x" because
    topic0 is a key column and must not be null
    (eth_cassandra_streaming.py:346-355); CSV dialect leaves it null
    (eth_csv_export.py:339-340). ``default=None`` selects the CSV behavior.
    """
    c = F.col(topics) if isinstance(topics, str) else topics
    head = F.when(c.isNotNull() & (F.size(c) > 0), F.element_at(c, 1))
    if default is None:
        return head
    return F.coalesce(head, F.lit(default))


def topics_unhex(topics: Column | str) -> Column:
    """P10 — element-wise hex→bytes over the topics array, with None→[]
    normalization (eth_cassandra_streaming.py:348-349,357)."""
    c = F.col(topics) if isinstance(topics, str) else topics
    return F.transform(F.coalesce(c, F.array().cast("array<string>")), lambda t: F.unhex(F.substring(t, 3, 2_147_483_647)))


def topics_to_json(topics: Column | str) -> Column:
    """P11 — CSV logs dialect: topics → ``["0x..","0x.."]`` quoted-joined
    string (eth_csv_export.py:342-344). Exact string semantics (not to_json):
    the reference emits ``'","'.join`` wrapped in ``["…"]``."""
    c = F.col(topics) if isinstance(topics, str) else topics
    joined = F.concat(
        F.lit('["'),
        F.array_join(c, '","'),
        F.lit('"]'),
    )
    return F.when(c.isNotNull() & (F.size(c) > 0), joined).otherwise(
        F.when(c.isNotNull(), F.lit("[]"))
    )


def uint_to_bin32(col: Column | str) -> Column:
    """Lossless uint256 companion column (SURVEY.md §7.4.1): a non-negative
    DECIMAL(38,0) (the canonical wei/difficulty type — covers every realistic
    chain value) encoded as a 32-byte big-endian BinaryType, the exact bytes
    Cassandra's varint would hold for adversarial values beyond Decimal(38).

    Arrow-vectorized pandas UDF: Python ints are arbitrary-precision, so the
    base-256 digit extraction is exact; this is a codec-boundary op (§2.11
    UDF policy — same class as the RPC fetch and media decode), never a
    transform hot path. None-safe.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def enc(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            return int(v).to_bytes(32, "big")

        return s.map(one)

    return enc(F.col(col) if isinstance(col, str) else col)


def bin32_to_uint(col: Column | str) -> Column:
    """Inverse of ``uint_to_bin32``: 32-byte big-endian → DECIMAL(38,0).
    Values above 38 digits (true adversarial uint256) cannot round-trip
    through the decimal — callers keep the binary column authoritative and
    this decode raises ValueError for the out-of-range case (a real raise,
    not an ``assert``, so ``python -O`` cannot strip the guard)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("decimal(38,0)")
    def dec(s: pd.Series) -> pd.Series:
        from decimal import Decimal

        def one(b):
            if b is None:
                return None
            v = int.from_bytes(bytes(b), "big")
            if v >= 10**38:
                raise ValueError(
                    "value exceeds Decimal(38,0) — keep the binary column "
                    "authoritative for adversarial uint256"
                )
            return Decimal(v)

        return s.map(one)

    return dec(F.col(col) if isinstance(col, str) else col)
