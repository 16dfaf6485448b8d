"""Multimodal column operators (north-star surface).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` Pandas functions — the only sanctioned Python hot path,
because codec work genuinely can't be a Catalyst expression. The actual
codec libraries (PIL/ffmpeg/librosa) are NOT in this container, so the decode
step is STUBBED: ``extractor="real"`` raises ``NotImplementedError`` with the
dependency named, and the default extractor is a deterministic fake that
derives pseudo-features from the bytes — which keeps the Spark-side plumbing
(schema, batch shape, partition parallelism) real and testable.

Scale posture: mapInPandas streams Arrow record batches (bounded memory per
task); binary payloads never hit the driver; feature extraction is
embarrassingly parallel over partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_media_columns(df: DataFrame, id_col: str, payload_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Lift any byte-producing column into the (content, meta) media shape."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"), F.length(content).cast("bigint").alias("n_bytes")
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic pseudo-decode: features are pure arithmetic on the byte
    length, so results are reproducible and SQL-oracle-checkable."""
    n = len(payload)
    return n, 16 + n % 64, 16 + (n * 7) % 64, 1 + n % 4


def extract_features(media: DataFrame, extractor: str = "fake") -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    ``extractor="real"`` is the production path — it needs an image/audio
    codec library that is not installed here, so it raises with the exact
    dependency; ``"fake"`` exercises the identical plumbing with the
    deterministic stub."""
    if extractor == "real":  # pragma: no cover - codec libs absent by design
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg (not installed in this "
            "container); use extractor='fake' for the plumbing path"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(b if b is not None else b"") for b in pdf["content"]
            ]
            out = pd.DataFrame(
                feats, columns=["n_bytes", "width", "height", "n_frames"]
            )
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, width: int, height: int, extractor: str = "fake") -> DataFrame:
    """Resize: 1-in-1-out mapInPandas over Arrow batches, emitting new binary
    content plus updated meta. The real path would decode → PIL resize →
    re-encode; the stub deterministically truncates/tiles the payload to
    width*height bytes so row count, schema, and batch shape are the real
    pipeline's."""
    if extractor == "real":  # pragma: no cover - codec libs absent by design
        raise NotImplementedError(
            "real resize requires PIL (not installed); use extractor='fake'"
        )
    target = width * height

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                out = (b * (target // max(len(b), 1) + 1))[:target] if b else b"\x00" * target
                rows.append(
                    {
                        "media_id": mid,
                        "content": out,
                        "meta": {
                            "mime": "image/raw",
                            "n_bytes": len(out),
                            "width": width,
                            "height": height,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
                  extractor: str = "fake") -> DataFrame:
    """Frame sampling: 1-in-N-out mapInPandas (row-expanding, the video →
    frames shape). The real path would ffmpeg-demux and keep every Nth frame;
    the stub slices the payload into ``every_n_bytes`` windows, capped at
    ``max_frames`` — exercising the same expansion, ordering, and memory
    profile (frames stream out per Arrow batch; no row ever materializes the
    whole video more than once)."""
    if extractor == "real":  # pragma: no cover - codec libs absent by design
        raise NotImplementedError(
            "real frame sampling requires ffmpeg (not installed); use extractor='fake'"
        )

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                for i in range(min(max_frames, max(1, (len(b) + every_n_bytes - 1) // every_n_bytes))):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_index": i,
                            "frame": b[i * every_n_bytes : (i + 1) * every_n_bytes],
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(frame_batches, schema=FRAME_SCHEMA)
