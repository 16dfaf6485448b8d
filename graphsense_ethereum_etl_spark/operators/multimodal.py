"""Multimodal column operators (north-star surface).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` Pandas functions — the only sanctioned Python hot path,
because codec work genuinely can't be a Catalyst expression.

Two extractors share identical Spark plumbing (schema, batch shape,
partition parallelism):

- ``extractor="real"`` — actual decode via the pure-stdlib codecs in
  operators/codecs.py: PNG (zlib inflate + scanline unfilter), netpbm
  P5/P6 (single images and concatenated ffmpeg-image2pipe streams, the
  dependency-free video container), and PCM WAV. Formats that need
  external libraries (JPEG, MP4, …) raise ``NotImplementedError`` naming
  the dependency (Pillow/ffmpeg are not in this container).
- ``extractor="fake"`` (default) — a deterministic stub deriving
  pseudo-features from the byte length, kept as the SQL-oracle-checkable
  path (mm1) since the oracle can reproduce arithmetic but not a codec.

Scale posture: mapInPandas streams Arrow record batches (bounded memory per
task); binary payloads never hit the driver; feature extraction is
embarrassingly parallel over partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
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

    ``extractor="real"`` decodes PNG / netpbm / WAV headers (codecs.py,
    header-only — no pixel inflate on this path); ``"fake"`` exercises the
    identical plumbing with the deterministic stub."""
    if extractor == "real":
        from .codecs import media_features

        def feature_fn(payload: bytes):
            # Per-row tolerance: one corrupt/unknown payload must not kill a
            # whole 1000-executor stage — it degrades to (n_bytes, null,
            # null, null) and the caller filters. That includes payloads
            # whose MAGIC matches but whose body is garbage (truncated IHDR
            # → struct.error, bad IDAT → zlib.error, torn RIFF →
            # wave.Error). NotImplementedError (a format needing an absent
            # library) still raises: that is a deployment gap, not bad data.
            try:
                return media_features(payload)
            except NotImplementedError:
                raise
            except Exception:
                return len(payload), None, None, None
    else:
        feature_fn = _fake_features

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                feature_fn(bytes(b) if b is not None else b"")
                for b in pdf["content"]
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
    content plus updated meta.

    ``extractor="real"``: decode (PNG/netpbm, codecs.py) → nearest-neighbor
    resample → re-encode as PNG. ``"fake"``: deterministically truncates/
    tiles the payload to width*height bytes — same row count, schema, and
    batch shape."""
    target = width * height

    if extractor == "real":
        from .codecs import decode_image, png_encode, resize_nearest

        def one(b: bytes) -> tuple[bytes, str]:
            out = png_encode(resize_nearest(decode_image(b), width, height))
            return out, "image/png"
    else:

        def one(b: bytes) -> tuple[bytes, str]:
            out = (
                (b * (target // max(len(b), 1) + 1))[:target]
                if b
                else b"\x00" * target
            )
            return out, "image/raw"

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                out, mime = one(b)
                rows.append(
                    {
                        "media_id": mid,
                        "content": out,
                        "meta": {
                            "mime": mime,
                            "n_bytes": len(out),
                            "width": width,
                            "height": height,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
                  extractor: str = "fake", every_n_frames: int = 1) -> DataFrame:
    """Frame sampling: 1-in-N-out mapInPandas (row-expanding, the video →
    frames shape).

    ``extractor="real"``: the payload is a concatenated netpbm P5/P6 stream
    (ffmpeg ``-f image2pipe -vcodec ppm`` output — a real, dependency-free
    video container); every ``every_n_frames``-th frame is kept, capped at
    ``max_frames``, each re-encoded as PNG. ``frame_index`` is the index IN
    THE SOURCE STREAM (so downstream can recover timestamps). Containers
    that need a demuxer (MP4/MKV) raise NotImplementedError naming ffmpeg.

    ``"fake"``: slices the payload into ``every_n_bytes`` windows capped at
    ``max_frames`` — same expansion, ordering, and memory profile (frames
    stream out per Arrow batch; no row ever materializes the whole video
    more than once)."""
    if extractor == "real":
        from .codecs import pnm_stream_frames, png_encode, sniff_mime

        def frames_of(b: bytes) -> list[tuple[int, bytes]]:
            mime = sniff_mime(b)
            if mime != "image/x-portable-anymap":
                raise NotImplementedError(
                    f"frame sampling of {mime} needs ffmpeg (not installed); "
                    "supported real container: concatenated netpbm P5/P6"
                )
            frames = pnm_stream_frames(b)
            picked = range(0, len(frames), max(1, every_n_frames))
            return [
                (i, png_encode(frames[i])) for i in list(picked)[:max_frames]
            ]
    else:

        def frames_of(b: bytes) -> list[tuple[int, bytes]]:
            n = min(max_frames, max(1, (len(b) + every_n_bytes - 1) // every_n_bytes))
            return [
                (i, b[i * every_n_bytes : (i + 1) * every_n_bytes])
                for i in range(n)
            ]

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                for i, frame in frames_of(b):
                    rows.append(
                        {"media_id": mid, "frame_index": i, "frame": frame}
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType()),
    ]
)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def audio_hash(media: DataFrame, n_bits: int = 60) -> DataFrame:
    """Audio perceptual fingerprints: real-decode each PCM WAV payload
    (codecs.wav_decode) and emit its energy-delta fingerprint
    (codecs.audio_fingerprint) packed into a signed BIGINT — the audio
    counterpart of ``perceptual_hash``, sharing the SimHash column
    convention so ``dedup.fingerprint_hamming_pairs`` works unchanged for
    audio NEAR-duplicate detection (re-encoded / gain-shifted clips land
    within a few bit flips). Corrupt payloads degrade to null per row."""
    if n_bits > 64:
        raise ValueError(f"audio hash width {n_bits} exceeds 64 bits")

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import audio_fingerprint, wav_decode

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                fp: int | None
                try:
                    samples, _ = wav_decode(
                        bytes(content) if content is not None else b""
                    )
                    raw = audio_fingerprint(samples, n_bits)
                    fp = raw - (1 << 64) if raw >= (1 << 63) else raw
                except NotImplementedError:
                    raise
                except Exception:
                    fp = None
                rows.append({"media_id": mid, "ahash": fp})
            # explicit columns= so an EMPTY batch still yields a frame with
            # the AHASH_SCHEMA columns (a column-less frame fails Arrow
            # serialization) — same defense as video_frame_hashes.
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return media.mapInPandas(hash_batches, schema=AHASH_SCHEMA)


FHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("fhash", T.LongType()),
    ]
)


def video_frame_hashes(
    media: DataFrame, hash_w: int = 8, hash_h: int = 8
) -> DataFrame:
    """Per-frame perceptual hashes for video payloads (concatenated
    P5/P6 netpbm streams — the dependency-free ffmpeg image2pipe
    container codecs.py already speaks): real-decode the stream, dHash
    every frame, emit one (media_id, frame_idx, fhash) row per frame —
    a 1-in-N-out Arrow expansion. Downstream, video NEAR-duplicate
    detection is an inverted index on the frame hash: exact-match join
    on fhash, count shared frames per video pair — no all-pairs over
    videos, and re-encoded / partially-edited clips still meet on their
    unchanged frames. Corrupt payloads degrade to zero rows."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import dhash, pnm_stream_frames

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    frames = pnm_stream_frames(
                        bytes(content) if content is not None else b""
                    )
                except NotImplementedError:
                    raise
                except Exception:
                    continue
                for i, frame in enumerate(frames):
                    raw = dhash(frame, hash_w, hash_h)
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "fhash": raw - (1 << 64)
                            if raw >= (1 << 63)
                            else raw,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "fhash"]
            )

    return media.mapInPandas(hash_batches, schema=FHASH_SCHEMA)


def perceptual_hash(
    media: DataFrame, hash_w: int = 8, hash_h: int = 8
) -> DataFrame:
    """Perceptual image fingerprints: decode each binary image payload
    (PNG/netpbm, codecs.py), nearest-resize to the dHash grid, and emit the
    ``hash_w*hash_h``-bit difference hash packed into a signed BIGINT
    (two's-complement fold of the top bit, matching the SimHash column
    convention so both modalities share downstream tooling).

    Feed the result straight into ``dedup.fingerprint_hamming_pairs`` for
    image NEAR-duplicate detection — the image analog of SimHash text
    dedup: re-encoded / slightly-retouched images land within a few bit
    flips of each other. Corrupt or unsupported-but-sniffable payloads
    degrade to a null fingerprint per row (filtered by callers) instead of
    failing the stage; formats needing an absent library still raise.
    """
    n_bits = hash_w * hash_h
    if n_bits > 64:
        raise ValueError(f"dhash grid {hash_w}x{hash_h} exceeds 64 bits")

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_image, dhash

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                fp: int | None
                try:
                    raw = dhash(
                        decode_image(bytes(content) if content is not None else b""),
                        hash_w,
                        hash_h,
                    )
                    # two's-complement fold into a signed 64-bit column
                    fp = raw - (1 << 64) if raw >= (1 << 63) else raw
                except NotImplementedError:
                    raise
                except Exception:
                    fp = None
                rows.append({"media_id": mid, "dhash": fp})
            yield pd.DataFrame(rows)

    return media.mapInPandas(hash_batches, schema=PHASH_SCHEMA)


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("energy_sum", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def audio_frame_energies(media: DataFrame, frame_len: int = 256) -> DataFrame:
    """Per-frame integer energies for WAV payloads: real-decode
    (codecs.wav_decode, stdlib wave), mono-mix by summing channels, frame
    into fixed ``frame_len``-sample windows, and emit one
    ``(media_id, frame_idx, energy_sum, n_samples)`` row per frame — a
    1-in-N Arrow expansion like ``video_frame_hashes``. ``energy_sum`` is
    Σ|sample| as an exact BIGINT (no float mean — the downstream threshold
    compare cross-multiplies, so the whole VAD pipeline is
    integer-deterministic and SQL-oracle-checkable). The ragged tail frame
    is emitted with its true ``n_samples`` so thresholding stays a
    per-frame mean, not a per-frame sum. Corrupt payloads degrade to zero
    rows; Python does ONLY what Catalyst can't (the codec), the
    segmentation itself is pure Spark (``audio_activity_segments``)."""

    def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codecs import wav_decode

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    samples, _rate = wav_decode(
                        bytes(content) if content is not None else b""
                    )
                except NotImplementedError:
                    raise
                except Exception:
                    continue
                mono = np.abs(samples.astype(np.int64)).sum(axis=1)
                n = len(mono)
                for f in range(0, (n + frame_len - 1) // frame_len):
                    lo, hi = f * frame_len, min((f + 1) * frame_len, n)
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": f,
                            "energy_sum": int(mono[lo:hi].sum()),
                            "n_samples": hi - lo,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "energy_sum", "n_samples"],
            )

    return media.mapInPandas(energy_batches, schema=ENERGY_SCHEMA)


def audio_activity_segments(
    energies: DataFrame, threshold_per_sample: int = 100
) -> DataFrame:
    """Energy-threshold voice-activity segmentation over the output of
    ``audio_frame_energies`` — pure Catalyst: a frame is ACTIVE iff its
    mean |amplitude| exceeds the threshold, evaluated exactly as
    ``energy_sum > threshold · n_samples`` (integer cross-multiplication,
    no division), and maximal runs of active frames collapse into segments
    by gaps-and-islands (island key = frame_idx − row_number over the
    active frames of the clip). One shuffle on media_id shared by the
    window and the final aggregation; per-clip state is streaming window
    arithmetic, never a buffered waveform. Returns one row per segment:
    ``(media_id, seg_idx, start_frame, end_frame, n_frames,
    energy_sum)``."""
    active = energies.filter(
        F.col("energy_sum")
        > F.lit(threshold_per_sample).cast("bigint") * F.col("n_samples")
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    islands = active.withColumn(
        "_island", F.col("frame_idx") - F.row_number().over(w)
    )
    seg = (
        islands.groupBy("media_id", "_island")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count("*").cast("bigint").alias("n_frames"),
            F.sum("energy_sum").cast("bigint").alias("energy_sum"),
        )
    )
    w2 = Window.partitionBy("media_id").orderBy("start_frame")
    return seg.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        (F.row_number().over(w2) - 1).cast("bigint").alias("seg_idx"),
        F.col("start_frame").cast("bigint"),
        F.col("end_frame").cast("bigint"),
        "n_frames",
        "energy_sum",
    )
