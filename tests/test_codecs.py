"""Real-codec tests: operators/codecs.py pure kernels + the
extractor="real" Spark paths in operators/multimodal.py."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from graphsense_ethereum_etl_spark.operators.codecs import (
    PNG_MAGIC,
    decode_image,
    media_features,
    png_decode,
    png_encode,
    pnm_decode,
    pnm_encode,
    pnm_stream_frames,
    resize_nearest,
    sniff_mime,
    wav_encode,
    wav_info,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = _rng(channels).integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def _forward_filter(raw: np.ndarray, ftypes: list[int], ch: int) -> bytes:
    """Apply PNG forward filters (spec §6) to build test scanline data."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    h, stride = raw.shape
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        out.append(f)
        cur = raw[y].astype(np.int16)
        for x in range(stride):
            left = int(cur[x - ch]) if x >= ch else 0
            up = int(prev[x])
            ul = int(prev[x - ch]) if x >= ch else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2, 4: paeth(left, up, ul)}[f]
            out.append((int(cur[x]) - pred) & 0xFF)
        prev = cur
    return bytes(out)


def test_png_decode_all_filter_types():
    """Hand-filter scanlines with every filter type (our encoder only emits
    filter 0) and confirm the decoder inverts each one."""
    h, w, ch = 10, 5, 3
    img = _rng(42).integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    raw = img.reshape(h, w * ch)
    filtered = _forward_filter(raw, [0, 1, 2, 3, 4], ch)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    payload = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(filtered))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(payload), img)


def test_png_palette_expands_to_rgb():
    pal = _rng(7).integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = _rng(8).integers(0, 16, size=(6, 4, 1), dtype=np.uint8)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    raw = bytearray()
    for y in range(6):
        raw.append(0)
        raw.extend(idx[y, :, 0].tobytes())
    payload = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 6, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(payload), pal[idx[:, :, 0]])


def test_png_rejects_garbage_and_16bit():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"not a png")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(png_encode(img))
    payload[24] = 16  # bit depth byte inside IHDR
    # CRC is not rechecked; depth gate fires first
    with pytest.raises(NotImplementedError, match="bit depth"):
        png_decode(bytes(payload))


# ---------------------------------------------------------------------------
# netpbm + WAV
# ---------------------------------------------------------------------------


def test_pnm_roundtrip_and_comments():
    img = _rng(3).integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    arr, end = pnm_decode(pnm_encode(img))
    assert np.array_equal(arr, img) and end == len(pnm_encode(img))

    with_comment = b"P6\n# a comment line\n11 9\n# more\n255\n" + img.tobytes()
    arr2, _ = pnm_decode(with_comment)
    assert np.array_equal(arr2, img)


def test_pnm_stream_frames():
    frames = [
        _rng(i).integers(0, 256, size=(4, 6, 3), dtype=np.uint8) for i in range(5)
    ]
    stream = b"".join(pnm_encode(f) for f in frames)
    out = pnm_stream_frames(stream)
    assert len(out) == 5
    for got, want in zip(out, frames):
        assert np.array_equal(got, want)


def test_wav_roundtrip_info():
    samples = (_rng(1).integers(-1000, 1000, size=(400, 2))).astype(np.int16)
    payload = wav_encode(samples, sample_rate=8000)
    assert sniff_mime(payload) == "audio/wav"
    ch, rate, n, width = wav_info(payload)
    assert (ch, rate, n, width) == (2, 8000, 400, 2)


def test_wav_8bit_is_unsigned_biased():
    # 8-bit WAV PCM is UNSIGNED (uint8, 128 bias per the RIFF spec): signed
    # input samples must land biased by +128 in the data chunk, not as a raw
    # int8 dump, or standard decoders misread every negative sample.
    import io as _io
    import wave as _wave

    samples = np.array([-128, -1, 0, 1, 127], dtype=np.int16)
    payload = wav_encode(samples, sample_rate=8000, sample_width=1)
    with _wave.open(_io.BytesIO(payload), "rb") as w:
        assert w.getsampwidth() == 1
        raw = np.frombuffer(w.readframes(w.getnframes()), dtype=np.uint8)
    assert raw.tolist() == [0, 127, 128, 129, 255]


# ---------------------------------------------------------------------------
# dispatch, features, resize
# ---------------------------------------------------------------------------


def test_media_features_dispatch():
    img = _rng(5).integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    assert media_features(png_encode(img)) == (len(png_encode(img)), 12, 8, 1)

    stream = pnm_encode(img) + pnm_encode(img) + pnm_encode(img)
    assert media_features(stream) == (len(stream), 12, 8, 3)

    wav = wav_encode(np.zeros(100, dtype=np.int16))
    assert media_features(wav) == (len(wav), None, None, 100)

    with pytest.raises(NotImplementedError, match="Pillow"):
        media_features(b"\xff\xd8\xff\xe0fakejpeg")
    with pytest.raises(ValueError, match="unsupported"):
        media_features(b"garbage")


def test_resize_nearest():
    img = _rng(9).integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    assert np.array_equal(resize_nearest(img, 10, 10), img)  # identity
    small = resize_nearest(img, 5, 4)
    assert small.shape == (4, 5, 3)
    # nearest-neighbor: every output pixel exists verbatim in the source
    assert small[0, 0].tolist() == img[0, 0].tolist()
    up = resize_nearest(img, 20, 30)
    assert up.shape == (30, 20, 3)


# ---------------------------------------------------------------------------
# Spark extractor="real" paths
# ---------------------------------------------------------------------------


def _media_df(spark, payloads: list[bytes]):
    from graphsense_ethereum_etl_spark.operators.multimodal import (
        attach_media_columns,
    )

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "media_id long, payload binary"
    )
    return attach_media_columns(df, "media_id", "payload")


def test_extract_features_real(spark):
    from graphsense_ethereum_etl_spark.operators.multimodal import extract_features

    img = _rng(11).integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    payloads = [
        png_encode(img),
        pnm_encode(img) + pnm_encode(img),
        wav_encode(np.zeros(64, dtype=np.int16)),
        b"corrupt payload",
    ]
    # valid magic + garbage body must degrade per-row, not kill the stage
    payloads.append(PNG_MAGIC + b"\x00\x00")  # truncated before IHDR
    payloads.append(b"RIFF\x00\x00\x00\x00WAVEgarbage")  # torn RIFF
    rows = {
        r["media_id"]: r
        for r in extract_features(_media_df(spark, payloads), extractor="real").collect()
    }
    assert (rows[0]["width"], rows[0]["height"], rows[0]["n_frames"]) == (12, 8, 1)
    assert (rows[1]["width"], rows[1]["n_frames"]) == (12, 2)
    assert rows[2]["width"] is None and rows[2]["n_frames"] == 64
    # corrupt rows degrade to nulls instead of failing the stage —
    # including bodies that lie about their magic
    for mid in (3, 4, 5):
        assert rows[mid]["n_bytes"] == len(payloads[mid])
        assert rows[mid]["width"] is None and rows[mid]["n_frames"] is None


def test_resize_media_real(spark):
    from graphsense_ethereum_etl_spark.operators.multimodal import resize_media

    img = _rng(13).integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = resize_media(
        _media_df(spark, [png_encode(img), pnm_encode(img)]),
        width=8,
        height=4,
        extractor="real",
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["meta"]["mime"] == "image/png"
        decoded = png_decode(bytes(r["content"]))
        assert decoded.shape == (4, 8, 3)
        assert np.array_equal(decoded, resize_nearest(img, 8, 4))


def test_sample_frames_real(spark):
    from graphsense_ethereum_etl_spark.operators.multimodal import sample_frames

    frames = [
        _rng(20 + i).integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
        for i in range(6)
    ]
    stream = b"".join(pnm_encode(f) for f in frames)
    out = sample_frames(
        _media_df(spark, [stream]),
        extractor="real",
        every_n_frames=2,
        max_frames=8,
    ).collect()
    assert [r["frame_index"] for r in sorted(out, key=lambda r: r["frame_index"])] == [0, 2, 4]
    for r in out:
        assert np.array_equal(png_decode(bytes(r["frame"])), frames[r["frame_index"]])


def test_decode_image_jpeg_names_dependency():
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\xff\xd8\xff\xe0fakejpeg")


def test_dhash_brightness_invariant_and_roundtrip():
    """dHash is invariant to uniform brightness shifts and survives a PNG
    encode→decode→2×-downsample round trip bit-exactly."""
    from graphsense_ethereum_etl_spark.operators.codecs import (
        dhash,
        png_decode,
        png_encode,
    )

    rng = _rng(11)
    img = rng.integers(30, 200, size=(8, 9), dtype=np.uint8)
    fp = dhash(img)
    assert fp == dhash(np.clip(img.astype(np.int16) + 40, 0, 255).astype(np.uint8))
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    rgb = np.stack([up, up, up], axis=2)
    assert dhash(png_decode(png_encode(rgb))) == fp


def test_dhash_near_duplicate_small_distance():
    """A lightly perturbed image lands within a few bit flips; an unrelated
    image lands far away."""
    from graphsense_ethereum_etl_spark.operators.codecs import dhash

    rng = _rng(12)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    near = img.copy()
    near[5:7, 5:7] = 255  # small local retouch
    far = _rng(13).integers(0, 256, size=(32, 32), dtype=np.uint8)
    d_near = bin(dhash(img) ^ dhash(near)).count("1")
    d_far = bin(dhash(img) ^ dhash(far)).count("1")
    assert d_near <= 6
    assert d_far > 15


def test_wav_decode_roundtrip_all_widths():
    import numpy as np

    from graphsense_ethereum_etl_spark.operators.codecs import (
        wav_decode,
        wav_encode,
    )

    ramp = np.arange(-100, 100, dtype=np.int64)
    for width in (1, 2, 4):
        payload = wav_encode(ramp, sample_rate=16000, sample_width=width)
        out, rate = wav_decode(payload)
        assert rate == 16000
        assert out.shape == (200, 1)
        # 8-bit is stored biased-unsigned per RIFF; decode re-biases
        assert list(out[:, 0]) == list(ramp)


def test_audio_fingerprint_gain_invariant_and_sensitive():
    import numpy as np

    from graphsense_ethereum_etl_spark.operators.codecs import (
        audio_fingerprint,
    )

    rng_amps = ((np.arange(61) * 37) % 50 + 20).astype(np.int64)
    x = np.repeat(rng_amps, 8)
    fp = audio_fingerprint(x, n_bits=60)
    # uniform gain change preserves every delta sign
    assert audio_fingerprint(x * 3, n_bits=60) == fp
    # flipping one frame's relative level flips bits
    y = x.copy()
    y[8 * 30 : 8 * 31] = 1000
    assert audio_fingerprint(y, n_bits=60) != fp


def test_audio_hash_empty_input_keeps_schema(spark):
    """ADVICE r5: a zero-row batch must yield a frame that still carries
    the AHASH_SCHEMA columns (a column-less pd.DataFrame fails Arrow
    serialization)."""
    from graphsense_ethereum_etl_spark.operators.multimodal import audio_hash

    empty = spark.createDataFrame(
        [], "media_id bigint, content binary"
    ).repartition(2)
    out = audio_hash(empty)
    assert out.columns == ["media_id", "ahash"]
    assert out.count() == 0


# ---------------------------------------------------------------------------
# audio VAD: frame energies + activity segmentation
# ---------------------------------------------------------------------------


def test_audio_frame_energies_ragged_tail_and_corrupt(spark):
    """The tail frame carries its true n_samples (thresholding stays a
    mean), corrupt payloads degrade to zero rows, and energies are exact
    integer sums."""
    import pandas as pd
    from pyspark.sql import functions as F

    from graphsense_ethereum_etl_spark.operators.codecs import wav_encode
    from graphsense_ethereum_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_frame_energies,
    )
    import numpy as np

    # 10 samples at frame_len=4 -> frames of 4, 4, 2
    samples = np.array([1, -2, 3, -4, 5, -6, 7, -8, 9, -10], dtype=np.int16)
    good = wav_encode(samples, sample_rate=8000, sample_width=2)
    pdf = pd.DataFrame(
        [
            {"media_id": 1, "content": good, "meta": {"mime": "audio/wav", "n_bytes": len(good)}},
            {"media_id": 2, "content": b"not a wav", "meta": {"mime": "audio/wav", "n_bytes": 9}},
        ]
    )
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    rows = {
        r.frame_idx: (r.energy_sum, r.n_samples)
        for r in audio_frame_energies(media, frame_len=4).collect()
    }
    assert rows == {0: (1 + 2 + 3 + 4, 4), 1: (5 + 6 + 7 + 8, 4), 2: (9 + 10, 2)}


def test_audio_activity_segments_islands_and_threshold_edge(spark):
    """Gaps-and-islands merges adjacent active frames only; the threshold
    is strict (mean == threshold is inactive, integer cross-multiplied)."""
    from graphsense_ethereum_etl_spark.operators.multimodal import (
        audio_activity_segments,
    )

    # frames: idx, energy_sum, n_samples (threshold 10/sample)
    energies = spark.createDataFrame(
        [
            (1, 0, 44, 4),   # active (11 > 10)
            (1, 1, 41, 4),   # active
            (1, 2, 40, 4),   # INACTIVE: mean exactly 10, strict >
            (1, 3, 99, 4),   # active
            (1, 5, 80, 4),   # active but frame 4 missing -> new segment
            (2, 0, 400, 4),  # second clip independent
        ],
        "media_id long, frame_idx long, energy_sum long, n_samples long",
    )
    segs = [
        (r.media_id, r.seg_idx, r.start_frame, r.end_frame, r.n_frames, r.energy_sum)
        for r in audio_activity_segments(energies, threshold_per_sample=10)
        .orderBy("media_id", "seg_idx")
        .collect()
    ]
    assert segs == [
        (1, 0, 0, 1, 2, 85),
        (1, 1, 3, 3, 1, 99),
        (1, 2, 5, 5, 1, 80),
        (2, 0, 0, 0, 1, 400),
    ]
