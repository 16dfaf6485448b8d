"""Pure-stdlib media codecs backing the ``extractor="real"`` paths in
operators/multimodal.py.

This container ships no Pillow/ffmpeg, so the "real" decode path is built on
formats that are fully decodable with the standard library + numpy:

- **PNG** (RFC 2083): chunk parse, zlib inflate, scanline unfilter
  (None/Sub/Up/Average/Paeth) — 8-bit gray/gray+alpha/RGB/RGBA/palette,
  non-interlaced. Encoder emits filter-0 scanlines (always valid PNG).
- **netpbm** P5 (PGM) / P6 (PPM), maxval ≤ 255, including **concatenated P6
  streams** — the raw-video interchange format ffmpeg emits with
  ``-f image2pipe -vcodec ppm`` — which gives frame sampling a real,
  dependency-free video container.
- **WAV** via the stdlib ``wave`` module (PCM).

Compressed formats that genuinely require external codecs (JPEG, MP4, …)
raise ``NotImplementedError`` naming the dependency, exactly as before.

These functions are plain bytes→numpy kernels: Spark never sees them
directly — multimodal.py calls them inside Arrow-batched ``mapInPandas``
functions, so per-row Python cost is the sanctioned codec hot path, not a
row-at-a-time UDF in a relational operator.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_mime(payload: bytes) -> str:
    """Magic-byte content sniffing for the supported container formats."""
    if payload.startswith(PNG_MAGIC):
        return "image/png"
    if payload.startswith(b"P6") or payload.startswith(b"P5"):
        return "image/x-portable-anymap"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    return "application/octet-stream"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to an (H, W, C) uint8 array.

    Palette images are expanded to RGB. Raises ValueError on malformed
    chunks and NotImplementedError for 16-bit / interlaced variants."""
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_MAGIC)
    ihdr = None
    idat = bytearray()
    palette: bytes | None = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype} on row {y}")
        out[y] = cur
        prev = cur

    img = out.reshape(height, width, ch)
    if color == 3:  # palette → RGB
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        img = pal[img[:, :, 0]]
    return img


def png_encode(img: np.ndarray) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a filter-0 PNG."""
    if img.ndim == 2:
        img = img[:, :, None]
    height, width, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    flat = np.ascontiguousarray(img, dtype=np.uint8).reshape(height, width * ch)
    for y in range(height):
        raw.append(0)
        raw.extend(flat[y].tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# netpbm (P5/P6), single image and concatenated streams
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes, pos: int) -> tuple[str, int, int, int, int]:
    """Parse one P5/P6 header starting at ``pos``; returns
    (kind, width, height, maxval, data_offset)."""
    kind = payload[pos : pos + 2].decode("ascii", "replace")
    if kind not in ("P5", "P6"):
        raise ValueError(f"not a P5/P6 netpbm header at offset {pos}")
    i = pos + 2
    vals: list[int] = []
    while len(vals) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    return kind, vals[0], vals[1], vals[2], i


def pnm_decode(payload: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    """Decode one netpbm image at ``pos``; returns (array, next_offset) so
    concatenated streams can be walked frame by frame."""
    kind, width, height, maxval, off = _pnm_header(payload, pos)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if kind == "P6" else 1
    n = width * height * ch
    data = payload[off : off + n]
    if len(data) != n:
        raise ValueError("truncated netpbm pixel data")
    arr = np.frombuffer(data, dtype=np.uint8).reshape(height, width, ch)
    return arr, off + n


def pnm_encode(img: np.ndarray) -> bytes:
    """Encode (H, W) → P5 or (H, W, 3) → P6."""
    if img.ndim == 2:
        img = img[:, :, None]
    height, width, ch = img.shape
    kind = b"P6" if ch == 3 else b"P5"
    header = kind + b"\n%d %d\n255\n" % (width, height)
    return header + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def pnm_stream_frames(payload: bytes) -> list[np.ndarray]:
    """Split a concatenated P5/P6 stream (ffmpeg image2pipe format) into
    per-frame arrays."""
    frames: list[np.ndarray] = []
    pos = 0
    while pos < len(payload):
        frame, pos = pnm_decode(payload, pos)
        frames.append(frame)
    return frames


# ---------------------------------------------------------------------------
# WAV (stdlib)
# ---------------------------------------------------------------------------


def wav_info(payload: bytes) -> tuple[int, int, int, int]:
    """(n_channels, sample_rate, n_samples, sample_width_bytes) of a PCM WAV."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        return w.getnchannels(), w.getframerate(), w.getnframes(), w.getsampwidth()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """((n_samples, n_channels) int array, sample_rate) from a PCM WAV —
    stdlib ``wave`` only. 8-bit PCM is unsigned per the RIFF spec and is
    re-biased to signed on the way out (the encoder's inverse)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        ch, n, width = w.getnchannels(), w.getnframes(), w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(n)
    if width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
    elif width == 2:
        arr = np.frombuffer(raw, dtype="<i2")
    elif width == 4:
        arr = np.frombuffer(raw, dtype="<i4")
    else:
        raise NotImplementedError(f"PCM width {width} not supported")
    return arr.reshape(-1, ch), rate


def audio_fingerprint(samples: np.ndarray, n_bits: int = 60) -> int:
    """Energy-delta audio fingerprint — the audio analog of ``dhash``
    (the Haitsma/Kalker "robust audio hashing" family reduced to its
    band-free time-domain core): mono-mix, split into ``n_bits + 1``
    equal-span frames, and set bit f iff frame f's mean |amplitude|
    exceeds frame f+1's. Like dHash it encodes only the SIGN of adjacent
    deltas, so uniform gain changes and re-encoding leave the fingerprint
    intact while different material lands ~n_bits/2 away. Returns an
    unsigned ``n_bits``-bit int (bit 0 = first frame pair)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    x = np.abs(samples.astype(np.float64)).mean(axis=1)
    n = len(x)
    frames = n_bits + 1
    bounds = (np.arange(frames + 1) * n) // frames
    e = np.empty(frames, dtype=np.float64)
    for i in range(frames):
        lo, hi = bounds[i], bounds[i + 1]
        e[i] = x[lo:hi].mean() if hi > lo else 0.0
    fp = 0
    for b in range(n_bits):
        if e[b] > e[b + 1]:
            fp |= 1 << b
    return fp


def wav_encode(
    samples: np.ndarray, sample_rate: int = 8000, sample_width: int = 2
) -> bytes:
    """PCM-encode an (n_samples,) or (n_samples, n_channels) int array.

    ``sample_width=1`` takes SIGNED input samples in [-128, 127] and stores
    them biased by +128: 8-bit WAV PCM is unsigned per the RIFF spec, so a
    raw int8 dump would be misread by any standard decoder.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        if sample_width == 1:
            raw = (
                np.ascontiguousarray(samples, dtype=np.int16) + 128
            ).astype(np.uint8)
        else:
            dtype = {2: np.int16, 4: np.int32}[sample_width]
            raw = np.ascontiguousarray(samples, dtype=dtype)
        w.writeframes(raw.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# decode dispatch + resize
# ---------------------------------------------------------------------------


def decode_image(payload: bytes) -> np.ndarray:
    """Decode PNG or single netpbm payloads to (H, W, C) uint8."""
    mime = sniff_mime(payload)
    if mime == "image/png":
        return png_decode(payload)
    if mime == "image/x-portable-anymap":
        arr, _ = pnm_decode(payload)
        return arr
    if mime == "image/jpeg":
        raise NotImplementedError(
            "JPEG decode requires Pillow/libjpeg (not installed); supported "
            "real codecs: PNG, netpbm P5/P6, WAV"
        )
    raise ValueError(f"unsupported image payload ({mime})")


def media_features(payload: bytes) -> tuple[int, int | None, int | None, int]:
    """(n_bytes, width, height, n_frames) for any supported payload:
    images → 1 frame; P6 streams → frame count; WAV → (None, None, samples).
    Header-only where the format allows (PNG needs just IHDR; WAV just the
    RIFF header) — no full pixel decode on the feature path."""
    n = len(payload)
    mime = sniff_mime(payload)
    if mime == "image/png":
        # IHDR is always the first chunk: width/height at fixed offsets.
        width, height = struct.unpack(">II", payload[16:24])
        return n, int(width), int(height), 1
    if mime == "image/x-portable-anymap":
        frames = pnm_stream_frames(payload)
        h, w = frames[0].shape[:2]
        return n, int(w), int(h), len(frames)
    if mime == "audio/wav":
        _ch, _rate, n_samples, _width = wav_info(payload)
        return n, None, None, int(n_samples)
    if mime == "image/jpeg":
        raise NotImplementedError(
            "JPEG requires Pillow/libjpeg (not installed in this container)"
        )
    raise ValueError(f"unsupported media payload ({mime})")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — the classic index-map
    formulation; no interpolation dependency."""
    src_h, src_w = img.shape[:2]
    ys = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    xs = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return img[ys][:, xs]


def dhash(img: np.ndarray, hash_w: int = 8, hash_h: int = 8) -> int:
    """Difference hash (dHash) — the standard perceptual image fingerprint
    (Krawetz, "Kind of Like That", 2013; same family as pHash/aHash): mean-
    grayscale, nearest-resize to ``(hash_w+1) × hash_h``, and bit
    ``r*hash_w + c`` is set iff ``g[r, c] > g[r, c+1]``. Robust to uniform
    brightness/contrast shifts and re-encoding; near-duplicate images land
    within a few bit flips, so the fingerprints feed the same piece-banding
    Hamming join as SimHash text dedup (dedup.py::fingerprint_hamming_pairs).

    Returns an UNSIGNED ``hash_w*hash_h``-bit int (row-major, bit 0 =
    top-left); callers packing 64 bits into a signed BIGINT column fold the
    top bit two's-complement style.
    """
    g = img.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    small = resize_nearest(g, hash_w + 1, hash_h)
    bits = small[:, :-1] > small[:, 1:]  # (hash_h, hash_w) row-major
    fp = 0
    for b, v in enumerate(bits.reshape(-1)):
        if v:
            fp |= 1 << b
    return fp
