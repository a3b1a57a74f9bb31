"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels.

Decode support is tiered by what this environment can honestly do:

- REAL, stdlib-only decoders for PPM/PGM images (pure byte parsing +
  numpy), uncompressed 24-bit BMP, non-interlaced 8-bit PNG
  (``zlib`` inflate + the five per-row filters), baseline AND
  progressive JPEG (huffman entropy decode + batched IDCT,
  ``operators/jpeg.py``) and PCM WAV audio (``wave`` module) — parse,
  feature-extract and nearest-neighbor resize with no external
  libraries;
- payloads in remaining formats (MP3, arithmetic/12-bit JPEG, ...)
  raise NotImplementedError unless ``fake=True`` (librosa is not
  available in this sandbox; swapping it in later only changes the
  kernel body);
- ``fake=True`` derives a deterministic feature vector from the raw
  bytes, used by the oracle-checked plumbing tests.

The Spark-side plumbing — schema handling, partition-sized Arrow
batches, UDF signatures, 1->N row expansion — is real and tested
throughout.
"""

from __future__ import annotations

import io
import wave
import zlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), True),       # image | audio | video
    StructField("payload", BinaryType(), True),    # opaque encoded bytes
    StructField("mime", StringType(), True),
    StructField("n_bytes", LongType(), True),
])


def attach_media(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Demo adapter: wrap a text column as an opaque binary payload with
    typed metadata (stands in for real image/audio ingestion)."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col(id_col) % 3 + 1).cast("int")).alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def parse_netpbm(payload: bytes) -> Optional[tuple[int, int, "np.ndarray"]]:
    """Parse binary netpbm images — P6 (PPM, RGB) or P5 (PGM, gray) with
    maxval < 256 — into (width, height, HxWxC uint8 array). Pure byte
    parsing (header tokens with ``#`` comment support) + one
    ``np.frombuffer``. Returns None if the payload is not netpbm."""
    if payload is None or payload[:2] not in (b"P6", b"P5"):
        return None
    channels = 3 if payload[:2] == b"P6" else 1
    # header = magic + 3 ASCII tokens (w, h, maxval); '#' starts a
    # comment running to end-of-line; a single whitespace ends the header
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i:i + 1]
        if c == b"#":
            while i < n and payload[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if maxval >= 256 or w <= 0 or h <= 0:
        return None
    i += 1  # single whitespace after maxval
    raster = payload[i:i + w * h * channels]
    if len(raster) != w * h * channels:
        return None
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, channels)
    return w, h, arr


def parse_bmp(payload: bytes) -> Optional[tuple[int, int, "np.ndarray"]]:
    """Parse uncompressed 24-bit BMP (BITMAPINFOHEADER or longer,
    bottom-up or top-down) into (width, height, HxWx3 uint8 RGB array).
    Pure byte parsing: little-endian header fields, 4-byte row padding,
    BGR->RGB swap. Returns None if the payload is not a BMP this
    decoder handles."""
    if payload is None or payload[:2] != b"BM" or len(payload) < 54:
        return None
    offset = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    # pixel data must start after the file header (14) + info header;
    # a smaller offset would decode header bytes as pixels
    if hdr_size < 40 or offset < 14 + hdr_size:
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    planes = int.from_bytes(payload[26:28], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if planes != 1 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down, height = h < 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    data = payload[offset:offset + stride * height]
    if len(data) != stride * height:
        return None
    rows = (np.frombuffer(data, dtype=np.uint8)
            .reshape(height, stride)[:, :w * 3].reshape(height, w, 3))
    if not top_down:
        rows = rows[::-1]
    return w, height, rows[..., ::-1].copy()


def write_bmp(arr: "np.ndarray") -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed 24-bit
    bottom-up BMP — the inverse of :func:`parse_bmp`."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    pad = stride - w * 3
    bgr = arr[..., ::-1][::-1]  # RGB->BGR, bottom-up row order
    body = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    size = 54 + len(body)
    header = (b"BM" + size.to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + body


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/pixel


def parse_png(payload: bytes) -> Optional[tuple[int, int, "np.ndarray"]]:
    """Parse non-interlaced 8-bit-depth PNG (grayscale / RGB /
    gray+alpha / RGBA) into (width, height, HxWxC uint8 array) with
    stdlib only: chunk walk, ``zlib`` inflate of the concatenated IDAT
    stream, then the five per-row filters (none/sub/up/average/Paeth)
    undone exactly per the PNG spec §9. Returns None for payloads this
    decoder does not handle (palette, 16-bit, interlaced, non-PNG) —
    callers fall through to the next decoder or the fake tier."""
    if payload is None or payload[:8] != PNG_SIG:
        return None
    i, n = 8, len(payload)
    w = h = channels = None
    idat: list[bytes] = []
    while i + 8 <= n:
        length = int.from_bytes(payload[i:i + 4], "big")
        ctype = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + length]
        if len(data) != length:
            return None
        if ctype == b"IHDR":
            if length != 13:
                return None
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, comp, filt, interlace = data[8:13]
            channels = _PNG_CHANNELS.get(color_type)
            if (bit_depth != 8 or comp != 0 or filt != 0 or interlace != 0
                    or channels is None or w <= 0 or h <= 0):
                return None
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + length  # len + type + data + crc
    if w is None or not idat:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) != h * (stride + 1):
        return None
    # Unfilter cost note: none/up/sub are fully vectorized (sub is a
    # per-channel-lane prefix sum — mod-256 distributes over addition);
    # average/Paeth carry a true left-to-right data dependence (floor
    # and argmin break linearity), so they run a per-PIXEL loop
    # vectorized across channels — w iterations, not w*channels.
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            pass
        elif ftype == 2:      # up: uint8 array add wraps mod 256 (spec)
            row += prev
        elif ftype == 1:      # sub == prefix sum along each channel lane
            lanes = row.reshape(w, channels).astype(np.uint32)
            row = (lanes.cumsum(axis=0, dtype=np.uint32) & 0xFF) \
                .astype(np.uint8).reshape(stride)
        elif ftype == 3:      # average (floor of left+up over 2)
            cur = row.reshape(w, channels).astype(np.int32)
            up = prev.reshape(w, channels).astype(np.int32)
            left = np.zeros(channels, dtype=np.int32)
            for xp in range(w):
                left = (cur[xp] + ((left + up[xp]) >> 1)) & 0xFF
                cur[xp] = left
            row = cur.astype(np.uint8).reshape(stride)
        elif ftype == 4:      # Paeth predictor
            cur = row.reshape(w, channels).astype(np.int32)
            up = prev.reshape(w, channels).astype(np.int32)
            a = np.zeros(channels, dtype=np.int32)   # left
            c = np.zeros(channels, dtype=np.int32)   # upper-left
            for xp in range(w):
                b = up[xp]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a,
                                np.where(pb <= pc, b, c))
                a = (cur[xp] + pred) & 0xFF
                cur[xp] = a
                c = b
            row = cur.astype(np.uint8).reshape(stride)
        else:
            return None
        out[y] = row
        prev = out[y]
    return w, h, out.reshape(h, w, channels)


def write_png(arr: "np.ndarray") -> bytes:
    """Encode an HxWxC uint8 array (C in 1/2/3/4) as a non-interlaced
    8-bit PNG with filter-0 rows — the inverse of :func:`parse_png`,
    stdlib only (``zlib`` deflate + crc32)."""
    h, w = arr.shape[:2]
    channels = arr.shape[2] if arr.ndim == 3 else 1
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + ctype + data
                + zlib.crc32(ctype + data).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, color_type, 0, 0, 0]))
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Image decode + feature extraction.

    REAL for netpbm (P6/P5), uncompressed 24-bit BMP, non-interlaced
    8-bit PNG, and baseline or progressive JPEG: ``[width, height,
    mean_c1..mean_cN]`` from the decoded raster. Remaining formats
    (arithmetic/12-bit JPEG, interlaced PNG, GIF/TIFF/WebP, ...) need
    PIL (absent here) and raise NotImplementedError. ``fake=True``
    derives a deterministic 4-dim feature from the raw bytes instead
    of decoding."""
    if fake:
        if payload is None or len(payload) == 0:
            return [0.0, 0.0, 0.0, 0.0]
        n = len(payload)
        return [float(n), float(payload[0]), float(payload[-1]),
                float(sum(payload[:16]) % 256)]
    from dynamic_etl_pipeline_thesis_ii_spark.operators.jpeg import parse_jpeg
    parsed = (parse_netpbm(payload) or parse_bmp(payload)
              or parse_png(payload) or parse_jpeg(payload))
    if parsed is not None:
        w, h, arr = parsed
        means = arr.reshape(-1, arr.shape[2]).mean(axis=0)
        return [float(w), float(h)] + [round(float(m), 6) for m in means]
    raise NotImplementedError(
        "image decoding beyond netpbm/BMP/PNG/JPEG(SOF0/1/2) requires "
        "PIL; not available here")


FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("feat", ArrayType(DoubleType()), True),
    # decode provenance: which decoder actually produced ``feat`` —
    # 'netpbm' / 'bmp' / 'png' / 'jpeg' / 'wav' (real parses) or 'fake'
    # (deterministic byte features: fake mode, or real mode's
    # undecodable fallback). Without this a downstream consumer cannot
    # tell a real feature from a placeholder.
    StructField("decoder", StringType(), True),
])


def extract_features(media: DataFrame, batch_hint: int = 1024,
                     mode: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow streams
    partition-sized batches; the kernel never materializes more than one
    batch of payloads, so executor memory is bounded by batch size, not
    partition size.

    ``mode="fake"`` (default, used by the oracle-checked plumbing
    queries) derives deterministic byte features; ``mode="real"``
    dispatches per kind to the REAL decoders (netpbm/BMP images, PCM WAV
    audio) and falls back to the byte features for formats those can't
    parse. Every row's ``decoder`` column records which path produced
    its features, so fallbacks are visible, not silent."""
    if mode not in ("fake", "real"):
        raise ValueError(f"mode must be 'fake' or 'real', got {mode!r}")

    def one(kind, payload):
        if mode == "real" and payload is not None:
            try:
                p = bytes(payload)
                if kind == "audio":
                    return decode_audio(p), "wav"
                name = ("netpbm" if p[:2] in (b"P6", b"P5")
                        else "png" if p[:8] == PNG_SIG
                        else "jpeg" if p[:2] == b"\xFF\xD8" else "bmp")
                return decode_image(p), name
            except Exception:  # noqa: BLE001 — one undecodable file
                # (wrong format, truncated WAV, malformed header) must
                # fall back, never fail the whole job
                pass
        return decode_image(payload, fake=True), "fake"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            done = [one(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["n_bytes"],
                "feat": [f for f, _ in done],
                "decoder": [d for _, d in done],
            })

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def decode_audio(payload: bytes, fake: bool = False) -> list[float]:
    """Audio decode + feature extraction.

    REAL for PCM WAV (stdlib ``wave``): ``[duration_sec, sample_rate,
    n_channels, rms]`` with RMS computed over the int16 samples.
    Compressed formats need librosa (absent here) and raise
    NotImplementedError. ``fake=True`` derives a deterministic 2-dim
    byte feature instead."""
    if fake:
        if payload is None or len(payload) == 0:
            return [0.0, 0.0]
        return [float(len(payload)), float(sum(payload[:8]) % 97)]
    if payload is not None and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        with wave.open(io.BytesIO(payload)) as wav:
            rate, channels = wav.getframerate(), wav.getnchannels()
            n_frames, width = wav.getnframes(), wav.getsampwidth()
            frames = wav.readframes(n_frames)
        duration = n_frames / float(rate) if rate else 0.0
        if width == 2 and frames:
            samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
            rms = float(np.sqrt(np.mean(samples ** 2)))
        else:  # non-16-bit PCM: amplitude stats over raw bytes
            samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
            rms = float(np.sqrt(np.mean(samples ** 2))) if len(samples) else 0.0
        return [round(duration, 6), float(rate), float(channels),
                round(rms, 6)]
    raise NotImplementedError(
        "non-WAV audio decoding requires librosa; not available here")


def write_wav(samples: "np.ndarray", rate: int, channels: int = 1) -> bytes:
    """Encode int16 PCM samples (1-D interleaved, or (n, channels)) as
    a WAV payload — the inverse of :func:`decode_audio`'s parse, stdlib
    ``wave`` only."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 2:
        channels = arr.shape[1]
        arr = arr.reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wav:
        wav.setnchannels(channels)
        wav.setsampwidth(2)
        wav.setframerate(rate)
        wav.writeframes(arr.tobytes())
    return buf.getvalue()


def resample_wav(payload: bytes, target_rate: int) -> bytes:
    """REAL linear-interpolation resample for 16-bit PCM WAV payloads,
    re-encoded as WAV at ``target_rate``; raises NotImplementedError
    for non-WAV/non-16-bit payloads (librosa territory)."""
    if not (payload is not None and payload[:4] == b"RIFF"
            and payload[8:12] == b"WAVE"):
        raise NotImplementedError(
            "non-WAV audio resample requires librosa; not available here")
    with wave.open(io.BytesIO(payload)) as wav:
        rate, channels = wav.getframerate(), wav.getnchannels()
        n_frames, width = wav.getnframes(), wav.getsampwidth()
        frames = wav.readframes(n_frames)
    if width != 2:
        raise NotImplementedError(
            "non-16-bit PCM resample requires librosa; not available here")
    if target_rate <= 0:
        raise ValueError(f"target_rate must be positive, got {target_rate}")
    x = (np.frombuffer(frames, dtype="<i2")
         .reshape(-1, channels).astype(np.float64))
    n_in = x.shape[0]
    n_out = max(1, int(round(n_in * target_rate / rate))) if n_in else 0
    if n_in == 0:
        return write_wav(np.zeros((0, channels), dtype="<i2"), target_rate,
                         channels)
    pos = np.linspace(0.0, n_in - 1, n_out)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (pos - lo)[:, None]
    y = x[lo] * (1.0 - frac) + x[hi] * frac
    out = np.clip(np.round(y), -32768, 32767).astype("<i2")
    return write_wav(out, target_rate, channels)


def resample_audio(media: DataFrame, target_rate: int = 16_000) -> DataFrame:
    """Binary -> binary audio resample kernel (1:1 rows), the audio
    twin of :func:`resize_images`: 16-bit PCM WAV payloads get the REAL
    linear-interp resample; anything else falls back to a deterministic
    truncate-or-pad (the librosa slot). Schema contract: payload stays
    BinaryType, the target rate is recorded as metadata."""
    out_schema = StructType(MEDIA_SCHEMA.fields + [
        StructField("sample_rate", LongType(), True),
    ])

    def one(p):
        if p is None:
            return None
        b = bytes(p)
        try:
            return resample_wav(b, target_rate)
        except Exception:  # noqa: BLE001 — undecodable: librosa slot
            return b[:target_rate] if len(b) >= target_rate \
                else b + b"\x00" * (target_rate - len(b))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resampled = [one(p) for p in pdf["payload"]]
            out = pdf.copy()
            out["payload"] = resampled
            out["n_bytes"] = [len(p) if p is not None else 0
                              for p in resampled]
            out["sample_rate"] = target_rate
            yield out

    return media.mapInPandas(kernel, schema=out_schema)


def resize_netpbm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for P6/P5 payloads, re-encoded to
    the same format; raises NotImplementedError for other formats
    (PIL territory)."""
    parsed = parse_netpbm(payload)
    if parsed is None:
        raise NotImplementedError(
            "non-netpbm image resize requires PIL; not available here")
    w, h, arr = parsed
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    out = arr[rows][:, cols]
    magic = b"P6" if arr.shape[2] == 3 else b"P5"
    return (magic + b"\n" + f"{width} {height}\n255\n".encode()
            + out.tobytes())


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for uncompressed 24-bit BMP
    payloads, re-encoded as BMP; raises NotImplementedError for other
    formats (PIL territory)."""
    parsed = parse_bmp(payload)
    if parsed is None:
        raise NotImplementedError(
            "non-BMP image resize requires PIL; not available here")
    w, h, arr = parsed
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return write_bmp(arr[rows][:, cols])


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for non-interlaced 8-bit PNG
    payloads, re-encoded as PNG; raises NotImplementedError for other
    formats (PIL territory)."""
    parsed = parse_png(payload)
    if parsed is None:
        raise NotImplementedError(
            "non-PNG image resize requires PIL; not available here")
    w, h, arr = parsed
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return write_png(arr[rows][:, cols])


def resize_jpeg(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for baseline JPEG payloads,
    re-encoded as baseline 4:4:4 JPEG; raises NotImplementedError for
    other formats (PIL territory)."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.jpeg import (
        parse_jpeg, write_jpeg,
    )
    parsed = parse_jpeg(payload)
    if parsed is None:
        raise NotImplementedError(
            "non-baseline-JPEG image resize requires PIL; not available here")
    w, h, arr = parsed
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    out = arr[rows][:, cols]
    return write_jpeg(out[..., 0] if out.shape[2] == 1 else out)


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  ) -> DataFrame:
    """Binary -> binary image resize kernel (1:1 rows). netpbm, 24-bit
    BMP, 8-bit PNG and baseline JPEG payloads get the REAL
    nearest-neighbor resize;
    anything else falls back to a deterministic truncate-or-pad of the
    payload to width*height bytes (the PIL slot). Either way the schema
    contract (payload stays BinaryType, dims recorded as metadata) and
    batch shape hold."""
    target = width * height

    out_schema = StructType(MEDIA_SCHEMA.fields + [
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ])

    def one(p):
        if p is None:
            return None
        b = bytes(p)
        for real in (resize_netpbm, resize_bmp, resize_png, resize_jpeg):
            try:
                return real(b, width, height)
            except NotImplementedError:
                continue
            except Exception:  # noqa: BLE001 — a malformed payload that
                # passed a decoder's magic check must fall back, never
                # fail the whole mapInPandas task (same invariant as
                # extract_features' kernel)
                break
        return (b[:target] if len(b) >= target
                else b + b"\x00" * (target - len(b)))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [one(p) for p in pdf["payload"]]
            out = pdf.copy()
            out["payload"] = resized
            out["n_bytes"] = [len(p) if p is not None else 0 for p in resized]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(kernel, schema=out_schema)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("frame", BinaryType(), True),
])


def sample_frames(media: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling as a 1->N mapInPandas kernel: each payload
    yields up to ``max_frames`` evenly-spaced 'frames' (STUB: fixed-size
    byte slices stand in for real ffmpeg frame extraction). Demonstrates
    the row-expanding batch shape — output batches are not 1:1 with
    input batches, which is exactly what mapInPandas (vs pandas_udf)
    exists for."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(p[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(
        kernel, schema=FRAME_SCHEMA)
