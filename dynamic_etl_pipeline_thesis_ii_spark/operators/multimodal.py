"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels.

Decode support is tiered by what this environment can honestly do:

- REAL, stdlib-only decoders for PPM/PGM images (pure byte parsing +
  numpy), uncompressed 24-bit BMP, 8-bit PNG (non-interlaced AND
  Adam7; ``zlib`` inflate + the five per-row filters), baseline AND
  progressive JPEG (huffman entropy decode + batched IDCT,
  ``operators/jpeg.py``), GIF87a/89a (variable-width LZW, interlace,
  global/local palettes), uncompressed strip TIFF (both byte orders)
  and WAV audio — PCM via the ``wave`` module plus REAL G.711
  mu-law/A-law and IMA-ADPCM decoders (format tags 7/6/0x11, pure
  integer table math, audioop-differential-tested) — parse,
  feature-extract and nearest-neighbor resize with no external
  libraries;
- REAL lossless-WebP decode (full VP8L bitstream: canonical prefix
  codes, LZ77 + color cache, meta prefix codes, all four inverse
  transforms — ``operators/vp8l.py``, provenance ``vp8l``), with the
  metadata walk as the lossy-VP8 fallback;
- a REAL metadata tier for MPEG audio (MP1/MP2/MP3 frame-header
  walk, provenance ``mp3meta``), FLAC (STREAMINFO, ``flacmeta``),
  Ogg Opus/Vorbis (page walk to the last granule, ``oggmeta``),
  lossy WebP (RIFF chunk walk over VP8/VP8X, ``webpmeta``),
  ISO-BMFF video (MP4/MOV/M4A box-tree walk giving duration /
  dimensions / track census / codec fourccs, ``mp4meta``) and AVI
  (hdrl walk, ``avimeta``) — plus a REAL video SAMPLE tier for the
  two AVI codecs this environment can honestly decode: uncompressed
  DIB and MJPEG (``avi_frames``, each MJPEG frame through
  ``operators/jpeg.py``), feeding real frame sampling and the
  perceptual video hash ``vhash64``. The compressed samples of
  inter-frame video / MP3/FLAC/Ogg audio, and remaining formats
  (arithmetic-coded JPEG, ...), raise NotImplementedError unless
  ``fake=True`` (librosa/ffmpeg are not available in this sandbox;
  swapping them in later only changes
  the kernel body);
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
    """Parse uncompressed 24-bit OR 8-bit palette-indexed BMP
    (BITMAPINFOHEADER or longer, bottom-up or top-down) into (width,
    height, HxWx3 uint8 RGB array). Pure byte parsing: little-endian
    header fields, 4-byte row padding, BGRA color table / BGR->RGB
    swap. Returns None if the payload is not a BMP this decoder
    handles (1/4/16/32-bit and RLE variants stay PIL territory)."""
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
    if planes != 1 or bpp not in (8, 24) or comp != 0 or w <= 0 or h == 0:
        return None
    top_down, height = h < 0, abs(h)
    bypp = bpp // 8
    stride = (w * bypp + 3) // 4 * 4
    data = payload[offset:offset + stride * height]
    if len(data) != stride * height:
        return None
    rows = (np.frombuffer(data, dtype=np.uint8)
            .reshape(height, stride)[:, :w * bypp])
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # color table: BGRA quads between the info header and pixels
        used = int.from_bytes(payload[46:50], "little") or 256
        tbl = payload[14 + hdr_size:14 + hdr_size + 4 * used]
        if len(tbl) < 4 * used or int(rows.max(initial=0)) >= used:
            return None
        pal = (np.frombuffer(tbl, dtype=np.uint8)
               .reshape(used, 4)[:, :3][:, ::-1])      # BGRA -> RGB
        return w, height, pal[rows]
    rows = rows.reshape(height, w, 3)
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
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/px


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(raw: bytes, pos: int, w: int, h: int,
                  channels: int) -> Optional[tuple["np.ndarray", int]]:
    """Undo the five per-row filters for one (sub-)image of ``h``
    scanlines of ``w`` pixels starting at byte ``pos``; returns the
    (h, w*channels) array and the position after the last scanline.

    Cost note: none/up/sub are fully vectorized (sub is a per-channel-
    lane prefix sum — mod-256 distributes over addition); average/
    Paeth carry a true left-to-right data dependence (floor and argmin
    break linearity), so they run a per-PIXEL loop vectorized across
    channels — w iterations, not w*channels."""
    stride = w * channels
    if len(raw) < pos + h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
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
    return out, pos


def parse_png(payload: bytes) -> Optional[tuple[int, int, "np.ndarray"]]:
    """Parse 8- or 16-bit-depth PNG (grayscale / RGB / gray+alpha /
    RGBA / 8-bit PALETTE-indexed, non-interlaced OR Adam7-interlaced;
    16-bit samples reduce to their high byte) into (width,
    height, HxWxC uint8 array) with stdlib only: chunk walk, ``zlib``
    inflate of the concatenated IDAT stream, then the five per-row
    filters (none/sub/up/average/Paeth) undone exactly per the PNG
    spec §9 — for Adam7, per pass (each pass is an independently-
    filtered sub-image, spec §8.2). Palette images resolve through
    the PLTE chunk to RGB. Returns None for payloads this decoder
    does not handle (16-bit palette, sub-byte depths, non-PNG) —
    callers fall through to the next decoder or the fake tier."""
    if payload is None or payload[:8] != PNG_SIG:
        return None
    i, n = 8, len(payload)
    w = h = channels = None
    interlaced = False
    palette = None
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
            interlaced = interlace == 1
            if (bit_depth not in (8, 16) or comp != 0 or filt != 0
                    or (bit_depth == 16 and color_type == 3)
                    or interlace not in (0, 1)
                    or channels is None or w <= 0 or h <= 0):
                return None
        elif ctype == b"PLTE":
            if length % 3 or length > 768:
                return None
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
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
    # the five filters operate on BYTE lanes with a bytes-per-pixel
    # left offset (PNG spec §9), so 16-bit depth is the same unfilter
    # with bpp = 2*channels, then a big-endian high-byte reduction
    bpp = channels * (2 if bit_depth == 16 else 1)

    def finish(arr):
        if bit_depth == 16:
            arr = arr.reshape(*arr.shape[:2], channels, 2)[..., 0]
        if color_type == 3:
            if palette is None or int(arr.max(initial=0)) >= len(palette):
                return None
            return w, h, palette[arr[..., 0]]
        return w, h, np.ascontiguousarray(arr)

    if not interlaced:
        got = _png_unfilter(raw, 0, w, h, bpp)
        if got is None or got[1] != len(raw):
            return None
        return finish(got[0].reshape(h, w, bpp))
    # Adam7: seven independently-filtered sub-images scattered back
    # onto the (dy, dx) grids
    out = np.empty((h, w, bpp), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        got = _png_unfilter(raw, pos, pw, ph, bpp)
        if got is None:
            return None
        sub, pos = got
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
    if pos != len(raw):
        return None
    return finish(out)


def write_png(arr: "np.ndarray", interlace: bool = False) -> bytes:
    """Encode an HxWxC uint8 array (C in 1/2/3/4) as an 8-bit PNG with
    filter-0 rows — the inverse of :func:`parse_png`, stdlib only
    (``zlib`` deflate + crc32). ``interlace=True`` emits Adam7 pass
    ordering (the decoder-fixture generator for interlaced files)."""
    h, w = arr.shape[:2]
    channels = arr.shape[2] if arr.ndim == 3 else 1
    arr3 = arr.reshape(h, w, channels)
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr3[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts += [b"\x00" + sub[y].tobytes()
                      for y in range(sub.shape[0])]
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + arr3[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + ctype + data
                + zlib.crc32(ctype + data).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, color_type, 0, 0, 1 if interlace else 0]))
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# GIF (87a/89a): LZW-compressed, palette-indexed; first frame decoded
# ---------------------------------------------------------------------------

def _gif_lzw_decode(data: bytes, min_code_size: int,
                    npix: int) -> Optional[bytes]:
    """GIF-variant LZW (LSB-first variable-width codes, clear/EOI,
    12-bit cap) -> index stream of at most ``npix`` pixels."""
    if not 2 <= min_code_size <= 8:
        return None
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    code_size = min_code_size + 1
    next_code = eoi + 1
    out = bytearray()
    prev: Optional[bytes] = None
    pos_bit, total_bits = 0, len(data) * 8
    while pos_bit + code_size <= total_bits and len(out) < npix:
        bi = pos_bit >> 3
        chunk = int.from_bytes(data[bi:bi + 4], "little")
        code = (chunk >> (pos_bit & 7)) & ((1 << code_size) - 1)
        pos_bit += code_size
        if code == clear:
            table = dict(base)
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]       # the KwKwK case
            else:
                return None
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out += entry
        prev = entry
    return bytes(out[:npix])


def _gif_lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`_gif_lzw_decode` (real string-table LZW with
    clear-on-full); the fixture generator for the GIF decoder."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    code_size = min_code_size + 1
    next_code = eoi + 1
    emit(clear, code_size)
    w = b""
    for px in pixels:
        wc = w + bytes([px])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # encoder is one insert ahead of the decoder, so it widens
            # one entry later (at 2^n + 1, where the decoder widens at
            # its own 2^n) — the codes stay in lockstep
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        w = bytes([px])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_interlace_order(h: int) -> list[int]:
    """Destination row index, in storage order, of an interlaced
    frame's scanlines (GIF89a appendix E four-pass layout)."""
    return ([*range(0, h, 8)] + [*range(4, h, 8)]
            + [*range(2, h, 4)] + [*range(1, h, 2)])


def parse_gif(payload: bytes) -> Optional[tuple[int, int, "np.ndarray"]]:
    """Decode the FIRST frame of a GIF87a/89a into (width, height,
    HxWx3 uint8 RGB) with stdlib only: logical-screen + image
    descriptors (including frames positioned at a left/top offset
    inside a larger logical screen — composited onto a background-
    color canvas, as a viewer shows them), global/local color tables,
    variable-width LZW, optional interlaced row order. Extensions
    (GCE, comments, application) are skipped; later frames ignored.
    None for non-GIF / malformed payloads.

    Transparency contract: GCE-transparent pixels composite onto the
    file's background-color index (what a first-frame viewer shows).
    Consequence for downstream features: channel means of transparent
    GIFs FOLLOW the file's background slot — a saturated bg_index
    tints them, deterministically and per the file's own declaration.
    A fixed neutral fill would instead diverge from every rendered
    view of the same file; we keep the viewer-faithful choice and
    document it here."""
    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        sw = int.from_bytes(payload[6:8], "little")
        sh = int.from_bytes(payload[8:10], "little")
        packed = payload[10]
        bg_index = payload[11]
        i = 13
        gct = None
        if packed & 0x80:
            ncol = 2 << (packed & 0x07)
            gct = np.frombuffer(payload[i:i + 3 * ncol],
                                dtype=np.uint8).reshape(ncol, 3)
            i += 3 * ncol
        trans_idx = None
        while i < len(payload):
            b = payload[i]
            if b == 0x3B:                       # trailer
                return None
            if b == 0x21:                       # extension
                # GCE (0xF9): remember the transparent index for the
                # next image descriptor; everything else is skipped
                if (payload[i + 1] == 0xF9 and payload[i + 2] >= 4
                        and payload[i + 3] & 0x01):
                    trans_idx = payload[i + 6]
                i += 2
                while i < len(payload) and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
                continue
            if b != 0x2C:                       # image descriptor expected
                return None
            left = int.from_bytes(payload[i + 1:i + 3], "little")
            top = int.from_bytes(payload[i + 3:i + 5], "little")
            w = int.from_bytes(payload[i + 5:i + 7], "little")
            h = int.from_bytes(payload[i + 7:i + 9], "little")
            ipacked = payload[i + 9]
            i += 10
            pal = gct
            if ipacked & 0x80:                  # local color table
                ncol = 2 << (ipacked & 0x07)
                pal = np.frombuffer(payload[i:i + 3 * ncol],
                                    dtype=np.uint8).reshape(ncol, 3)
                i += 3 * ncol
            cw = max(sw, left + w)              # canvas; tolerate a
            ch = max(sh, top + h)               # lying screen size
            if pal is None or w <= 0 or h <= 0 or cw * ch > 1 << 26:
                return None
            min_code = payload[i]
            i += 1
            data = bytearray()
            while i < len(payload) and payload[i] != 0:
                n = payload[i]
                data += payload[i + 1:i + 1 + n]
                i += 1 + n
            idx = _gif_lzw_decode(bytes(data), min_code, w * h)
            if idx is None or len(idx) < w * h:
                return None
            rows = np.frombuffer(idx, dtype=np.uint8).reshape(h, w)
            if ipacked & 0x40:                  # interlaced row order
                deinter = np.empty_like(rows)
                deinter[_gif_interlace_order(h)] = rows
                rows = deinter
            if rows.max(initial=0) >= len(pal):
                return None
            # the background color index addresses the GLOBAL color
            # table (GIF89a §18), not the frame's local one
            bg = (gct[bg_index] if gct is not None
                  and bg_index < len(gct) else np.zeros(3, np.uint8))
            rgb = pal[rows]                  # advanced indexing: fresh
            if trans_idx is not None:            # array, safe to mutate
                rgb[rows == trans_idx] = bg      # GCE: bg shows through
            if (left, top, cw, ch) == (0, 0, w, h):
                return w, h, rgb
            canvas = np.broadcast_to(bg, (ch, cw, 3)).copy()
            canvas[top:top + h, left:left + w] = rgb
            return cw, ch, canvas
        return None
    except (IndexError, ValueError):
        return None


def gif_frames(payload: bytes, max_frames: int = 8,
               hard_cap: int = 512) -> Optional[list]:
    """Up to ``max_frames`` evenly-spaced COMPOSITED frames of an
    animated GIF as ``(width, height, HxWx3 uint8)`` rasters — the
    GIF container's entry into the video tier (:func:`video_frames`).

    Real GIF89a animation semantics, not per-descriptor rasters:
    every image descriptor paints its (left, top, w, h) rect onto the
    running canvas with GCE transparency holes leaving the underlying
    pixels visible, and the GCE DISPOSAL method is honored between
    frames (1/none: leave; 2: restore the rect to the background
    color; 3: restore the whole canvas to its pre-frame state), so a
    delta-encoded animation yields what a viewer shows at each step.
    All frames up to ``hard_cap`` must be decoded to composite
    correctly (deltas chain) — the cap bounds adversarial payloads;
    sampling then picks ``max_frames`` by frame index. None for
    non-GIF / zero decodable frames."""
    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        sw = int.from_bytes(payload[6:8], "little")
        sh = int.from_bytes(payload[8:10], "little")
        packed = payload[10]
        bg_index = payload[11]
        i = 13
        gct = None
        if packed & 0x80:
            ncol = 2 << (packed & 0x07)
            gct = np.frombuffer(payload[i:i + 3 * ncol],
                                dtype=np.uint8).reshape(ncol, 3)
            i += 3 * ncol
        bg = (gct[bg_index] if gct is not None and bg_index < len(gct)
              else np.zeros(3, np.uint8))
        canvas = None
        trans_idx, disposal = None, 0
        frames = []
        while i < len(payload) and len(frames) < hard_cap:
            b = payload[i]
            if b == 0x3B:
                break
            if b == 0x21:
                if (payload[i + 1] == 0xF9 and payload[i + 2] >= 4):
                    gpacked = payload[i + 3]
                    disposal = (gpacked >> 2) & 0x7
                    trans_idx = (payload[i + 6] if gpacked & 0x01
                                 else None)
                i += 2
                while i < len(payload) and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
                continue
            if b != 0x2C:
                break
            left = int.from_bytes(payload[i + 1:i + 3], "little")
            top = int.from_bytes(payload[i + 3:i + 5], "little")
            w = int.from_bytes(payload[i + 5:i + 7], "little")
            h = int.from_bytes(payload[i + 7:i + 9], "little")
            ipacked = payload[i + 9]
            i += 10
            pal = gct
            if ipacked & 0x80:
                ncol = 2 << (ipacked & 0x07)
                pal = np.frombuffer(payload[i:i + 3 * ncol],
                                    dtype=np.uint8).reshape(ncol, 3)
                i += 3 * ncol
            cw = max(sw, left + w)
            ch = max(sh, top + h)
            if pal is None or w <= 0 or h <= 0 or cw * ch > 1 << 26:
                break
            min_code = payload[i]
            i += 1
            data = bytearray()
            while i < len(payload) and payload[i] != 0:
                n = payload[i]
                data += payload[i + 1:i + 1 + n]
                i += 1 + n
            i += 1                              # block terminator
            idx = _gif_lzw_decode(bytes(data), min_code, w * h)
            if idx is None or len(idx) < w * h:
                break
            rows = np.frombuffer(idx, dtype=np.uint8).reshape(h, w)
            if ipacked & 0x40:
                deinter = np.empty_like(rows)
                deinter[_gif_interlace_order(h)] = rows
                rows = deinter
            if rows.max(initial=0) >= len(pal):
                break
            if canvas is None:
                canvas = np.broadcast_to(bg, (ch, cw, 3)).copy()
            elif canvas.shape[0] < ch or canvas.shape[1] < cw:
                grown = np.broadcast_to(
                    bg, (max(ch, canvas.shape[0]),
                         max(cw, canvas.shape[1]), 3)).copy()
                grown[:canvas.shape[0], :canvas.shape[1]] = canvas
                canvas = grown
            before = canvas.copy() if disposal == 3 else None
            rect = canvas[top:top + h, left:left + w]
            rgb = pal[rows]
            if trans_idx is not None:
                keep = rows == trans_idx        # holes: canvas shows
                rect[~keep] = rgb[~keep]
            else:
                rect[:] = rgb
            frames.append((canvas.shape[1], canvas.shape[0],
                           canvas.copy()))
            if disposal == 2:
                canvas[top:top + h, left:left + w] = bg
            elif disposal == 3 and before is not None:
                canvas = before
            trans_idx, disposal = None, 0
        if not frames:
            return None
        n = len(frames)
        if n > max_frames:
            # identical timeline-fraction sampling to avi_frames
            # (round, not floor) so a cross-container copy of one
            # clip samples the SAME timeline positions
            frames = [frames[round(k * (n - 1) / (max_frames - 1))]
                      for k in range(max_frames)]
        return frames
    except (IndexError, ValueError):
        return None


def _gif_quantize(arr: "np.ndarray"):
    """(palette-index rows HxW uint8, 256x3 palette) — the 6x7x6
    uniform-cube quantization shared by :func:`write_gif` and
    :func:`write_gif_anim` (gray input uses the exact 256-gray
    palette)."""
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[2] == 1:
        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        return arr[..., 0], pal
    r = (arr[..., 0].astype(int) * 6) // 256
    g = (arr[..., 1].astype(int) * 7) // 256
    b = (arr[..., 2].astype(int) * 6) // 256
    idx = (r * 42 + g * 6 + b).astype(np.uint8)
    rr, gg, bb = np.meshgrid(np.arange(6), np.arange(7), np.arange(6),
                             indexing="ij")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:252, 0] = (rr.ravel() * 256 + 128) // 6
    pal[:252, 1] = (gg.ravel() * 256 + 128) // 7
    pal[:252, 2] = (bb.ravel() * 256 + 128) // 6
    return idx, pal


def write_gif_anim(frames: list, delay_cs: int = 10,
                   disposal: int = 1) -> bytes:
    """Spec-valid ANIMATED GIF89a from equal-sized HxWx3 uint8
    rasters — the fixture twin of :func:`gif_frames` (whole-frame
    updates, one GCE per frame carrying ``delay_cs`` and
    ``disposal``; the first frame's quantized palette is the global
    color table, per-frame rasters quantize through the same cube so
    compositing is raster-exact for decode tests)."""
    if not frames:
        raise ValueError("write_gif_anim needs at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]
    _, pal = _gif_quantize(np.asarray(frames[0]))
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])
    out += pal.tobytes()
    for fr in frames:
        a = np.asarray(fr)
        if a.shape[:2] != (h, w):
            raise ValueError("write_gif_anim frames must share one size")
        idx, _ = _gif_quantize(a)
        out += bytes([0x21, 0xF9, 0x04, (disposal & 0x7) << 2])
        out += int(delay_cs).to_bytes(2, "little") + b"\x00\x00"
        out += b"\x2C" + b"\x00" * 4
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x00])
        lzw = _gif_lzw_encode(idx.tobytes(), 8)
        out += bytes([8])
        for off in range(0, len(lzw), 255):
            blockb = lzw[off:off + 255]
            out += bytes([len(blockb)]) + blockb
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def write_gif(arr: "np.ndarray", interlace: bool = False) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a single-frame GIF89a with a
    256-color uniform palette (nearest-color quantization) — the
    inverse-modulo-quantization of :func:`parse_gif` and its fixture
    generator. Gray input (HxW / HxWx1) uses an exact 256-gray
    palette."""
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w = arr.shape[:2]
    if arr.shape[2] == 1:
        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        idx = arr[..., 0]
    else:
        # 6x7x6 uniform RGB cube (252 colors): index = 42r + 6g + b
        r = (arr[..., 0].astype(int) * 6) // 256
        g = (arr[..., 1].astype(int) * 7) // 256
        b = (arr[..., 2].astype(int) * 6) // 256
        idx = (r * 42 + g * 6 + b).astype(np.uint8)
        rr, gg, bb = np.meshgrid(np.arange(6), np.arange(7), np.arange(6),
                                 indexing="ij")
        pal = np.zeros((256, 3), dtype=np.uint8)
        pal[:252, 0] = (rr.ravel() * 256 + 128) // 6
        pal[:252, 1] = (gg.ravel() * 256 + 128) // 7
        pal[:252, 2] = (bb.ravel() * 256 + 128) // 6
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])           # GCT, 256 entries
    out += pal.tobytes()
    out += b"\x2C" + b"\x00" * 4
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    rows = idx
    if interlace:
        rows = idx[_gif_interlace_order(h)]
    lzw = _gif_lzw_encode(rows.tobytes(), 8)
    out += bytes([8])                           # LZW min code size
    for off in range(0, len(lzw), 255):
        blockb = lzw[off:off + 255]
        out += bytes([len(blockb)]) + blockb
    out += b"\x00\x3B"
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (baseline, uncompressed strips, 8-bit gray / RGB, II + MM)
# ---------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}            # BYTE, SHORT, LONG


def _tiff_lzw_decode(data: bytes, max_out: int) -> Optional[bytes]:
    """TIFF-variant LZW (spec §13): MSB-first bit order, codes 256 =
    Clear / 257 = EOI, 9->12-bit growth with EARLY CHANGE (the width
    bumps one code sooner than GIF's variant)."""
    CLEAR, EOI = 256, 257
    base = {i: bytes([i]) for i in range(256)}
    table = dict(base)
    width, next_code = 9, 258
    out = bytearray()
    prev: Optional[bytes] = None
    pos, total = 0, len(data) * 8
    while pos + width <= total and len(out) < max_out:
        bi, off = divmod(pos, 8)
        chunk = int.from_bytes(data[bi:bi + 4].ljust(4, b"\x00"), "big")
        code = (chunk >> (32 - off - width)) & ((1 << width) - 1)
        pos += width
        if code == CLEAR:
            table = dict(base)
            width, next_code = 9, 258
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]        # KwKwK
            else:
                return None
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1                      # early change
        out += entry
        prev = entry
    return bytes(out[:max_out])


def _packbits_decode(data: bytes, max_out: int) -> Optional[bytes]:
    """TIFF PackBits RLE (spec §9): control byte 0..127 = copy n+1
    literals, 129..255 = repeat next byte 257-n times, 128 = no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < max_out:
        c = data[i]
        i += 1
        if c < 128:
            if i + c + 1 > n:
                return None
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out[:max_out])


def _packbits_encode_row(row: bytes) -> bytes:
    """Inverse of :func:`_packbits_decode` for ONE row (the spec
    requires each row to compress independently)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:                           # run of 2+ -> repeat op
            out += bytes([257 - (j - i), row[i]])
            i = j
            continue
        # literal stretch: until the next run of 3+ (2-runs inside a
        # literal cost nothing extra) or 128 bytes
        k = i + 1
        while k < n and k - i < 128:
            if k + 2 < n and row[k] == row[k + 1] == row[k + 2]:
                break
            k += 1
        out += bytes([k - i - 1]) + row[i:k]
        i = k
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Inverse of :func:`_tiff_lzw_decode` (fixture generator)."""
    CLEAR, EOI = 256, 257
    acc = nbits = 0
    out = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    width, next_code = 9, 258
    emit(CLEAR, width)
    w = b""
    for c in data:
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4094:
            table[wc] = next_code
            next_code += 1
            # the decoder's table lags one insert behind, so its
            # early-change bump at (1<<w)-1 lines up with the encoder
            # bumping at the natural 1<<w boundary
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            width, next_code = 9, 258
        w = bytes([c])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def parse_tiff(payload: bytes) -> Optional[tuple[int, int, "np.ndarray"]]:
    """Decode a baseline TIFF (8 bits/sample, 1 or 3 samples/pixel,
    chunky, any strip layout, little- or big-endian; uncompressed OR
    LZW with optional horizontal-differencing predictor — the common
    scanned-document layout) into (width, height, HxWxC uint8).
    Other compressions / tiled / planar / non-8-bit variants return
    None — callers fall through."""
    if payload is None or payload[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    bo = "little" if payload[:2] == b"II" else "big"
    try:
        ifd = int.from_bytes(payload[4:8], bo)
        n = int.from_bytes(payload[ifd:ifd + 2], bo)
        tags: dict[int, list[int]] = {}
        for e in range(n):
            off = ifd + 2 + 12 * e
            tag = int.from_bytes(payload[off:off + 2], bo)
            typ = int.from_bytes(payload[off + 2:off + 4], bo)
            cnt = int.from_bytes(payload[off + 4:off + 8], bo)
            size = _TIFF_TYPE_SIZE.get(typ)
            if size is None:
                continue
            if size * cnt <= 4:
                vals_raw = payload[off + 8:off + 8 + size * cnt]
            else:
                voff = int.from_bytes(payload[off + 8:off + 12], bo)
                vals_raw = payload[voff:voff + size * cnt]
            tags[tag] = [int.from_bytes(vals_raw[k * size:(k + 1) * size],
                                        bo) for k in range(cnt)]
        w = tags.get(256, [0])[0]
        h = tags.get(257, [0])[0]
        spp = tags.get(277, [1])[0]
        bits = tags.get(258, [8])
        compression = tags.get(259, [1])[0]
        photometric = tags.get(262, [1])[0]
        planar = tags.get(284, [1])[0]
        offsets = tags.get(273)
        counts = tags.get(279)
        predictor = tags.get(317, [1])[0]
        if (not offsets or w <= 0 or h <= 0 or w * h > 1 << 26
                or spp not in (1, 3) or any(b != 8 for b in bits)
                or compression not in (1, 5, 32773) or planar != 1
                or predictor not in (1, 2)
                # 0=WhiteIsZero, 1=BlackIsZero, 2=RGB; palette/CMYK/
                # YCbCr need PIL — reject rather than mis-decode
                or photometric not in (0, 1, 2)
                or (photometric == 2) != (spp == 3)):
            return None
        rps = tags.get(278, [h])[0] or h
        strip_rows = [min(rps, h - k * rps) for k in range(-(-h // rps))]
        if len(offsets) < len(strip_rows):
            return None
        if counts is None:
            counts = [len(payload)] * len(offsets)
        parts = []
        for k, nrows in enumerate(strip_rows):
            want = nrows * w * spp
            seg = payload[offsets[k]:offsets[k] + counts[k]]
            if compression in (5, 32773):
                dec = (_tiff_lzw_decode(seg, want) if compression == 5
                       else _packbits_decode(seg, want))
                if dec is None or len(dec) < want:
                    return None
                parts.append(dec)
            else:
                if len(seg) < want:
                    return None
                parts.append(seg[:want])
        arr = np.frombuffer(b"".join(parts), dtype=np.uint8)
        arr = arr.reshape(h, w, spp)
        if predictor == 2:      # horizontal differencing: per-row,
            arr = (arr.astype(np.uint32)          # per-channel prefix sum
                   .cumsum(axis=1) & 0xFF).astype(np.uint8)
        if photometric == 0:                     # WhiteIsZero: invert
            arr = 255 - arr
        return w, h, arr
    except (IndexError, ValueError):
        return None


def write_tiff(arr: "np.ndarray", rows_per_strip: int = 0,
               compression: str = "none",
               predictor: bool = False) -> bytes:
    """Encode HxWxC uint8 (C in 1/3) as a little-endian TIFF — the
    inverse of :func:`parse_tiff`. ``rows_per_strip > 0`` splits the
    image into multiple strips; ``compression="lzw"`` LZW-compresses
    each strip, optionally after horizontal differencing
    (``predictor=True``) — the decoder's fixture generators."""
    if arr.ndim == 2:
        arr = arr[..., None]
    if compression not in ("none", "lzw", "packbits"):
        raise ValueError(
            f"compression must be none/lzw/packbits, got {compression!r}")
    if predictor and compression != "lzw":
        raise ValueError("predictor requires lzw compression")
    h, w, c = arr.shape
    src = arr
    if predictor:
        diff = src.astype(np.int16)
        diff[:, 1:] = (diff[:, 1:] - diff[:, :-1]) & 0xFF
        src = diff.astype(np.uint8)
    rps = rows_per_strip if rows_per_strip > 0 else h
    if compression == "packbits":
        # each ROW compresses independently (TIFF spec §9)
        strips = [b"".join(_packbits_encode_row(src[y].tobytes())
                           for y in range(y0, min(y0 + rps, h)))
                  for y0 in range(0, h, rps)]
    else:
        strips = [src[y:y + rps].tobytes() for y in range(0, h, rps)]
        if compression == "lzw":
            strips = [_tiff_lzw_encode(s) for s in strips]
    nstrips = len(strips)

    # layout: header(8) | strip data | [bits-per-sample array]
    #         | strip offset/count arrays | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    bps_off = pos
    if c == 3:
        pos += 6                                 # 3 SHORTs
    arrays_off = pos
    ext: list[tuple[int, bytes]] = []
    if nstrips > 2:                              # arrays spill out of IFD
        off_arr = b"".join(o.to_bytes(4, "little") for o in strip_offsets)
        cnt_arr = b"".join(len(s).to_bytes(4, "little") for s in strips)
        ext = [(arrays_off, off_arr),
               (arrays_off + len(off_arr), cnt_arr)]
        pos += len(off_arr) + len(cnt_arr)
    ifd_off = pos

    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        size = _TIFF_TYPE_SIZE[typ]
        body = val.to_bytes(size, "little") if size * cnt <= 4 \
            else val.to_bytes(4, "little")
        return (tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
                + cnt.to_bytes(4, "little") + body.ljust(4, b"\x00"))

    entries = [entry(256, 4, 1, w), entry(257, 4, 1, h)]
    if c == 3:
        entries.append(entry(258, 3, 3, bps_off))   # pointer to 3 SHORTs
    else:
        entries.append(entry(258, 3, 1, 8))
    entries.append(entry(259, 3, 1, {"none": 1, "lzw": 5,
                                     "packbits": 32773}[compression]))
    if predictor:
        entries.append(entry(317, 3, 1, 2))
    entries.append(entry(262, 3, 1, 2 if c == 3 else 1))
    if nstrips > 2:
        entries.append(entry(273, 4, nstrips, ext[0][0]))
    elif nstrips == 2:
        # two LONGs don't fit inline; reuse the ext area
        ext = [(arrays_off, b"".join(o.to_bytes(4, "little")
                                     for o in strip_offsets)),
               (arrays_off + 8, b"".join(len(s).to_bytes(4, "little")
                                         for s in strips))]
        ifd_off = arrays_off + 16
        entries.append(entry(273, 4, 2, ext[0][0]))
    else:
        entries.append(entry(273, 4, 1, strip_offsets[0]))
    entries.append(entry(277, 3, 1, c))
    entries.append(entry(278, 4, 1, rps))
    if nstrips > 2:
        entries.append(entry(279, 4, nstrips, ext[1][0]))
    elif nstrips == 2:
        entries.append(entry(279, 4, 2, ext[1][0]))
    else:
        entries.append(entry(279, 4, 1, len(strips[0])))
    entries.sort(key=lambda e: int.from_bytes(e[:2], "little"))

    out = bytearray(b"II*\x00" + ifd_off.to_bytes(4, "little"))
    for s in strips:
        out += s
    if c == 3:
        out += (8).to_bytes(2, "little") * 3
    for off, data in ext:
        assert len(out) == off, (len(out), off)
        out += data
    out += len(entries).to_bytes(2, "little")
    for e in entries:
        out += e
    out += b"\x00" * 4                           # no next IFD
    return bytes(out)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Image decode + feature extraction.

    REAL for netpbm (P6/P5), uncompressed 24-bit BMP, 8/16-bit PNG
    (non-interlaced, Adam7 or palette), baseline or progressive JPEG, GIF
    (LZW, first frame) and uncompressed TIFF: ``[width, height,
    mean_c1..mean_cN]`` from the decoded raster. Remaining formats
    (arithmetic-coded JPEG, WebP, ...) need PIL (absent
    here) and raise NotImplementedError. ``fake=True`` derives a
    deterministic 4-dim feature from the raw bytes instead of
    decoding."""
    if fake:
        if payload is None or len(payload) == 0:
            return [0.0, 0.0, 0.0, 0.0]
        n = len(payload)
        return [float(n), float(payload[0]), float(payload[-1]),
                float(sum(payload[:16]) % 256)]
    from dynamic_etl_pipeline_thesis_ii_spark.operators.jpeg import parse_jpeg
    from dynamic_etl_pipeline_thesis_ii_spark.operators.vp8l import parse_vp8l
    parsed = (parse_netpbm(payload) or parse_bmp(payload)
              or parse_png(payload) or parse_jpeg(payload)
              or parse_gif(payload) or parse_tiff(payload)
              or parse_vp8l(payload))
    if parsed is not None:
        w, h, arr = parsed
        means = arr.reshape(-1, arr.shape[2]).mean(axis=0)
        return [float(w), float(h)] + [round(float(m), 6) for m in means]
    raise NotImplementedError(
        "image decoding beyond netpbm/BMP/PNG/JPEG(SOF0/1/2)/GIF/TIFF/"
        "VP8L requires PIL; not available here")


FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("feat", ArrayType(DoubleType()), True),
    # decode provenance: which decoder actually produced ``feat`` —
    # 'netpbm' / 'bmp' / 'png' / 'jpeg' / 'gif' / 'tiff' / 'wav' /
    # 'flac' (real parses) or 'fake'
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
                    try:
                        return decode_audio(p), \
                            ("flac" if p[:4] == b"fLaC" else "wav")
                    except NotImplementedError:
                        meta = parse_mp3_meta(p)
                        if meta is not None:
                            # metadata tier: same 4-dim shape as the
                            # WAV features, bitrate in the RMS slot
                            # (PCM decode is librosa territory)
                            return [meta["duration_sec"],
                                    meta["sample_rate"],
                                    meta["channels"],
                                    meta["bitrate_kbps"]], "mp3meta"
                        flac = parse_flac_meta(p)
                        if flac is not None:
                            return [flac["duration_sec"],
                                    flac["sample_rate"],
                                    flac["channels"],
                                    flac["bits_per_sample"]], "flacmeta"
                        ogg = parse_ogg_meta(p)
                        if ogg is None:
                            raise
                        return [ogg["duration_sec"],
                                ogg["sample_rate"], ogg["channels"],
                                0.0], "oggmeta"
                if kind == "video":
                    frames_ = avi_frames(p, max_frames=8)
                    if frames_ is None and p[:6] in (b"GIF87a",
                                                     b"GIF89a"):
                        # animated GIF on the same REAL sample tier
                        # (disposal-composited frames)
                        gf = gif_frames(p, max_frames=8)
                        if gf:
                            w0, h0 = gf[0][0], gf[0][1]
                            means = np.mean(
                                [fr.reshape(-1, fr.shape[2]).mean(
                                    axis=0)[:3] for _, _, fr in gf],
                                axis=0)
                            return ([float(w0), float(h0)]
                                    + [round(float(m), 6)
                                       for m in means]), "gifanim"
                    if frames_:
                        # REAL sample tier (DIB/MJPEG AVI): the image
                        # contract [w, h, channel means] averaged over
                        # the timeline-fraction frame sample
                        w0, h0 = frames_[0][0], frames_[0][1]
                        means = np.mean(
                            [fr.reshape(-1, fr.shape[2]).mean(axis=0)
                             [:3] for _, _, fr in frames_], axis=0)
                        return ([float(w0), float(h0)]
                                + [round(float(m), 6) for m in means]), \
                            "avi"
                    meta = parse_mp4_meta(p)
                    if meta is not None:
                        # metadata tier (sample decode is ffmpeg
                        # territory): duration/dimensions/track census
                        return [meta["duration_sec"], meta["width"],
                                meta["height"],
                                meta["n_video"] + meta["n_audio"]], \
                            "mp4meta"
                    avi = parse_avi_meta(p)
                    if avi is None:
                        raise ValueError("unknown video container")
                    # RIFF-AVI metadata walk (inter-frame codecs in an
                    # AVI container) — same 4-dim shape as mp4meta
                    return [avi["duration_sec"], avi["width"],
                            avi["height"], avi["n_frames"]], "avimeta"
                if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
                    from dynamic_etl_pipeline_thesis_ii_spark.operators.vp8l import (
                        parse_vp8l,
                    )
                    v = parse_vp8l(p)
                    if v is not None:
                        # REAL lossless-WebP (VP8L) raster decode —
                        # the image feature contract
                        w0, h0, arr0 = v
                        means = arr0.reshape(-1, arr0.shape[2]) \
                            .mean(axis=0)
                        return ([float(w0), float(h0)]
                                + [round(float(m), 6)
                                   for m in means]), "vp8l"
                    webp = parse_webp_meta(p)
                    if webp is None:
                        raise ValueError("bad WebP")  # -> fake tier
                    # metadata tier (lossy VP8 bitstream decode is
                    # libwebp territory): dims + alpha/anim flags
                    return [webp["width"], webp["height"],
                            webp["has_alpha"], webp["has_anim"]], \
                        "webpmeta"
                name = ("netpbm" if p[:2] in (b"P6", b"P5")
                        else "png" if p[:8] == PNG_SIG
                        else "jpeg" if p[:2] == b"\xFF\xD8"
                        else "gif" if p[:6] in (b"GIF87a", b"GIF89a")
                        else "tiff" if p[:4] in (b"II*\x00", b"MM\x00*")
                        else "bmp")
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


# --- G.711 / IMA-ADPCM tier: telephony and legacy-WAV codecs that are
# --- pure integer table math (ITU G.711; IMA ADPCM rev 1.2) — decoded
# --- here for real, no librosa needed. Differential-tested against
# --- the stdlib audioop reference decoders.

def _ulaw_decode(data: bytes) -> "np.ndarray":
    """G.711 mu-law -> int16 (vectorized; max magnitude 32124)."""
    u = (~np.frombuffer(data, dtype=np.uint8)) & 0xFF
    exp = (u >> 4) & 0x07
    mant = (u & 0x0F).astype(np.int32)
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _alaw_decode(data: bytes) -> "np.ndarray":
    """G.711 A-law -> int16 (vectorized; even-bit XOR 0x55 mask)."""
    a = np.frombuffer(data, dtype=np.uint8) ^ 0x55
    seg = ((a >> 4) & 0x07).astype(np.int32)
    t = ((a & 0x0F).astype(np.int32)) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_nibbles(pred: int, idx: int, nibs) -> list[int]:
    """Core IMA/DVI ADPCM nibble loop (shared by every block)."""
    out = []
    for nib in nibs:
        step = _IMA_STEPS[idx]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
        out.append(pred)
    return out


def _ima_adpcm_decode(data: bytes, channels: int,
                      block_align: int) -> "np.ndarray":
    """IMA ADPCM WAV (format tag 0x11) -> interleaved int16: each
    block carries a 4-byte (predictor, step-index) header per channel
    — the predictor IS the first output sample — then nibble data in
    4-byte-per-channel interleaved words, LOW nibble first."""
    if channels not in (1, 2):
        raise NotImplementedError("IMA ADPCM beyond stereo")
    if block_align < 4 * channels:
        raise ValueError("block_align smaller than the block header")
    out_ch: list[list[int]] = [[] for _ in range(channels)]
    for off in range(0, len(data), block_align):
        block = data[off:off + block_align]
        if len(block) < 4 * channels:
            break
        preds, idxs = [], []
        for c in range(channels):
            p = int.from_bytes(block[4 * c:4 * c + 2], "little",
                               signed=True)
            preds.append(p)
            idxs.append(min(88, block[4 * c + 2]))
            out_ch[c].append(p)
        body = block[4 * channels:]
        # per channel: its 4-byte words are words c, c+channels, ... of
        # the body; nibbles low-first within each byte
        for c in range(channels):
            chunks = [body[w:w + 4]
                      for w in range(4 * c, len(body), 4 * channels)]
            nibs = []
            for ch in chunks:
                for b in ch:
                    nibs.append(b & 0x0F)
                    nibs.append((b >> 4) & 0x0F)
            out_ch[c].extend(_ima_nibbles(preds[c], idxs[c], nibs))
    n = min(len(o) for o in out_ch)
    inter = np.empty(n * channels, dtype=np.int16)
    for c in range(channels):
        inter[c::channels] = np.array(out_ch[c][:n], dtype=np.int16)
    return inter


def _riff_chunks(payload: bytes):
    """(chunk_id, data) pairs of a RIFF-WAVE payload (word-aligned)."""
    pos = 12
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        yield payload[pos:pos + 4], payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)


def decode_audio(payload: bytes, fake: bool = False) -> list[float]:
    """Audio decode + feature extraction.

    REAL for PCM WAV (stdlib ``wave``), for the G.711 mu-law /
    A-law and IMA-ADPCM WAV codecs (format tags 7/6/0x11 — pure
    integer table math, decoded here, audioop-differential-tested),
    and for FLAC (full sample decode, ``operators/flac.py``):
    ``[duration_sec, sample_rate, n_channels, rms]`` with RMS over
    the decoded samples. Other compressed formats need librosa
    (absent here) and raise NotImplementedError. ``fake=True``
    derives a deterministic 2-dim byte feature instead."""
    if fake:
        if payload is None or len(payload) == 0:
            return [0.0, 0.0]
        return [float(len(payload)), float(sum(payload[:8]) % 97)]
    if payload is not None and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        fmt = data = None
        for cid, chunk in _riff_chunks(payload):
            if cid == b"fmt " and fmt is None:
                fmt = chunk
            elif cid == b"data" and data is None:
                data = chunk
        if fmt is not None and len(fmt) >= 16 and data is not None:
            tag = int.from_bytes(fmt[0:2], "little")
            if tag in (6, 7, 0x11):
                channels = int.from_bytes(fmt[2:4], "little") or 1
                rate = int.from_bytes(fmt[4:8], "little")
                if tag == 7:
                    samples = _ulaw_decode(data)
                elif tag == 6:
                    samples = _alaw_decode(data)
                else:
                    block_align = int.from_bytes(fmt[12:14], "little")
                    samples = _ima_adpcm_decode(data, channels,
                                                block_align)
                n_frames = len(samples) // channels
                duration = n_frames / float(rate) if rate else 0.0
                rms = (float(np.sqrt(np.mean(
                    samples.astype(np.float64) ** 2)))
                       if len(samples) else 0.0)
                return [round(duration, 6), float(rate),
                        float(channels), round(rms, 6)]
        with wave.open(io.BytesIO(payload)) as wav:
            rate, channels = wav.getframerate(), wav.getnchannels()
            n_frames, width = wav.getnframes(), wav.getsampwidth()
            frames = wav.readframes(n_frames)
        duration = n_frames / float(rate) if rate else 0.0
        if width == 2 and frames:
            samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
            rms = float(np.sqrt(np.mean(samples ** 2)))
        elif width == 3 and frames:
            # 24-bit PCM: widen each little-endian triplet to int32
            # with sign extension, scale back to the 24-bit range
            b = np.frombuffer(frames, dtype=np.uint8)
            b = b[:len(b) - len(b) % 3].reshape(-1, 3).astype(np.int32)
            vals = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            rms = float(np.sqrt(np.mean(vals.astype(np.float64) ** 2)))
        else:  # 8-bit PCM: amplitude stats over raw bytes
            samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
            rms = float(np.sqrt(np.mean(samples ** 2))) if len(samples) else 0.0
        return [round(duration, 6), float(rate), float(channels),
                round(rms, 6)]
    if payload is not None and payload[:4] == b"fLaC":
        from dynamic_etl_pipeline_thesis_ii_spark.operators.flac import (
            parse_flac,
        )
        dec = parse_flac(payload)
        if dec is not None and dec["rate"] > 0:
            x = dec["samples"].astype(np.float64)
            rms = (float(np.sqrt(np.mean(x.reshape(-1) ** 2)))
                   if x.size else 0.0)
            return [round(len(x) / dec["rate"], 6), float(dec["rate"]),
                    float(dec["channels"]), round(rms, 6)]
    raise NotImplementedError(
        "non-WAV/FLAC audio decoding requires librosa; not available here")


# MPEG audio frame-header tables (ISO 11172-3 / 13818-3): bitrates in
# kbps by (version-group, layer); sample rates by version
_MP3_BITRATES = {
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
               384, 416, 448],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
               320, 384],
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
               224, 256],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160],
}
_MP3_RATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
              "2.5": [11025, 12000, 8000]}


def parse_webp_meta(payload: bytes) -> Optional[dict]:
    """REAL WebP container metadata WITHOUT pixel decode: RIFF chunk
    walk covering all three layouts — ``VP8 `` (lossy: 0x9D012A start
    code, 14-bit dimensions), ``VP8L`` (lossless: 0x2F signature,
    14-bit minus-one dimensions + alpha bit) and ``VP8X`` (extended:
    feature flags + 24-bit minus-one canvas). Returns ``{width,
    height, format, has_alpha, has_anim, n_chunks}`` or None for
    non-WebP payloads. The VP8/VP8L bitstreams themselves are
    libwebp territory (boolean arithmetic coder + transform stack);
    this is the honest metadata tier, same contract as
    :func:`parse_mp3_meta` / :func:`parse_mp4_meta`."""
    if (payload is None or len(payload) < 16 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WEBP"):
        return None
    out = {"width": 0.0, "height": 0.0, "format": None,
           "has_alpha": 0.0, "has_anim": 0.0, "n_chunks": 0.0}
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        fourcc = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        data = payload[pos + 8:pos + 8 + size]
        if len(data) < size:
            break  # truncated chunk
        out["n_chunks"] += 1
        if fourcc == b"VP8 " and out["format"] is None and size >= 10:
            # key-frame only: 3-byte frame tag, then the start code
            if data[3:6] == b"\x9d\x01\x2a":
                out["format"] = "lossy"
                out["width"] = float(
                    int.from_bytes(data[6:8], "little") & 0x3FFF)
                out["height"] = float(
                    int.from_bytes(data[8:10], "little") & 0x3FFF)
        elif fourcc == b"VP8L" and out["format"] is None and size >= 5:
            if data[0] == 0x2F:
                bits = int.from_bytes(data[1:5], "little")
                out["format"] = "lossless"
                out["width"] = float((bits & 0x3FFF) + 1)
                out["height"] = float(((bits >> 14) & 0x3FFF) + 1)
                out["has_alpha"] = float((bits >> 28) & 1)
        elif fourcc == b"VP8X" and size >= 10:
            flags = data[0]
            out["format"] = "extended"
            out["has_alpha"] = float((flags >> 4) & 1)
            out["has_anim"] = float((flags >> 1) & 1)
            out["width"] = float(
                int.from_bytes(data[4:7], "little") + 1)
            out["height"] = float(
                int.from_bytes(data[7:10], "little") + 1)
        elif fourcc == b"ALPH":
            out["has_alpha"] = 1.0
        pos += 8 + size + (size & 1)  # chunks pad to even
    return out if out["format"] is not None else None


def parse_mp3_meta(payload: bytes) -> Optional[dict]:
    """REAL MPEG-audio (MP1/MP2/MP3) container metadata WITHOUT PCM
    decode: skip an ID3v2 tag, then walk every frame header summing
    per-frame durations (correct for CBR and VBR alike — no Xing
    heuristics needed). Returns ``{duration_sec, sample_rate,
    channels, bitrate_kbps (byte-weighted mean), n_frames, layer}`` or
    None for non-MPEG payloads. The PCM samples themselves stay
    librosa territory; this is the honest metadata tier a corpus
    audit needs (durations, rates, bitrate stats)."""
    if payload is None or len(payload) < 4:
        return None
    i, n = 0, len(payload)
    if payload[:3] == b"ID3" and n >= 10:       # ID3v2: syncsafe size
        size = ((payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
                | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F))
        i = 10 + size
    frames = 0
    dur = 0.0
    bits = 0
    rate = channels = layer_out = None
    while i + 4 <= n:
        h = int.from_bytes(payload[i:i + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:          # lost sync
            if frames:
                break                            # trailing tag/garbage
            return None
        ver_bits = (h >> 19) & 0x3
        layer_bits = (h >> 17) & 0x3
        if ver_bits == 0x1 or layer_bits == 0x0:
            if frames:
                break                            # trailing garbage
            return None
        version = {0x0: "2.5", 0x2: "2", 0x3: "1"}[ver_bits]
        layer = {0x3: 1, 0x2: 2, 0x1: 3}[layer_bits]
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        if br_idx in (0x0, 0xF) or sr_idx == 0x3:
            if frames:
                break                            # trailing garbage
            return None                          # free-format/invalid
        vgroup = "1" if version == "1" else "2"
        kbps = _MP3_BITRATES[(vgroup, layer)][br_idx]
        sr = _MP3_RATES[version][sr_idx]
        padding = (h >> 9) & 0x1
        mono = ((h >> 6) & 0x3) == 0x3
        if layer == 1:
            size = (12 * kbps * 1000 // sr + padding) * 4
            samples = 384
        else:
            samples = (1152 if layer == 2 or vgroup == "1" else 576)
            size = samples * kbps * 1000 // (8 * sr) + padding
        if size <= 4:
            if frames:
                break                            # trailing garbage
            return None
        frames += 1
        dur += samples / sr
        bits += size * 8
        rate, channels = sr, 1 if mono else 2
        layer_out = layer
        i += size
    if not frames:
        return None
    return {"duration_sec": round(dur, 6), "sample_rate": float(rate),
            "channels": float(channels),
            "bitrate_kbps": round(bits / dur / 1000, 3) if dur else 0.0,
            "n_frames": frames, "layer": layer_out}


def parse_flac_meta(payload: bytes) -> Optional[dict]:
    """REAL FLAC container metadata WITHOUT sample decode: the
    mandatory first STREAMINFO block (spec §: always block 0 right
    after 'fLaC') carries sample rate (20 bits), channels (3+1),
    bits per sample (5+1) and total samples (36) — enough for exact
    duration. Returns ``{duration_sec, sample_rate, channels,
    bits_per_sample, total_samples}`` or None."""
    if (payload is None or len(payload) < 42
            or payload[:4] != b"fLaC"):
        return None
    btype = payload[4] & 0x7F
    length = int.from_bytes(payload[5:8], "big")
    if btype != 0 or length < 34:
        return None
    b = payload[8:42]
    sr = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    channels = ((b[12] >> 1) & 0x7) + 1
    bps = (((b[12] & 0x1) << 4) | (b[13] >> 4)) + 1
    total = ((b[13] & 0x0F) << 32) | int.from_bytes(b[14:18], "big")
    if sr == 0:
        return None                       # spec: invalid stream
    return {"duration_sec": round(total / sr, 6),
            "sample_rate": float(sr), "channels": float(channels),
            "bits_per_sample": float(bps), "total_samples": total}


def write_flac_meta(total_samples: int, rate: int = 44_100,
                    channels: int = 2, bits: int = 16) -> bytes:
    """Minimal fLaC + STREAMINFO fixture twin of
    :func:`parse_flac_meta` (no audio frames)."""
    b = bytearray(34)
    b[0:2] = (4096).to_bytes(2, "big")     # min/max blocksize
    b[2:4] = (4096).to_bytes(2, "big")
    b[10] = (rate >> 12) & 0xFF
    b[11] = (rate >> 4) & 0xFF
    b[12] = (((rate & 0xF) << 4) | (((channels - 1) & 0x7) << 1)
             | (((bits - 1) >> 4) & 0x1))
    b[13] = (((bits - 1) & 0xF) << 4) | ((total_samples >> 32) & 0xF)
    b[14:18] = (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(b)


def _ogg_pages(payload: bytes):
    """(header_type, granule, serial, body) per Ogg page; stops at the
    first malformed page. CRCs are not verified — this is a metadata
    walk, not an integrity check."""
    pos, n = 0, len(payload)
    while pos + 27 <= n and payload[pos:pos + 4] == b"OggS":
        htype = payload[pos + 5]
        granule = int.from_bytes(payload[pos + 6:pos + 14], "little",
                                 signed=True)
        serial = int.from_bytes(payload[pos + 14:pos + 18], "little")
        nseg = payload[pos + 26]
        seg_end = pos + 27 + nseg
        if seg_end > n:
            return
        body_len = sum(payload[pos + 27:seg_end])
        if seg_end + body_len > n:
            return
        yield htype, granule, serial, payload[seg_end:seg_end + body_len]
        pos = seg_end + body_len


def parse_ogg_meta(payload: bytes) -> Optional[dict]:
    """REAL Ogg container metadata WITHOUT sample decode: identify the
    codec from the first (BOS) packet — OpusHead (RFC 7845 §5.1:
    channels, pre-skip, input rate; granules always tick at 48 kHz)
    or \\x01vorbis (channels, rate) — then take the stream's LAST
    granule position for the exact PCM length. Returns
    ``{duration_sec, sample_rate, channels, codec}`` or None."""
    if payload is None or len(payload) < 28 or payload[:4] != b"OggS":
        return None
    codec = rate = channels = None
    pre_skip = 0
    gscale = 48_000.0               # opus granule timescale (fixed)
    serial0 = last_granule = None
    for htype, granule, serial, body in _ogg_pages(payload):
        if serial0 is None:
            serial0 = serial
            if body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                pre_skip = int.from_bytes(body[10:12], "little")
                rate = int.from_bytes(body[12:16], "little")
            elif body[:7] == b"\x01vorbis" and len(body) >= 28:
                codec = "vorbis"
                channels = body[11]
                rate = int.from_bytes(body[12:16], "little")
                gscale = float(rate) if rate else 0.0
            else:
                return None
        if serial == serial0 and granule >= 0:
            last_granule = granule
    if codec is None or last_granule is None or not gscale:
        return None
    pcm = max(0, last_granule - (pre_skip if codec == "opus" else 0))
    return {"duration_sec": round(pcm / gscale, 6),
            "sample_rate": float(rate or 0), "channels": float(channels),
            "codec": codec}


def write_ogg_meta(duration_sec: float, codec: str = "opus",
                   rate: int = 48_000, channels: int = 2) -> bytes:
    """Minimal two-page Ogg fixture twin of :func:`parse_ogg_meta`:
    a BOS page carrying the codec id header and an EOS page whose
    granule position encodes the duration (no audio packets)."""
    def page(htype: int, granule: int, body: bytes) -> bytes:
        segs = []
        left = len(body)
        while left >= 255:
            segs.append(255)
            left -= 255
        segs.append(left)
        return (b"OggS\x00" + bytes([htype])
                + granule.to_bytes(8, "little", signed=True)
                + (7).to_bytes(4, "little") + (0).to_bytes(4, "little")
                + (0).to_bytes(4, "little") + bytes([len(segs)])
                + bytes(segs) + body)

    pre_skip = 312
    if codec == "opus":
        head = (b"OpusHead" + bytes([1, channels])
                + pre_skip.to_bytes(2, "little")
                + rate.to_bytes(4, "little") + b"\x00\x00" + b"\x00")
        granule = int(round(duration_sec * 48_000)) + pre_skip
    elif codec == "vorbis":
        head = (b"\x01vorbis" + (0).to_bytes(4, "little")
                + bytes([channels]) + rate.to_bytes(4, "little")
                + b"\x00" * 12 + b"\xB8\x01")
        granule = int(round(duration_sec * rate))
    else:
        raise ValueError(f"codec must be opus or vorbis, got {codec!r}")
    return page(0x02, -1, head) + page(0x04, granule, b"")


def _mp4_boxes(data: bytes, pos: int, end: int):
    """(type, body_start, body_end) triples of the ISO-BMFF boxes in
    data[pos:end]; handles size==1 (64-bit largesize) and size==0
    (to-end); stops on any malformed size."""
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


_MP4_TOP_BOXES = (b"ftyp", b"moov", b"mdat", b"free", b"skip", b"styp",
                  b"wide", b"moof", b"pdin", b"sidx", b"meta", b"uuid")


def parse_mp4_meta(payload: bytes) -> Optional[dict]:
    """REAL ISO-BMFF (MP4/MOV/M4A) container metadata WITHOUT sample
    decode: walk the box tree — ``mvhd`` for timescale/duration
    (version 0 and 1 layouts), each ``trak``'s ``hdlr`` for the
    track kind, ``tkhd`` for 16.16-fixed width/height, and the first
    ``stsd`` entry for the codec fourcc. Returns ``{duration_sec,
    timescale, n_video, n_audio, width, height, video_codec,
    audio_codec, brand}`` or None for non-BMFF payloads. Decoding
    the samples themselves is ffmpeg territory; this is the honest
    metadata tier a corpus audit needs (the video analog of
    :func:`parse_mp3_meta`)."""
    if (payload is None or len(payload) < 12
            or payload[4:8] not in _MP4_TOP_BOXES):
        return None
    out = {"duration_sec": 0.0, "timescale": 0.0, "n_video": 0.0,
           "n_audio": 0.0, "width": 0.0, "height": 0.0,
           "video_codec": None, "audio_codec": None, "brand": None}
    saw_moov = False

    def find(btype: bytes, lo: int, hi: int):
        for t, a, b in _mp4_boxes(payload, lo, hi):
            if t == btype:
                return a, b
        return None

    for t, a, b in _mp4_boxes(payload, 0, len(payload)):
        if t == b"ftyp" and b - a >= 4:
            out["brand"] = payload[a:a + 4].decode("ascii", "replace")
        if t != b"moov":
            continue
        saw_moov = True
        if mv := find(b"mvhd", a, b):
            p, pe = mv
            ver = payload[p]
            # v1: 8-byte ctime/mtime/duration; v0: all 4-byte
            if ver == 1 and p + 32 <= pe:
                ts = int.from_bytes(payload[p + 20:p + 24], "big")
                dur = int.from_bytes(payload[p + 24:p + 32], "big")
            elif ver == 0 and p + 20 <= pe:
                ts = int.from_bytes(payload[p + 12:p + 16], "big")
                dur = int.from_bytes(payload[p + 16:p + 20], "big")
            else:
                ts = dur = 0
            out["timescale"] = float(ts)
            out["duration_sec"] = round(dur / ts, 6) if ts else 0.0
        for tt, ta, tb in _mp4_boxes(payload, a, b):
            if tt != b"trak":
                continue
            handler = codec = None
            width = height = 0.0
            if tk := find(b"tkhd", ta, tb):
                p, pe = tk
                ver = payload[p]
                # width/height are the LAST 8 bytes, 16.16 fixed,
                # same offset from the end for v0 and v1 (full tkhd
                # bodies: 84 bytes at v0, 96 at v1)
                if pe - p >= (84 if ver == 0 else 96):
                    width = int.from_bytes(payload[pe - 8:pe - 4],
                                           "big") / 65536.0
                    height = int.from_bytes(payload[pe - 4:pe],
                                            "big") / 65536.0
            if md := find(b"mdia", ta, tb):
                ma, mb = md
                if hd := find(b"hdlr", ma, mb):
                    p, _ = hd
                    handler = payload[p + 8:p + 12]
                if mi := find(b"minf", ma, mb):
                    if st := find(b"stbl", *mi):
                        if sd := find(b"stsd", *st):
                            p, pe = sd
                            # ver/flags(4) + entry_count(4) + entry box
                            if pe - p >= 16:
                                codec = payload[p + 12:p + 16] \
                                    .decode("ascii", "replace")
            if handler == b"vide":
                out["n_video"] += 1
                out["width"] = out["width"] or round(width, 2)
                out["height"] = out["height"] or round(height, 2)
                out["video_codec"] = out["video_codec"] or codec
            elif handler == b"soun":
                out["n_audio"] += 1
                out["audio_codec"] = out["audio_codec"] or codec
    return out if saw_moov else None


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def write_mp4(duration_sec: float, timescale: int = 1000,
              tracks: tuple = (("vide", "avc1", 640, 360),
                               ("soun", "mp4a", 0, 0)),
              version: int = 0) -> bytes:
    """Minimal structurally-valid ISO-BMFF: ftyp + moov(mvhd + one
    trak per (handler, codec fourcc, width, height)) + empty mdat —
    the fixture twin of :func:`parse_mp4_meta` (no media samples;
    ``version=1`` writes 64-bit mvhd duration)."""
    dur = int(round(duration_sec * timescale))
    if version == 1:
        mvhd = (b"\x01" + b"\x00" * 3 + b"\x00" * 16
                + timescale.to_bytes(4, "big") + dur.to_bytes(8, "big")
                + b"\x00\x01\x00\x00" + b"\x01\x00" + b"\x00" * 10
                + b"\x00" * 36 + b"\x00" * 24 + (99).to_bytes(4, "big"))
    else:
        mvhd = (b"\x00" * 4 + b"\x00" * 8
                + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big")
                + b"\x00\x01\x00\x00" + b"\x01\x00" + b"\x00" * 10
                + b"\x00" * 36 + b"\x00" * 24 + (99).to_bytes(4, "big"))
    traks = b""
    for i, (handler, codec, w, h) in enumerate(tracks):
        tkhd = (b"\x00\x00\x00\x07" + b"\x00" * 8
                + (i + 1).to_bytes(4, "big") + b"\x00" * 4
                + dur.to_bytes(4, "big") + b"\x00" * 16 + b"\x00" * 36
                + (int(w) << 16).to_bytes(4, "big")
                + (int(h) << 16).to_bytes(4, "big"))
        hdlr = (b"\x00" * 4 + b"\x00" * 4 + handler.encode("ascii")
                + b"\x00" * 12 + b"\x00")
        entry = _mp4_box(codec.encode("ascii"),
                         b"\x00" * 6 + (1).to_bytes(2, "big"))
        stsd = b"\x00" * 4 + (1).to_bytes(4, "big") + entry
        stbl = _mp4_box(b"stsd", stsd)
        minf = _mp4_box(b"stbl", stbl)
        mdia = (_mp4_box(b"hdlr", hdlr)
                + _mp4_box(b"minf", minf))
        traks += _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd)
                          + _mp4_box(b"mdia", mdia))
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + traks)
    ftyp = _mp4_box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isommp42")
    return ftyp + moov + _mp4_box(b"mdat", b"")


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


def resample_flac(payload: bytes, target_rate: int) -> bytes:
    """REAL linear-interpolation resample for FLAC payloads (full
    sample decode via ``operators/flac.py``), re-encoded as FLAC at
    ``target_rate`` with Rice-coded FIXED frames; raises
    NotImplementedError for non-FLAC/undecodable payloads — the same
    contract as :func:`resample_wav`, so :func:`resample_audio`
    chains the two before its truncate-pad fallback."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.flac import (
        parse_flac,
        write_flac,
    )
    dec = parse_flac(payload) if payload is not None \
        and payload[:4] == b"fLaC" else None
    if dec is None or dec["rate"] <= 0:
        raise NotImplementedError(
            "undecodable FLAC resample requires librosa; not available here")
    if target_rate <= 0:
        raise ValueError(f"target_rate must be positive, got {target_rate}")
    x = dec["samples"].astype(np.float64)
    n_in = x.shape[0]
    if n_in == 0:
        return write_flac(np.zeros((0, dec["channels"]), dtype=np.int64),
                          target_rate, bits=dec["bits"])
    n_out = max(1, int(round(n_in * target_rate / dec["rate"])))
    pos = np.linspace(0.0, n_in - 1, n_out)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (pos - lo)[:, None]
    y = x[lo] * (1.0 - frac) + x[hi] * frac
    cap = 1 << (dec["bits"] - 1)
    out = np.clip(np.round(y), -cap, cap - 1).astype(np.int64)
    return write_flac(out, target_rate, bits=dec["bits"], mode="fixed")


def resample_audio(media: DataFrame, target_rate: int = 16_000) -> DataFrame:
    """Binary -> binary audio resample kernel (1:1 rows), the audio
    twin of :func:`resize_images`: 16-bit PCM WAV and FLAC payloads
    get the REAL linear-interp resample (re-encoded in their own
    container); anything else falls back to a deterministic
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
        except Exception:  # noqa: BLE001 — not 16-bit WAV, try FLAC
            pass
        try:
            return resample_flac(b, target_rate)
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


def _resize_via(parse_fn, write_fn, fmt: str, payload: bytes,
                width: int, height: int) -> bytes:
    """Shared scaffold of every per-format resize: parse (or raise the
    PIL-slot NotImplementedError), nearest-neighbor index, re-encode
    in the same format."""
    parsed = parse_fn(payload)
    if parsed is None:
        raise NotImplementedError(
            f"non-{fmt} image resize requires PIL; not available here")
    w, h, arr = parsed
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return write_fn(arr[rows][:, cols])


def resize_netpbm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for P6/P5 payloads, re-encoded to
    the same format."""
    def write_pnm(out):
        magic = b"P6" if out.shape[2] == 3 else b"P5"
        return (magic + b"\n" + f"{width} {height}\n255\n".encode()
                + out.tobytes())
    return _resize_via(parse_netpbm, write_pnm, "netpbm", payload,
                       width, height)


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for uncompressed 24-bit BMP."""
    return _resize_via(parse_bmp, write_bmp, "BMP", payload, width, height)


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for 8-bit PNG (incl. Adam7 input;
    output is non-interlaced)."""
    return _resize_via(parse_png, write_png, "PNG", payload, width, height)


def resize_gif(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for GIF, re-encoded single-frame."""
    return _resize_via(parse_gif, write_gif, "GIF", payload, width, height)


def resize_tiff(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for uncompressed TIFF."""
    return _resize_via(parse_tiff, write_tiff, "TIFF", payload,
                       width, height)


def resize_jpeg(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for JPEG (baseline or progressive
    input; output is baseline 4:4:4)."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.jpeg import (
        parse_jpeg, write_jpeg,
    )
    return _resize_via(
        parse_jpeg,
        lambda out: write_jpeg(out[..., 0] if out.shape[2] == 1 else out),
        "JPEG", payload, width, height)


def resize_webp(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for lossless WebP (VP8L input and
    output; lossy VP8 stays libwebp territory and raises the PIL-slot
    NotImplementedError)."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.vp8l import (
        parse_vp8l, write_vp8l,
    )
    return _resize_via(parse_vp8l, write_vp8l, "VP8L", payload,
                       width, height)


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  ) -> DataFrame:
    """Binary -> binary image resize kernel (1:1 rows). netpbm, 24-bit
    BMP, 8-bit PNG, JPEG, GIF and uncompressed TIFF payloads get the
    REAL nearest-neighbor resize;
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
        for real in (resize_netpbm, resize_bmp, resize_png, resize_jpeg,
                     resize_gif, resize_tiff, resize_webp):
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
    yields up to ``max_frames`` evenly-spaced frames. AVI payloads the
    codec tier can decode (uncompressed DIB / MJPEG, see
    :func:`avi_frames`) emit REAL frames, BMP-encoded so any image
    operator downstream (dHash, resize, features) consumes them
    directly; other containers fall back to fixed-size byte slices
    (the documented stub tier for ffmpeg-territory codecs).
    Demonstrates the row-expanding batch shape — output batches are
    not 1:1 with input batches, which is exactly what mapInPandas
    (vs pandas_udf) exists for."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                decoded = video_frames(bytes(p), max_frames=max_frames)
                if decoded:
                    for i, (_, _, arr) in enumerate(decoded):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(write_bmp(arr))
                    continue
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(p[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(
        kernel, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual image hashing + image near-dup (dHash over the real
# decode tier, paired through the text engine's hamming banding)
# ---------------------------------------------------------------------------

def dhash64(payload: bytes,
            decode_fn: Optional[callable] = None) -> Optional[int]:
    """64-bit difference hash (dHash) of an image payload: decode with
    the REAL parser tier (netpbm/BMP/PNG/JPEG/GIF/TIFF), grayscale by
    channel mean, nearest-neighbor downscale to a 9x8 grid, and set
    bit ``r*8 + c`` iff ``g[r, c] > g[r, c+1]`` — the standard
    gradient-sign perceptual hash: stable under re-encoding, mild
    noise, and resizing (the downscale IS the normalization), while
    unrelated images land ~32 bits apart. Returns a SIGNED 64-bit int
    (bit 63 two's complement, the ``hamming64``/banding convention) or
    None when no parser claims the payload (undecodable formats skip
    hashing rather than fake it).

    ``decode_fn`` is the native-codec escape hatch for true 100 TB
    image scale: a ``bytes -> (width, height, HxWxC uint8 array) |
    None`` callable (a PIL/turbojpeg wrapper) tried FIRST; the
    dependency-free stdlib tier stays the default, the fallback for
    payloads the hook declines, and the correctness oracle — the hash
    math downstream of the decode is identical either way, so the two
    tiers agree wherever both decode (pinned in
    ``test_multimodal.py``)."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.jpeg import (
        parse_jpeg,
    )
    from dynamic_etl_pipeline_thesis_ii_spark.operators.vp8l import (
        parse_vp8l,
    )
    if payload is None:
        return None
    p = bytes(payload)
    parsed = decode_fn(p) if decode_fn is not None else None
    if parsed is None:
        parsed = (parse_netpbm(p) or parse_bmp(p) or parse_png(p)
                  or parse_jpeg(p) or parse_gif(p) or parse_tiff(p)
                  or parse_vp8l(p))
    if parsed is None:
        return None
    bits = _dhash_bits(*parsed)
    return None if bits is None else _bits_to_signed64(bits)


def _dhash_bits(w: int, h: int, arr: "np.ndarray") -> Optional["np.ndarray"]:
    """The raster→64-gradient-bit core of :func:`dhash64`, factored so
    video frames hash through the IDENTICAL grid math (one bit
    contract for stills and frames — the two cannot drift). Returns a
    64-element boolean array (row-major 8x8) or None below the 9x8
    sampling grid."""
    if arr.ndim == 2:               # grayscale hooks (PIL 'L' mode)
        arr = arr[:, :, None]
    if w < 9 or h < 8:
        # below the 9x8 sampling grid there is no gradient signal:
        # every such thumbnail would hash to ~0 and false-pair with
        # every other one — skip hashing instead
        return None
    # alpha is not luminance: folding RGBA/gray+alpha's mask channel
    # into the mean breaks the raster-determined contract (the same
    # color raster as BMP vs alpha-PNG would hash apart)
    if arr.shape[2] in (2, 4):
        arr = arr[:, :, :-1]
    gray = arr.astype(np.float64).mean(axis=2)
    # AREA-average each 9x8 cell (reduceat over the grid boundaries),
    # not point-sample one pixel per cell: point samples track pixel
    # noise, so a resized copy of a textured image lands ~18 bits
    # away; cell means are what survive resizing — the downscale IS
    # the normalization only if it integrates the cell
    rb = (np.arange(9) * h) // 8
    cb = (np.arange(10) * w) // 9
    sums = np.add.reduceat(np.add.reduceat(gray, rb[:-1], axis=0),
                           cb[:-1], axis=1)
    g = sums / np.outer(np.diff(rb), np.diff(cb))
    return (g[:, :-1] > g[:, 1:]).reshape(-1)   # 8x8, row-major


def _bits_to_signed64(bits) -> int:
    """64 booleans (bit j at index j) → SIGNED 64-bit int, bit 63
    two's complement — the ``hamming64``/banding convention shared by
    every perceptual-hash modality."""
    out = 0
    for j in range(64):
        if bits[j]:
            out += -(1 << 63) if j == 63 else (1 << j)
    return out


def image_dhash(media: DataFrame, batch_hint: int = 1024,
                extra_cols: tuple = (),
                decode_fn: Optional[callable] = None) -> DataFrame:
    """(id, sim) perceptual fingerprints for every DECODABLE image
    payload — the image-space twin of ``simhash_fingerprints``. Arrow
    mapInPandas kernel (one payload batch in memory at a time);
    undecodable or non-image rows drop out, visible by comparing row
    counts. ``extra_cols`` pass through unchanged (streaming callers
    carry the event-time column so watermarks survive the kernel) —
    works on a STREAM as-is: the kernel is stateless. ``decode_fn``
    threads the native-codec hook into every executor's kernel (see
    :func:`dhash64` — a picklable PIL/turbojpeg wrapper decodes at
    native speed, the stdlib tier remains the fallback and oracle)."""
    return _media_fingerprints(
        media, "image",
        (dhash64 if decode_fn is None
         else (lambda p, _fn=decode_fn: dhash64(p, decode_fn=_fn))),
        extra_cols=extra_cols)


def _media_fingerprints(media: DataFrame, kind: str, hash_fn,
                        extra_cols: tuple = ()) -> DataFrame:
    """Shared Arrow kernel turning one media KIND's payloads into
    ``(id, sim)`` 64-bit fingerprints via ``hash_fn`` (picklable,
    ``bytes -> signed int | None``) — image dHash and audio aHash ride
    the identical plumbing, so their streaming/banding faces cannot
    drift. Stateless; ``extra_cols`` pass through."""
    import pandas as pd

    extras = list(extra_cols)
    sub = media.select("media_id", "kind", "payload", *extras)
    extra_fields = ", ".join(
        f"{c} {media.schema[c].dataType.simpleString()}" for c in extras)
    out_schema = "id long, sim long" + (
        ", " + extra_fields if extras else "")

    def kernel(batches):
        for pdf in batches:
            rows = {"id": [], "sim": [], **{c: [] for c in extras}}
            for i in range(len(pdf)):
                if pdf["kind"].iloc[i] != kind:
                    continue
                h = hash_fn(pdf["payload"].iloc[i])
                if h is not None:
                    rows["id"].append(int(pdf["media_id"].iloc[i]))
                    rows["sim"].append(h)
                    for c in extras:
                        rows[c].append(pdf[c].iloc[i])
            out = pd.DataFrame(rows)
            out["id"] = out["id"].astype("int64")
            out["sim"] = out["sim"].astype("int64")
            yield out

    return sub.mapInPandas(kernel, out_schema)


def image_neardup_pairs(media: DataFrame, max_hamming: int = 6,
                        n_blocks: int = 8,
                        max_bucket: Optional[int] = 2000,
                        cap_report: Optional[dict] = None,
                        decode_fn: Optional[callable] = None,
                        hot_policy: str = "drop") -> DataFrame:
    """Image near-duplicate pairs: perceptual dHash fingerprints
    (:func:`image_dhash`) joined through the text engine's Manku
    banding (``dedup.hamming_band_pairs`` — equi-join on
    block-combination keys, hot-bucket cap, exact-hamming verify;
    NEVER a quadratic pair scan). ``n_blocks=8`` with the default
    ``max_hamming=6`` keys each band on 2 blocks (~16-bit keys,
    C(8,2)=28 bands) — complete for <=6 differing bits, the usual
    near-dup budget for 64-bit dHash. Same ``(id_a, id_b, hamming)``
    contract as ``simhash_pairs``; at 100 TB the fingerprint pass is
    one Arrow scan of the payload column and everything after moves
    16-byte rows. ``cap_report`` (dict, filled in place) records the
    buckets/rows the hot-bucket cap dropped
    (``dedup.bucket_cap_stats``) — image dedup hits the cap EARLIEST
    of all the banding paths (16-bit band keys put the average bucket
    over the default 2000 at ~10⁸ images), so the recall loss must be
    a report number, never silent."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        hamming_band_pairs,
    )
    fps = image_dhash(media, decode_fn=decode_fn) \
        .localCheckpoint(eager=False)
    return hamming_band_pairs(fps, max_hamming=max_hamming,
                              n_blocks=n_blocks, max_bucket=max_bucket,
                              cap_report=cap_report,
                              hot_policy=hot_policy)


def image_dedup(media: DataFrame, max_hamming: int = 6,
                n_blocks: int = 8,
                max_bucket: Optional[int] = 2000,
                cap_report: Optional[dict] = None,
                decode_fn: Optional[callable] = None,
                hot_policy: str = "drop") -> DataFrame:
    """End-to-end image dedup: keep ONE image per perceptual-dup
    cluster (connected components over :func:`image_neardup_pairs`,
    lowest ``media_id`` canonical — the text engine's
    ``dedup_by_components`` contract reused verbatim on the media
    frame). Undecodable images can never pair, so they always pass
    through — dedup only ever drops something a REAL decoded raster
    matched."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        dedup_by_components,
    )
    pairs = image_neardup_pairs(media, max_hamming=max_hamming,
                                n_blocks=n_blocks,
                                max_bucket=max_bucket,
                                cap_report=cap_report,
                                decode_fn=decode_fn,
                                hot_policy=hot_policy)
    return dedup_by_components(media, pairs, id_col="media_id")


# ---------------------------------------------------------------------------
# audio perceptual fingerprinting (time-frequency gradient aHash over
# the real WAV decode tier, paired through the same hamming banding)
# ---------------------------------------------------------------------------

def wav_mono_samples(payload: bytes) -> Optional[tuple[int, "np.ndarray"]]:
    """(sample_rate, mono float64 waveform) for every WAV tier this
    module REALLY decodes — PCM 8/16/24-bit, G.711 mu-law/A-law, and
    IMA-ADPCM (format tags 1/6/7/0x11) — or None for non-WAV /
    malformed payloads. The sample-level face of :func:`decode_audio`
    (which reduces to summary features): audio fingerprinting needs
    the waveform itself. Channels fold to mono by mean; 8-bit PCM
    centers at 128 so silence is 0 like the other widths."""
    if not (payload is not None and payload[:4] == b"RIFF"
            and payload[8:12] == b"WAVE"):
        return None
    try:
        fmt = data = None
        for cid, chunk in _riff_chunks(payload):
            if cid == b"fmt " and fmt is None:
                fmt = chunk
            elif cid == b"data" and data is None:
                data = chunk
        if fmt is not None and len(fmt) >= 16 and data is not None:
            tag = int.from_bytes(fmt[0:2], "little")
            channels = int.from_bytes(fmt[2:4], "little") or 1
            rate = int.from_bytes(fmt[4:8], "little")
            if tag in (6, 7, 0x11):
                if tag == 7:
                    samples = _ulaw_decode(data)
                elif tag == 6:
                    samples = _alaw_decode(data)
                else:
                    block_align = int.from_bytes(fmt[12:14], "little")
                    samples = _ima_adpcm_decode(data, channels,
                                                block_align)
                x = samples.astype(np.float64)
                x = x[:len(x) - len(x) % channels]
                return rate, x.reshape(-1, channels).mean(axis=1)
        with wave.open(io.BytesIO(payload)) as wav:
            rate, channels = wav.getframerate(), wav.getnchannels()
            n_frames, width = wav.getnframes(), wav.getsampwidth()
            frames = wav.readframes(n_frames)
        if width == 2:
            x = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        elif width == 3:
            b = np.frombuffer(frames, dtype=np.uint8)
            b = b[:len(b) - len(b) % 3].reshape(-1, 3).astype(np.int32)
            vals = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float64)
        else:   # 8-bit PCM is unsigned, silence = 128
            x = (np.frombuffer(frames, dtype=np.uint8)
                 .astype(np.float64) - 128.0)
        x = x[:len(x) - len(x) % max(1, channels)]
        return rate, x.reshape(-1, max(1, channels)).mean(axis=1)
    except Exception:
        return None


def audio_mono_samples(payload: bytes) -> Optional[tuple[int, "np.ndarray"]]:
    """Container-independent (sample_rate, mono float64 waveform):
    every WAV tier (:func:`wav_mono_samples`) plus real FLAC decode
    (:func:`operators.flac.flac_mono_samples`). FLAC is lossless, so
    the same PCM in either container yields a bit-identical mono
    array — perceptual hashes agree EXACTLY across containers (the
    cross-container twin of dHash's cross-format invariance)."""
    decoded = wav_mono_samples(payload)
    if decoded is None:
        from dynamic_etl_pipeline_thesis_ii_spark.operators.flac import (
            flac_mono_samples,
        )
        decoded = flac_mono_samples(payload)
    return decoded


def _resample_mono(x: "np.ndarray", rate: int,
                   target: int) -> "np.ndarray":
    """Linear-interpolation mono resample (the :func:`resample_wav`
    kernel on a bare array) — the normalization step that pins the
    fingerprint's band edges regardless of source sample rate."""
    n_in = len(x)
    if rate == target or n_in == 0:
        return x
    n_out = max(1, int(round(n_in * target / rate)))
    pos = np.linspace(0.0, n_in - 1, n_out)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    return x[lo] * (1.0 - frac) + x[hi] * frac


_AHASH_RATE = 8000
_AHASH_SEGMENTS = 9          # 8 time transitions x 8 bands = 64 bits
_AHASH_BANDS = np.geomspace(100.0, 3600.0, 9)   # log-spaced edges


def ahash64(payload: bytes) -> Optional[int]:
    """64-bit audio perceptual hash — the audio twin of
    :func:`dhash64` (a time-frequency GRADIENT hash): decode to mono
    (:func:`wav_mono_samples`), linear-resample to 8 kHz (the
    normalization — band edges stop depending on the source rate),
    split into 9 equal time segments, measure rFFT power in 8
    log-spaced bands (100–3600 Hz, inside any telephony Nyquist), and
    set bit ``t*8 + b`` iff band ``b``'s energy RISES from segment t
    to t+1. Gradient signs make it invariant to uniform gain; the
    per-length segmentation makes it length-proportional; and the
    quantization noise of the u-law/A-law/ADPCM tiers moves energies
    far less than real content differences, so re-encodes of one clip
    land within a few bits while unrelated clips land ~32 apart.
    Returns a SIGNED 64-bit int (the ``hamming64``/banding
    convention), or None for undecodable, too-short (< 90 ms at 8 kHz
    — below that the segment FFTs cannot resolve the 100 Hz band
    floor) or silent payloads (no gradient signal), mirroring
    ``dhash64``'s sub-grid guard. Decodes every WAV tier AND real
    FLAC (:func:`audio_mono_samples`) — lossless re-containering
    WAV<->FLAC yields the IDENTICAL hash."""
    decoded = audio_mono_samples(payload)
    if decoded is None:
        return None
    rate, x = decoded
    if rate <= 0:
        return None
    return _ahash_from_samples(_resample_mono(x, rate, _AHASH_RATE))


def _ahash_from_samples(x: "np.ndarray") -> Optional[int]:
    """The 8 kHz-mono-samples → 64-gradient-bit core of
    :func:`ahash64`, factored so per-window audio fingerprints hash
    through the IDENTICAL segment/band math."""
    seg = len(x) // _AHASH_SEGMENTS
    if seg < 80:                 # df = 8000/seg must resolve 100 Hz
        return None
    freqs = np.fft.rfftfreq(seg, 1.0 / _AHASH_RATE)
    band_of = np.digitize(freqs, _AHASH_BANDS) - 1   # -1/8 = outside
    energies = np.zeros((_AHASH_SEGMENTS, 8))
    for t in range(_AHASH_SEGMENTS):
        spec = np.abs(np.fft.rfft(x[t * seg:(t + 1) * seg])) ** 2
        for b in range(8):
            energies[t, b] = spec[band_of == b].sum()
    if energies.sum() <= 0.0:
        return None
    bits = (energies[1:] > energies[:-1]).reshape(-1)   # 8x8 row-major
    return _bits_to_signed64(bits)


def audio_ahash(media: DataFrame, extra_cols: tuple = ()) -> DataFrame:
    """(id, sim) perceptual fingerprints for every DECODABLE audio
    payload — rides the same Arrow kernel as :func:`image_dhash`
    (:func:`_media_fingerprints`), so the banding/streaming faces of
    the two modalities share one implementation."""
    return _media_fingerprints(media, "audio", ahash64,
                               extra_cols=extra_cols)


def audio_neardup_pairs(media: DataFrame, max_hamming: int = 6,
                        n_blocks: int = 8,
                        max_bucket: Optional[int] = 2000,
                        cap_report: Optional[dict] = None,
                        hot_policy: str = "drop") -> DataFrame:
    """Audio near-duplicate pairs: aHash fingerprints joined through
    the SAME Manku banding engine as text SimHash and image dHash
    (``dedup.hamming_band_pairs``) — one blocking implementation, two
    media modalities, identical ``(id_a, id_b, hamming)`` contract,
    the same hot-bucket telemetry and reband policy."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        hamming_band_pairs,
    )
    fps = audio_ahash(media).localCheckpoint(eager=False)
    return hamming_band_pairs(fps, max_hamming=max_hamming,
                              n_blocks=n_blocks, max_bucket=max_bucket,
                              cap_report=cap_report,
                              hot_policy=hot_policy)


def audio_dedup(media: DataFrame, max_hamming: int = 6,
                n_blocks: int = 8,
                max_bucket: Optional[int] = 2000,
                cap_report: Optional[dict] = None,
                hot_policy: str = "drop") -> DataFrame:
    """End-to-end audio dedup: keep ONE clip per perceptual-dup
    cluster (components over :func:`audio_neardup_pairs`, lowest
    ``media_id`` canonical). Undecodable/compressed-sample formats
    can never pair, so they always pass through — the same honesty
    contract as :func:`image_dedup`."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        dedup_by_components,
    )
    pairs = audio_neardup_pairs(media, max_hamming=max_hamming,
                                n_blocks=n_blocks,
                                max_bucket=max_bucket,
                                cap_report=cap_report,
                                hot_policy=hot_policy)
    return dedup_by_components(media, pairs, id_col="media_id")


# ---------------------------------------------------------------------------
# media census (mergeable per-kind telemetry, the media face of
# text.corpus_census)
# ---------------------------------------------------------------------------

def media_census(media: DataFrame) -> DataFrame:
    """Mergeable per-kind media census: ``(kind, stratum, n_items,
    n_bytes)`` with ``kind='media_kind'`` rows per media kind plus one
    ``'__total__'`` row — the media face of ``text.corpus_census``
    (same shape discipline: exact integer sums, |kinds|+1 rows, so the
    fold machinery and the Datasheets-style reporting treat documents
    and media uniformly). Merge law: :func:`merge_media_census` over
    two disjoint batches equals the census of their union (pinned in
    tests) — the property continuous ingest folds on."""
    per_kind = (media.groupBy(F.col("kind").alias("stratum"))
                .agg(F.count(F.lit(1)).alias("n_items"),
                     F.coalesce(F.sum(F.octet_length("payload")),
                                F.lit(0)).alias("n_bytes"))
                .select(F.lit("media_kind").alias("kind"), "stratum",
                        "n_items", "n_bytes"))
    total = (media.agg(F.count(F.lit(1)).alias("n_items"),
                       F.coalesce(F.sum(F.octet_length("payload")),
                                  F.lit(0)).alias("n_bytes"))
             .select(F.lit("__total__").alias("kind"),
                     F.lit("__total__").alias("stratum"),
                     "n_items", "n_bytes"))
    return per_kind.unionByName(total)


def merge_media_census(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two media censuses: exact integer sums per (kind,
    stratum) — ``merge(census(A), census(B)) == census(A ∪ B)`` for
    disjoint A/B, the invariant the streaming sink relies on."""
    return (a.unionByName(b)
            .groupBy("kind", "stratum")
            .agg(F.sum("n_items").alias("n_items"),
                 F.sum("n_bytes").alias("n_bytes")))


# ---------------------------------------------------------------------------
# AVI container tier: REAL frame decode for uncompressed-DIB and MJPEG
# video (RIFF 'AVI ' list walk; MJPEG frames ride operators/jpeg.py's
# baseline decoder) — the video face of the image/audio codec tiers.
# Inter-frame codecs (H.264/VP9/...) remain ffmpeg territory and fall
# back to the mp4meta/avimeta metadata walks, never a fake decode.
# ---------------------------------------------------------------------------

def _avi_subchunks(data: bytes, pos: int, end: int):
    """(fourcc, lo, hi) payload ranges of the RIFF chunks in
    ``data[pos:end]`` (word-aligned, truncation-safe)."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        lo = pos + 8
        hi = min(lo + size, end)
        yield cid, lo, hi
        pos = lo + size + (size & 1)


def _avi_header_walk(p: bytes) -> Optional[dict]:
    """hdrl walk shared by the meta and frame tiers: avih dims/counts
    plus the FIRST 'vids' stream's (index, codec fourcc, fps, strf
    BITMAPINFOHEADER fields). None for non-AVI payloads."""
    if not (p is not None and len(p) >= 12 and p[:4] == b"RIFF"
            and p[8:12] == b"AVI "):
        return None
    out = {"width": 0, "height": 0, "fps": 0.0, "n_frames": 0,
           "n_streams": 0, "video_codec": None, "vids_index": None,
           "bit_count": 24, "compression": 0, "movi": None}
    stream_no = 0
    for cid, lo, hi in _avi_subchunks(p, 12, len(p)):
        if cid != b"LIST":
            continue
        ltype = p[lo:lo + 4]
        if ltype == b"movi":
            out["movi"] = (lo + 4, hi)
        elif ltype == b"hdrl":
            for hcid, hlo, hhi in _avi_subchunks(p, lo + 4, hi):
                if hcid == b"avih" and hhi - hlo >= 40:
                    out["n_frames"] = int.from_bytes(
                        p[hlo + 16:hlo + 20], "little")
                    out["n_streams"] = int.from_bytes(
                        p[hlo + 24:hlo + 28], "little")
                    out["width"] = int.from_bytes(
                        p[hlo + 32:hlo + 36], "little")
                    out["height"] = int.from_bytes(
                        p[hlo + 36:hlo + 40], "little")
                    us = int.from_bytes(p[hlo:hlo + 4], "little")
                    if us:
                        out["fps"] = 1e6 / us
                elif hcid == b"LIST" and p[hlo:hlo + 4] == b"strl":
                    strh = strf = None
                    for scid, slo, shi in _avi_subchunks(
                            p, hlo + 4, hhi):
                        if scid == b"strh" and strh is None:
                            strh = (slo, shi)
                        elif scid == b"strf" and strf is None:
                            strf = (slo, shi)
                    if strh is not None:
                        slo, shi = strh
                        if (shi - slo >= 32
                                and p[slo:slo + 4] == b"vids"
                                and out["vids_index"] is None):
                            out["vids_index"] = stream_no
                            handler = p[slo + 4:slo + 8]
                            out["video_codec"] = (
                                handler.decode("ascii", "replace")
                                .strip() or None)
                            scale = int.from_bytes(
                                p[slo + 20:slo + 24], "little")
                            rate = int.from_bytes(
                                p[slo + 24:slo + 28], "little")
                            if scale and rate:
                                out["fps"] = rate / scale
                            if strf is not None:
                                flo, fhi = strf
                                if fhi - flo >= 20:
                                    out["bit_count"] = int.from_bytes(
                                        p[flo + 14:flo + 16], "little")
                                    out["compression"] = \
                                        int.from_bytes(
                                            p[flo + 16:flo + 20],
                                            "little")
                    stream_no += 1
    if out["vids_index"] is None and out["n_frames"] == 0:
        return None
    return out


def parse_avi_meta(payload: bytes) -> Optional[dict]:
    """REAL AVI container metadata WITHOUT sample decode: RIFF list
    walk over hdrl (avih + per-stream strh/strf) giving duration /
    dimensions / fps / frame count / video codec fourcc — the RIFF
    twin of :func:`parse_mp4_meta` (provenance ``avimeta``). None for
    non-AVI payloads."""
    h = _avi_header_walk(bytes(payload)) if payload is not None else None
    if h is None:
        return None
    fps = h["fps"]
    return {"width": float(h["width"]), "height": float(h["height"]),
            "fps": float(fps), "n_frames": float(h["n_frames"]),
            "duration_sec": (h["n_frames"] / fps) if fps else 0.0,
            "n_streams": float(h["n_streams"]),
            "video_codec": h["video_codec"]}


def avi_frames(payload: bytes,
               max_frames: int = 8) -> Optional[list]:
    """Up to ``max_frames`` EVENLY-SPACED decoded video frames of an
    AVI payload as ``(width, height, HxWxC uint8)`` rasters — REAL
    decode for the two codecs this environment can honestly do:

    - uncompressed DIB (``biCompression=0``, 24/32-bit): bottom-up
      BGR(A) rows, 4-byte row stride — the BMP raster without the BMP
      file header;
    - MJPEG (``MJPG`` fourcc): every frame chunk is a standalone
      baseline/progressive JPEG, decoded by ``operators/jpeg.py``.

    Returns None when the payload is not AVI or no frame decodes
    (inter-frame codecs) — undecodable videos skip hashing rather
    than fake it, the same honesty contract as the image/audio
    tiers. Even spacing (not the first N) is what makes the
    downstream vHash stable across trims at the tail."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.jpeg import (
        parse_jpeg,
    )
    if payload is None:
        return None
    p = bytes(payload)
    h = _avi_header_walk(p)
    if h is None or h["movi"] is None:
        return None
    sid = b"%02d" % (h["vids_index"] if h["vids_index"] is not None
                     else 0)
    spans = []

    def walk_movi(lo, hi):
        for cid, clo, chi in _avi_subchunks(p, lo, hi):
            if cid == b"LIST" and p[clo:clo + 4] == b"rec ":
                walk_movi(clo + 4, chi)     # interleave groups
            elif cid[:2] == sid and cid[2:4] in (b"db", b"dc"):
                spans.append((clo, chi))

    walk_movi(*h["movi"])
    if not spans:
        return None
    n = len(spans)
    # sample by TIMELINE FRACTION (round(t·(n−1)) at max_frames
    # evenly-spaced t), not by frame index: a frame-rate-halved copy
    # then samples (nearly) the same timeline positions, so its
    # per-frame hashes line up with the original's — duplicates are
    # kept and act as vote weights downstream
    k = min(max_frames, max(n, 1))
    take = [round(i * (n - 1) / max(k - 1, 1)) for i in range(k)]
    w, hh, bits = h["width"], h["height"], h["bit_count"]
    frames = []
    for i in take:
        lo, hi = spans[i]
        chunk = p[lo:hi]
        if chunk[:2] == b"\xFF\xD8":        # MJPEG frame
            parsed = parse_jpeg(chunk)
            if parsed is not None:
                frames.append(parsed)
            continue
        if h["compression"] == 0 and bits in (24, 32) and w and hh:
            stride = ((w * bits // 8) + 3) & ~3
            if len(chunk) < stride * hh:
                continue
            rows = np.frombuffer(
                chunk[:stride * hh],
                dtype=np.uint8).reshape(hh, stride)
            px = rows[:, :w * (bits // 8)] \
                .reshape(hh, w, bits // 8)
            rgb = px[::-1, :, 2::-1]        # bottom-up BGR(A) → RGB
            frames.append((w, hh, np.ascontiguousarray(rgb)))
    return frames or None


def write_avi(frames: list, fps: float = 10.0,
              codec: str = "DIB ") -> bytes:
    """Minimal valid AVI writer for the two decodable codecs —
    ``codec='DIB '`` stores each HxWx3 RGB uint8 frame as an
    uncompressed bottom-up BGR DIB; ``codec='MJPG'`` encodes each
    frame through :func:`~...jpeg.write_jpeg`. The fixture/round-trip
    twin of :func:`avi_frames`, like ``write_bmp``/``write_wav`` for
    their tiers."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.jpeg import (
        write_jpeg,
    )
    if codec not in ("DIB ", "MJPG"):
        raise ValueError(f"unsupported AVI codec {codec!r}")
    if not frames:
        raise ValueError("write_avi needs at least one frame")
    h, w = frames[0].shape[:2]

    def u32(v):
        return int(v).to_bytes(4, "little")

    def u16(v):
        return int(v).to_bytes(2, "little")

    def chunk(cid, data):
        return cid + u32(len(data)) + data + (b"\x00" * (len(data) & 1))

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    frame_blobs = []
    for arr in frames:
        if arr.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        if codec == "MJPG":
            frame_blobs.append(chunk(b"00dc", write_jpeg(arr)))
        else:
            stride = ((w * 3) + 3) & ~3
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
            frame_blobs.append(chunk(b"00db", rows.tobytes()))
    max_len = max(len(b) - 8 for b in frame_blobs)
    scale, rate = 1000, int(round(fps * 1000))
    avih = (u32(int(1e6 / fps)) + u32(0) + u32(0) + u32(0)
            + u32(len(frames)) + u32(0) + u32(1) + u32(max_len)
            + u32(w) + u32(h) + u32(0) * 4)
    strh = (b"vids" + codec.encode("ascii") + u32(0) + u16(0) + u16(0)
            + u32(0) + u32(scale) + u32(rate) + u32(0)
            + u32(len(frames)) + u32(max_len) + u32(0xFFFFFFFF)
            + u32(0) + u16(0) + u16(0) + u16(w) + u16(h))
    strf = (u32(40) + u32(w) + u32(h) + u16(1) + u16(24)
            + (u32(0) if codec == "DIB "
               else b"MJPG") + u32(max_len) + u32(0) * 4)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(frame_blobs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + u32(len(body)) + body


# ---------------------------------------------------------------------------
# perceptual video fingerprinting (per-frame dHash majority vote over
# the real AVI decode tier, paired through the same hamming banding)
# ---------------------------------------------------------------------------

def video_frames(payload: bytes, max_frames: int = 8) -> Optional[list]:
    """Container-independent evenly-spaced decoded video frames:
    AVI (:func:`avi_frames` — DIB/MJPEG) then animated GIF
    (:func:`gif_frames` — full disposal compositing). One dispatcher
    so vHash, per-frame containment hashing and frame sampling treat
    every decodable moving-picture container identically — the video
    twin of :func:`audio_mono_samples`."""
    frames = avi_frames(payload, max_frames=max_frames)
    if frames is None and payload is not None:
        p = bytes(payload)
        if p[:6] in (b"GIF87a", b"GIF89a"):
            frames = gif_frames(p, max_frames=max_frames)
    return frames


def vhash64(payload: bytes, max_frames: int = 8,
            decode_fn: Optional[callable] = None) -> Optional[int]:
    """64-bit perceptual video hash: dHash (:func:`_dhash_bits`, the
    EXACT grid math stills use) over up to ``max_frames``
    evenly-spaced decoded frames, then a per-bit MAJORITY VOTE across
    frames (ties set the bit). Stable under re-encoding (DIB↔MJPEG),
    per-frame noise, and frame-rate halving (even spacing samples the
    same timeline positions); unrelated videos land ~32 bits apart —
    the video member of the dHash/aHash fingerprint family, signed
    64-bit for the shared banding convention.

    ``decode_fn`` is the native-codec escape hatch (an
    ffmpeg/PyAV wrapper, ``bytes -> [(w, h, HxWxC uint8), ...] |
    None``) tried FIRST, with the stdlib AVI tier as default,
    fallback, and correctness oracle — the hash math downstream of
    the decode is identical either way. Returns None when no frame
    decodes (inter-frame codecs, malformed payloads, frames below
    the 9x8 grid): undecodable videos skip hashing, never fake it."""
    if payload is None:
        return None
    p = bytes(payload)
    frames = decode_fn(p) if decode_fn is not None else None
    if frames is None:
        frames = video_frames(p, max_frames=max_frames)
    if not frames:
        return None
    votes = np.zeros(64, dtype=np.int64)
    n = 0
    for w, h, arr in frames:
        bits = _dhash_bits(w, h, arr)
        if bits is None:
            continue
        votes += bits
        n += 1
    if n == 0:
        return None
    return _bits_to_signed64(votes * 2 >= n)


def video_vhash(media: DataFrame, extra_cols: tuple = (),
                decode_fn: Optional[callable] = None) -> DataFrame:
    """(id, sim) perceptual fingerprints for every DECODABLE video
    payload — rides the same Arrow kernel as :func:`image_dhash` and
    :func:`audio_ahash` (:func:`_media_fingerprints`), so all three
    modalities share one banding/streaming implementation."""
    return _media_fingerprints(
        media, "video",
        (vhash64 if decode_fn is None
         else (lambda p, _fn=decode_fn: vhash64(p, decode_fn=_fn))),
        extra_cols=extra_cols)


def video_neardup_pairs(media: DataFrame, max_hamming: int = 6,
                        n_blocks: int = 8,
                        max_bucket: Optional[int] = 2000,
                        cap_report: Optional[dict] = None,
                        decode_fn: Optional[callable] = None,
                        hot_policy: str = "drop") -> DataFrame:
    """Video near-duplicate pairs: vHash fingerprints joined through
    the SAME Manku banding engine as text SimHash, image dHash and
    audio aHash (``dedup.hamming_band_pairs``) — one blocking
    implementation, three media modalities, identical
    ``(id_a, id_b, hamming)`` contract, the same hot-bucket telemetry
    and reband policy."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        hamming_band_pairs,
    )
    fps = video_vhash(media, decode_fn=decode_fn) \
        .localCheckpoint(eager=False)
    return hamming_band_pairs(fps, max_hamming=max_hamming,
                              n_blocks=n_blocks, max_bucket=max_bucket,
                              cap_report=cap_report,
                              hot_policy=hot_policy)


def video_dedup(media: DataFrame, max_hamming: int = 6,
                n_blocks: int = 8,
                max_bucket: Optional[int] = 2000,
                cap_report: Optional[dict] = None,
                decode_fn: Optional[callable] = None,
                hot_policy: str = "drop") -> DataFrame:
    """End-to-end video dedup: keep ONE clip per perceptual-dup
    cluster (components over :func:`video_neardup_pairs`, lowest
    ``media_id`` canonical). Undecodable/inter-frame-coded formats
    can never pair, so they always pass through — the same honesty
    contract as :func:`image_dedup` and :func:`audio_dedup`."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        dedup_by_components,
    )
    pairs = video_neardup_pairs(media, max_hamming=max_hamming,
                                n_blocks=n_blocks,
                                max_bucket=max_bucket,
                                cap_report=cap_report,
                                decode_fn=decode_fn,
                                hot_policy=hot_policy)
    return dedup_by_components(media, pairs, id_col="media_id")


def video_frame_hashes(media: DataFrame, max_frames: int = 16,
                       decode_fn: Optional[callable] = None,
                       extra_cols: tuple = ()) -> DataFrame:
    """(id, frame_idx, sim) per-frame dHash rows for every decodable
    video payload — the FRAME-level face of :func:`video_vhash`
    (which majority-votes these same bits into one clip hash). One
    Arrow payload scan; ``frame_idx`` is the position in the
    timeline-fraction sample (0..max_frames-1). Within one video,
    frames with IDENTICAL hashes collapse to the first occurrence —
    frame rows are distinct-content identities here, not vote
    weights, so a static scene contributes ONE row however long it
    holds. ``decode_fn`` is the same native-codec hook as
    :func:`vhash64`; ``extra_cols`` pass through (streaming callers
    carry the event-time column)."""

    def one(p):
        if p is None:
            return None
        p = bytes(p)
        frames = decode_fn(p) if decode_fn is not None else None
        if frames is None:
            frames = video_frames(p, max_frames=max_frames)
        if not frames:
            return None
        out, seen = [], set()
        for j, (w, h, arr) in enumerate(frames):
            bits = _dhash_bits(w, h, arr)
            if bits is None:
                continue
            sim = _bits_to_signed64(bits)
            if sim in seen:
                continue
            seen.add(sim)
            out.append((j, sim))
        return out or None

    return _subitem_hashes(media, "video", one, "frame_idx",
                           extra_cols=extra_cols)


def _subitem_hashes(media: DataFrame, kind: str, windows_fn,
                    idx_name: str, extra_cols: tuple = ()) -> DataFrame:
    """Shared 1->N Arrow kernel turning one media kind's payloads into
    ``(id, <idx_name>, sim)`` sub-item fingerprint rows via
    ``windows_fn`` (picklable, ``bytes -> [(idx, sim), ...] | None``)
    — video frame hashes and audio anchor windows ride identical
    plumbing, like :func:`_media_fingerprints` for whole-item hashes.
    ``extra_cols`` replicate onto every sub-item row."""
    import pandas as pd

    extras = list(extra_cols)
    sub = media.select("media_id", "kind", "payload", *extras)
    extra_fields = ", ".join(
        f"{c} {media.schema[c].dataType.simpleString()}" for c in extras)
    out_schema = f"id long, {idx_name} int, sim long" + (
        ", " + extra_fields if extras else "")

    def kernel(batches):
        for pdf in batches:
            rows = {"id": [], idx_name: [], "sim": [],
                    **{c: [] for c in extras}}
            for i in range(len(pdf)):
                if pdf["kind"].iloc[i] != kind:
                    continue
                ws = windows_fn(pdf["payload"].iloc[i])
                if not ws:
                    continue
                for j, sim in ws:
                    rows["id"].append(int(pdf["media_id"].iloc[i]))
                    rows[idx_name].append(j)
                    rows["sim"].append(sim)
                    for c in extras:
                        rows[c].append(pdf[c].iloc[i])
            out = pd.DataFrame(rows)
            out["id"] = out["id"].astype("int64")
            out[idx_name] = out[idx_name].astype("int32")
            out["sim"] = out["sim"].astype("int64")
            yield out

    return sub.mapInPandas(kernel, out_schema)


def video_containment_pairs(media: DataFrame,
                            min_shared_frames: int = 3,
                            max_frames: int = 16,
                            max_hamming: int = 6, n_blocks: int = 8,
                            max_bucket: Optional[int] = 2000,
                            cap_report: Optional[dict] = None,
                            decode_fn: Optional[callable] = None,
                            hot_policy: str = "drop") -> DataFrame:
    """Sub-clip (containment) video matching: find video pairs that
    share ≥ ``min_shared_frames`` near-duplicate FRAMES — the case
    whole-clip vHash structurally misses (a clip trimmed out of a
    longer video samples different timeline fractions, so its
    majority vote lands far from the original's even though every
    frame matches). Per-frame dHash rows pack ``(media_id,
    frame_idx)`` into one 64-bit id (``media_id·4096 + idx`` —
    max_frames is bounded at 4096) and ride the SAME Manku banding
    engine; matched frame pairs then roll up per video pair, counting
    DISTINCT matched frames on EACH side — a static scene matching
    one frame many times counts once, so repeated-frame false
    positives stay below the threshold. Output: ``(id_a, id_b,
    shared_frames, min_hamming)`` with ``id_a < id_b``,
    ``shared_frames = least(distinct matched frames of a, of b)``.

    Scale shape: ≤ ``max_frames`` 16-byte rows per video after one
    Arrow payload scan, banded equi-join (hot-bucket cap + telemetry
    as everywhere), one groupBy on the video pair — never a
    quadratic frame or video scan."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        hamming_band_pairs,
    )
    if not 0 < max_frames <= 4096:
        raise ValueError("max_frames must be in 1..4096 (frame_idx "
                         "packs into 12 bits of the pair id)")
    fh = video_frame_hashes(media, max_frames=max_frames,
                            decode_fn=decode_fn)
    return _containment_rollup(
        fh.withColumnRenamed("frame_idx", "idx"), min_shared_frames,
        "shared_frames", max_hamming=max_hamming, n_blocks=n_blocks,
        max_bucket=max_bucket, cap_report=cap_report,
        hot_policy=hot_policy)


def _containment_rollup(hashes: DataFrame, min_shared: int,
                        shared_col: str, max_hamming: int = 6,
                        n_blocks: int = 8,
                        max_bucket: Optional[int] = 2000,
                        cap_report: Optional[dict] = None,
                        hot_policy: str = "drop") -> DataFrame:
    """Shared containment core over an ``(id, idx, sim)`` sub-item
    fingerprint frame (video frames, audio anchor windows): pack
    ``(id, idx)`` into one 64-bit id (``id·4096 + idx``), pair
    through the Manku banding engine, roll matched sub-item pairs up
    per ITEM pair counting distinct matches on each side. Output
    ``(id_a, id_b, <shared_col>, min_hamming)`` with ``id_a <
    id_b`` and ``<shared_col> >= min_shared``."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        hamming_band_pairs,
    )
    packed = hashes.select(
        (F.col("id") * 4096 + F.col("idx")).alias("id"), "sim") \
        .localCheckpoint(eager=False)
    pairs = hamming_band_pairs(packed, max_hamming=max_hamming,
                               n_blocks=n_blocks, max_bucket=max_bucket,
                               cap_report=cap_report,
                               hot_policy=hot_policy)
    # packed ids order by (item, idx), so id_a < id_b across two
    # different items already means item_a < item_b — no swap
    by_item = (pairs
               .select(F.expr("id_a div 4096").alias("va"),  # integral
                       (F.col("id_a") % 4096).alias("fa"),   # div: no
                       F.expr("id_b div 4096").alias("vb"),  # float
                       (F.col("id_b") % 4096).alias("fb"),   # precision
                       "hamming")                            # loss
               .filter(F.col("va") != F.col("vb")))
    return (by_item.groupBy(F.col("va").alias("id_a"),
                            F.col("vb").alias("id_b"))
            .agg(F.least(F.countDistinct("fa"),
                         F.countDistinct("fb"))
                 .alias(shared_col),
                 F.min("hamming").alias("min_hamming"))
            .filter(F.col(shared_col) >= min_shared))


# ---------------------------------------------------------------------------
# audio sub-clip containment: onset-anchored window fingerprints —
# the audio face of video_containment_pairs. Whole-clip aHash is
# length-proportional (9 segments scale with the clip), so a TRIM
# structurally breaks it; fixed-stride windows break too (a 50 ms
# window misalignment already costs ~7 bits — measured). Anchoring
# windows on the CONTENT (onset = strict local max of the hop-energy
# log-rise, refined to the steepest 4 ms rise) makes window starts
# trim-invariant: the same onset yields the same window wherever the
# clip was cut, as long as the onset itself survives.
# ---------------------------------------------------------------------------

_ANCHOR_HOP_MS = 25
_ANCHOR_RADIUS = 8          # strict-max radius in hops (±200 ms)
_ANCHOR_BLK = 32            # 4 ms refine blocks at 8 kHz


def audio_anchor_hashes(payload: bytes, window_sec: float = 2.0,
                        min_rise: float = 1.15,
                        max_windows: int = 64) -> Optional[list]:
    """Onset-anchored window fingerprints of one audio payload:
    ``[(anchor_pos_sec, sim), ...]`` (at most ``max_windows``, evenly
    thinned, identical hashes deduped) or None when nothing decodes
    or no onset clears ``min_rise``. Each window is
    :func:`_ahash_from_samples` over ``window_sec`` starting AT the
    onset — the refine step pins the start to a 4 ms block, inside
    the ~2-bit jitter budget the windowed hash tolerates
    (misalignment sensitivity measured: 25 ms ≈ 2 bits, 50 ms ≈ 7).
    WAV and FLAC payloads both decode (:func:`audio_mono_samples`)."""
    decoded = audio_mono_samples(payload)
    if decoded is None:
        return None
    rate, x = decoded
    if rate <= 0:
        return None
    x = _resample_mono(x, rate, _AHASH_RATE)
    hop = (_AHASH_RATE * _ANCHOR_HOP_MS) // 1000
    W = int(_AHASH_RATE * window_sec)
    n = len(x) // hop
    if n < 2 * _ANCHOR_RADIUS + 3:
        return None
    e = (x[:n * hop] ** 2).reshape(n, hop).sum(axis=1) + 1e-12
    rise = np.log(e[1:] / e[:-1])    # gain cancels in the ratio
    out, seen = [], set()
    for k in range(_ANCHOR_RADIUS, len(rise) - _ANCHOR_RADIUS):
        sl = rise[k - _ANCHOR_RADIUS:k + _ANCHOR_RADIUS + 1]
        if sl.argmax() != _ANCHOR_RADIUS or rise[k] < np.log(min_rise):
            continue
        lo, hi = k * hop, min(len(x), (k + 2) * hop)
        nb = (hi - lo) // _ANCHOR_BLK
        if nb < 2:
            continue
        be = (x[lo:lo + nb * _ANCHOR_BLK] ** 2) \
            .reshape(nb, _ANCHOR_BLK).sum(axis=1) + 1e-12
        t0 = lo + (int(np.argmax(be[1:] / be[:-1])) + 1) * _ANCHOR_BLK
        if t0 + W > len(x):
            continue
        h = _ahash_from_samples(x[t0:t0 + W])
        if h is None or h in seen:
            continue
        seen.add(h)
        out.append((t0 / _AHASH_RATE, h))
    if not out:
        return None
    if len(out) > max_windows:    # evenly thin, keep timeline spread
        out = [out[(i * (len(out) - 1)) // (max_windows - 1)]
               for i in range(max_windows)]
    return out


def audio_window_hashes(media: DataFrame, window_sec: float = 2.0,
                        min_rise: float = 1.15,
                        max_windows: int = 64,
                        extra_cols: tuple = ()) -> DataFrame:
    """(id, idx, sim) onset-anchored window fingerprints for every
    decodable audio payload — the audio twin of
    :func:`video_frame_hashes`, riding the same
    :func:`_subitem_hashes` Arrow kernel (one plumbing, two
    modalities; same distinct-content dedupe)."""

    def one(p):
        if p is None:
            return None
        ws = audio_anchor_hashes(bytes(p), window_sec=window_sec,
                                 min_rise=min_rise,
                                 max_windows=max_windows)
        return ([(j, h) for j, (_, h) in enumerate(ws)]
                if ws else None)

    return _subitem_hashes(media, "audio", one, "idx",
                           extra_cols=extra_cols)


def incremental_containment_pairs(new_hashes: DataFrame,
                                  seen_banded: DataFrame,
                                  min_shared: int = 2,
                                  shared_col: str = "shared_frames",
                                  max_hamming: int = 6,
                                  n_blocks: int = 8,
                                  key_blocks: Optional[int] = None) -> DataFrame:
    """Probe a NEW batch's ``(id, idx, sim)`` sub-item hashes against
    a persisted PACKED-ID hamming snapshot (``hamming_band_keys`` over
    ``id·4096 + idx`` rows — the containment store the NL build face
    persists) and roll frame/window matches up per item pair:
    ``(id_new, id_seen, <shared_col>, min_hamming)`` with
    ``<shared_col> >= min_shared``. Cost scales with the batch (the
    probe broadcast-prunes the snapshot), never the corpus — the
    containment face of :func:`~...dedup.incremental_hamming_pairs`.
    No id-equality exclusion: a re-ingested video SHOULD flag against
    its stored self."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.dedup import (
        incremental_hamming_pairs,
    )
    idx_col = new_hashes.columns[1]     # frame_idx / idx
    packed = new_hashes.select(
        (F.col("id") * 4096 + F.col(idx_col)).alias("id"), "sim")
    pairs = incremental_hamming_pairs(
        packed, seen_banded, max_hamming=max_hamming,
        n_blocks=n_blocks, key_blocks=key_blocks)
    by_item = pairs.select(
        F.expr("id_new div 4096").alias("vn"),
        (F.col("id_new") % 4096).alias("fn"),
        F.expr("id_seen div 4096").alias("vs"),
        (F.col("id_seen") % 4096).alias("fs"), "hamming")
    return (by_item.groupBy(F.col("vn").alias("id_new"),
                            F.col("vs").alias("id_seen"))
            .agg(F.least(F.countDistinct("fn"), F.countDistinct("fs"))
                 .alias(shared_col),
                 F.min("hamming").alias("min_hamming"))
            .filter(F.col(shared_col) >= min_shared))


def audio_containment_pairs(media: DataFrame,
                            min_shared_windows: int = 2,
                            window_sec: float = 2.0,
                            max_windows: int = 64,
                            max_hamming: int = 6, n_blocks: int = 8,
                            max_bucket: Optional[int] = 2000,
                            cap_report: Optional[dict] = None,
                            hot_policy: str = "drop") -> DataFrame:
    """Sub-clip (containment) audio matching: clip pairs sharing ≥
    ``min_shared_windows`` near-duplicate onset-anchored windows —
    the case whole-clip aHash structurally misses (a trim rescales
    its 9 segments). Same packed-id + banding + per-side
    distinct-count rollup as :func:`video_containment_pairs`
    (:func:`_containment_rollup`); output ``(id_a, id_b,
    shared_windows, min_hamming)``."""
    if not 0 < max_windows <= 4096:
        raise ValueError("max_windows must be in 1..4096 (idx packs "
                         "into 12 bits of the pair id)")
    wh = audio_window_hashes(media, window_sec=window_sec,
                             max_windows=max_windows)
    return _containment_rollup(
        wh, min_shared_windows, "shared_windows",
        max_hamming=max_hamming, n_blocks=n_blocks,
        max_bucket=max_bucket, cap_report=cap_report,
        hot_policy=hot_policy)


def resize_avi(payload: bytes, width: int, height: int) -> bytes:
    """REAL per-frame nearest-neighbor resize for decodable AVI
    (uncompressed DIB / MJPEG), re-encoded as uncompressed DIB at the
    source frame rate — the video member of the per-format resize
    family (``resize_bmp``/``resize_jpeg``/...). Raises the PIL-slot
    NotImplementedError for inter-frame codecs, like its siblings."""
    p = bytes(payload)
    h = _avi_header_walk(p)
    frames = avi_frames(p, max_frames=4096)
    if h is None or not frames:
        raise NotImplementedError(
            "non-AVI/inter-frame video resize requires ffmpeg; "
            "not available here")
    out = []
    for w0, h0, arr in frames:
        rows = (np.arange(height) * h0) // height
        cols = (np.arange(width) * w0) // width
        rgb = arr[:, :, :3] if arr.shape[2] >= 3 else \
            arr.repeat(3, axis=2)
        out.append(np.ascontiguousarray(rgb[rows][:, cols]))
    return write_avi(out, fps=h["fps"] or 10.0, codec="DIB ")


def resize_videos(media: DataFrame, width: int = 64,
                  height: int = 64) -> DataFrame:
    """Binary -> binary video resize kernel (1:1 rows): decodable AVI
    payloads get the REAL per-frame resize (:func:`resize_avi`);
    anything else falls back to the deterministic truncate-or-pad the
    image kernel uses for its PIL slot. Same schema/batch contract as
    :func:`resize_images`."""
    target = width * height

    out_schema = StructType(MEDIA_SCHEMA.fields + [
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ])

    def one(p):
        if p is None:
            return None
        b = bytes(p)
        try:
            return resize_avi(b, width, height)
        except NotImplementedError:
            pass
        except Exception:  # noqa: BLE001 — malformed AVI falls back,
            pass           # never fails the task
        return (b[:target] if len(b) >= target
                else b + b"\x00" * (target - len(b)))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [one(p) for p in pdf["payload"]]
            out = pdf.copy()
            out["payload"] = resized
            out["n_bytes"] = [len(p) if p is not None else 0
                              for p in resized]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(kernel, schema=out_schema)


def container_ext(payload, kind=None):
    """Pure column expression: the payload's container FORMAT as a
    file extension, sniffed from magic bytes — entirely JVM-side
    (a ``hex(substring)`` prefix compare, no UDF), so deriving
    extensions for a 100 TB media export costs nothing beyond the
    scan that reads the payloads anyway. Covers every container the
    engine's decode tier speaks (netpbm/BMP/PNG/JPEG/GIF/TIFF/WebP,
    WAV/FLAC/Ogg/MP4, AVI) plus the RIFF subtype split; anything
    unrecognized falls back to the ``kind`` column's coarse class
    (``image``→``img`` etc.) or ``bin`` — a wrong-but-honest generic
    extension, never a misleading specific one. Built for
    :func:`...sinks.write_webdataset`'s ``ext_col``."""
    p = F.col(payload) if isinstance(payload, str) else payload
    h8 = F.upper(F.hex(F.substring(p, 1, 4)))
    riff_sub = F.upper(F.hex(F.substring(p, 9, 4)))
    ftyp = F.upper(F.hex(F.substring(p, 5, 4)))
    k = (F.col(kind) if isinstance(kind, str)
         else (kind if kind is not None else F.lit(None)))
    fallback = (F.when(k == "image", F.lit("img"))
                .when(k == "audio", F.lit("aud"))
                .when(k == "video", F.lit("vid"))
                .otherwise(F.lit("bin")))
    return (
        F.when(h8.startswith("FFD8"), F.lit("jpg"))
        .when(h8 == "89504E47", F.lit("png"))
        .when(h8.startswith("474946"), F.lit("gif"))
        .when(h8.startswith("424D"), F.lit("bmp"))
        .when(h8 == "664C6143", F.lit("flac"))
        .when(h8 == "4F676753", F.lit("ogg"))
        .when(h8.startswith("494433") | h8.startswith("FFFB")
              | h8.startswith("FFF3"), F.lit("mp3"))
        .when((h8 == "49492A00") | (h8 == "4D4D002A"), F.lit("tif"))
        # netpbm: 'P5'/'P6' + whitespace
        .when(h8.startswith("5035"), F.lit("pgm"))
        .when(h8.startswith("5036"), F.lit("ppm"))
        .when(h8 == "52494646",                       # RIFF subtype
              F.when(riff_sub == "57415645", F.lit("wav"))
              .when(riff_sub == "41564920", F.lit("avi"))
              .when(riff_sub == "57454250", F.lit("webp"))
              .otherwise(fallback))
        .when(ftyp == "66747970", F.lit("mp4"))       # ISO-BMFF ftyp
        .otherwise(fallback))
