"""Baseline JPEG codec in stdlib + numpy — no PIL.

Decoder: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
component sampling factors in {1, 2} (4:4:4 / 4:2:2 / 4:2:0), restart
markers, 0xFF00 byte stuffing. Encoder: 4:4:4 YCbCr (or grayscale)
with the JPEG Annex K quantization + Huffman tables, quality-scaled
per the IJG curve — enough to round-trip our own output and decode
typical camera/tool baseline files; progressive (SOF2), arithmetic and
12-bit variants are out of scope and return None so callers fall back.

This exists because the multimodal tier (``operators/multimodal.py``)
wants REAL decode provenance for the common training-data image
formats, and the sandbox has no PIL: netpbm/BMP/PNG were pure byte
plumbing, JPEG needs the actual entropy-decode + IDCT pipeline, which
is ~300 lines of numpy below. The 8x8 IDCT is a pair of matrix
multiplies (the orthonormal DCT-II basis), vectorized over all blocks
of a component at once — no per-pixel Python in the hot loop.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# orthonormal 8x8 DCT-II basis: basis[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_BASIS = np.array([[np.cos((2 * x + 1) * u * np.pi / 16)
                    * (np.sqrt(0.5) if u == 0 else 1.0) * 0.5
                    for x in range(8)] for u in range(8)])

# zig-zag order: zigzag[k] = (row, col) of the k-th coefficient
# (ITU T.81 Fig. A.6: odd diagonals walk row-ascending, even diagonals
# row-descending — (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),... — so the
# within-diagonal key is r on odd sums, c on even sums)
_ZIGZAG = sorted(((r, c) for r in range(8) for c in range(8)),
                 key=lambda rc: (rc[0] + rc[1],
                                 rc[0] if (rc[0] + rc[1]) % 2 else rc[1]))

# Annex K Table K.1/K.2 base quantization tables (luma, chroma)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K typical Huffman tables: (bits[1..16], huffval)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol map from a DHT spec."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) map (inverse of the decode table)."""
    return {v: (c, l) for (l, c), v in _huff_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers are handled by the caller resetting at
    byte boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos, self.bit = data, pos, 0

    def read_bit(self) -> int:
        d = self.data
        b = (d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            # 0xFF00 is a stuffed literal 0xFF: consume both bytes
            step = 2 if (d[self.pos] == 0xFF
                         and self.pos + 1 < len(d)
                         and d[self.pos + 1] == 0x00) else 1
            self.pos += step
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            step = 2 if (self.data[self.pos] == 0xFF
                         and self.pos + 1 < len(self.data)
                         and self.data[self.pos + 1] == 0x00) else 1
            self.pos += step

    def decode_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t-bit magnitude v to signed coefficient."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def parse_jpeg(payload: bytes) -> Optional[tuple[int, int, "np.ndarray"]]:
    """Decode a baseline-sequential JPEG into (width, height, HxWxC
    uint8, C in {1, 3}); None for non-JPEG or unsupported variants."""
    try:
        return _parse_jpeg(payload)
    except (IndexError, ValueError, KeyError, ZeroDivisionError,
            StopIteration, MemoryError):
        return None  # truncated / corrupt streams fall back, never raise


def _parse_jpeg(payload: bytes) -> Optional[tuple[int, int, "np.ndarray"]]:
    if payload is None or payload[:2] != b"\xFF\xD8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    i, n = 2, len(payload)
    while i < n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xD8:
            i += 2
            continue
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / lossless
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        seg = payload[i + 4:i + 2 + seg_len]
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                if prec != 0:
                    return None                 # 16-bit tables
                tab = np.zeros((8, 8))
                for k in range(64):
                    tab[_ZIGZAG[k]] = seg[p + 1 + k]
                qt[tid] = tab
                p += 65
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17:p + 17 + cnt])
                (huff_ac if cls else huff_dc)[tid] = \
                    _huff_decode_table(bits, vals)
                p += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if seg[0] != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            # hostile/corrupt dims would otherwise allocate GB-scale
            # planes before any entropy data is validated
            if w * h > 1 << 26:  # 64M pixels
                return None
            nc = seg[5]
            if nc not in (1, 3):
                return None
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                   for c in comps):
                return None
        elif marker == 0xDD:                    # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:                    # SOS -> entropy data
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                # SOS before SOF, or a component id absent from SOF —
                # corrupt stream, not an exception path
                comp = next((x for x in comps if x["id"] == cid), None)
                if comp is None:
                    return None
                scan.append((comp, tt >> 4, tt & 0x0F))
            data_pos = i + 2 + seg_len
            return _decode_scan(payload, data_pos, w, h, comps, scan,
                                qt, huff_dc, huff_ac, restart)
        i += 2 + seg_len
    return None


def _decode_scan(payload, pos, w, h, comps, scan, qt, huff_dc, huff_ac,
                 restart):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component coefficient planes (in units of 8x8 blocks)
    planes = [np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
              for c in comps]
    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_idx and mcu_idx % restart == 0:
                reader.align()
                if payload[reader.pos] == 0xFF and \
                        0xD0 <= payload[reader.pos + 1] <= 0xD7:
                    reader.pos += 2
                pred = [0] * len(comps)
            for ci, (comp, td, ta) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = _decode_block(reader, huff_dc[td],
                                            huff_ac[ta])
                        pred[ci] += blk[0]
                        coeffs = np.zeros((8, 8))
                        coeffs[0, 0] = pred[ci]
                        for k in range(1, 64):
                            coeffs[_ZIGZAG[k]] = blk[k]
                        coeffs *= qt[comp["tq"]]
                        spatial = _BASIS.T @ coeffs @ _BASIS
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
            mcu_idx += 1
    # upsample each component to full size, crop, level-shift
    out = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0),
                      hmax // comp["h"], axis=1)
        out.append(p[:h, :w] + 128.0)
    if len(out) == 1:
        arr = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return w, h, arr[..., None]
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader: _BitReader, dc_table: dict,
                  ac_table: dict) -> list[int]:
    """One 8x8 block in zig-zag order: DC diff + RLE'd AC coefficients."""
    blk = [0] * 64
    t = reader.decode_symbol(dc_table)
    blk[0] = _extend(reader.read_bits(t), t) if t else 0
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16            # ZRL: 16 zeros
                continue
            break                  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        blk[k] = _extend(reader.read_bits(s), s)
        k += 1
    return blk


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


def _encode_block(bw: _BitWriter, coeffs: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    zz = np.array([int(coeffs[_ZIGZAG[k]]) for k in range(64)])
    diff = zz[0] - pred

    def mag(v: int) -> tuple[int, int]:
        t = int(abs(v)).bit_length()
        return (t, v if v >= 0 else v + (1 << t) - 1)

    t, bits = mag(diff)
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        bw.write(bits, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab[0xF0]
            bw.write(c, ln)
            run -= 16
        s, bits = mag(int(zz[k]))
        c, ln = ac_tab[(run << 4) | s]
        bw.write(c, ln)
        bw.write(bits, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_tab[0x00]
        bw.write(c, ln)
    return int(zz[0])


def write_jpeg(arr: "np.ndarray", quality: int = 90,
               subsample: bool = False,
               restart_interval: int = 0) -> bytes:
    """Encode HxWx3 RGB (or HxWx1 / HxW grayscale) uint8 as baseline
    JPEG with quality-scaled Annex K tables. ``subsample=True`` emits
    4:2:0 (luma 2x2 per MCU, chroma 2x2-mean downsampled) — the common
    camera layout, and the fixture generator for the decoder's MCU
    interleave / upsample path; default is 4:4:4.
    ``restart_interval > 0`` emits a DRI segment and RSTn markers every
    N MCUs with DC-prediction resets — camera files carry these for
    error resilience, and it is the fixture generator for the
    decoder's restart path."""
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, nc = arr.shape
    gray = nc == 1
    if gray:
        subsample = False
    ql = _quality_scale(_QL.reshape(8, 8), quality)
    qc = _quality_scale(_QC.reshape(8, 8), quality)
    x = arr.astype(np.float64)
    lsamp = 2 if subsample else 1
    if gray:
        planes = [(x[..., 0] - 128.0, ql, lsamp)]
    else:
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even dims, then 2x2 block mean
            def down(p):
                pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return pe.reshape(pe.shape[0] // 2, 2,
                                  pe.shape[1] // 2, 2).mean(axis=(1, 3))
            cb, cr = down(cb), down(cr)
        planes = [(y - 128.0, ql, lsamp), (cb - 128.0, qc, 1),
                  (cr - 128.0, qc, 1)]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xFF\xD8")
    for tid, q in ((0, ql),) if gray else ((0, ql), (1, qc)):
        zz = bytes(int(q[_ZIGZAG[k]]) for k in range(64))
        out += seg(0xDB, bytes([tid]) + zz)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for c in range(ncomp):
        samp = (lsamp << 4) | lsamp if c == 0 else 0x11
        sof += bytes([c + 1, samp, 0 if c == 0 else 1])
    out += seg(0xC0, sof)
    tables = ((0x00, _DC_L), (0x10, _AC_L)) if gray else \
        ((0x00, _DC_L), (0x10, _AC_L), (0x01, _DC_C), (0x11, _AC_C))
    for tc, (bits, vals) in tables:
        out += seg(0xC4, bytes([tc]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    enc_dc = [_huff_encode_table(*_DC_L), _huff_encode_table(*_DC_C)]
    enc_ac = [_huff_encode_table(*_AC_L), _huff_encode_table(*_AC_C)]
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu = 8 * lsamp
    my_max, mx_max = -(-h // mcu), -(-w // mcu)
    padded = []
    for plane, q, samp in planes:
        ph, pw = my_max * 8 * samp, mx_max * 8 * samp
        p = np.pad(plane, ((0, ph - plane.shape[0]),
                           (0, pw - plane.shape[1])), mode="edge")
        padded.append((p, q, samp))
    mcu_idx = 0
    for my in range(my_max):
        for mx in range(mx_max):
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                # byte-align (1-fill), emit RSTn (mod-8 cycle), reset DC
                bw.flush()
                out_rst = 0xD0 + ((mcu_idx // restart_interval - 1) % 8)
                bw.out += bytes([0xFF, out_rst])
                preds = [0] * ncomp
            mcu_idx += 1
            for ci, (p, q, samp) in enumerate(padded):
                tsel = 0 if ci == 0 else 1
                for by in range(samp):
                    for bx in range(samp):
                        y0 = (my * samp + by) * 8
                        x0 = (mx * samp + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8]
                        coeffs = np.round((_BASIS @ blk @ _BASIS.T) / q)
                        preds[ci] = _encode_block(bw, coeffs, preds[ci],
                                                  enc_dc[tsel],
                                                  enc_ac[tsel])
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)
