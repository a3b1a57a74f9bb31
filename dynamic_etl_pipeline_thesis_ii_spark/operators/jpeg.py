"""JPEG codec in stdlib + numpy — no PIL.

Decoder: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2,
spectral selection + successive approximation per T.81 G.2, control
flow mirroring libjpeg's decode_mcu_{DC,AC}_{first,refine}), 8-bit,
1 or 3 components, sampling factors in {1, 2} (4:4:4 / 4:2:2 /
4:2:0), restart markers, 0xFF00 byte stuffing. Encoder: YCbCr (or
grayscale) with the JPEG Annex K quantization + Huffman tables,
quality-scaled per the IJG curve, baseline or progressive
(``progressive=True`` — the standard DC-first/AC-band/refine scan
script) with 4:4:4 / 4:2:0 / 4:2:2 chroma layouts — enough to
round-trip both modes at every layout and decode typical camera/tool
files; arithmetic and 12-bit variants return None so callers fall
back.

This exists because the multimodal tier (``operators/multimodal.py``)
wants REAL decode provenance for the common training-data image
formats, and the sandbox has no PIL: netpbm/BMP/PNG were pure byte
plumbing, JPEG needs the actual entropy-decode + IDCT pipeline.
Entropy decode is inherently bit-serial Python; everything after it
is batched numpy — both scan paths accumulate quantized coefficient
planes and :func:`_finish` runs ONE fancy-index de-zig-zag plus ONE
einsum (the 8x8 DCT-II basis matmul pair applied to every block of a
component at once) per component, and the encoder's forward DCT is
the same einsum in reverse. No per-block numpy calls remain in
either direction.
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

# flat natural-order index of the k-th zig-zag coefficient:
# natural.reshape(64)[_ZZ_IDX[k]] == zigzag[k]
_ZZ_IDX = np.array([r * 8 + c for r, c in _ZIGZAG])

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
    """Decode a baseline-sequential (SOF0/1) or progressive (SOF2)
    JPEG into (width, height, HxWxC uint8, C in {1, 3}; 12-bit
    streams — incl. 16-bit DQTs — decode at full precision and scale
    to the uint8 contract); None for non-JPEG or unsupported variants
    (arithmetic, lossless)."""
    try:
        return _parse_jpeg(payload)
    except (IndexError, ValueError, KeyError, ZeroDivisionError,
            StopIteration, MemoryError, OverflowError):
        # truncated / corrupt streams fall back, never raise; the
        # OverflowError arm is a corrupt DC-predictor chain growing
        # past int64 before the numpy store (found by the AVI fuzz)
        return None


def _parse_jpeg(payload: bytes) -> Optional[tuple[int, int, "np.ndarray"]]:
    if payload is None or payload[:2] != b"\xFF\xD8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    prec = 8
    restart = 0
    progressive = False
    coefs: Optional[list[np.ndarray]] = None   # progressive accumulators
    eobrun_box = [0]
    i, n = 2, len(payload)
    while i < n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:          # 0xFF fill byte before a marker
            i += 1                  # (legal padding, T.81 B.1.1.2)
            continue
        if marker == 0xD8:
            i += 2
            continue
        if marker == 0xD9:                      # EOI
            break
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            return None  # arithmetic / lossless / differential
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        seg = payload[i + 4:i + 2 + seg_len]
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                qprec, tid = seg[p] >> 4, seg[p] & 0x0F
                if qprec not in (0, 1):
                    return None
                tab = np.zeros((8, 8))
                for k in range(64):             # qprec 1: 16-bit entries
                    tab[_ZIGZAG[k]] = (
                        seg[p + 1 + k] if qprec == 0 else
                        int.from_bytes(seg[p + 1 + 2 * k:p + 3 + 2 * k],
                                       "big"))
                qt[tid] = tab
                p += 65 if qprec == 0 else 129
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
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            if seg[0] not in (8, 12):
                return None
            prec = seg[0]
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
            if not comps:
                return None
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                # a component id absent from SOF — corrupt stream,
                # not an exception path
                comp = next((x for x in comps if x["id"] == cid), None)
                if comp is None:
                    return None
                scan.append((comp, tt >> 4, tt & 0x0F))
            data_pos = i + 2 + seg_len
            geom = _geometry(w, h, comps)
            if not progressive:
                coefs = _alloc_coefs(comps, geom)
                _decode_baseline_scan(payload, data_pos, comps, scan,
                                      huff_dc, huff_ac, restart, coefs,
                                      geom)
                return _finish(w, h, comps, coefs, qt, geom, prec)
            if coefs is None:
                coefs = _alloc_coefs(comps, geom)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahl = seg[3 + 2 * ns]
            eobrun_box[0] = 0
            i = _decode_progressive_scan(
                payload, data_pos, comps, scan, huff_dc, huff_ac,
                restart, coefs, geom, ss, se, ahl >> 4, ahl & 0x0F,
                eobrun_box)
            continue
        i += 2 + seg_len
    if progressive and coefs is not None:
        return _finish(w, h, comps, coefs,
                       qt, _geometry(w, h, comps), prec)
    return None


def _geometry(w: int, h: int, comps: list[dict]) -> dict:
    """MCU grid + per-component block dims. ``nb`` is the padded
    (MCU-aligned) grid every coefficient array uses; ``nb_scan`` is the
    tighter grid a NON-interleaved scan walks (T.81 A.2.2: blocks that
    cover the component's own samples, not the MCU padding)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    nb = [(mcus_y * c["v"], mcus_x * c["h"]) for c in comps]
    nb_scan = [(-(- (h * c["v"]) // (8 * vmax)),
                -(- (w * c["h"]) // (8 * hmax))) for c in comps]
    return {"hmax": hmax, "vmax": vmax, "mcus_x": mcus_x,
            "mcus_y": mcus_y, "nb": nb, "nb_scan": nb_scan}


def _alloc_coefs(comps: list[dict], geom: dict) -> list[np.ndarray]:
    """Per-component QUANTIZED coefficient planes in zig-zag index
    order: shape (blocks_y, blocks_x, 64), int32."""
    return [np.zeros((by, bx, 64), dtype=np.int32)
            for by, bx in geom["nb"]]


def _skip_restart(reader: _BitReader) -> None:
    reader.align()
    d = reader.data
    if d[reader.pos] == 0xFF and 0xD0 <= d[reader.pos + 1] <= 0xD7:
        reader.pos += 2


def _decode_baseline_scan(payload, pos, comps, scan, huff_dc, huff_ac,
                          restart, coefs, geom):
    """Baseline sequential scan: entropy-decode every MCU into the
    zig-zag coefficient planes (the IDCT happens once, batched, in
    :func:`_finish`)."""
    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_idx = 0
    for my in range(geom["mcus_y"]):
        for mx in range(geom["mcus_x"]):
            if restart and mcu_idx and mcu_idx % restart == 0:
                _skip_restart(reader)
                pred = [0] * len(comps)
            for ci, (comp, td, ta) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = _decode_block(reader, huff_dc[td],
                                            huff_ac[ta])
                        pred[ci] += blk[0]
                        blk[0] = pred[ci]
                        coefs[ci][my * comp["v"] + by,
                                  mx * comp["h"] + bx] = blk
            mcu_idx += 1


def _finish(w, h, comps, coefs, qt, geom, prec: int = 8):
    """Dequantize + IDCT + upsample + color-convert, all components
    batched: one fancy-index de-zig-zag and one einsum (the pair of
    8x8 basis matmuls applied to EVERY block of a component at once)
    per component — entropy decode is inherently bit-serial Python,
    but nothing per-block happens after it."""
    out = []
    for ci, comp in enumerate(comps):
        zz = coefs[ci]
        nby, nbx = zz.shape[:2]
        nat = np.zeros((nby, nbx, 64))
        nat[..., _ZZ_IDX] = zz
        nat = nat.reshape(nby, nbx, 8, 8) * qt[comp["tq"]]
        spatial = np.einsum("yu,BCuv,vx->BCyx", _BASIS.T, nat, _BASIS,
                            optimize=True)
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        p = np.repeat(np.repeat(plane, geom["vmax"] // comp["v"], axis=0),
                      geom["hmax"] // comp["h"], axis=1)
        # 12-bit: level-shift at 2^(P-1), then scale the PLANES back to
        # the 8-bit domain; the YCbCr->RGB transform is affine in
        # (y, cb-center, cr-center), so pre-scaling each plane by
        # 2^(P-8) yields exactly rgb12 / 2^(P-8) — one uniform uint8
        # contract for every precision
        shift = float(1 << (prec - 1))
        out.append((p[:h, :w] + shift) / float(1 << (prec - 8)))
    if len(out) == 1:
        arr = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return w, h, arr[..., None]
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) scan decoding — T.81 G.2, control flow mirrors the
# de-facto-canonical libjpeg decode_mcu_{DC,AC}_{first,refine}
# ---------------------------------------------------------------------------

def _decode_progressive_scan(payload, pos, comps, scan, huff_dc, huff_ac,
                             restart, coefs, geom, ss, se, ah, al,
                             eobrun_box) -> int:
    """Decode one progressive scan into ``coefs`` and return the byte
    offset of the next marker segment. Four scan kinds: DC first
    (Ss=0, Ah=0; interleaved when ns>1), DC refine (Ss=0, Ah>0, one
    bit per block), AC first and AC refine (Ss>0, single component,
    non-interleaved block order)."""
    if ss > se or se > 63 or al > 13:
        raise ValueError("corrupt progressive scan header")
    reader = _BitReader(payload, pos)
    ci_of = [comps.index(comp) for comp, _, _ in scan]

    if ss == 0:                                  # DC scan
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        pred = [0] * len(comps)
        unit = 0
        if len(scan) > 1:                        # interleaved MCU walk
            for my in range(geom["mcus_y"]):
                for mx in range(geom["mcus_x"]):
                    if restart and unit and unit % restart == 0:
                        _skip_restart(reader)
                        pred = [0] * len(comps)
                    for si, (comp, td, _ta) in enumerate(scan):
                        ci = ci_of[si]
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                _dc_unit(reader, huff_dc.get(td), ah, al,
                                         coefs[ci],
                                         my * comp["v"] + by,
                                         mx * comp["h"] + bx, pred, ci)
                    unit += 1
        else:
            comp, td, _ta = scan[0]
            ci = ci_of[0]
            nby, nbx = geom["nb_scan"][ci]
            for byx in range(nby * nbx):
                if restart and byx and byx % restart == 0:
                    _skip_restart(reader)
                    pred = [0] * len(comps)
                _dc_unit(reader, huff_dc.get(td), ah, al, coefs[ci],
                         byx // nbx, byx % nbx, pred, ci)
    else:                                        # AC scan: ns must be 1
        if len(scan) != 1:
            raise ValueError("interleaved AC progressive scan")
        comp, _td, ta = scan[0]
        ci = ci_of[0]
        nby, nbx = geom["nb_scan"][ci]
        table = huff_ac[ta]
        plane = coefs[ci]
        for byx in range(nby * nbx):
            if restart and byx and byx % restart == 0:
                _skip_restart(reader)
                eobrun_box[0] = 0
            blk = plane[byx // nbx, byx % nbx]
            if ah == 0:
                _ac_first(reader, table, blk, ss, se, al, eobrun_box)
            else:
                _ac_refine(reader, table, blk, ss, se, al, eobrun_box)

    # advance to the next marker (skip pad bits, stray RSTs, and 0xFF
    # fill bytes — T.81 B.1.1.2 allows any number of 0xFF before a
    # marker, so 0xFF 0xFF is padding, not a marker at the first 0xFF)
    p = reader.pos if reader.bit == 0 else reader.pos + 1
    d = payload
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] not in (0x00, 0xFF):
            if 0xD0 <= d[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(d)


def _dc_unit(reader, dc_table, ah, al, plane, by, bx, pred, ci):
    if ah == 0:                                  # first pass: diff << Al
        if dc_table is None:
            raise ValueError("DC scan references missing huffman table")
        t = reader.decode_symbol(dc_table)
        diff = _extend(reader.read_bits(t), t) if t else 0
        pred[ci] += diff
        plane[by, bx, 0] = pred[ci] << al
    else:                                        # refinement: one bit
        if reader.read_bit():
            plane[by, bx, 0] |= 1 << al


def _ac_first(reader, table, blk, ss, se, al, eobrun_box):
    if eobrun_box[0] > 0:
        eobrun_box[0] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_symbol(table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16                          # ZRL
                continue
            eobrun = (1 << r) - 1                # EOBn (this block counted)
            if r:
                eobrun += reader.read_bits(r)
            eobrun_box[0] = eobrun
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine(reader, table, blk, ss, se, al, eobrun_box):
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun_box[0] == 0:
        while k <= se:
            rs = reader.decode_symbol(table)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("refinement magnitude != 1")
                newval = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r                  # EOBn; decremented below
                if r:
                    eobrun += reader.read_bits(r)
                eobrun_box[0] = eobrun
                break
            # advance over r zero-history coefficients, reading a
            # correction bit at every nonzero-history one on the way
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun_box[0] > 0:
        while k <= se:                           # post-EOB correction bits
            if blk[k] != 0:
                if reader.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun_box[0] -= 1


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


def _mag(v: int) -> tuple[int, int]:
    """(bit length, appended-bits value) of a signed coefficient —
    T.81 F.1.2.1 magnitude category coding."""
    t = int(abs(v)).bit_length()
    return (t, v if v >= 0 else v + (1 << t) - 1)


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    """Baseline emission of one block given its ZIG-ZAG-ordered
    quantized coefficients."""
    diff = int(zz[0]) - pred
    t, bits = _mag(diff)
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
        s, bits = _mag(int(zz[k]))
        c, ln = ac_tab[(run << 4) | s]
        bw.write(c, ln)
        bw.write(bits, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_tab[0x00]
        bw.write(c, ln)
    return int(zz[0])


# extended Huffman tables for 12-bit precision: the Annex K tables
# stop at DC category 11 / AC size 10, but 12-bit DC diffs reach
# category 15 and AC sizes 14 (T.81 F.1.2.1). Flat canonical codes —
# all DC symbols at 5 bits (16 <= 2^5 - 2, all-ones code unused), all
# 226 AC symbols at 8 bits — are legal, decoder-generic and simple.
_DC_EXT = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
           list(range(16)))
_AC_EXT = ([0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0],
           [0x00, 0xF0] + [(r << 4) | sz
                           for r in range(16) for sz in range(1, 15)])


def write_jpeg(arr: "np.ndarray", quality: int = 90,
               subsample=False,
               restart_interval: int = 0,
               progressive: bool = False,
               precision: int = 8) -> bytes:
    """Encode HxWx3 RGB (or HxWx1 / HxW grayscale) uint8 as JPEG with
    quality-scaled Annex K tables. ``subsample`` picks the chroma
    layout: False/"444" (default), True/"420" (luma 2x2 per MCU,
    chroma 2x2-mean downsampled — the common camera layout) or "422"
    (luma 2x1, chroma halved horizontally only — the common video
    layout); the 420/422 modes are the fixture generators for the
    decoder's MCU interleave / upsample paths.
    ``restart_interval > 0`` emits a DRI segment and RSTn markers every
    N MCUs with DC-prediction resets (baseline only; ignored for
    progressive) — the fixture generator for the decoder's restart
    path. ``progressive=True`` emits SOF2 with the standard
    spectral-selection + successive-approximation scan script (DC
    Al=1 → AC bands Al=2 → AC refine → DC refine → AC refine to
    full precision) — the fixture generator for the progressive
    decoder. The forward DCT is one einsum over all blocks of a
    component; only entropy emission is per-block Python.
    ``precision=12`` (baseline only) scales the sample domain by 16,
    emits 16-bit DQTs and the extended-category Huffman tables — the
    fixture generator for the 12-bit decode path."""
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, nc = arr.shape
    gray = nc == 1
    mode = {False: "444", True: "420"}.get(subsample, subsample)
    if mode not in ("444", "420", "422"):
        raise ValueError(f"subsample must be 444/420/422, got {subsample!r}")
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    if precision == 12 and progressive:
        raise ValueError("12-bit fixtures are baseline-only")
    if gray:
        mode = "444"
    lh, lv = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}[mode]
    ql = _quality_scale(_QL.reshape(8, 8), quality)
    qc = _quality_scale(_QC.reshape(8, 8), quality)
    dscale = float(1 << (precision - 8))
    if precision == 12:
        # q >= 2 caps the DC diff range at category 15 (q=1 would
        # allow |diff| = 2 * 8 * 2048 = 2^16, one past the table)
        ql, qc = np.maximum(ql, 2), np.maximum(qc, 2)
    x = arr.astype(np.float64)
    if gray:
        planes = [((x[..., 0] - 128.0) * dscale, ql, lh, lv)]
    else:
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if mode != "444":
            # pad to factor-aligned dims, then lv x lh block mean
            def down(p):
                pe = np.pad(p, ((0, h % lv), (0, w % lh)), mode="edge")
                return pe.reshape(pe.shape[0] // lv, lv,
                                  pe.shape[1] // lh, lh).mean(axis=(1, 3))
            cb, cr = down(cb), down(cr)
        planes = [((y - 128.0) * dscale, ql, lh, lv),
                  ((cb - 128.0) * dscale, qc, 1, 1),
                  ((cr - 128.0) * dscale, qc, 1, 1)]

    # batched forward DCT: pad each plane to its MCU grid, quantize,
    # and store zig-zag-ordered int coefficients (nby, nbx, 64)
    my_max, mx_max = -(-h // (8 * lv)), -(-w // (8 * lh))
    zzs: list[np.ndarray] = []
    samps: list[tuple[int, int]] = []
    for plane, q, sh, sv in planes:
        ph, pw = my_max * 8 * sv, mx_max * 8 * sh
        p = np.pad(plane, ((0, ph - plane.shape[0]),
                           (0, pw - plane.shape[1])), mode="edge")
        nby, nbx = ph // 8, pw // 8
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        coeffs = np.round(np.einsum("uy,BCyx,xv->BCuv", _BASIS, blocks,
                                    _BASIS.T, optimize=True) / q)
        zzs.append(coeffs.reshape(nby, nbx, 64)[..., _ZZ_IDX]
                   .astype(np.int32))
        samps.append((sh, sv))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xFF\xD8")
    for tid, q in ((0, ql),) if gray else ((0, ql), (1, qc)):
        if precision == 12:                     # 16-bit DQT entries
            zz = b"".join(int(q[_ZIGZAG[k]]).to_bytes(2, "big")
                          for k in range(64))
            out += seg(0xDB, bytes([0x10 | tid]) + zz)
        else:
            zz = bytes(int(q[_ZIGZAG[k]]) for k in range(64))
            out += seg(0xDB, bytes([tid]) + zz)
    ncomp = 1 if gray else 3
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for c in range(ncomp):
        samp = (lh << 4) | lv if c == 0 else 0x11
        sof += bytes([c + 1, samp, 0 if c == 0 else 1])
    out += seg(0xC2 if progressive else 0xC0, sof)
    dc_l, ac_l = (_DC_EXT, _AC_EXT) if precision == 12 else (_DC_L, _AC_L)
    dc_c, ac_c = (_DC_EXT, _AC_EXT) if precision == 12 else (_DC_C, _AC_C)
    tables = ((0x00, dc_l), (0x10, ac_l)) if gray else \
        ((0x00, dc_l), (0x10, ac_l), (0x01, dc_c), (0x11, ac_c))
    for tc, (bits, vals) in tables:
        out += seg(0xC4, bytes([tc]) + bytes(bits) + bytes(vals))

    enc_dc = [_huff_encode_table(*dc_l), _huff_encode_table(*dc_c)]
    enc_ac = [_huff_encode_table(*ac_l), _huff_encode_table(*ac_c)]

    if progressive:
        _emit_progressive(out, seg, zzs, samps, w, h, my_max, mx_max,
                          enc_dc, enc_ac, gray)
        out += b"\xFF\xD9"
        return bytes(out)

    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * ncomp
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
            for ci in range(ncomp):
                tsel = 0 if ci == 0 else 1
                sh, sv = samps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        preds[ci] = _encode_block(
                            bw, zzs[ci][my * sv + by, mx * sh + bx],
                            preds[ci], enc_dc[tsel], enc_ac[tsel])
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive emission — T.81 G.1, mirrors libjpeg encode_mcu_*_{first,
# refine}; scan-wide EOB-run + buffered-correction-bit state
# ---------------------------------------------------------------------------

def _emit_progressive(out, seg, zzs, samps, w, h, my_max, mx_max,
                      enc_dc, enc_ac, gray):
    ncomp = len(zzs)
    # tighter non-interleaved AC grids (padding blocks carry DC only)
    hmax = max(sh for sh, _ in samps)
    vmax = max(sv for _, sv in samps)
    nb_scan = [(-(-(h * sv) // (8 * vmax)), -(-(w * sh) // (8 * hmax)))
               for sh, sv in samps]

    def sos(comp_ids_tables, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids_tables)])
        for cid, tt in comp_ids_tables:
            body += bytes([cid, tt])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, interleaved, Al=1 (Td high nibble, Ta ignored)
    out += sos([(c + 1, 0x00 if c == 0 else 0x10) for c in range(ncomp)],
               0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(my_max):
        for mx in range(mx_max):
            for ci in range(ncomp):
                sh, sv = samps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        v = int(zzs[ci][my * sv + by,
                                        mx * sh + bx, 0]) >> 1
                        t, bits = _mag(v - preds[ci])
                        preds[ci] = v
                        code, ln = enc_dc[0 if ci == 0 else 1][t]
                        bw.write(code, ln)
                        if t:
                            bw.write(bits, t)
    bw.flush()
    out += bw.out

    # scans 2..: AC first approximations (Al=2), band-split for luma
    ac_first_scans = []
    for ci in range(ncomp):
        ac_first_scans += [(ci, 1, 5, 0, 2), (ci, 6, 63, 0, 2)]
    for ci, ss, se, ah, al in ac_first_scans:
        out += sos([(ci + 1, 0x00 if ci == 0 else 0x01)], ss, se, ah, al)
        bw = _BitWriter()
        _emit_ac_first_scan(bw, zzs[ci], nb_scan[ci], ss, se, al,
                            enc_ac[0 if ci == 0 else 1])
        bw.flush()
        out += bw.out

    # AC refine Al 2 -> 1
    for ci in range(ncomp):
        out += sos([(ci + 1, 0x00 if ci == 0 else 0x01)], 1, 63, 2, 1)
        bw = _BitWriter()
        _emit_ac_refine_scan(bw, zzs[ci], nb_scan[ci], 1, 63, 1,
                             enc_ac[0 if ci == 0 else 1])
        bw.flush()
        out += bw.out

    # DC refine (Ah=1, Al=0): one raw bit per block, interleaved
    out += sos([(c + 1, 0x00) for c in range(ncomp)], 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(my_max):
        for mx in range(mx_max):
            for ci in range(ncomp):
                sh, sv = samps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bw.write(int(zzs[ci][my * sv + by,
                                             mx * sh + bx, 0]) & 1, 1)
    bw.flush()
    out += bw.out

    # AC refine Al 1 -> 0 (full precision)
    for ci in range(ncomp):
        out += sos([(ci + 1, 0x00 if ci == 0 else 0x01)], 1, 63, 1, 0)
        bw = _BitWriter()
        _emit_ac_refine_scan(bw, zzs[ci], nb_scan[ci], 1, 63, 0,
                             enc_ac[0 if ci == 0 else 1])
        bw.flush()
        out += bw.out


def _emit_ac_first_scan(bw, zzplane, nb, ss, se, al, ac_tab):
    nby, nbx = nb
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            code, ln = ac_tab[nbits << 4]
            bw.write(code, ln)
            if nbits:
                bw.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for byx in range(nby * nbx):
        blk = zzplane[byx // nbx, byx % nbx]
        r = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                r -= 16
            s, bits = _mag(t if v >= 0 else -t)
            code, ln = ac_tab[(r << 4) | s]
            bw.write(code, ln)
            bw.write(bits, s)
            r = 0
        if r > 0:
            # EOB0 per block: the Annex K tables carry no EOBn (r>0,
            # s=0) symbols — those need custom progressive tables —
            # so runs are never accumulated (decode still handles
            # arbitrary EOBn from real encoders)
            eobrun = 1
            flush_eob()
    flush_eob()


def _emit_ac_refine_scan(bw, zzplane, nb, ss, se, al, ac_tab):
    nby, nbx = nb
    eobrun = 0
    br: list[int] = []                  # correction bits pending a symbol

    def emit_br():
        nonlocal br
        for b in br:
            bw.write(b, 1)
        br = []

    def flush_eob():
        # correction bits ride the EOBn symbol ONLY when a run is
        # pending; otherwise they follow the next ZRL/newly-visible
        # symbol (libjpeg emit_eobrun vs emit_buffered_bits split)
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            code, ln = ac_tab[nbits << 4]
            bw.write(code, ln)
            if nbits:
                bw.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
            emit_br()

    for byx in range(nby * nbx):
        blk = zzplane[byx // nbx, byx % nbx]
        tvals = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        # index of the LAST newly-visible coefficient: runs beyond it
        # ride the EOB run instead of ZRLs (libjpeg EOB tracking)
        eob_k = max((k for k, t in zip(range(ss, se + 1), tvals)
                     if t == 1), default=ss - 1)
        r = 0
        for k in range(ss, se + 1):
            t = tvals[k - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob_k:
                flush_eob()
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                r -= 16
                emit_br()
            if t > 1:                   # already visible: correction bit
                br.append(t & 1)
                continue
            flush_eob()                 # newly visible: (r, 1) + sign
            code, ln = ac_tab[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if int(blk[k]) >= 0 else 0, 1)
            emit_br()
            r = 0
        if r > 0 or br:
            eobrun = 1                  # EOB0 per block (see AC-first)
            flush_eob()
    flush_eob()
