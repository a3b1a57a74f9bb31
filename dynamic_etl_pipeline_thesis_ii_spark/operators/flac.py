"""Real FLAC sample decode, stdlib-only (RFC 9639 bitstream subset
covering every non-reserved construct: all blocksize/rate/sample-size
codes, all four channel assignments incl. the three stereo
decorrelations, CONSTANT/VERBATIM/FIXED/LPC subframes, wasted bits,
both Rice partition methods incl. escape partitions, CRC-8 header and
CRC-16 frame checks).

Extends the engine's real-decode audio tier (``multimodal.py``'s WAV
family — PCM/G.711/IMA-ADPCM) to the most common lossless compressed
format in audio corpora, so perceptual fingerprinting (`ahash64`),
containment matching and the feature extractor consume FLAC payloads
through the exact same mono-samples contract as WAV. The reference
repo has no audio codec tier at all (its media handling stops at
opaque blobs), so this module is engine-original; the decode order
and tables follow the public spec only.

:func:`write_flac` is the spec-valid fixture twin (same stance as
``vp8l.write_vp8l``): it emits real Rice-coded FIXED/LPC frames, all
stereo decorrelations and escape partitions so every decoder path
round-trips in tests without libFLAC. Decoding is interpreter-speed
(pure-Python bit reader — the documented trade of the whole codec
tier); at true 100 TB audio scale the ``decode_fn`` hook on the
fingerprint kernels swaps in a native codec while this stays the
dependency-free default and correctness oracle.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["parse_flac", "flac_mono_samples", "write_flac"]


class _Bad(Exception):
    """Malformed/reserved construct — decoding stops cleanly."""


# ---------------------------------------------------------------------------
# CRCs (FLAC frame integrity): CRC-8 poly 0x07, CRC-16 poly 0x8005,
# both init 0, MSB-first
# ---------------------------------------------------------------------------

def _make_crc8():
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _make_crc16():
    tbl = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_CRC8 = _make_crc8()
_CRC16 = _make_crc16()


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# MSB-first bit reader (FLAC bit order — the mirror of vp8l's LSB reader)
# ---------------------------------------------------------------------------

class _Bits:
    __slots__ = ("buf", "pos", "nbits")

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits
        self.nbits = len(buf) * 8

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > self.nbits:
            raise _Bad("truncated")
        b0, b1 = self.pos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.buf[b0:b1], "big")
        val = (chunk >> ((b1 << 3) - end)) & ((1 << n) - 1)
        self.pos = end
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while not self.read(1):
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ---------------------------------------------------------------------------
# Frame decode
# ---------------------------------------------------------------------------

_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_FIXED = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _utf8_num(bits: _Bits) -> int:
    first = bits.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise _Bad("bad utf8-coded number")
    val = first & (mask - 1)
    for _ in range(n):
        cont = bits.read(8)
        if cont & 0xC0 != 0x80:
            raise _Bad("bad utf8 continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


def _residual(bits: _Bits, blocksize: int, order: int) -> list:
    method = bits.read(2)
    if method > 1:
        raise _Bad("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts or (blocksize >> porder) <= order:
        raise _Bad("bad partition order")
    out = []
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        param = bits.read(pbits)
        if param == escape:
            nbits = bits.read(5)
            if nbits == 0:
                out.extend([0] * count)
            else:
                out.extend(bits.read_signed(nbits) for _ in range(count))
        else:
            for _ in range(count):
                q = bits.unary()
                u = (q << param) | bits.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _subframe(bits: _Bits, blocksize: int, bps: int) -> list:
    if bits.read(1):
        raise _Bad("subframe pad bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise _Bad("wasted bits exceed sample size")
    if stype == 0:                                   # CONSTANT
        out = [bits.read_signed(eff)] * blocksize
    elif stype == 1:                                 # VERBATIM
        out = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:                           # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise _Bad("fixed order exceeds blocksize")
        out = [bits.read_signed(eff) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(res):
            pred = sum(c * out[order + i - 1 - j]
                       for j, c in enumerate(coefs))
            out.append(pred + r)
    elif stype >= 32:                                # LPC order 1-32
        order = (stype & 0x1F) + 1
        if order > blocksize:
            raise _Bad("lpc order exceeds blocksize")
        out = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise _Bad("invalid qlp precision")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise _Bad("negative qlp shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        for i, r in enumerate(res):
            acc = sum(c * out[order + i - 1 - j]
                      for j, c in enumerate(coefs))
            out.append((acc >> shift) + r)
    else:
        raise _Bad("reserved subframe type")
    if wasted:
        out = [s << wasted for s in out]
    return out


def _decode_frame(bits: _Bits, info: dict):
    start_byte = bits.pos >> 3                 # frames are byte-aligned
    if bits.read(14) != 0x3FFE:
        raise _Bad("lost frame sync")
    if bits.read(1):
        raise _Bad("reserved bit set")
    bits.read(1)                               # blocking strategy
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    if bits.read(1):
        raise _Bad("reserved bit set")
    _utf8_num(bits)
    if bs_code == 0:
        raise _Bad("reserved blocksize code")
    elif bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_FIXED[bs_code]
    if sr_code == 0:
        rate = info["rate"]
    elif sr_code == 12:
        rate = bits.read(8) * 1000
    elif sr_code == 13:
        rate = bits.read(16)
    elif sr_code == 14:
        rate = bits.read(16) * 10
    elif sr_code == 15:
        raise _Bad("invalid sample rate code")
    else:
        rate = _RATE_FIXED[sr_code]
    if ss_code == 0:
        bps = info["bits"]
    elif ss_code == 3:
        raise _Bad("reserved sample size code")
    else:
        bps = _SAMPLE_SIZE[ss_code]
    if ch_code >= 11:
        raise _Bad("reserved channel assignment")
    n_ch = ch_code + 1 if ch_code <= 7 else 2
    crc_pos = bits.pos >> 3
    if _crc8(bits.buf[start_byte:crc_pos]) != bits.read(8):
        raise _Bad("frame header CRC-8 mismatch")
    chans = []
    for c in range(n_ch):
        eff_bps = bps
        if (ch_code == 8 and c == 1) or (ch_code == 9 and c == 0) \
                or (ch_code == 10 and c == 1):
            eff_bps += 1                       # side channel carries +1
        chans.append(_subframe(bits, blocksize, eff_bps))
    if ch_code == 8:                           # left/side
        left, side = chans
        chans = [left, [l - s for l, s in zip(left, side)]]
    elif ch_code == 9:                         # side/right
        side, right = chans
        chans = [[r + s for r, s in zip(right, side)], right]
    elif ch_code == 10:                        # mid/side
        mid, side = chans
        left = [((m << 1) | (s & 1)) + s for m, s in zip(mid, side)]
        chans = [[v >> 1 for v in left],
                 [(v - (s << 1)) >> 1 for v, s in zip(left, side)]]
    bits.align()
    end_byte = bits.pos >> 3
    if _crc16(bits.buf[start_byte:end_byte]) != bits.read(16):
        raise _Bad("frame CRC-16 mismatch")
    return rate, np.array(chans, dtype=np.int64).T


def parse_flac(payload: bytes) -> Optional[dict]:
    """Full sample decode: ``{rate, channels, bits, samples}`` with
    ``samples`` an ``(n_frames, channels)`` int64 array, or None for
    non-FLAC / malformed payloads (never raises — the corrupt-stream
    discipline of every decoder in the codec tier). A frame that
    fails its CRC (or hits a reserved construct) stops the walk;
    frames decoded up to that point are returned, so a truncated
    stream yields its intact prefix rather than nothing."""
    if payload is None or len(payload) < 8 or payload[:4] != b"fLaC":
        return None
    try:
        pos, n = 4, len(payload)
        info = None
        while True:
            if pos + 4 > n:
                return None
            hdr = payload[pos]
            length = int.from_bytes(payload[pos + 1:pos + 4], "big")
            body = payload[pos + 4:pos + 4 + length]
            if (hdr & 0x7F) == 0 and len(body) >= 18 and info is None:
                b = body
                sr = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
                info = {"rate": sr,
                        "channels": ((b[12] >> 1) & 0x7) + 1,
                        "bits": (((b[12] & 0x1) << 4) | (b[13] >> 4)) + 1,
                        "total": ((b[13] & 0x0F) << 32)
                                 | int.from_bytes(b[14:18], "big")}
            pos += 4 + length
            if hdr & 0x80:
                break
        if info is None or info["rate"] == 0 or pos > n:
            return None
        bits = _Bits(payload, pos * 8)
        blocks, rate = [], info["rate"]
        while bits.nbits - bits.pos >= 16:       # at least a sync word
            try:
                rate, block = _decode_frame(bits, info)
            except _Bad:
                break
            if block.shape[1] != info["channels"]:
                break
            blocks.append(block)
        if not blocks:
            return None
        samples = np.concatenate(blocks, axis=0)
        if 0 < info["total"] < len(samples):
            samples = samples[:info["total"]]
        return {"rate": rate, "channels": info["channels"],
                "bits": info["bits"], "samples": samples}
    except Exception:
        return None


def flac_mono_samples(payload: bytes) -> Optional[tuple[int, np.ndarray]]:
    """(sample_rate, mono float64 waveform) — the FLAC face of
    ``multimodal.wav_mono_samples`` (same contract: channels fold to
    mono by mean; FLAC samples are already signed so no re-centering).
    Lossless by construction: the same PCM encoded as WAV and as FLAC
    yields bit-identical mono arrays, so perceptual hashes agree
    EXACTLY across the two containers."""
    decoded = parse_flac(payload)
    if decoded is None or decoded["rate"] <= 0:
        return None
    x = decoded["samples"].astype(np.float64)
    return decoded["rate"], x.mean(axis=1)


# ---------------------------------------------------------------------------
# Writer twin (spec-valid fixtures exercising every decoder path)
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("data", "acc", "nacc")

    def __init__(self):
        self.data = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.data.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)


def _utf8_write(w: _BitWriter, val: int) -> None:
    if val < 0x80:
        w.write(val, 8)
        return
    # n continuation bytes: lead byte caps at 11/16/21/26/31 payload bits
    seqs = [(0xC0, 11), (0xE0, 16), (0xF0, 21), (0xF8, 26), (0xFC, 31)]
    for n_cont, (lead, cap) in enumerate(seqs, start=1):
        if val < (1 << cap):
            w.write(lead | (val >> (6 * n_cont)), 8)
            for i in range(n_cont - 1, -1, -1):
                w.write(0x80 | ((val >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("frame number too large")


def _rice_param(res: list) -> int:
    """Smallest-total-bits Rice parameter over 0..14 (exact cost scan
    — fixture-scale corpora, exactness over speed)."""
    us = [(v << 1) if v >= 0 else ((-v << 1) - 1) for v in res]
    best, best_p = None, 0
    for p in range(15):
        cost = sum((u >> p) + 1 + p for u in us)
        if best is None or cost < best:
            best, best_p = cost, p
    return best_p


def _write_residual(w: _BitWriter, res: list, escape_bits: int = 0) -> None:
    if escape_bits:
        w.write(0, 2)                  # method 0 (4-bit params)
        w.write(0, 4)                  # partition order 0
        w.write(0xF, 4)                # escape code
        w.write(escape_bits, 5)
        for v in res:
            w.write(v, escape_bits)
        return
    p = _rice_param(res)
    w.write(0, 2)
    w.write(0, 4)
    w.write(p, 4)
    for v in res:
        u = (v << 1) if v >= 0 else ((-v << 1) - 1)
        q = u >> p
        w.write(0, q) if q else None
        w.write(1, 1)
        w.write(u, p) if p else None


def _write_subframe(w: _BitWriter, samples: list, bps: int,
                    mode: str, escape_bits: int = 0) -> None:
    w.write(0, 1)                      # pad
    n = len(samples)
    if mode == "constant" and n and all(s == samples[0] for s in samples):
        w.write(0, 6)
        w.write(0, 1)                  # no wasted bits
        w.write(samples[0], bps)
        return
    if mode == "fixed" and n > 2:
        order = 2
        w.write(8 + order, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s, bps)
        res = [samples[i] - (2 * samples[i - 1] - samples[i - 2])
               for i in range(order, n)]
        _write_residual(w, res, escape_bits)
        return
    if mode == "lpc" and n > 1:
        order, prec, shift, coef = 1, 5, 2, 4    # (4 >> 2) == s[i-1]
        w.write(32 + (order - 1), 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s, bps)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        w.write(coef, prec)
        res = [samples[i] - ((coef * samples[i - 1]) >> shift)
               for i in range(order, n)]
        _write_residual(w, res, escape_bits)
        return
    w.write(1, 6)                      # VERBATIM fallback
    w.write(0, 1)
    for s in samples:
        w.write(s, bps)


_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def write_flac(samples: "np.ndarray", rate: int, bits: int = 16,
               blocksize: int = 4096, mode: str = "verbatim",
               stereo_mode: str = "independent",
               escape_bits: int = 0) -> bytes:
    """Spec-valid FLAC encode of int samples — the fixture twin of
    :func:`parse_flac`. ``samples`` is (n,) mono or (n, ch);
    ``mode`` picks the subframe strategy (verbatim / constant /
    fixed / lpc — constant falls back to verbatim for non-constant
    blocks); ``stereo_mode`` exercises the decorrelations
    (independent / left_side / right_side / mid_side, stereo input
    only); ``escape_bits`` > 0 writes escaped (raw) residual
    partitions instead of Rice codes. Lossless for any mode
    combination — that is the round-trip property the tests pin."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if stereo_mode != "independent" and ch != 2:
        raise ValueError("stereo_mode needs 2 channels")
    if bits not in _SS_CODE:
        raise ValueError(f"unsupported bits {bits}")
    # STREAMINFO
    si = bytearray(34)
    si[0:2] = max(16, min(blocksize, n or 16)).to_bytes(2, "big")
    si[2:4] = blocksize.to_bytes(2, "big")
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = (((rate & 0xF) << 4) | (((ch - 1) & 0x7) << 1)
              | (((bits - 1) >> 4) & 0x1))
    si[13] = (((bits - 1) & 0xF) << 4) | ((n >> 32) & 0xF)
    si[14:18] = (n & 0xFFFFFFFF).to_bytes(4, "big")
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + si
    ch_code = {"independent": ch - 1, "left_side": 8,
               "right_side": 9, "mid_side": 10}[stereo_mode]
    for fno, off in enumerate(range(0, n, blocksize)):
        block = x[off:off + blocksize]
        bs = len(block)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)                  # fixed blocking strategy
        w.write(7, 4)                  # 16-bit blocksize-1 follows
        w.write(0, 4)                  # rate from STREAMINFO
        w.write(ch_code, 4)
        w.write(_SS_CODE[bits], 3)
        w.write(0, 1)
        _utf8_write(w, fno)
        w.write(bs - 1, 16)
        w.write(_crc8(bytes(w.data)), 8)
        if stereo_mode == "independent":
            chans = [(block[:, c].tolist(), bits) for c in range(ch)]
        else:
            left, right = block[:, 0], block[:, 1]
            side = (left - right).tolist()
            if stereo_mode == "left_side":
                chans = [(left.tolist(), bits), (side, bits + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bits + 1), (right.tolist(), bits)]
            else:
                mid = ((left + right) >> 1).tolist()
                chans = [(mid, bits), (side, bits + 1)]
        for vals, bps in chans:
            _write_subframe(w, vals, bps, mode, escape_bits)
        w.align()
        w.write(_crc16(bytes(w.data)), 16)
        out += w.data
    return bytes(out)
