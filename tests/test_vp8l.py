"""VP8L (lossless WebP) codec tests: round-trips over every decoder
path, a hand-assembled bit-exact stream (independent of the writer, so
a shared writer/decoder spec misreading cannot hide), corruption fuzz,
and the multimodal integration (dHash format-independence, feature
provenance, resize)."""

from __future__ import annotations

import numpy as np
import pytest

from dynamic_etl_pipeline_thesis_ii_spark.operators import multimodal as M
from dynamic_etl_pipeline_thesis_ii_spark.operators import vp8l as V


def _rt(arr, **kw):
    enc = V.write_vp8l(arr, **kw)
    dec = V.parse_vp8l(enc)
    assert dec is not None, kw
    w, h, out = dec
    assert (w, h) == (arr.shape[1], arr.shape[0])
    want = arr if arr.shape[2] == 4 else np.concatenate(
        [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], axis=2)
    assert np.array_equal(out, want), kw
    return enc


def test_vp8l_roundtrip_plain_and_entropy_features():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    _rt(img)
    _rt(img, cache_bits=4)
    _rt(img, meta_bits=3)
    run = np.tile(rng.integers(0, 256, (1, 1, 3), dtype=np.uint8),
                  (9, 21, 1))
    run[4:, 5:] = 77
    plain = V.write_vp8l(run)
    packed = _rt(run, lz77=True)
    assert len(packed) < len(plain)         # backrefs actually used
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    _rt(rgba)
    # 1x1 and single-color degenerate images
    _rt(np.full((1, 1, 3), 9, dtype=np.uint8))
    _rt(np.full((5, 7, 3), 200, dtype=np.uint8))


def test_vp8l_roundtrip_all_transforms():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (20, 33, 3), dtype=np.uint8)
    _rt(img, transforms=("subtract_green",))
    _rt(img, transforms=("predictor",))
    _rt(img, transforms=("color",))
    _rt(img, transforms=("color",), color_cte=(255, 130, 77))  # signed
    _rt(img, transforms=("subtract_green", "predictor"))
    _rt(img, transforms=("subtract_green", "color"))
    _rt(img, transforms=("subtract_green", "predictor"),
        cache_bits=5, lz77=True)
    # palette bundling at every width: 2/4/16 colors pack 8/4/2 pixels
    # per byte, >16 is plain indexing
    for k in (2, 4, 13, 16, 17, 200):
        base = rng.integers(0, 256, (k, 3), dtype=np.uint8)
        idx = rng.integers(0, k, (11, 23))
        arr = base[idx]
        if len({tuple(c) for c in base}) == k:   # distinct colors
            _rt(arr, transforms=("palette",))


def test_vp8l_hand_assembled_stream_bit_exact():
    """A 2x1 stream written bit-by-bit from the spec text (simple
    prefix codes only, no writer machinery): decodes to exactly the
    two expected pixels. Guards the reader against a writer-shared
    misreading — this byte sequence is fixed by the spec alone."""
    bw = V._BitWriter()
    bw.write(1, 14)          # width - 1
    bw.write(0, 14)          # height - 1
    bw.write(0, 1)           # alpha hint
    bw.write(0, 3)           # version
    bw.write(0, 1)           # no transforms
    bw.write(0, 1)           # no color cache
    bw.write(0, 1)           # no meta prefix codes
    # green: simple, 1 symbol, 1-bit value 1
    bw.write(0b1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)
    # red: same single symbol 1
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)
    # blue: simple, 2 symbols {0, 1}
    bw.write(1, 1); bw.write(1, 1); bw.write(0, 1)
    bw.write(0, 1)           # first symbol = 0 (1-bit form)
    bw.write(1, 8)           # second symbol = 1 (8-bit form)
    # alpha: single symbol 255 (8-bit form)
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(255, 8)
    # distance: single symbol 0
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    # two pixels: only blue consumes bits (codes: sym0=0, sym1=1)
    bw.write(0, 1)
    bw.write(1, 1)
    stream = b"\x2f" + bw.bytes()
    out = V.parse_vp8l(stream)           # bare stream (no RIFF)
    assert out is not None
    w, h, arr = out
    assert (w, h) == (2, 1)
    assert arr.tolist() == [[[1, 1, 0, 255], [1, 1, 1, 255]]]


def test_vp8l_rejects_and_never_raises():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 12, 3), dtype=np.uint8)
    good = V.write_vp8l(img, transforms=("subtract_green", "predictor"),
                        cache_bits=4)
    assert V.parse_vp8l(None) is None
    assert V.parse_vp8l(b"") is None
    assert V.parse_vp8l(b"RIFFxxxxWEBP") is None
    assert V.parse_vp8l(b"\x2e" + good[21:]) is None   # bad signature
    for cut in (12, 20, 25, 40, len(good) - 2):
        V.parse_vp8l(good[:cut])                       # never raises
    for _ in range(60):
        bad = bytearray(good)
        for _ in range(rng.integers(1, 5)):
            bad[rng.integers(12, len(bad))] = rng.integers(0, 256)
        V.parse_vp8l(bytes(bad))                       # never raises
    with pytest.raises(ValueError):
        V.write_vp8l(np.zeros((4, 4), dtype=np.uint8))


def test_vp8l_dhash_format_independence():
    """The decoded raster enters the image pipeline as a first-class
    format: dHash of the SAME raster as BMP and as lossless WebP is
    identical — VP8L is lossless, so the raster-determined hash
    contract extends to it unchanged."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    webp = V.write_vp8l(img, transforms=("subtract_green", "predictor"))
    bmp = bytes(M.write_bmp(img))
    assert M.dhash64(webp) is not None
    assert M.dhash64(webp) == M.dhash64(bmp)


def test_vp8l_extract_features_and_resize(spark):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    webp = V.write_vp8l(img, transforms=("subtract_green",))
    vp8_data = (b"\x00\x00\x00\x9d\x01\x2a"
                + (64).to_bytes(2, "little")
                + (32).to_bytes(2, "little"))
    lossy = (b"RIFF"
             + (4 + 8 + len(vp8_data)).to_bytes(4, "little") + b"WEBP"
             + b"VP8 " + len(vp8_data).to_bytes(4, "little") + vp8_data)
    rows = [(1, "image", webp, "image/webp", len(webp)),
            (2, "image", lossy, "image/webp", len(lossy))]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           M.extract_features(media, mode="real").collect()}
    assert got[1]["decoder"] == "vp8l"
    assert got[1]["feat"][:2] == [32.0, 24.0]
    want = np.concatenate(
        [img, np.full((24, 32, 1), 255, np.uint8)],
        axis=2).reshape(-1, 4).mean(axis=0)
    assert got[1]["feat"][2:] == [pytest.approx(float(m), abs=1e-4)
                                  for m in want]
    assert got[2]["decoder"] == "webpmeta"

    small = M.resize_webp(webp, 16, 8)
    w, h, arr = V.parse_vp8l(small)
    assert (w, h) == (16, 8)
    ri = (np.arange(8) * 24) // 8
    ci = (np.arange(16) * 32) // 16
    assert np.array_equal(arr[:, :, :3], img[ri][:, ci])
