"""Multimodal plumbing tests: schema contracts, batch shapes, stub gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators import multimodal as M
from dynamic_etl_pipeline_thesis_ii_spark.sources.registry import Catalog


@pytest.fixture()
def media(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents.limit(50)
    return M.attach_media(docs)


def test_attach_media_schema(media):
    assert [f.name for f in media.schema.fields] == \
        ["media_id", "kind", "payload", "mime", "n_bytes"]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"}


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"abc")
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"abc")


def test_extract_features_deterministic(media):
    out = M.extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    again = {r["media_id"]: r for r in M.extract_features(media).collect()}
    assert rows.keys() == again.keys()
    for k in rows:
        assert rows[k]["feat"] == again[k]["feat"]
        assert len(rows[k]["feat"]) == 4
        assert rows[k]["feat"][0] == float(rows[k]["n_bytes"])


def test_resize_images_contract(media):
    out = M.resize_images(media, width=8, height=8)
    rows = out.collect()
    assert all(r["n_bytes"] == 64 for r in rows)
    assert all(len(r["payload"]) == 64 for r in rows)
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)


def test_sample_frames_expands_rows(media):
    out = M.sample_frames(media, every_n_bytes=32, max_frames=4)
    rows = out.collect()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(rows) > n_videos  # 1 -> N expansion
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r)
    for mid, frames in per.items():
        assert sorted(f["frame_idx"] for f in frames) == list(range(len(frames)))
        assert all(len(f["frame"]) <= 32 for f in frames)


# ---------------------------------------------------------------------------
# REAL stdlib decoders: netpbm images, PCM WAV audio


def _ppm(w, h, pixel_fn):
    raster = bytes(c for y in range(h) for x in range(w)
                   for c in pixel_fn(x, y))
    return b"P6\n# comment\n" + f"{w} {h}\n255\n".encode() + raster


def _wav(rate=8000, freq=440.0, seconds=0.25, amp=10000):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        n = int(rate * seconds)
        f.writeframes(b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * freq * i / rate)))
            for i in range(n)))
    return buf.getvalue()


def test_decode_ppm_real():
    img = _ppm(4, 2, lambda x, y: (255, 0, 128))
    feats = M.decode_image(img)
    assert feats == [4.0, 2.0, 255.0, 0.0, 128.0]


def test_decode_pgm_real():
    img = b"P5\n3 3\n255\n" + bytes([10] * 9)
    feats = M.decode_image(img)
    assert feats == [3.0, 3.0, 10.0]


def test_decode_wav_real():
    import numpy as np

    feats = M.decode_audio(_wav(rate=8000, seconds=0.25, amp=10000))
    duration, rate, channels, rms = feats
    assert duration == 0.25 and rate == 8000.0 and channels == 1.0
    # RMS of a sine at amplitude A is A/sqrt(2)
    assert abs(rms - 10000 / np.sqrt(2)) / rms < 0.02


def test_resize_netpbm_real():
    # left half red, right half blue; nearest-neighbor to 2x2 keeps both
    img = _ppm(4, 4, lambda x, y: (255, 0, 0) if x < 2 else (0, 0, 255))
    out = M.resize_netpbm(img, 2, 2)
    w, h, arr = M.parse_netpbm(out)
    assert (w, h) == (2, 2)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 0, 255]


def test_real_decode_through_mapinpandas(spark):
    """Real decoders run distributed: PPM and WAV payloads through the
    same Arrow-batched kernel shape as the stub path."""
    import pandas as pd
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StringType, StructField, StructType)

    rows = [(1, "image", bytearray(_ppm(4, 2, lambda x, y: (9, 9, 9)))),
            (2, "audio", bytearray(_wav(seconds=0.125)))]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")

    schema = StructType([StructField("media_id", LongType()),
                         StructField("kind", StringType()),
                         StructField("feat", ArrayType(DoubleType()))])

    def kernel(batches):
        for pdf in batches:
            feats = [M.decode_image(bytes(p)) if k == "image"
                     else M.decode_audio(bytes(p))
                     for k, p in zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"], "feat": feats})

    got = {r["media_id"]: r["feat"]
           for r in media.mapInPandas(kernel, schema=schema).collect()}
    assert got[1] == [4.0, 2.0, 9.0, 9.0, 9.0]
    assert got[2][1] == 8000.0 and got[2][0] == 0.125


def test_resize_images_mixed_formats(spark):
    """The resize kernel really resizes netpbm payloads and falls back
    to truncate/pad for opaque bytes, in one batch."""
    ppm = _ppm(8, 8, lambda x, y: (1, 2, 3))
    rows = [(1, "image", bytearray(ppm), "image/x-portable-pixmap", len(ppm)),
            (2, "image", bytearray(b"JPEGISH" * 10), "image/jpeg", 70)]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, n_bytes long")
    out = {r["media_id"]: r for r in
           M.resize_images(media, width=2, height=2).collect()}
    w, h, arr = M.parse_netpbm(bytes(out[1]["payload"]))
    assert (w, h) == (2, 2) and arr[0, 0].tolist() == [1, 2, 3]
    assert len(out[2]["payload"]) == 4  # opaque fallback: truncate to w*h


def test_extract_features_real_mode(spark):
    """extract_features(mode='real') decodes netpbm/WAV payloads and
    falls back to byte features for opaque formats, per row."""
    rows = [(1, "image", bytearray(_ppm(4, 2, lambda x, y: (9, 9, 9))), "x", 1),
            (2, "audio", bytearray(_wav(seconds=0.125)), "x", 1),
            (3, "image", bytearray(b"JPEGISH"), "x", 7)]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, n_bytes long")
    rows = {r["media_id"]: r
            for r in M.extract_features(media, mode="real").collect()}
    got = {k: r["feat"] for k, r in rows.items()}
    assert got[1] == [4.0, 2.0, 9.0, 9.0, 9.0]      # real PPM decode
    assert got[2][1] == 8000.0                       # real WAV decode
    assert got[3] == [7.0, 74.0, 72.0, float(sum(b"JPEGISH") % 256)]  # fallback
    # decode provenance: real parses name their decoder, the JPEG-ish
    # payload is visibly a fallback — not silently fake
    assert {k: r["decoder"] for k, r in rows.items()} == {
        1: "netpbm", 2: "wav", 3: "fake"}
    # fake mode labels everything fake
    assert {r["decoder"] for r in M.extract_features(media).collect()} \
        == {"fake"}
    with pytest.raises(ValueError, match="mode"):
        M.extract_features(media, mode="nope")


def test_real_mode_corrupt_payloads_fall_back(spark):
    """A RIFF/WAVE header with garbage inside (wave.Error) or a
    truncated 16-bit body must fall back to byte features, not fail
    the job."""
    bad_wav = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"garbage-not-a-chunk"
    rows = [(1, "audio", bytearray(bad_wav), "x", len(bad_wav))]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, n_bytes long")
    row = M.extract_features(media, mode="real").collect()[0]
    assert row["feat"] == M.decode_image(bad_wav, fake=True)  # byte fallback
    assert row["decoder"] == "fake"  # provenance records the fallback


# ---------------------------------------------------------------------------
# REAL stdlib BMP decoder
# ---------------------------------------------------------------------------

def _bmp_3x2():
    import numpy as np
    # 3x2 RGB: distinct per-pixel values; w=3 exercises row padding
    arr = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
    return arr, M.write_bmp(arr)


def test_bmp_roundtrip_identity():
    import numpy as np
    arr, payload = _bmp_3x2()
    parsed = M.parse_bmp(payload)
    assert parsed is not None
    w, h, back = parsed
    assert (w, h) == (3, 2)
    assert np.array_equal(back, arr)


def test_bmp_top_down_variant():
    import numpy as np
    arr, payload = _bmp_3x2()
    # flip the height sign to declare top-down, and reorder the raster
    # rows accordingly (top-down stores row 0 first, no flip)
    h = (-2).to_bytes(4, "little", signed=True)
    stride = (3 * 3 + 3) // 4 * 4
    body = b"".join(arr[r, :, ::-1].tobytes() + b"\x00" * (stride - 9)
                    for r in range(2))
    payload_td = payload[:22] + h + payload[26:54] + body
    parsed = M.parse_bmp(payload_td)
    assert parsed is not None
    w, hh, back = parsed
    assert (w, hh) == (3, 2)
    assert np.array_equal(back, arr)


def test_bmp_decode_features():
    import numpy as np
    arr, payload = _bmp_3x2()
    feats = M.decode_image(payload)
    assert feats[:2] == [3.0, 2.0]
    means = arr.reshape(-1, 3).mean(axis=0)
    assert feats[2:] == [round(float(m), 6) for m in means]


def test_bmp_rejects_non_bmp():
    assert M.parse_bmp(b"NOTABMP" + b"\x00" * 60) is None
    assert M.parse_bmp(b"BM" + b"\x00" * 10) is None  # truncated


def test_resize_bmp_real():
    import numpy as np
    arr, payload = _bmp_3x2()
    out = M.resize_bmp(payload, 6, 4)
    w, h, back = M.parse_bmp(out)
    assert (w, h) == (6, 4)
    # nearest-neighbor: top-left pixel preserved
    assert np.array_equal(back[0, 0], arr[0, 0])


def test_extract_features_real_mode_bmp_provenance(spark):
    from pyspark.sql.types import (BinaryType, LongType, StringType,
                                   StructField, StructType)
    _, payload = _bmp_3x2()
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ])
    media = spark.createDataFrame(
        [(1, "image", "image/bmp", len(payload), bytearray(payload))],
        schema)
    row = M.extract_features(media, mode="real").first()
    assert row["decoder"] == "bmp"
    assert row["feat"][:2] == [3.0, 2.0]


def test_bmp_rejects_offset_inside_header():
    _, payload = _bmp_3x2()
    # rewrite the pixel-data offset to point inside the header
    bad = payload[:10] + (0).to_bytes(4, "little") + payload[14:]
    assert M.parse_bmp(bad) is None


# ---------------------------------------------------------------------------
# PNG (stdlib zlib decoder)
# ---------------------------------------------------------------------------

def _rand_raster(h, w, c, seed=7):
    import numpy as np
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_identity(channels):
    import numpy as np
    arr = _rand_raster(13, 9, channels)
    parsed = M.parse_png(M.write_png(arr))
    assert parsed is not None
    w, h, back = parsed
    assert (w, h) == (9, 13)
    assert np.array_equal(back, arr)


def test_png_all_five_filters_unfilter_correctly():
    """Hand-build an IDAT stream whose five rows use filter types
    0/1/2/3/4 (applying each filter to a known raster per PNG spec §9)
    and assert the decoder recovers the raster exactly — write_png only
    emits filter 0, so this is the only way to prove sub/up/average/
    Paeth handling."""
    import zlib

    import numpy as np
    h, w, c = 5, 7, 3
    arr = _rand_raster(h, w, c, seed=42)
    stride = w * c
    flat = arr.reshape(h, stride).astype(int)

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)

    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        raw.append(ftype)
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=int)
        for x in range(stride):
            cur = flat[y][x]
            left = flat[y][x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if ftype == 0:
                out = cur
            elif ftype == 1:
                out = cur - left
            elif ftype == 2:
                out = cur - up
            elif ftype == 3:
                out = cur - ((left + up) >> 1)
            else:
                out = cur - paeth(left, up, ul)
            raw.append(out & 0xFF)

    def chunk(ctype, data):
        return (len(data).to_bytes(4, "big") + ctype + data
                + zlib.crc32(ctype + data).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    png = (M.PNG_SIG + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    parsed = M.parse_png(png)
    assert parsed is not None
    _, _, back = parsed
    assert np.array_equal(back, arr)


def test_png_rejects_unsupported_variants():
    import numpy as np
    arr = _rand_raster(4, 4, 3)
    good = M.write_png(arr)
    assert M.parse_png(b"\x89PNG\r\n\x1a\njunk") is None
    assert M.parse_png(b"not a png") is None
    # flip bit depth byte (IHDR data offset: 8 sig + 8 len/type + 8 w/h)
    bad_depth = bytearray(good)
    bad_depth[24] = 16
    assert M.parse_png(bytes(bad_depth)) is None
    # interlace flag flipped on a NON-interlaced stream: the Adam7
    # pass layout no longer matches the scanline bytes -> corrupt
    bad_int = bytearray(good)
    bad_int[28] = 1
    assert M.parse_png(bytes(bad_int)) is None
    # truncated IDAT payload
    assert M.parse_png(good[:40]) is None


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_adam7_interlaced_roundtrip(channels):
    """Adam7: seven independently-filtered sub-images must scatter
    back losslessly, including sizes where trailing passes are
    empty."""
    import numpy as np
    rng = np.random.default_rng(13)
    for shape in [(13, 9), (8, 8), (1, 1), (2, 3), (16, 5), (1, 9)]:
        arr = rng.integers(0, 256, (*shape, channels)).astype(np.uint8)
        parsed = M.parse_png(M.write_png(arr, interlace=True))
        assert parsed is not None, shape
        assert parsed[:2] == (shape[1], shape[0])
        assert np.array_equal(parsed[2], arr), shape


def test_gif_roundtrip_and_interlace():
    """Gray GIF round-trips exactly (identity palette); RGB is
    quantized onto the 6x7x6 cube (bounded error); interlaced row
    order deinterlaces to the same raster."""
    import numpy as np
    rng = np.random.default_rng(21)
    g = rng.integers(0, 256, (17, 11)).astype(np.uint8)
    for il in (False, True):
        parsed = M.parse_gif(M.write_gif(g, interlace=il))
        assert parsed is not None and parsed[:2] == (11, 17)
        assert np.array_equal(parsed[2],
                              np.repeat(g[..., None], 3, axis=2))
    rgb = rng.integers(0, 256, (9, 13, 3)).astype(np.uint8)
    parsed = M.parse_gif(M.write_gif(rgb))
    assert np.abs(parsed[2].astype(int) - rgb.astype(int)).max() <= 22


def test_gif_lzw_fuzz_and_rejects():
    """Seeded LZW encode/decode differential (incl. table-full clear
    + code-width growth) and malformed-payload rejection."""
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators.multimodal import (
        _gif_lzw_decode, _gif_lzw_encode,
    )
    rng = np.random.default_rng(22)
    for _ in range(60):
        n = int(rng.integers(1, 6000))
        alphabet = int(rng.choice([4, 16, 256]))
        px = rng.integers(0, alphabet, n).astype(np.uint8).tobytes()
        assert _gif_lzw_decode(_gif_lzw_encode(px, 8), 8, n) == px
    assert M.parse_gif(None) is None
    assert M.parse_gif(b"not a gif") is None
    assert M.parse_gif(b"GIF89a" + b"\x00" * 4) is None
    good = M.write_gif(np.zeros((4, 4), np.uint8))
    assert M.parse_gif(good[:20]) is None  # truncated -> None, not raise


def test_tiff_roundtrip_strips_and_endianness():
    """Uncompressed TIFF round-trips exactly across gray/RGB and
    single/dual/multi-strip layouts; big-endian files decode; the
    compressed/PIL tier is rejected not raised."""
    import numpy as np
    rng = np.random.default_rng(23)
    for shape, rps in [((9, 13, 3), 0), ((9, 13, 3), 2), ((16, 8, 1), 0),
                       ((16, 8, 1), 5), ((5, 5, 3), 1), ((4, 4, 1), 2)]:
        a = rng.integers(0, 256, shape).astype(np.uint8)
        parsed = M.parse_tiff(M.write_tiff(a, rows_per_strip=rps))
        assert parsed is not None, (shape, rps)
        assert parsed[:2] == (shape[1], shape[0])
        assert np.array_equal(parsed[2], a.reshape(shape[0], shape[1], -1))
    assert M.parse_tiff(None) is None
    assert M.parse_tiff(b"II*\x00" + b"\x00" * 4) is None
    # flip compression tag to LZW (5): unsupported -> None
    enc = bytearray(M.write_tiff(np.zeros((3, 3, 3), np.uint8)))
    i = enc.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    assert i > 0
    enc[i + 8] = 5
    assert M.parse_tiff(bytes(enc)) is None


def test_gif_tiff_decode_features_resize_and_provenance(spark):
    """decode_image dispatches to the real GIF/TIFF decoders, the
    resize family re-encodes in-format, and extract_features names
    the provenance."""
    import numpy as np
    flat = np.full((8, 8), 77, dtype=np.uint8)
    for enc, kind in [(M.write_gif(flat), "gif"),
                      (M.write_tiff(flat), "tiff")]:
        feats = M.decode_image(enc)
        assert feats[:2] == [8.0, 8.0]
        assert all(abs(m - 77.0) < 1e-9 for m in feats[2:])
    out = M.resize_gif(M.write_gif(flat), 4, 2)
    assert M.parse_gif(out)[:2] == (4, 2)
    out = M.resize_tiff(M.write_tiff(flat), 4, 2)
    assert M.parse_tiff(out)[:2] == (4, 2)

    rows = [(1, "image", bytearray(M.write_gif(flat)), "image/gif",
             len(M.write_gif(flat))),
            (2, "image", bytearray(M.write_tiff(flat)), "image/tiff",
             len(M.write_tiff(flat)))]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    got = {r["media_id"]: r["decoder"]
           for r in M.extract_features(media, mode="real").collect()}
    assert got == {1: "gif", 2: "tiff"}


def test_png_decode_features():
    import numpy as np
    arr = np.zeros((4, 6, 3), dtype=np.uint8)
    arr[..., 0] = 10
    arr[..., 1] = 20
    arr[..., 2] = 30
    feats = M.decode_image(M.write_png(arr))
    assert feats == [6.0, 4.0, 10.0, 20.0, 30.0]


def test_resize_png_real():
    import numpy as np
    arr = _rand_raster(8, 8, 4)
    out = M.resize_png(M.write_png(arr), 4, 2)
    parsed = M.parse_png(out)
    assert parsed is not None
    w, h, back = parsed
    assert (w, h) == (4, 2)
    # nearest-neighbor: every output pixel is some input pixel
    assert back.shape == (2, 4, 4)
    assert np.array_equal(back[0, 0], arr[0, 0])


def test_extract_features_real_mode_png_provenance(spark):
    """A real PNG payload flows through mapInPandas real mode with
    decoder='png' and raster-derived features — the NotImplementedError
    surface is now JPEG/MP3 only."""
    import numpy as np
    arr = np.full((3, 5, 3), 128, dtype=np.uint8)
    rows = [(1, "image", bytearray(M.write_png(arr)), "image/png",
             len(M.write_png(arr))),
            (2, "image", bytearray(b"not an image"), "application/x", 12)]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           M.extract_features(media, mode="real").collect()}
    assert got[1]["decoder"] == "png"
    assert got[1]["feat"][:2] == [5.0, 3.0]
    assert got[1]["feat"][2:] == [128.0, 128.0, 128.0]
    assert got[2]["decoder"] == "fake"


# ---------------------------------------------------------------------------
# JPEG (stdlib baseline codec)
# ---------------------------------------------------------------------------

def _gradient(h, w):
    import numpy as np
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255 / w), (yy * 255 / h),
                     ((xx + yy) * 255 / (w + h))], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("subsample", [False, True, "422"])
def test_jpeg_roundtrip_within_tolerance(subsample):
    """Lossy codec: round-trip must preserve dims exactly and pixels
    within a small mean error at q90 (4:4:4, 4:2:0 and 4:2:2 layouts — the
    latter exercises the MCU interleave + chroma upsample path)."""
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    img = _gradient(24, 40)
    enc = J.write_jpeg(img, quality=90, subsample=subsample)
    parsed = J.parse_jpeg(enc)
    assert parsed is not None
    w, h, back = parsed
    assert (w, h) == (40, 24) and back.shape == (24, 40, 3)
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 4.0


def test_jpeg_grayscale_and_odd_dims():
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    g = _gradient(17, 23)[..., 0]
    parsed = J.parse_jpeg(J.write_jpeg(g, quality=85))
    assert parsed is not None
    assert (parsed[0], parsed[1]) == (23, 17)
    assert parsed[2].shape == (17, 23, 1)
    assert np.abs(parsed[2][..., 0].astype(int) - g.astype(int)).mean() < 3.0
    # odd dims under 4:2:0 (chroma pad + final crop)
    odd = _gradient(17, 23)
    p2 = J.parse_jpeg(J.write_jpeg(odd, quality=85, subsample=True))
    assert p2 is not None and (p2[0], p2[1]) == (23, 17)


def test_jpeg_noise_stresses_entropy_paths():
    """Random noise maximizes AC activity (ZRL runs, long codes) —
    the entropy coder must survive and stay within quantization
    error."""
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
    parsed = J.parse_jpeg(J.write_jpeg(noise, quality=95))
    assert parsed is not None
    assert np.abs(parsed[2].astype(int) - noise.astype(int)).mean() < 8.0


def test_jpeg_rejects_unsupported():
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    assert J.parse_jpeg(None) is None
    assert J.parse_jpeg(b"not a jpeg") is None
    # corrupt SOF2 (zero components) -> None, not raise
    assert J.parse_jpeg(b"\xFF\xD8\xFF\xC2" + b"\x00" * 20) is None
    # arithmetic coding (SOF9) stays out of scope
    assert J.parse_jpeg(b"\xFF\xD8\xFF\xC9" + b"\x00" * 20) is None
    good = J.write_jpeg(_gradient(8, 8))
    assert J.parse_jpeg(good[:30]) is None  # truncated -> None, not raise


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2: spectral selection + successive approximation)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,subsample", [
    ((16, 16, 1), False),    # gray, exact MCUs
    ((24, 33, 3), False),    # RGB 4:4:4, ragged width
    ((17, 30, 3), True),     # 4:2:0, both dims ragged
    ((17, 30, 3), "422"),    # 4:2:2, horizontal-only chroma subsample
    ((7, 5, 1), False),      # sub-MCU
])
def test_jpeg_progressive_equals_baseline_decode(shape, subsample):
    """The progressive scan script (DC Al=1 -> AC bands Al=2 -> AC
    refine -> DC refine -> AC refine to Al=0) carries EXACTLY the
    same quantized coefficients as the baseline encoding, so the
    decoded rasters must be bit-identical — any deviation means a
    scan path dropped or misplaced refinement bits."""
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    rng = np.random.default_rng(5)
    h, w, c = shape
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.sin(yy / 5) * 60 + np.cos(xx / 7) * 60 + 128
    arr = np.clip(base[..., None] + rng.normal(0, 12, shape),
                  0, 255).astype(np.uint8)
    bb = J.parse_jpeg(J.write_jpeg(arr, quality=90, subsample=subsample))
    pp = J.parse_jpeg(J.write_jpeg(arr, quality=90, subsample=subsample,
                                   progressive=True))
    assert bb is not None and pp is not None
    assert bb[:2] == pp[:2]
    assert np.array_equal(bb[2], pp[2])


def test_jpeg_progressive_roundtrip_within_tolerance():
    """End-to-end: original -> progressive encode -> decode stays
    within quantization error, and decode_image reports the real
    'jpeg' provenance for SOF2 payloads."""
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    img = _gradient(24, 24)
    dec = J.parse_jpeg(J.write_jpeg(img, quality=92, progressive=True))
    assert dec is not None
    assert np.abs(dec[2].astype(int) - img.astype(int)).mean() < 4.0
    feats = M.decode_image(J.write_jpeg(img, quality=92, progressive=True))
    assert feats[:2] == [24.0, 24.0]


def test_jpeg_progressive_ac_scan_pairs_differential():
    """AC first/refine encoder vs decoder, seeded random bands: the
    decoded coefficient plane after each refinement scan must equal
    the point-transformed truth at that scan's Al — the T.81 G.2
    successive-approximation invariant."""
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    enc_ac = J._huff_encode_table(*J._AC_L)
    dec_ac = J._huff_decode_table(*J._AC_L)
    rng = np.random.default_rng(3)
    for _ in range(60):
        nblocks = int(rng.integers(1, 5))
        full = np.zeros((1, nblocks, 64), np.int32)
        mask = rng.random((1, nblocks, 64)) < rng.choice([0.05, 0.3, 0.8])
        full[mask] = rng.integers(-40, 41, int(mask.sum()))
        full[..., 0] = 0
        # first scan at Al=2
        bw = J._BitWriter()
        J._emit_ac_first_scan(bw, full, (1, nblocks), 1, 63, 2, enc_ac)
        bw.flush()
        reader = J._BitReader(bytes(bw.out) + b"\xff\xd9", 0)
        got = np.zeros_like(full)
        eob = [0]
        for b in range(nblocks):
            J._ac_first(reader, dec_ac, got[0, b], 1, 63, 2, eob)
        assert np.array_equal(
            got, np.sign(full) * ((np.abs(full) >> 2) << 2))
        # refine 2 -> 1 -> 0
        for al in (1, 0):
            bw = J._BitWriter()
            J._emit_ac_refine_scan(bw, full, (1, nblocks), 1, 63, al,
                                   enc_ac)
            bw.flush()
            reader = J._BitReader(bytes(bw.out) + b"\xff\xd9", 0)
            eob = [0]
            for b in range(nblocks):
                J._ac_refine(reader, dec_ac, got[0, b], 1, 63, al, eob)
            assert np.array_equal(
                got, np.sign(full) * ((np.abs(full) >> al) << al))


def test_jpeg_progressive_corrupt_never_raises():
    """Truncations and bit flips anywhere in a progressive stream must
    yield None or a decoded image — never an exception."""
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    img = _gradient(16, 16)
    good = J.write_jpeg(img, quality=90, progressive=True)
    for cut in range(2, len(good), 37):
        J.parse_jpeg(good[:cut])         # must not raise
    rng = np.random.default_rng(9)
    for _ in range(40):
        b = bytearray(good)
        b[int(rng.integers(2, len(b)))] ^= int(rng.integers(1, 256))
        J.parse_jpeg(bytes(b))           # must not raise


def test_jpeg_decode_features_and_resize():
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    flat = np.full((16, 16, 3), 100, dtype=np.uint8)
    feats = M.decode_image(J.write_jpeg(flat, quality=95))
    assert feats[:2] == [16.0, 16.0]
    assert all(abs(m - 100.0) < 2.0 for m in feats[2:])
    out = M.resize_jpeg(J.write_jpeg(flat), 8, 4)
    p = J.parse_jpeg(out)
    assert p is not None and (p[0], p[1]) == (8, 4)


def test_extract_features_real_mode_jpeg_provenance(spark):
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    payload = J.write_jpeg(_gradient(16, 24), quality=90)
    rows = [(1, "image", bytearray(payload), "image/jpeg", len(payload))]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = M.extract_features(media, mode="real").collect()[0]
    assert got["decoder"] == "jpeg"
    assert got["feat"][:2] == [24.0, 16.0]


# ---------------------------------------------------------------------------
# WAV writer + resample (audio real tier)
# ---------------------------------------------------------------------------

def test_wav_roundtrip_and_resample():
    import numpy as np
    t = np.arange(800) / 8000.0
    mono = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
    payload = M.write_wav(mono, rate=8000)
    dur, rate, ch, rms = M.decode_audio(payload)
    assert (rate, ch) == (8000.0, 1.0)
    assert abs(dur - 0.1) < 1e-6
    assert abs(rms - 20000 / np.sqrt(2)) < 300  # sine RMS = A/sqrt(2)

    up = M.resample_wav(payload, 16000)
    dur2, rate2, ch2, rms2 = M.decode_audio(up)
    assert (rate2, ch2) == (16000.0, 1.0)
    assert abs(dur2 - 0.1) < 1e-3       # duration preserved
    assert abs(rms2 - rms) < 500        # energy preserved by linear interp

    stereo = np.stack([mono, -mono], axis=1)
    down = M.resample_wav(M.write_wav(stereo, 8000), 4000)
    d3, r3, c3, _ = M.decode_audio(down)
    assert (r3, c3) == (4000.0, 2.0) and abs(d3 - 0.1) < 1e-3

    with pytest.raises(NotImplementedError):
        M.resample_wav(b"not audio", 8000)


def test_resample_audio_kernel(spark):
    import numpy as np
    t = np.arange(400) / 8000.0
    wav = M.write_wav((np.sin(2 * np.pi * 220 * t) * 1000).astype("<i2"),
                      rate=8000)
    rows = [(1, "audio", bytearray(wav), "audio/wav", len(wav)),
            (2, "audio", bytearray(b"opaque-bytes"), "application/x", 12)]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           M.resample_audio(media, target_rate=16000).collect()}
    d, r, c, _ = M.decode_audio(bytes(got[1]["payload"]))
    assert r == 16000.0 and abs(d - 0.05) < 1e-3
    assert got[2]["n_bytes"] == 16000     # fallback pad to target bytes
    assert got[1]["sample_rate"] == 16000


def test_jpeg_zigzag_is_canonical_t81():
    """Pin the zig-zag table to ITU T.81 Fig. A.6 — encoder and decoder
    share it, so a transposed table would still round-trip internally
    while garbling every interchange with standards-compliant codecs."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.jpeg import _ZIGZAG
    canon = [
        0, 1, 5, 6, 14, 15, 27, 28,
        2, 4, 7, 13, 16, 26, 29, 42,
        3, 8, 12, 17, 25, 30, 41, 43,
        9, 11, 18, 24, 31, 40, 44, 53,
        10, 19, 23, 32, 39, 45, 52, 54,
        20, 22, 33, 38, 46, 51, 55, 60,
        21, 34, 37, 47, 50, 56, 59, 61,
        35, 36, 48, 49, 57, 58, 62, 63]
    assert all(canon[r * 8 + c] == k for k, (r, c) in enumerate(_ZIGZAG))


def test_jpeg_corrupt_streams_return_none_never_raise():
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    # SOS referencing a component id with no SOF seen (StopIteration
    # path before the fix) — 1 component, id 1, tables 0, Ss/Se/Ah/Al
    sos = b"\xFF\xDA" + (8).to_bytes(2, "big") + bytes([1, 1, 0, 0, 63, 0])
    assert J.parse_jpeg(b"\xFF\xD8" + sos) is None
    # hostile SOF dims (would allocate ~34 GB of planes)
    sof = (b"\xFF\xC0" + (11).to_bytes(2, "big")
           + bytes([8]) + (65535).to_bytes(2, "big")
           + (65535).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    assert J.parse_jpeg(b"\xFF\xD8" + sof) is None


def test_jpeg_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker — both the header walker and the progressive between-scan
    advance must treat 0xFF 0xFF as padding, not a marker."""
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    img = _gradient(16, 16)
    for progressive in (False, True):
        good = J.write_jpeg(img, quality=90, progressive=progressive)
        ref = J.parse_jpeg(good)
        # inject fill bytes before every marker segment AFTER SOI
        padded = bytearray(good[:2])
        i = 2
        while i < len(good) - 1:
            if good[i] == 0xFF and good[i + 1] not in (0x00,) and \
                    not (0xD0 <= good[i + 1] <= 0xD7):
                padded += b"\xFF\xFF"
            padded.append(good[i])
            i += 1
        padded.append(good[-1])
        got = J.parse_jpeg(bytes(padded))
        assert got is not None, f"progressive={progressive}"
        assert np.array_equal(got[2], ref[2])


def test_gif_offset_frame_composites_on_canvas():
    """A first frame positioned at (left, top) inside a larger logical
    screen decodes as the full screen with the frame composited over
    the background color — what a viewer shows."""
    import numpy as np
    flat = np.full((4, 6), 200, dtype=np.uint8)
    enc = bytearray(M.write_gif(flat))
    # logical screen 10x8, bg index 3; image descriptor at offset (2, 3)
    enc[6:8] = (10).to_bytes(2, "little")
    enc[8:10] = (8).to_bytes(2, "little")
    enc[11] = 3
    desc = 13 + 3 * 256            # header + 256-entry global palette
    assert enc[desc] == 0x2C
    enc[desc + 1:desc + 3] = (2).to_bytes(2, "little")
    enc[desc + 3:desc + 5] = (3).to_bytes(2, "little")
    w, h, arr = M.parse_gif(bytes(enc))
    assert (w, h) == (10, 8)
    assert (arr[3:7, 2:8] == 200).all()          # the frame
    assert (arr[0, 0] == [3, 3, 3]).all()        # bg color (gray pal idx 3)


def test_resize_images_real_path_covers_gif_and_tiff(spark):
    """resize_images must really resize GIF/TIFF payloads (decode back
    at the target size), not fall back to byte truncation."""
    import numpy as np
    flat = np.full((16, 16), 90, dtype=np.uint8)
    rows = [(1, "image", bytearray(M.write_gif(flat)), "image/gif", 0),
            (2, "image", bytearray(M.write_tiff(flat)), "image/tiff", 0)]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    out = {r["media_id"]: bytes(r["payload"])
           for r in M.resize_images(media, width=8, height=4).collect()}
    assert M.parse_gif(out[1])[:2] == (8, 4)
    assert M.parse_tiff(out[2])[:2] == (8, 4)


def _mp3_frames(n=50, kbps=128, sr=44100, ver_bits=0x3, layer_bits=0x1,
                mono=False, bitrate_indexes=None):
    """Valid MPEG frame headers with zeroed payloads (a metadata
    parser never reads the audio bits)."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.multimodal import (
        _MP3_BITRATES, _MP3_RATES,
    )
    version = {0x0: "2.5", 0x2: "2", 0x3: "1"}[ver_bits]
    layer = {0x3: 1, 0x2: 2, 0x1: 3}[layer_bits]
    vgroup = "1" if version == "1" else "2"
    out = bytearray()
    for k in range(n):
        idx = (bitrate_indexes[k % len(bitrate_indexes)]
               if bitrate_indexes
               else _MP3_BITRATES[(vgroup, layer)].index(kbps))
        this_kbps = _MP3_BITRATES[(vgroup, layer)][idx]
        h = (0x7FF << 21) | (ver_bits << 19) | (layer_bits << 17) \
            | (1 << 16) | (idx << 12) \
            | (_MP3_RATES[version].index(sr) << 10) \
            | ((0x3 if mono else 0x0) << 6)
        samples = 1152 if (layer == 2 or vgroup == "1") else 576
        size = (samples * this_kbps * 1000 // (8 * sr)
                if layer != 1 else (12 * this_kbps * 1000 // sr) * 4)
        out += h.to_bytes(4, "big") + b"\x00" * (size - 4)
    return bytes(out)


def test_mp3_meta_cbr_vbr_id3_and_rejects():
    """Frame-walk metadata: exact duration for CBR, byte-weighted mean
    bitrate for VBR, ID3v2 skip, mono flag, MPEG2 math; non-MPEG and
    truncated junk return None."""
    import pytest as _pytest
    stream = _mp3_frames(n=50, kbps=128)
    meta = M.parse_mp3_meta(stream)
    assert meta["n_frames"] == 50 and meta["layer"] == 3
    assert meta["sample_rate"] == 44100.0 and meta["channels"] == 2.0
    assert abs(meta["duration_sec"] - 50 * 1152 / 44100) < 1e-4
    assert abs(meta["bitrate_kbps"] - 128.0) < 1.5  # integer frame sizes

    # ID3v2 tag (syncsafe size) skipped
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 3]) + b"\x00" * 131
    assert M.parse_mp3_meta(tag + stream)["n_frames"] == 50

    # VBR: alternating 64/192 kbps -> mean strictly between
    vbr = M.parse_mp3_meta(_mp3_frames(n=40, bitrate_indexes=[5, 11]))
    assert 64 < vbr["bitrate_kbps"] < 192

    mono = M.parse_mp3_meta(_mp3_frames(n=4, mono=True))
    assert mono["channels"] == 1.0

    # MPEG2 layer III: 576 samples/frame at 22050
    m2 = M.parse_mp3_meta(_mp3_frames(n=20, kbps=64, sr=22050,
                                      ver_bits=0x2))
    assert abs(m2["duration_sec"] - 20 * 576 / 22050) < 1e-4

    assert M.parse_mp3_meta(None) is None
    assert M.parse_mp3_meta(b"not audio at all") is None
    assert M.parse_mp3_meta(b"\xFF\xFB") is None          # truncated
    # trailing garbage after valid frames is tolerated
    assert M.parse_mp3_meta(stream + b"TAGjunk" * 4)["n_frames"] == 50
    # decode_audio still refuses (PCM is librosa territory)
    with _pytest.raises(NotImplementedError):
        M.decode_audio(stream)


def test_extract_features_mp3meta_provenance(spark):
    """Audio payloads that aren't WAV but parse as MPEG frames get the
    metadata tier with 'mp3meta' provenance, not the fake fallback."""
    stream = _mp3_frames(n=25, kbps=128)
    rows = [(1, "audio", bytearray(stream), "audio/mpeg", len(stream)),
            (2, "audio", bytearray(b"opaque-bytes"), "audio/ogg", 12)]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           M.extract_features(media, mode="real").collect()}
    assert got[1]["decoder"] == "mp3meta"
    assert got[1]["feat"][1] == 44100.0
    assert abs(got[1]["feat"][0] - 25 * 1152 / 44100) < 1e-4
    assert got[2]["decoder"] == "fake"


def test_mp3_meta_trailing_sync_lookalike_tolerated():
    """Trailing bytes that carry a valid sync but an invalid bitrate/
    samplerate index (APE tags, junk) must not discard the parsed
    frames (second review pass finding)."""
    stream = _mp3_frames(n=10, kbps=128)
    for tail in (b"\xFF\xFB\xF0\x00",      # bad bitrate index 0xF
                 b"\xFF\xFB\x9C\x00",      # reserved samplerate idx
                 b"\xFF\xFB\x90"):         # truncated header
        got = M.parse_mp3_meta(stream + tail)
        assert got is not None and got["n_frames"] == 10, tail


def test_tiff_white_is_zero_inverts():
    """Photometric 0 (WhiteIsZero) grayscale must decode inverted;
    palette/CMYK photometrics are rejected, not mis-decoded."""
    import numpy as np
    g = np.full((4, 4), 40, dtype=np.uint8)
    enc = bytearray(M.write_tiff(g))
    i = enc.find((262).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    assert i > 0
    enc[i + 8] = 0                          # BlackIsZero -> WhiteIsZero
    w, h, arr = M.parse_tiff(bytes(enc))
    assert (arr == 215).all()
    enc[i + 8] = 3                          # palette: PIL territory
    assert M.parse_tiff(bytes(enc)) is None


def test_gif_offset_bg_uses_global_table_with_local_frame_table():
    """The background index addresses the GLOBAL color table even when
    the frame carries a local one."""
    import numpy as np
    flat = np.full((2, 2), 5, dtype=np.uint8)
    enc = bytearray(M.write_gif(flat))
    desc = 13 + 3 * 256
    assert enc[desc] == 0x2C
    # larger screen + offset frame, bg index 7
    enc[6:8] = (4).to_bytes(2, "little")
    enc[8:10] = (4).to_bytes(2, "little")
    enc[11] = 7
    enc[desc + 1:desc + 3] = (1).to_bytes(2, "little")
    enc[desc + 3:desc + 5] = (1).to_bytes(2, "little")
    # give the FRAME a local 2-color table (indexes still valid: pixel
    # value 5 needs >= 6 entries, so use an 8-entry local table)
    local = bytes(range(8 * 3))
    enc[desc + 9] |= 0x80 | 0x02            # LCT flag, size 2^(2+1)=8
    enc[desc + 10:desc + 10] = local        # insert before LZW data
    w, h, arr = M.parse_gif(bytes(enc))
    assert (w, h) == (4, 4)
    assert (arr[0, 0] == [7, 7, 7]).all()   # GLOBAL[7], not local[7]
    assert arr[1, 1].tolist() == list(local[15:18])  # frame uses LOCAL


def test_png_palette_indexed_decodes():
    """Color-type-3 PNGs resolve through the PLTE chunk to RGB, in
    both non-interlaced and Adam7 layouts; out-of-range indexes and
    missing PLTE reject."""
    import struct
    import zlib as _zlib

    import numpy as np

    def chunk(ctype, data):
        return (len(data).to_bytes(4, "big") + ctype + data
                + _zlib.crc32(ctype + data).to_bytes(4, "big"))

    pal = bytes([250, 0, 0, 0, 250, 0, 0, 0, 250, 9, 9, 9])  # 4 colors
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], np.uint8)
    h, w = idx.shape
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    ihdr = struct.pack(">II5B", w, h, 8, 3, 0, 0, 0)
    png = (M.PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal)
           + chunk(b"IDAT", _zlib.compress(raw)) + chunk(b"IEND", b""))
    parsed = M.parse_png(png)
    assert parsed is not None and parsed[:2] == (w, h)
    want = np.frombuffer(pal, np.uint8).reshape(4, 3)[idx]
    assert np.array_equal(parsed[2], want)
    # decode_image picks it up as a real 'png' parse
    feats = M.decode_image(png)
    assert feats[:2] == [float(w), float(h)]

    # out-of-range index -> reject (palette has 4 entries, index 7)
    bad = idx.copy(); bad[0, 0] = 7
    raw_b = b"".join(b"\x00" + bad[y].tobytes() for y in range(h))
    png_b = (M.PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal)
             + chunk(b"IDAT", _zlib.compress(raw_b)) + chunk(b"IEND", b""))
    assert M.parse_png(png_b) is None
    # missing PLTE -> reject
    png_c = (M.PNG_SIG + chunk(b"IHDR", ihdr)
             + chunk(b"IDAT", _zlib.compress(raw)) + chunk(b"IEND", b""))
    assert M.parse_png(png_c) is None

    # Adam7-interlaced palette: pass-ordered sub-images, palette
    # lookup after the scatter
    from dynamic_etl_pipeline_thesis_ii_spark.operators.multimodal import (
        _ADAM7,
    )
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = idx[y0::dy, x0::dx]
        if sub.size:
            parts += [b"\x00" + sub[y].tobytes()
                      for y in range(sub.shape[0])]
    ihdr_i = struct.pack(">II5B", w, h, 8, 3, 0, 0, 1)
    png_i = (M.PNG_SIG + chunk(b"IHDR", ihdr_i) + chunk(b"PLTE", pal)
             + chunk(b"IDAT", _zlib.compress(b"".join(parts)))
             + chunk(b"IEND", b""))
    parsed_i = M.parse_png(png_i)
    assert parsed_i is not None and np.array_equal(parsed_i[2], want)


def test_gif_transparency_shows_background():
    """A GCE transparency index renders as the (global) background
    color — the single-frame approximation of what a viewer shows."""
    import numpy as np
    flat = np.full((2, 3), 100, dtype=np.uint8)
    flat[0, 1] = 42                             # the transparent pixel
    enc = bytearray(M.write_gif(flat))
    enc[11] = 7                                 # bg color index
    desc = 13 + 3 * 256
    assert enc[desc] == 0x2C
    # insert a GCE before the image descriptor: transparent index 42
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 42, 0x00])
    enc[desc:desc] = gce
    w, h, arr = M.parse_gif(bytes(enc))
    assert (w, h) == (3, 2)
    assert (arr[0, 1] == [7, 7, 7]).all()       # transparent -> bg
    assert (arr[0, 0] == [100, 100, 100]).all()
    # without the GCE the pixel keeps its palette color
    w2, h2, arr2 = M.parse_gif(M.write_gif(flat))
    assert (arr2[0, 1] == [42, 42, 42]).all()


def test_png_16bit_depth_decodes_high_byte():
    """16-bit PNGs unfilter on byte lanes with bpp = 2*channels and
    reduce to the high byte; the sub filter at 16-bit must offset by
    two bytes per channel (the spec's bpp rule), and 16-bit palette
    is rejected (not a legal combination)."""
    import struct
    import zlib as _zlib

    import numpy as np

    def chunk(ctype, data):
        return (len(data).to_bytes(4, "big") + ctype + data
                + _zlib.crc32(ctype + data).to_bytes(4, "big"))

    rng = np.random.default_rng(8)
    h, w, ch = 4, 5, 3
    hi = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    lo = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    rows = np.stack([hi, lo], axis=-1).reshape(h, w * ch * 2)
    # filter rows forward: row0 sub (left offset = 6 bytes), rest up
    filt = bytearray()
    bpp = ch * 2
    r0 = rows[0].astype(np.int16)
    sub = r0.copy()
    sub[bpp:] = (r0[bpp:] - r0[:-bpp]) & 0xFF
    filt += b"\x01" + bytes(sub.astype(np.uint8))
    for y in range(1, h):
        up = (rows[y].astype(np.int16) - rows[y - 1].astype(np.int16)) & 0xFF
        filt += b"\x02" + bytes(up.astype(np.uint8))
    ihdr = struct.pack(">II5B", w, h, 16, 2, 0, 0, 0)
    png = (M.PNG_SIG + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", _zlib.compress(bytes(filt)))
           + chunk(b"IEND", b""))
    parsed = M.parse_png(png)
    assert parsed is not None and parsed[:2] == (w, h)
    assert np.array_equal(parsed[2], hi)

    bad = struct.pack(">II5B", 4, 4, 16, 3, 0, 0, 0)   # 16-bit palette
    png_b = (M.PNG_SIG + chunk(b"IHDR", bad)
             + chunk(b"IDAT", _zlib.compress(b"\x00" * 36))
             + chunk(b"IEND", b""))
    assert M.parse_png(png_b) is None


def test_bmp_8bit_palette_decodes():
    """8-bit palette BMPs resolve through the BGRA color table; both
    row orders work and out-of-range indexes reject."""
    import numpy as np
    idx = np.array([[0, 1, 2], [3, 2, 0]], np.uint8)
    h, w = idx.shape
    pal_rgb = [(250, 0, 0), (0, 250, 0), (0, 0, 250), (9, 9, 9)]
    table = b"".join(bytes([b, g, r, 0]) for r, g, b in pal_rgb)
    stride = (w + 3) // 4 * 4
    body = b"".join(bytes(idx[y]) + b"\x00" * (stride - w)
                    for y in range(h - 1, -1, -1))      # bottom-up
    offset = 14 + 40 + len(table)
    hdr = (b"BM" + (offset + len(body)).to_bytes(4, "little")
           + b"\x00" * 4 + offset.to_bytes(4, "little")
           + (40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)
           + h.to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
           + b"\x00" * 8 + (4).to_bytes(4, "little")    # biClrUsed = 4
           + b"\x00" * 4)
    bmp = hdr + table + body
    parsed = M.parse_bmp(bmp)
    assert parsed is not None and parsed[:2] == (w, h)
    want = np.array(pal_rgb, np.uint8)[idx]
    assert np.array_equal(parsed[2], want)
    # decode_image real tier picks it up
    assert M.decode_image(bmp)[:2] == [float(w), float(h)]
    # index beyond biClrUsed -> reject
    bad = bytearray(bmp)
    bad[offset] = 7
    assert M.parse_bmp(bytes(bad)) is None


def test_decode_wav_24bit_real():
    """24-bit PCM WAV: sign-extended little-endian triplets; RMS of a
    sine at amplitude A is A/sqrt(2)."""
    import io as _io
    import math as _math
    import struct as _struct
    import wave as _wave

    import numpy as np
    rate, amp, n = 8000, 4_000_000, 2000
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(3)
        f.setframerate(rate)
        frames = b"".join(
            _struct.pack("<i", int(amp * _math.sin(2 * _math.pi * 440 * i
                                                   / rate)))[:3]
            for i in range(n))
        f.writeframes(frames)
    duration, got_rate, channels, rms = M.decode_audio(buf.getvalue())
    assert (duration, got_rate, channels) == (n / rate, 8000.0, 1.0)
    assert abs(rms - amp / np.sqrt(2)) / rms < 0.02


def test_tiff_lzw_and_predictor_roundtrip():
    """LZW-compressed TIFFs (the common scanned-document layout)
    round-trip exactly across strip layouts, with and without the
    horizontal-differencing predictor; a truncated LZW strip rejects
    instead of raising."""
    import numpy as np
    rng = np.random.default_rng(31)
    for shape, rps, pred in [((9, 13, 3), 0, False), ((9, 13, 3), 2, True),
                             ((16, 8, 1), 5, False), ((25, 18, 3), 7, True)]:
        a = rng.integers(0, 256, shape).astype(np.uint8)
        enc = M.write_tiff(a, rows_per_strip=rps, compression="lzw",
                           predictor=pred)
        got = M.parse_tiff(enc)
        assert got is not None, (shape, rps, pred)
        assert np.array_equal(got[2], a.reshape(shape[0], shape[1], -1))
    # smooth gradients compress: LZW beats raw on compressible data
    grad = np.tile(np.arange(64, dtype=np.uint8), (64, 1))
    raw_len = len(M.write_tiff(grad))
    lzw_len = len(M.write_tiff(grad, compression="lzw", predictor=True))
    assert lzw_len < raw_len / 2
    # severe truncation (IFD gone) -> None, never raise
    enc = M.write_tiff(grad, compression="lzw")
    assert M.parse_tiff(enc[:100]) is None
    # corrupt LZW stream inside the strip -> None or decode, no raise
    broken = bytearray(enc)
    for k in range(20, 60):
        broken[k] ^= 0xFF
    M.parse_tiff(bytes(broken))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="compression"):
        M.write_tiff(grad, compression="zip")
    with _pytest.raises(ValueError, match="predictor"):
        M.write_tiff(grad, predictor=True)


def test_tiff_lzw_table_full_reset():
    """Random high-entropy data large enough to fill the 12-bit code
    table forces mid-stream Clear codes; round-trip must survive."""
    import numpy as np
    rng = np.random.default_rng(32)
    big = rng.integers(0, 256, (80, 80, 3)).astype(np.uint8)
    got = M.parse_tiff(M.write_tiff(big, compression="lzw"))
    assert got is not None and np.array_equal(got[2], big)


def test_tiff_packbits_roundtrip_and_fuzz():
    """PackBits (compression 32773) round-trips exactly across strip
    layouts with per-row independent compression; the row codec
    survives a seeded encode/decode fuzz over runs and noise."""
    import random

    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators.multimodal import (
        _packbits_decode, _packbits_encode_row,
    )
    rng = random.Random(46)
    for _ in range(80):
        n = rng.randint(0, 800)
        row = (bytes(rng.getrandbits(8) for _ in range(n))
               if rng.random() < 0.5 else
               b"".join(bytes([rng.getrandbits(8)]) * rng.randint(1, 200)
                        for _ in range(n // 40 + 1))[:n])
        assert _packbits_decode(_packbits_encode_row(row), n) == row
    nrng = np.random.default_rng(47)
    for shape, rps in [((9, 13, 3), 0), ((16, 8, 1), 5)]:
        a = nrng.integers(0, 4, shape).astype(np.uint8) * 60
        enc = M.write_tiff(a, rows_per_strip=rps, compression="packbits")
        got = M.parse_tiff(enc)
        assert got is not None
        assert np.array_equal(got[2], a.reshape(shape[0], shape[1], -1))
    # runs-heavy data actually compresses
    flat = np.zeros((32, 32), np.uint8)
    assert len(M.write_tiff(flat, compression="packbits")) \
        < len(M.write_tiff(flat)) / 4


# ---------------------------------------------------------------------------
# G.711 / IMA-ADPCM WAV tier (audioop differentials)
# ---------------------------------------------------------------------------

def _wav_container(tag, channels, rate, block_align, bits, data):
    import struct
    fmt = struct.pack("<HHIIHH", tag, channels, rate,
                      rate * block_align, block_align, bits)
    body = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data
            + (b"\x00" if len(data) % 2 else b""))
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def test_g711_decoders_match_audioop():
    """mu-law and A-law expansion == the stdlib audioop reference,
    byte for byte over every possible code."""
    import warnings

    import numpy as np
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    data = bytes(range(256)) * 3
    want_u = np.frombuffer(audioop.ulaw2lin(data, 2), dtype="<i2")
    want_a = np.frombuffer(audioop.alaw2lin(data, 2), dtype="<i2")
    assert np.array_equal(M._ulaw_decode(data), want_u)
    assert np.array_equal(M._alaw_decode(data), want_a)


def test_ima_adpcm_matches_audioop_core():
    """The IMA nibble loop == audioop's DVI/IMA ADPCM decoder given
    the same initial (predictor, index) state. audioop packs the
    FIRST sample in the HIGH nibble while IMA WAV is low-first, so
    the stream is nibble-swapped for the reference call; our block
    decode additionally emits the header predictor as sample 0."""
    import random
    import warnings

    import numpy as np
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    rng = random.Random(48)
    for trial in range(20):
        pred = rng.randint(-30000, 30000)
        idx = rng.randint(0, 88)
        body = bytes(rng.getrandbits(8) for _ in range(4 * rng.randint(1, 12)))
        block = (pred & 0xFFFF).to_bytes(2, "little") + bytes([idx, 0]) + body
        got = M._ima_adpcm_decode(block, channels=1,
                                  block_align=len(block))
        swapped = bytes(((b << 4) & 0xF0) | (b >> 4) for b in body)
        want, _ = audioop.adpcm2lin(swapped, 2, (pred, idx))
        want = np.frombuffer(want, dtype="<i2")
        assert got[0] == pred, trial
        assert np.array_equal(got[1:], want), trial


def test_ima_adpcm_stereo_interleave():
    """Stereo blocks interleave 4-byte words per channel; a stream
    whose left channel holds nibble 2 (+step/2 drift, index stays 0)
    and right channel nibble 0xA (the same magnitude negative) must
    decode to monotonically diverging channels."""
    import numpy as np
    left_word, right_word = b"\x22" * 4, b"\xAA" * 4
    block = (b"\x00\x00\x00\x00"      # L: pred 0, idx 0
             + b"\x00\x00\x00\x00"    # R: pred 0, idx 0
             + (left_word + right_word) * 3)
    got = M._ima_adpcm_decode(block, channels=2, block_align=len(block))
    l, r = got[0::2].astype(int), got[1::2].astype(int)
    assert len(l) == len(r) == 1 + 24
    assert l[0] == 0 and r[0] == 0
    assert np.all(np.diff(l) > 0) and l[-1] > 0
    assert np.all(np.diff(r) < 0) and r[-1] < 0


def test_decode_audio_g711_and_adpcm_wavs():
    """decode_audio handles mu-law/A-law/IMA-ADPCM WAV containers for
    real: duration from frames/rate, RMS over the DECODED int16
    samples (a constant-ish mu-law tone has far larger RMS than its
    8-bit code bytes would suggest)."""
    import warnings

    import numpy as np
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    data = bytes(range(256)) * 8                      # 2048 codes
    for tag, dec in ((7, audioop.ulaw2lin), (6, audioop.alaw2lin)):
        feats = M.decode_audio(_wav_container(tag, 1, 8000, 1, 8, data))
        want = np.frombuffer(dec(data, 2), dtype="<i2").astype(np.float64)
        assert feats[0] == round(len(data) / 8000, 6)
        assert feats[1] == 8000.0 and feats[2] == 1.0
        assert feats[3] == round(float(np.sqrt(np.mean(want ** 2))), 6)

    block = b"\x10\x00\x05\x00" + b"\x37" * 16        # pred 16, idx 5
    feats = M.decode_audio(_wav_container(0x11, 1, 8000, 20, 4,
                                          block * 4))
    assert feats[1] == 8000.0 and feats[2] == 1.0
    assert feats[0] == round(4 * 33 / 8000, 6)        # 1 + 32 per block
    assert feats[3] > 0


# ---------------------------------------------------------------------------
# ISO-BMFF (MP4) metadata tier
# ---------------------------------------------------------------------------

def test_mp4_meta_roundtrip_v0_and_v1():
    for version in (0, 1):
        enc = M.write_mp4(12.5, timescale=1000,
                          tracks=(("vide", "avc1", 640, 360),
                                  ("soun", "mp4a", 0, 0)),
                          version=version)
        meta = M.parse_mp4_meta(enc)
        assert meta is not None, version
        assert meta["duration_sec"] == 12.5 and meta["timescale"] == 1000.0
        assert meta["n_video"] == 1.0 and meta["n_audio"] == 1.0
        assert (meta["width"], meta["height"]) == (640.0, 360.0)
        assert meta["video_codec"] == "avc1"
        assert meta["audio_codec"] == "mp4a"
        assert meta["brand"] == "isom"


def test_mp4_meta_multi_video_and_audio_only():
    enc = M.write_mp4(3.0, tracks=(("vide", "hvc1", 1920, 1080),
                                   ("vide", "avc1", 640, 360)))
    meta = M.parse_mp4_meta(enc)
    assert meta["n_video"] == 2.0 and meta["n_audio"] == 0.0
    # first video track's dimensions and codec win
    assert (meta["width"], meta["height"]) == (1920.0, 1080.0)
    assert meta["video_codec"] == "hvc1"

    m4a = M.parse_mp4_meta(M.write_mp4(7.25, tracks=(("soun", "mp4a",
                                                      0, 0),)))
    assert m4a["n_video"] == 0.0 and m4a["audio_codec"] == "mp4a"
    assert m4a["width"] == 0.0


def test_mp4_meta_rejects_and_never_raises():
    import random
    assert M.parse_mp4_meta(None) is None
    assert M.parse_mp4_meta(b"") is None
    assert M.parse_mp4_meta(b"RIFF" + b"\x00" * 40) is None
    # ftyp without moov: recognized container but no metadata
    ftyp_only = M.write_mp4(1.0)[:24]
    assert M.parse_mp4_meta(ftyp_only) is None
    rng = random.Random(77)
    base = M.write_mp4(2.0)
    for _ in range(150):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] = rng.getrandbits(8)
        M.parse_mp4_meta(bytes(b))             # may be None, never raises
    for _ in range(100):
        junk = bytes(rng.getrandbits(8)
                     for _ in range(rng.randint(0, 120)))
        M.parse_mp4_meta(junk)


def test_decode_any_mp4_provenance(spark):
    rows = [(1, "video", M.write_mp4(9.0)),
            (2, "video", b"\x00\x01\x02 not a container")]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary") \
        .withColumn("n_bytes", F.length("payload"))
    out = {r["media_id"]: (r["decoder"], r["feat"]) for r in
           M.extract_features(media, mode="real").collect()}
    dec, feat = out[1]
    assert dec == "mp4meta"
    assert feat[0] == 9.0 and feat[1] == 640.0 and feat[3] == 2.0
    assert out[2][0] == "fake"                 # garbage falls back


def test_flac_meta_roundtrip_and_rejects():
    import random
    meta = M.parse_flac_meta(M.write_flac_meta(441_000, rate=44_100,
                                               channels=2, bits=16))
    assert meta == {"duration_sec": 10.0, "sample_rate": 44100.0,
                    "channels": 2.0, "bits_per_sample": 16.0,
                    "total_samples": 441_000}
    # >32-bit total-sample counts use the 36-bit field
    big = M.parse_flac_meta(M.write_flac_meta(5_000_000_000,
                                              rate=48_000, channels=1,
                                              bits=24))
    assert big["total_samples"] == 5_000_000_000
    assert big["channels"] == 1.0 and big["bits_per_sample"] == 24.0
    assert M.parse_flac_meta(None) is None
    assert M.parse_flac_meta(b"fLaC") is None
    assert M.parse_flac_meta(b"OggS" + b"\x00" * 60) is None
    rng = random.Random(79)
    base = M.write_flac_meta(1000)
    for _ in range(120):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(len(b))] = rng.getrandbits(8)
        M.parse_flac_meta(bytes(b))            # may be None, never raises


def test_decode_any_flac_provenance(spark):
    rows = [(1, "audio", M.write_flac_meta(88_200, rate=44_100))]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary") \
        .withColumn("n_bytes", F.length("payload"))
    r = M.extract_features(media, mode="real").first()
    assert r["decoder"] == "flacmeta"
    assert r["feat"][0] == 2.0 and r["feat"][1] == 44100.0


def test_ogg_meta_opus_and_vorbis():
    import random
    op = M.parse_ogg_meta(M.write_ogg_meta(7.5, codec="opus",
                                           channels=2))
    assert op == {"duration_sec": 7.5, "sample_rate": 48000.0,
                  "channels": 2.0, "codec": "opus"}
    vo = M.parse_ogg_meta(M.write_ogg_meta(3.25, codec="vorbis",
                                           rate=44_100, channels=1))
    assert vo["codec"] == "vorbis" and vo["duration_sec"] == 3.25
    assert vo["sample_rate"] == 44100.0 and vo["channels"] == 1.0
    assert M.parse_ogg_meta(None) is None
    assert M.parse_ogg_meta(b"OggS") is None
    assert M.parse_ogg_meta(b"fLaC" + b"\x00" * 60) is None
    rng = random.Random(83)
    base = M.write_ogg_meta(2.0)
    for _ in range(120):
        b = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            b[rng.randrange(len(b))] = rng.getrandbits(8)
        M.parse_ogg_meta(bytes(b))             # may be None, never raises


def test_decode_any_ogg_provenance(spark):
    rows = [(1, "audio", M.write_ogg_meta(4.0, codec="opus"))]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary") \
        .withColumn("n_bytes", F.length("payload"))
    r = M.extract_features(media, mode="real").first()
    assert r["decoder"] == "oggmeta"
    assert r["feat"][0] == 4.0 and r["feat"][1] == 48000.0


# ---------------------------------------------------------------------------
# 12-bit JPEG (extended-precision baseline)
# ---------------------------------------------------------------------------

def test_jpeg_12bit_roundtrip_and_precision_gain():
    """12-bit baseline decodes through the 16-bit-DQT + extended-
    Huffman path and lands closer to the source than the 8-bit
    pipeline at the same quality — the whole point of P=12."""
    import numpy as np
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    rng = np.random.default_rng(3)
    flat = (rng.integers(0, 8, (40, 56, 3)) * 36).astype(np.uint8)
    enc = J.write_jpeg(flat, quality=100, precision=12)
    got = J.parse_jpeg(enc)
    assert got is not None
    w, h, arr = got
    assert (w, h) == (56, 40)
    assert np.array_equal(arr, flat)           # exact at q=100

    gray = (rng.integers(0, 16, (33, 17)) * 17).astype(np.uint8)
    _, _, garr = J.parse_jpeg(J.write_jpeg(gray, quality=90,
                                           precision=12))
    assert np.abs(garr[..., 0].astype(int) - gray.astype(int)).max() <= 2

    noise = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    err = {}
    for prec in (8, 12):
        _, _, a = J.parse_jpeg(J.write_jpeg(noise, quality=90,
                                            precision=prec))
        err[prec] = np.abs(a.astype(int) - noise.astype(int)).mean()
    assert err[12] < err[8] / 5, err

    # 420-subsampled and restart-marker variants ride the same path
    _, _, s420 = J.parse_jpeg(J.write_jpeg(flat, quality=95,
                                           subsample="420",
                                           precision=12))
    assert s420.shape == (40, 56, 3)
    _, _, rst = J.parse_jpeg(J.write_jpeg(flat, quality=95,
                                          restart_interval=2,
                                          precision=12))
    assert np.abs(rst.astype(int) - flat.astype(int)).max() <= 3


def test_jpeg_12bit_stream_structure_and_guards():
    import numpy as np
    import pytest as _pytest
    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    a = np.full((16, 16, 3), 90, np.uint8)
    enc = J.write_jpeg(a, precision=12)
    # SOF0 precision byte is 12
    i = enc.index(b"\xFF\xC0")
    assert enc[i + 4] == 12
    # DQT uses 16-bit entries (precision nibble 1, length 2+1+128)
    d = enc.index(b"\xFF\xDB")
    assert enc[d + 4] >> 4 == 1
    assert int.from_bytes(enc[d + 2:d + 4], "big") == 2 + 1 + 128
    with _pytest.raises(ValueError, match="precision"):
        J.write_jpeg(a, precision=9)
    with _pytest.raises(ValueError, match="baseline"):
        J.write_jpeg(a, precision=12, progressive=True)


# ---------------------------------------------------------------------------
# WebP metadata tier
# ---------------------------------------------------------------------------

def _webp(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WEBP"
    for fourcc, data in chunks:
        body += fourcc + len(data).to_bytes(4, "little") + data
        if len(data) & 1:
            body += b"\x00"
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _vp8_chunk(w: int, h: int) -> tuple[bytes, bytes]:
    return (b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a"
            + w.to_bytes(2, "little") + h.to_bytes(2, "little"))


def _vp8l_chunk(w: int, h: int, alpha: int = 0) -> tuple[bytes, bytes]:
    bits = (w - 1) | ((h - 1) << 14) | (alpha << 28)
    return (b"VP8L", b"\x2f" + bits.to_bytes(4, "little"))


def _vp8x_chunk(w: int, h: int, alpha=0, anim=0) -> tuple[bytes, bytes]:
    flags = (0x10 if alpha else 0) | (0x02 if anim else 0)
    return (b"VP8X", bytes([flags, 0, 0, 0])
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))


def test_webp_meta_all_three_layouts():
    lossy = M.parse_webp_meta(_webp([_vp8_chunk(320, 240)]))
    assert (lossy["format"], lossy["width"], lossy["height"]) == \
        ("lossy", 320.0, 240.0)
    lossless = M.parse_webp_meta(_webp([_vp8l_chunk(100, 50, alpha=1)]))
    assert (lossless["format"], lossless["width"], lossless["height"],
            lossless["has_alpha"]) == ("lossless", 100.0, 50.0, 1.0)
    ext = M.parse_webp_meta(_webp([
        _vp8x_chunk(1024, 768, alpha=1, anim=1),
        (b"ANIM", b"\x00" * 6), _vp8_chunk(1024, 768)]))
    assert (ext["format"], ext["width"], ext["height"], ext["has_alpha"],
            ext["has_anim"]) == ("extended", 1024.0, 768.0, 1.0, 1.0)
    assert ext["n_chunks"] == 3.0


def test_webp_meta_rejects_and_truncation():
    assert M.parse_webp_meta(None) is None
    assert M.parse_webp_meta(b"RIFF\x10\x00\x00\x00WAVEfmt ") is None
    assert M.parse_webp_meta(b"RIFFxxxxWEBP") is None  # no chunks
    full = _webp([_vp8l_chunk(9, 9)])
    assert M.parse_webp_meta(full) is not None
    assert M.parse_webp_meta(full[:-3]) is None  # truncated chunk
    # bad VP8 start code -> chunk ignored -> no format -> None
    bad = _webp([(b"VP8 ", b"\x00\x00\x00XXX\x00\x00\x00\x00")])
    assert M.parse_webp_meta(bad) is None


def test_extract_features_webpmeta_provenance(spark):
    payload = _webp([_vp8_chunk(64, 32)])
    rows = [(1, "image", bytearray(payload), "image/webp", len(payload)),
            (2, "image", bytearray(b"RIFF????WEBPjunk"), "image/webp", 16)]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           M.extract_features(media, mode="real").collect()}
    assert got[1]["decoder"] == "webpmeta"
    assert got[1]["feat"][:2] == [64.0, 32.0]
    assert got[2]["decoder"] == "fake"


def test_dhash64_properties():
    """Perceptual dHash: format-independent (same raster as BMP and
    PNG hashes identically), stable under mild noise (small hamming),
    far apart for unrelated patterns, None for undecodable bytes."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    # smooth gradient structure so dhash has signal, not pure noise
    grad = np.linspace(0, 200, 32, dtype=np.uint8)
    base = ((base.astype(int) + grad[None, :, None]) // 2).astype(np.uint8)

    h_bmp = M.dhash64(M.write_bmp(base))
    h_png = M.dhash64(M.write_png(base))
    assert h_bmp is not None and h_bmp == h_png   # raster-determined

    noisy = base.copy()
    noisy[::7, ::5] = np.clip(noisy[::7, ::5].astype(int) + 12,
                              0, 255).astype(np.uint8)
    h_noisy = M.dhash64(M.write_bmp(noisy))
    from dynamic_etl_pipeline_thesis_ii_spark.operators import dedup as D
    ham = bin((h_bmp ^ h_noisy) & ((1 << 64) - 1)).count("1")
    assert ham <= 6

    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    other = ((other.astype(int) + grad[::-1][None, :, None]) // 2) \
        .astype(np.uint8)
    h_other = M.dhash64(M.write_bmp(other))
    assert bin((h_bmp ^ h_other) & ((1 << 64) - 1)).count("1") > 6

    assert M.dhash64(b"not an image") is None
    assert M.dhash64(None) is None


def test_image_neardup_pairs_end_to_end(spark):
    """image_neardup_pairs: planted near-dup (noisy BMP copy) pairs
    with its original across format boundaries; the unrelated image
    pairs with nothing; undecodable payloads drop out of the
    fingerprint frame."""
    import numpy as np

    rng = np.random.default_rng(11)
    grad = np.linspace(0, 200, 32, dtype=np.uint8)
    a = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
          + grad[None, :, None]) // 2).astype(np.uint8)
    a_noisy = a.copy()
    a_noisy[::9, ::6] = np.clip(a_noisy[::9, ::6].astype(int) + 10,
                                0, 255).astype(np.uint8)
    b = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
          + grad[::-1][None, :, None]) // 2).astype(np.uint8)
    rows = [(1, "image", bytes(M.write_bmp(a))),
            (2, "image", bytes(M.write_png(a_noisy))),   # cross-format
            (3, "image", bytes(M.write_bmp(b))),
            (4, "image", b"JUNKJUNKJUNK"),                # undecodable
            (5, "audio", b"RIFFxxxx")]                    # wrong kind
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")
    fps = M.image_dhash(media)
    assert fps.count() == 3                 # 4 and 5 dropped
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in M.image_neardup_pairs(media, max_hamming=6)
             .collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert all({ia, ib} != {1, 3} and {ia, ib} != {2, 3}
               for ia, ib in pairs)


def test_image_dedup_keeps_one_per_cluster(spark):
    """image_dedup: the noisy copy drops (lowest-id canonical kept),
    unrelated and undecodable images pass through."""
    import numpy as np

    rng = np.random.default_rng(11)
    grad = np.linspace(0, 200, 32, dtype=np.uint8)
    a = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
          + grad[None, :, None]) // 2).astype(np.uint8)
    a_noisy = a.copy()
    a_noisy[::9, ::6] = np.clip(a_noisy[::9, ::6].astype(int) + 10,
                                0, 255).astype(np.uint8)
    b = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
          + grad[::-1][None, :, None]) // 2).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytes(M.write_bmp(a))),
         (2, "image", bytes(M.write_png(a_noisy))),
         (3, "image", bytes(M.write_bmp(b))),
         (4, "image", b"JUNKJUNKJUNK")],
        "media_id long, kind string, payload binary")
    kept = {r["media_id"] for r in M.image_dedup(media).collect()}
    assert kept == {1, 3, 4}


def test_dhash64_rejects_sub_grid_thumbnails():
    """Images below the 9x8 sampling grid carry no gradient signal
    (they would all hash ~0 and false-pair) — dhash64 returns None."""
    import numpy as np

    tiny = np.full((4, 4, 3), 128, dtype=np.uint8)
    assert M.dhash64(M.write_bmp(tiny)) is None
    ok = np.random.default_rng(0).integers(0, 256, (9, 16, 3),
                                           dtype=np.uint8)
    assert M.dhash64(M.write_bmp(ok)) is not None


def test_image_cap_report_counts_dropped_buckets(spark):
    """A planted hot perceptual bucket (identical images over the cap)
    is dropped AND counted: the cap_report surfaces one over-cap
    bucket per band with the right row counts, while a healthy
    near-dup pair of a different base image still survives."""
    import numpy as np

    rng = np.random.default_rng(29)
    grad = np.linspace(0, 200, 32, dtype=np.uint8)
    hot = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
            + grad[None, :, None]) // 2).astype(np.uint8)
    b = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
          + grad[::-1][None, :, None]) // 2).astype(np.uint8)
    b_noisy = b.copy()
    b_noisy[::9, ::6] = np.clip(b_noisy[::9, ::6].astype(int) + 10,
                                0, 255).astype(np.uint8)
    rows = [(i, "image", bytes(M.write_bmp(hot))) for i in range(30)]
    rows += [(100, "image", bytes(M.write_bmp(b))),
             (101, "image", bytes(M.write_png(b_noisy)))]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")
    report = {}
    pairs = {(r["id_a"], r["id_b"]) for r in
             M.image_neardup_pairs(media, max_hamming=6, max_bucket=10,
                                   cap_report=report).collect()}
    # 30 identical dhashes fill one over-cap bucket in each of the
    # C(8,2)=28 bands; the healthy pair is unaffected
    assert report == {"max_bucket": 10, "capped_buckets": 28,
                      "capped_rows": 28 * 30, "largest_bucket": 30}
    assert (100, 101) in pairs
    assert not any(ia < 30 and ib < 30 for ia, ib in pairs)
    # image_dedup threads the same telemetry: the hot cluster is NOT
    # collapsed (every member passes through — that is the recall
    # loss the report makes visible), the healthy pair is
    report2 = {}
    kept = {r["media_id"] for r in
            M.image_dedup(media, max_hamming=6, max_bucket=10,
                          cap_report=report2).collect()}
    assert report2["capped_buckets"] == 28
    assert kept == set(range(30)) | {100}


def test_image_dhash_decode_fn_hook_parity(spark):
    """The native-codec hook: a decode_fn override produces hashes
    IDENTICAL to the stdlib tier wherever both decode (the stdlib
    tier is the oracle — the hash math is shared downstream of the
    decode), falls back to the stdlib tier for payloads it declines
    (the PNG keeps fingerprinting), and threads through the Arrow
    kernel to pair across formats exactly like the default."""
    import numpy as np

    def _pilish_decode(payload: bytes):
        # stand-in for a native-codec hook (PIL/turbojpeg wrapper):
        # handles 24-bit BMP via an independent byte walk, declines
        # everything else — a local def so cloudpickle ships it by
        # value to the executors, like a real deployment's hook
        import numpy as _np
        if payload[:2] != b"BM":
            return None
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        if bpp != 24 or h <= 0:
            return None
        stride = (w * 3 + 3) // 4 * 4
        rows = []
        for r in range(h):
            line = payload[off + r * stride: off + r * stride + w * 3]
            px = _np.frombuffer(line, _np.uint8).reshape(w, 3)[:, ::-1]
            rows.append(px)
        return w, h, _np.stack(rows[::-1])   # bottom-up -> top-down

    rng = np.random.default_rng(41)
    grad = np.linspace(0, 200, 32, dtype=np.uint8)
    a = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
          + grad[None, :, None]) // 2).astype(np.uint8)
    a_noisy = a.copy()
    a_noisy[::9, ::6] = np.clip(a_noisy[::9, ::6].astype(int) + 10,
                                0, 255).astype(np.uint8)
    bmp, png = bytes(M.write_bmp(a)), bytes(M.write_png(a_noisy))

    # driver-side parity: hook and stdlib tier agree bit-for-bit on
    # the BMP; the hook declines the PNG and the fallback covers it
    assert _pilish_decode(png) is None
    assert M.dhash64(bmp, decode_fn=_pilish_decode) == M.dhash64(bmp)
    assert M.dhash64(png, decode_fn=_pilish_decode) == M.dhash64(png)

    media = spark.createDataFrame(
        [(1, "image", bmp), (2, "image", png),
         (3, "image", b"JUNKJUNK")],
        "media_id long, kind string, payload binary")
    default = {r["id"]: r["sim"]
               for r in M.image_dhash(media).collect()}
    hooked = {r["id"]: r["sim"]
              for r in M.image_dhash(
                  media, decode_fn=_pilish_decode).collect()}
    assert hooked == default and set(hooked) == {1, 2}
    # the cross-format near-dup pair survives the hooked path
    pairs = {(r["id_a"], r["id_b"]) for r in
             M.image_neardup_pairs(
                 media, decode_fn=_pilish_decode).collect()}
    assert pairs == {(1, 2)}


def test_image_dedup_reband_collapses_over_cap_cluster(spark):
    """The judge-case for skew-aware banding: a planted 3000-member
    perceptual cluster (2600 exact copies + 400 noisy re-encodes —
    every band bucket over the DEFAULT max_bucket=2000) collapses to
    ONE kept image under hot_policy='reband', while the default drop
    policy passes the whole flood through; the unrelated image
    survives either way."""
    import numpy as np

    rng = np.random.default_rng(53)
    grad = np.linspace(0, 200, 32, dtype=np.uint8)
    base = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
             + grad[None, :, None]) // 2).astype(np.uint8)
    noisy = base.copy()
    noisy[::9, ::6] = np.clip(noisy[::9, ::6].astype(int) + 10,
                              0, 255).astype(np.uint8)
    other = ((rng.integers(0, 256, (32, 32, 3)).astype(int)
              + grad[::-1][None, :, None]) // 2).astype(np.uint8)
    base_b, noisy_b = bytes(M.write_bmp(base)), bytes(M.write_png(noisy))
    rows = [(i, "image", base_b) for i in range(2600)]
    rows += [(2600 + i, "image", noisy_b) for i in range(400)]
    rows.append((9000, "image", bytes(M.write_bmp(other))))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")

    report = {}
    kept = {r["media_id"] for r in
            M.image_dedup(media, hot_policy="reband",
                          cap_report=report).collect()}
    assert kept == {0, 9000}
    assert report["capped_buckets"] >= 28
    assert report["largest_bucket"] == 3000

    kept_drop = M.image_dedup(media).count()
    assert kept_drop == 3001          # the flood passes through silently


# ---------------------------------------------------------------------------
# audio perceptual fingerprinting (aHash)
# ---------------------------------------------------------------------------

def _chirp_wav(seed, rate=16000, secs=2.0, stereo=False):
    """Deterministic content-bearing clip: chirp + gated noise (the
    time-varying spectrum aHash keys on), int16 PCM WAV bytes."""
    import numpy as np

    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * secs)) / rate
    f0, f1 = 200 + 90 * seed, 400 + 50 * seed
    clip = (np.sin(2 * np.pi * (f0 + f1 * t) * t)
            * (0.5 + 0.5 * np.sin(2 * np.pi * (1.3 + 0.4 * seed) * t))
            + 0.2 * rng.standard_normal(len(t)) * (t % 0.7 < 0.35))
    pcm = (np.clip(clip, -1, 1) * 20000).astype("<i2")
    if stereo:
        pcm = np.stack([pcm, pcm], axis=1)
    return bytes(M.write_wav(pcm, rate)), pcm


def test_ahash64_invariances_and_discrimination():
    """aHash is invariant to the re-encodes a dedup pipeline must see
    through — gain scaling, resampling, stereo fold, u-law and 8-bit
    PCM re-encodes (hamming 0 on this clip) — while unrelated clips
    land ~32+ bits apart; silent/short/undecodable payloads return
    None (no gradient signal, the dhash64 sub-grid analog)."""
    import io
    import warnings
    import wave as _wave

    import numpy as np
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    def wav_container(tag, channels, rate, block_align, bits, data):
        fmt = (tag.to_bytes(2, "little") + channels.to_bytes(2, "little")
               + rate.to_bytes(4, "little")
               + (rate * block_align).to_bytes(4, "little")
               + block_align.to_bytes(2, "little")
               + bits.to_bytes(2, "little"))
        body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
                + b"data" + len(data).to_bytes(4, "little") + data)
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    def ham(a, b):
        return bin((a ^ b) & (2 ** 64 - 1)).count("1")

    wav16, pcm16 = _chirp_wav(0)
    h = M.ahash64(wav16)
    assert h is not None

    quiet = bytes(M.write_wav((pcm16 * 0.3).astype("<i2"), 16000))
    assert ham(h, M.ahash64(quiet)) <= 6
    res8 = bytes(M.resample_wav(wav16, 8000))
    assert ham(h, M.ahash64(res8)) <= 6
    stereo, _ = _chirp_wav(0, stereo=True)
    assert ham(h, M.ahash64(stereo)) <= 6
    with _wave.open(io.BytesIO(res8)) as w:
        frames = w.readframes(w.getnframes())
    ulaw = wav_container(7, 1, 8000, 1, 8,
                         audioop.lin2ulaw(frames, 2))
    assert ham(h, M.ahash64(ulaw)) <= 6
    pcm8 = ((pcm16.astype(int) // 256) + 128).astype(np.uint8).tobytes()
    assert ham(h, M.ahash64(wav_container(1, 1, 16000, 1, 8,
                                          pcm8))) <= 6

    # same-family chirps (shared gating structure) stay clearly past
    # the <=6 dedup cut; spectrally unrelated content lands ~32 off
    for seed in (1, 2, 3):
        other, _ = _chirp_wav(seed)
        assert ham(h, M.ahash64(other)) > 6, seed
    noise = np.random.default_rng(99).integers(
        -15000, 15000, 32000).astype("<i2")
    assert ham(h, M.ahash64(bytes(M.write_wav(noise, 16000)))) > 16

    assert M.ahash64(bytes(M.write_wav(
        np.zeros(8000, dtype="<i2"), 8000))) is None      # silent
    assert M.ahash64(bytes(M.write_wav(
        np.ones(100, dtype="<i2"), 8000))) is None        # too short
    assert M.ahash64(b"NOTAUDIO") is None                 # undecodable
    assert M.ahash64(None) is None


def test_audio_neardup_and_dedup(spark):
    """audio_neardup_pairs / audio_dedup: the u-law re-encode of a
    clip pairs with its PCM original through the shared hamming
    banding (one kept per cluster), unrelated and undecodable clips
    pass through — the audio face of the image M2 contract."""
    import io
    import warnings
    import wave as _wave

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    wav16, _ = _chirp_wav(0)
    res8 = bytes(M.resample_wav(wav16, 8000))
    with _wave.open(io.BytesIO(res8)) as w:
        frames = w.readframes(w.getnframes())
    fmt = ((7).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    data = audioop.lin2ulaw(frames, 2)
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    ulaw = b"RIFF" + len(body).to_bytes(4, "little") + body
    other, _ = _chirp_wav(2)

    media = spark.createDataFrame(
        [(1, "audio", wav16), (2, "audio", ulaw),
         (3, "audio", other), (4, "audio", b"ID3\x04junkjunk"),
         (5, "image", wav16)],     # wrong kind never fingerprints
        "media_id long, kind string, payload binary")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in M.audio_neardup_pairs(media).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert all({a, b} == {1, 2} for a, b in pairs)
    kept = {r["media_id"] for r in M.audio_dedup(media).collect()}
    assert kept == {1, 3, 4, 5}


def test_media_census_merge_law(spark):
    """media_census: per-kind items/bytes + __total__, and the merge
    law merge(census(A), census(B)) == census(A ∪ B) for disjoint
    batches — the invariant the streaming fold relies on."""
    rows_a = [(1, "image", b"x" * 10), (2, "audio", b"y" * 20),
              (3, "image", b"z" * 5)]
    rows_b = [(4, "video", b"v" * 7), (5, "image", b"w" * 3)]
    schema = "media_id long, kind string, payload binary"
    a = spark.createDataFrame(rows_a, schema)
    b = spark.createDataFrame(rows_b, schema)
    both = spark.createDataFrame(rows_a + rows_b, schema)
    want = sorted(map(tuple, M.media_census(both).collect()))
    got = sorted(map(tuple, M.merge_media_census(
        M.media_census(a), M.media_census(b)).collect()))
    assert got == want
    rows = {(r["kind"], r["stratum"]): (r["n_items"], r["n_bytes"])
            for r in M.media_census(both).collect()}
    assert rows[("media_kind", "image")] == (3, 18)
    assert rows[("media_kind", "audio")] == (1, 20)
    assert rows[("__total__", "__total__")] == (5, 45)


# ---------------------------------------------------------------------------
# AVI container tier + perceptual video hashing (vHash)

def _smooth_frames(n=24, h=48, w=64, phase=0.0, seed=None):
    """Temporally-smooth synthetic video: drifting diagonal gradient
    plus a moving bright blob — the frame-to-frame continuity real
    footage has, which is what makes frame-sample alignment a fair
    robustness claim."""
    import numpy as np
    out = []
    for t in range(n):
        y, x = np.mgrid[0:h, 0:w].astype(float)
        g = (x * 2 + y * 3 + (t + phase) * 4) % 256
        cx, cy = w * (0.2 + 0.6 * (t + phase) / 24), h * 0.5
        blob = 120 * np.exp(-(((x - cx) ** 2 + (y - cy) ** 2) / 80))
        c = np.clip(g + blob, 0, 255).astype(np.uint8)
        out.append(np.stack(
            [c, (c // 2 + 40).astype(np.uint8), 255 - c], axis=2))
    if seed is not None:
        rng = np.random.default_rng(seed)
        out = [np.clip(f.astype(int) + rng.integers(-8, 9, f.shape),
                       0, 255).astype(np.uint8) for f in out]
    return out


def _ham64(a, b):
    return bin((a ^ b) & (2 ** 64 - 1)).count("1")


def test_avi_roundtrip_and_meta():
    """write_avi ↔ avi_frames: uncompressed-DIB frames round-trip
    EXACTLY (the BMP raster without the file header), MJPEG frames
    decode within JPEG tolerance, and parse_avi_meta reads the hdrl
    walk (dims/fps/frame count/codec). Non-AVI and truncated payloads
    return None instead of raising."""
    import numpy as np

    frames = _smooth_frames(n=12)
    dib = M.write_avi(frames, fps=12.0, codec="DIB ")
    meta = M.parse_avi_meta(dib)
    assert (meta["width"], meta["height"]) == (64.0, 48.0)
    assert meta["fps"] == pytest.approx(12.0)
    assert meta["n_frames"] == 12.0
    assert meta["duration_sec"] == pytest.approx(1.0)
    assert meta["video_codec"] == "DIB"

    dec = M.avi_frames(dib, max_frames=12)
    assert len(dec) == 12
    for got, want in zip(dec, frames):
        w, h, arr = got
        assert (w, h) == (64, 48)
        assert np.array_equal(arr, want)

    mjpg = M.write_avi(frames, fps=12.0, codec="MJPG")
    assert M.parse_avi_meta(mjpg)["video_codec"] == "MJPG"
    decm = M.avi_frames(mjpg, max_frames=4)
    assert len(decm) == 4
    for w, h, arr in decm:
        assert (w, h) == (64, 48) and arr.shape == (48, 64, 3)

    assert M.parse_avi_meta(b"RIFF" + b"\x00" * 30) is None
    assert M.parse_avi_meta(b"NOTAVI") is None
    assert M.avi_frames(dib[:60]) is None          # truncated hdrl
    assert M.avi_frames(None) is None
    with pytest.raises(ValueError):
        M.write_avi(frames, codec="H264")
    with pytest.raises(ValueError):
        M.write_avi([])


def test_vhash64_invariances_and_discrimination():
    """vHash sees through the re-encodes video dedup must survive —
    DIB↔MJPEG transcode (hamming 0 on this clip), per-frame noise and
    frame-rate halving (≤6, the default near-dup budget) — while
    unrelated clips land well past the cut; inter-frame codecs
    (ISO-BMFF) and undecodable payloads return None, never a fake
    hash."""
    frames = _smooth_frames(n=24)
    h1 = M.vhash64(M.write_avi(frames, fps=12.0))
    assert h1 is not None
    assert _ham64(h1, M.vhash64(
        M.write_avi(frames, fps=12.0, codec="MJPG"))) == 0
    assert _ham64(h1, M.vhash64(
        M.write_avi(_smooth_frames(n=24, seed=5), fps=12.0))) <= 6
    assert _ham64(h1, M.vhash64(
        M.write_avi(frames[::2], fps=6.0))) <= 6   # half frame rate
    import numpy as np
    other = [np.roll(f[::-1], 20, axis=1).copy()
             for f in _smooth_frames(n=10, phase=7.0)]
    assert _ham64(h1, M.vhash64(M.write_avi(other, fps=10.0))) > 6
    assert M.vhash64(bytes(M.write_mp4(3.0))) is None   # inter-frame
    assert M.vhash64(b"NOTVIDEO") is None
    assert M.vhash64(None) is None
    # frames below the 9x8 dhash grid carry no gradient signal
    tiny = [f[:6, :6] for f in _smooth_frames(n=4)]
    assert M.vhash64(M.write_avi(tiny, fps=4.0)) is None


def test_vhash64_decode_fn_hook_parity():
    """The native-codec hook (an ffmpeg/PyAV stand-in) and the stdlib
    AVI tier agree wherever both decode — the hash math downstream of
    the decode is shared — and a declining hook falls back to the
    stdlib tier."""
    frames = _smooth_frames(n=8)
    avi = M.write_avi(frames, fps=8.0)

    def hook(p):
        return [(f.shape[1], f.shape[0], f) for f in frames]

    assert M.vhash64(avi, decode_fn=hook) == M.vhash64(avi)
    assert M.vhash64(avi, decode_fn=lambda p: None) == M.vhash64(avi)


def test_video_neardup_and_dedup(spark):
    """video_neardup_pairs / video_dedup: the MJPEG transcode of a
    clip pairs with its DIB original through the shared hamming
    banding (one kept per cluster); unrelated, inter-frame-coded and
    undecodable clips pass through — the video face of the image M2
    contract."""
    import numpy as np
    frames = _smooth_frames(n=12)
    dib = M.write_avi(frames, fps=12.0)
    mjpg = M.write_avi(frames, fps=12.0, codec="MJPG")
    other = M.write_avi(
        [np.roll(f[::-1], 20, axis=1).copy()
         for f in _smooth_frames(n=10, phase=7.0)], fps=10.0)
    media = spark.createDataFrame(
        [(1, "video", dib), (2, "video", mjpg),
         (3, "video", other), (4, "video", bytes(M.write_mp4(2.0))),
         (5, "image", dib)],       # wrong kind never fingerprints
        "media_id long, kind string, payload binary")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in M.video_neardup_pairs(media).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert all({a, b} == {1, 2} for a, b in pairs)
    kept = {r["media_id"] for r in M.video_dedup(media).collect()}
    assert kept == {1, 3, 4, 5}


def test_sample_frames_real_avi_tier(spark):
    """sample_frames emits REAL BMP-encoded frames for decodable AVI
    payloads — each one decodable by parse_bmp and matching the
    source raster — while non-AVI payloads keep the byte-slice stub
    tier (and its ≤ every_n_bytes frame size)."""
    import numpy as np
    frames = _smooth_frames(n=6)
    avi = M.write_avi(frames, fps=6.0)
    media = spark.createDataFrame(
        [(1, "video", avi), (2, "video", b"\x01\x02" * 200)],
        "media_id long, kind string, payload binary")
    out = M.sample_frames(media, every_n_bytes=32, max_frames=4).collect()
    real = sorted((r for r in out if r["media_id"] == 1),
                  key=lambda r: r["frame_idx"])
    assert len(real) == 4
    w, h, arr = M.parse_bmp(bytes(real[0]["frame"]))
    assert (w, h) == (64, 48)
    assert np.array_equal(arr, frames[0])
    stub = [r for r in out if r["media_id"] == 2]
    assert stub and all(len(r["frame"]) <= 32 for r in stub)


def test_extract_features_avi_tiers(spark):
    """extract_features(mode='real'): decodable AVI videos land on the
    REAL sample tier ('avi': [w, h, channel means] over the frame
    sample — the image feature contract); an AVI container whose
    frames don't decode falls back to the avimeta walk; ISO-BMFF
    still routes to mp4meta; junk video payloads to the fake tier —
    every fallback visible in the decoder column."""
    import numpy as np

    frames = _smooth_frames(n=12)
    avi = M.write_avi(frames, fps=12.0)
    headless = avi[:avi.find(b"movi") - 8]   # hdrl only, no frames
    media = spark.createDataFrame(
        [(1, "video", avi), (2, "video", bytes(M.write_mp4(3.0))),
         (3, "video", b"JUNKJUNKJUNK"), (4, "video", headless)],
        "media_id long, kind string, payload binary") \
        .withColumn("n_bytes", F.octet_length("payload"))
    rows = {r["media_id"]: r for r in
            M.extract_features(media, mode="real").collect()}
    assert rows[1]["decoder"] == "avi"
    assert rows[1]["feat"][:2] == [64.0, 48.0]
    want = np.mean([frames[j].reshape(-1, 3).mean(axis=0)
                    for j in (0, 2, 3, 5, 6, 8, 9, 11)], axis=0)
    assert rows[1]["feat"][2:] == [pytest.approx(float(m), abs=1e-4)
                                   for m in want]
    assert rows[2]["decoder"] == "mp4meta"
    assert rows[3]["decoder"] == "fake"
    assert rows[4]["decoder"] == "avimeta"
    assert rows[4]["feat"] == [pytest.approx(1.0), 64.0, 48.0, 12.0]


def test_video_containment_pairs(spark):
    """Sub-clip matching: an MJPEG re-encode of a TRIMMED span of a
    longer video shares ≥3 near-dup frames with the original even
    though whole-clip vHash (different timeline fractions) lands past
    the near-dup budget — the case the containment operator exists
    for. Unrelated clips never pair; a static-scene video matching
    one frame many times counts it ONCE and stays below the
    threshold."""
    import numpy as np

    long_frames = _smooth_frames(n=24)
    vid_a = M.write_avi(long_frames, fps=12.0)
    # B: frames 9..15 of A, re-encoded MJPEG — a 7-frame trim
    vid_b = M.write_avi(long_frames[9:16], fps=12.0, codec="MJPG")
    vid_c = M.write_avi(
        [np.roll(f[::-1], 20, axis=1).copy()
         for f in _smooth_frames(n=10, phase=7.0)], fps=10.0)
    # D: ten copies of ONE frame of A — a static scene; its single
    # distinct raster matches A's frame 0 many times but must count
    # once, below min_shared_frames
    vid_d = M.write_avi([long_frames[0]] * 10, fps=10.0)

    # why this operator exists: the trim breaks whole-clip vHash
    ha, hb = M.vhash64(vid_a), M.vhash64(vid_b)
    assert _ham64(ha, hb) > 6

    media = spark.createDataFrame(
        [(1, "video", vid_a), (2, "video", vid_b),
         (3, "video", vid_c), (4, "video", vid_d)],
        "media_id long, kind string, payload binary")
    got = {(r["id_a"], r["id_b"]): r for r in
           M.video_containment_pairs(media, min_shared_frames=3)
           .collect()}
    assert (1, 2) in got
    assert got[(1, 2)]["shared_frames"] >= 3
    assert got[(1, 2)]["min_hamming"] <= 6
    assert all(k == (1, 2) for k in got)   # C unrelated, D static

    # the static scene IS visible at threshold 1 (it genuinely shares
    # one frame), counted once per side
    got1 = {(r["id_a"], r["id_b"]): r["shared_frames"] for r in
            M.video_containment_pairs(media, min_shared_frames=1)
            .collect()}
    assert got1.get((1, 4)) == 1

    with pytest.raises(ValueError):
        M.video_containment_pairs(media, max_frames=5000)


def _envelope_clip(seed=3, secs=20, rate=16000):
    """Broadband multi-tone audio with random 0.25s band envelopes —
    onset-rich content (every envelope step is a candidate anchor)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    t = np.arange(rate * secs) / rate
    tones = np.sin(2 * np.pi * np.geomspace(140, 3400, 8)[:, None]
                   * t[None, :])
    seg = (np.arange(len(t)) * (4 * secs)) // len(t)
    env = 0.1 + 0.9 * rng.random((4 * secs, 8))
    x = (tones * env[seg].T).sum(axis=0) / 8.0
    return (np.clip(x, -1, 1) * 20000).astype("<i2")


def test_audio_containment_pairs(spark):
    """Sub-clip audio matching: an ARBITRARY-OFFSET trim (and its
    gain-scaled re-encode) shares ≥2 onset-anchored windows with the
    original even though whole-clip aHash (length-proportional
    segments) lands past the near-dup budget; unrelated clips never
    pair. Onset anchoring is what buys the trim invariance — window
    starts derive from the content, not the cut."""
    import numpy as np

    rate = 16000
    pcm = _envelope_clip(seed=3)
    full = bytes(M.write_wav(pcm, rate))
    # trim at an arbitrary (non-round) offset, then gain-scale
    lo, hi = int(5.3217 * rate), int(13.77 * rate)
    trim = bytes(M.write_wav(pcm[lo:hi], rate))
    redo = bytes(M.write_wav((pcm[lo:hi] * 0.5).astype("<i2"), rate))
    other = bytes(M.write_wav(_envelope_clip(seed=77), rate))

    # why this operator exists: the trim breaks whole-clip aHash
    assert _ham64(M.ahash64(full), M.ahash64(trim)) > 6

    media = spark.createDataFrame(
        [(1, "audio", full), (2, "audio", trim), (3, "audio", redo),
         (4, "audio", other), (5, "audio", b"ID3\x04junk"),
         (6, "video", full)],     # wrong kind never fingerprints
        "media_id long, kind string, payload binary")
    got = {(r["id_a"], r["id_b"]): r for r in
           M.audio_containment_pairs(media, min_shared_windows=2)
           .collect()}
    assert (1, 2) in got and got[(1, 2)]["shared_windows"] >= 2
    assert (1, 3) in got                     # re-encoded trim too
    assert got[(1, 2)]["min_hamming"] <= 6
    assert not any(4 in k or 5 in k or 6 in k for k in got)

    with pytest.raises(ValueError):
        M.audio_containment_pairs(media, max_windows=9999)


def test_audio_anchor_hashes_contract():
    """audio_anchor_hashes: anchors are content-determined (the same
    onset found in full and trimmed signals yields hashes within the
    near-dup budget), identical-hash windows dedupe, silence and junk
    return None, and max_windows thins evenly."""
    import numpy as np

    rate = 16000
    pcm = _envelope_clip(seed=3)
    full = bytes(M.write_wav(pcm, rate))
    ws = M.audio_anchor_hashes(full)
    assert ws and len({h for _, h in ws}) == len(ws)   # deduped
    trim = bytes(M.write_wav(pcm[int(5.3217 * rate):
                                 int(13.77 * rate)], rate))
    wt = M.audio_anchor_hashes(trim)
    assert wt
    matched = sum(1 for _, a in wt
                  if any(_ham64(a, b) <= 6 for _, b in ws))
    assert matched >= 2

    assert M.audio_anchor_hashes(
        bytes(M.write_wav(np.zeros(32000, dtype="<i2"), 16000))) is None
    assert M.audio_anchor_hashes(b"NOTAUDIO") is None
    capped = M.audio_anchor_hashes(full, max_windows=3)
    assert capped is not None and len(capped) <= 3


def test_avi_tier_corrupt_never_raises():
    """The AVI walkers and every hash built on them must survive
    arbitrary corruption (truncations, bit flips, random bytes, lying
    chunk sizes) by returning None/skipping — one malformed file must
    never fail a 100 TB scan."""
    import numpy as np

    rng = np.random.default_rng(11)
    frames = _smooth_frames(n=6)
    for codec in ("DIB ", "MJPG"):
        good = bytearray(M.write_avi(frames, fps=6.0, codec=codec))
        for cut in (4, 13, 60, 200, len(good) // 2, len(good) - 3):
            p = bytes(good[:cut])
            M.parse_avi_meta(p), M.avi_frames(p), M.vhash64(p)
        for _ in range(40):
            bad = bytearray(good)
            for _ in range(rng.integers(1, 6)):
                bad[rng.integers(0, len(bad))] = rng.integers(0, 256)
            p = bytes(bad)
            M.parse_avi_meta(p), M.avi_frames(p), M.vhash64(p)
    for _ in range(20):
        junk = bytes(rng.integers(0, 256, rng.integers(8, 400),
                                  dtype=np.uint8))
        assert M.vhash64(b"RIFF" + junk[4:]) is None or True
        M.parse_avi_meta(junk), M.avi_frames(junk), M.vhash64(junk)
    # lying chunk size: movi list claims more bytes than exist
    lie = bytes(good[:40]) + (2 ** 30).to_bytes(4, "little") \
        + bytes(good[44:])
    M.parse_avi_meta(lie), M.avi_frames(lie), M.vhash64(lie)


def test_resize_videos_real_and_fallback(spark):
    """resize_videos: decodable AVI gets the REAL per-frame
    nearest-neighbor resize (re-encoded DIB, round-trippable, frame
    count and fps preserved); non-AVI payloads keep the
    truncate-or-pad fallback; schema contract matches resize_images."""
    import numpy as np

    frames = _smooth_frames(n=6)
    avi = M.write_avi(frames, fps=6.0)
    media = spark.createDataFrame(
        [(1, "video", avi, "video/avi", len(avi)),
         (2, "video", b"\x07" * 100, "video/mp4", 100)],
        "media_id long, kind string, payload binary, mime string,"
        " n_bytes long")
    rows = {r["media_id"]: r for r in
            M.resize_videos(media, width=32, height=16).collect()}
    out = M.avi_frames(bytes(rows[1]["payload"]), max_frames=16)
    assert len(out) == 6
    w, h, arr = out[0]
    assert (w, h) == (32, 16)
    assert M.parse_avi_meta(bytes(rows[1]["payload"]))["fps"] == \
        pytest.approx(6.0)
    # nearest-neighbor ground truth on the first frame
    ri = (np.arange(16) * 48) // 16
    ci = (np.arange(32) * 64) // 32
    assert np.array_equal(arr, frames[0][ri][:, ci])
    assert (rows[1]["width"], rows[1]["height"]) == (32, 16)
    assert len(rows[2]["payload"]) == 32 * 16   # pad fallback


def test_avi_roundtrip_property():
    """Property fuzz: for random frame counts / dims / fps, DIB AVIs
    round-trip exactly and MJPEG stays within JPEG tolerance; vhash64
    of a clip equals vhash64 of its own DIB re-encode (idempotent
    normalization)."""
    import numpy as np

    rng = np.random.default_rng(23)
    for trial in range(6):
        n = int(rng.integers(1, 10))
        h = int(rng.integers(9, 40))
        w = int(rng.integers(10, 50))
        fps = float(rng.uniform(1.0, 30.0))
        frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                  for _ in range(n)]
        dib = M.write_avi(frames, fps=fps)
        dec = M.avi_frames(dib, max_frames=4096)
        assert len(dec) == n
        for got, want in zip(dec, frames):
            assert got[:2] == (w, h)
            assert np.array_equal(got[2], want)
        meta = M.parse_avi_meta(dib)
        assert meta["n_frames"] == float(n)
        assert meta["fps"] == pytest.approx(fps, rel=1e-3)
        mj = M.write_avi(frames, fps=fps, codec="MJPG")
        decm = M.avi_frames(mj, max_frames=4096)
        assert len(decm) == n
        for got, want in zip(decm, frames):
            err = np.abs(got[2].astype(int) - want.astype(int)).mean()
            assert err < 24, err   # random noise is JPEG's worst case
        h1 = M.vhash64(dib)
        if h1 is not None:
            redo = M.write_avi([fr[2] for fr in dec], fps=fps)
            assert M.vhash64(redo) == h1


# ---------------------------------------------------------------------------
# animated GIF video tier (gif_frames / video_frames dispatch)
# ---------------------------------------------------------------------------

def test_gif_frames_compositing_and_sampling():
    """Animated GIF decode: whole-frame animations round-trip
    raster-exactly through the shared quantizer, frame sampling
    matches avi_frames' timeline-fraction math, and single-frame GIFs
    agree with parse_gif."""
    import numpy as np
    frames = _smooth_frames(n=6)
    anim = M.write_gif_anim(frames)
    got = M.gif_frames(anim, max_frames=16)
    assert len(got) == 6
    for (w, h, arr), orig in zip(got, frames):
        assert (w, h) == (64, 48)
        # re-quantizing the decoded raster is a fixpoint
        idx1, _ = M._gif_quantize(arr)
        idx0, _ = M._gif_quantize(orig)
        assert np.array_equal(idx1, idx0)
    sampled = M.gif_frames(anim, max_frames=4)
    take = [round(k * 5 / 3) for k in range(4)]
    assert [np.array_equal(s[2], got[t][2])
            for s, t in zip(sampled, take)] == [True] * 4
    single = M.write_gif(frames[0])
    w, h, a1 = M.parse_gif(single)
    g1 = M.gif_frames(single)
    assert len(g1) == 1 and np.array_equal(g1[0][2], a1)


def test_gif_frames_disposal_and_delta_frames():
    """Hand-assembled delta animation: frame 2 paints a sub-rect with
    transparency holes (underlying pixels show through), disposal 2
    restores the rect to background before frame 3 — the compositing
    a per-descriptor decode would get wrong."""
    import numpy as np
    # 4x4 screen, GCT: 0=red bg, 1=green, 2=blue, 3=black
    pal = bytes([200, 0, 0,  0, 200, 0,  0, 0, 200,  0, 0, 0])
    def lzw(idx_bytes):
        return M._gif_lzw_encode(idx_bytes, 2)
    out = bytearray(b"GIF89a")
    out += (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
    out += bytes([0x80 | 0x01, 0, 0]) + pal      # 4-entry GCT, bg=0
    # frame 1: full 4x4 of green (index 1)
    out += b"\x2C" + b"\x00" * 4
    out += (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
    out += b"\x00\x02"
    d = lzw(bytes([1] * 16))
    out += bytes([len(d)]) + d + b"\x00"
    # GCE: disposal 2 (restore to bg), transparent index 3
    out += bytes([0x21, 0xF9, 0x04, (2 << 2) | 0x01, 0, 0, 3, 0])
    # frame 2: 2x2 rect at (1,1): [[2, trans], [trans, 2]]
    out += b"\x2C" + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
    out += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    out += b"\x00\x02"
    d = lzw(bytes([2, 3, 3, 2]))
    out += bytes([len(d)]) + d + b"\x00"
    # frame 3: 1x1 rect of black at (0,0)
    out += b"\x2C" + b"\x00" * 4
    out += (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
    out += b"\x00\x02"
    d = lzw(bytes([3]))
    out += bytes([len(d)]) + d + b"\x00"
    out += b"\x3B"

    got = M.gif_frames(bytes(out), max_frames=8)
    assert len(got) == 3
    green, blue, red = [0, 200, 0], [0, 0, 200], [200, 0, 0]
    f1, f2, f3 = (g[2] for g in got)
    assert (f1 == green).all()
    # frame 2: blue diagonal in the rect, green shows through holes
    assert list(f2[1, 1]) == blue and list(f2[2, 2]) == blue
    assert list(f2[1, 2]) == green and list(f2[2, 1]) == green
    # frame 3: disposal-2 restored the rect to RED bg, then black px
    assert list(f3[0, 0]) == [0, 0, 0]
    assert list(f3[1, 1]) == red and list(f3[2, 2]) == red
    assert list(f3[3, 3]) == green               # outside the rect


def test_vhash_gif_tier_and_dispatch():
    """vHash rides the video_frames dispatcher: GIF re-encodes are
    exact (the quantizer is a fixpoint), within-GIF frame-rate
    halving stays inside a 12-bit budget (the 252-color quantization
    costs bits the exact DIB tier doesn't), cross-container AVI<->GIF
    matches at a wider threshold, and unrelated animations stay far
    beyond all of them."""
    frames = _smooth_frames(n=24)
    anim = M.write_gif_anim(frames)
    h_gif = M.vhash64(anim)
    assert h_gif is not None
    # decode -> re-encode is bit-exact
    dec = [arr for _, _, arr in M.gif_frames(anim, max_frames=64)]
    assert _ham64(h_gif, M.vhash64(M.write_gif_anim(dec))) == 0
    assert _ham64(h_gif, M.vhash64(
        M.write_gif_anim(frames[::2]))) <= 12    # half frame rate
    h_avi = M.vhash64(M.write_avi(frames, fps=12.0))
    cross = _ham64(h_gif, h_avi)
    assert cross <= 16                           # quantized transcode
    import numpy as np
    other = [np.roll(f[::-1], 20, axis=1).copy()
             for f in _smooth_frames(n=10, phase=7.0)]
    far = _ham64(h_gif, M.vhash64(M.write_gif_anim(other)))
    assert far > 20 and far > cross + 4


def test_gif_video_dedup_and_features(spark):
    """Animated GIFs are first-class videos in the Spark faces:
    video_dedup collapses a GIF and its re-encode, extract_features
    puts animations on the real 'gifanim' sample tier, and sub-clip
    containment pairs a trimmed GIF with its source exactly (both
    sides decode the same quantized rasters)."""
    frames = _smooth_frames(n=24)
    anim = M.write_gif_anim(frames)
    re_enc = M.write_gif_anim(
        [arr for _, _, arr in M.gif_frames(anim, max_frames=64)])
    import numpy as np
    other = [np.roll(f[::-1], 20, axis=1).copy()
             for f in _smooth_frames(n=12, phase=7.0)]
    rows = [(1, "video", bytearray(anim), "image/gif", len(anim)),
            (2, "video", bytearray(re_enc), "image/gif", len(re_enc)),
            (3, "video", bytearray(M.write_gif_anim(other)),
             "image/gif", 1)]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in M.video_neardup_pairs(media).collect()}
    assert pairs == {(1, 2): 0}
    kept = {r["media_id"] for r in M.video_dedup(media).collect()}
    assert kept == {1, 3}
    feats = {r["media_id"]: (r["decoder"], r["feat"])
             for r in M.extract_features(media, mode="real").collect()}
    assert feats[1][0] == "gifanim"
    assert feats[1][1][:2] == [64.0, 48.0]
    # sub-clip containment: a 10-frame cut of the animation
    cut = M.write_gif_anim(frames[7:17])
    rows2 = [(1, "video", bytearray(anim), "image/gif", len(anim)),
             (2, "video", bytearray(cut), "image/gif", len(cut)),
             (3, "video", bytearray(M.write_gif_anim(other)),
              "image/gif", 1)]
    media2 = spark.createDataFrame(rows2, schema=M.MEDIA_SCHEMA)
    cpairs = {(r["id_a"], r["id_b"])
              for r in M.video_containment_pairs(
                  media2, min_shared_frames=3).collect()}
    assert (1, 2) in cpairs
    assert not any(3 in p for p in cpairs)
