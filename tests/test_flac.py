"""FLAC codec tier (operators/flac.py): lossless round-trips for every
subframe mode / stereo decorrelation / bit width, CRC integrity and
corruption containment, and the cross-container contract — the same
PCM as WAV and as FLAC must hash/fingerprint IDENTICALLY."""

from __future__ import annotations

import numpy as np
import pytest

from dynamic_etl_pipeline_thesis_ii_spark.operators import multimodal as M
from dynamic_etl_pipeline_thesis_ii_spark.operators.flac import (
    flac_mono_samples,
    parse_flac,
    write_flac,
)


def _sine(n=2000, amp=3000):
    return (amp * np.sin(np.arange(n) / 20.0)).astype(np.int64)


def _chirp_pcm(seed, rate=16000, secs=2.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * secs)) / rate
    f0, f1 = 200 + 90 * seed, 400 + 50 * seed
    clip = (np.sin(2 * np.pi * (f0 + f1 * t) * t)
            * (0.5 + 0.5 * np.sin(2 * np.pi * (1.3 + 0.4 * seed) * t))
            + 0.2 * rng.standard_normal(len(t)) * (t % 0.7 < 0.35))
    return (np.clip(clip, -1, 1) * 20000).astype("<i2")


@pytest.mark.parametrize("mode", ["verbatim", "constant", "fixed", "lpc"])
def test_mono_roundtrip_modes(mode):
    rng = np.random.default_rng(3)
    x = rng.integers(-30000, 30000, size=1100, dtype=np.int64) \
        if mode in ("verbatim", "constant") else _sine(1100)
    p = write_flac(x, 8000, blocksize=256, mode=mode)
    d = parse_flac(p)
    assert d["rate"] == 8000 and d["channels"] == 1 and d["bits"] == 16
    assert np.array_equal(d["samples"][:, 0], x)


def test_constant_subframe_and_odd_tail():
    c = np.full(700, -123, dtype=np.int64)
    p = write_flac(c, 8000, mode="constant", blocksize=256)
    d = parse_flac(p)
    assert np.array_equal(d["samples"][:, 0], c)
    # constant coding is dramatically smaller than verbatim
    assert len(p) < len(write_flac(c, 8000, mode="verbatim",
                                   blocksize=256)) / 10


def test_fixed_and_lpc_actually_compress():
    sine = _sine()
    pv = write_flac(sine, 8000, mode="verbatim", blocksize=512)
    for mode in ("fixed", "lpc"):
        pc = write_flac(sine, 8000, mode=mode, blocksize=512)
        assert np.array_equal(parse_flac(pc)["samples"][:, 0], sine)
        assert len(pc) < len(pv)


@pytest.mark.parametrize("sm", ["independent", "left_side",
                                "right_side", "mid_side"])
def test_stereo_decorrelations(sm):
    sine = _sine()
    right = (sine * 0.7).astype(np.int64) + 17
    st = np.stack([sine, right], axis=1)
    p = write_flac(st, 44100, mode="fixed", stereo_mode=sm,
                   blocksize=512)
    d = parse_flac(p)
    assert d["channels"] == 2
    assert np.array_equal(d["samples"], st), sm


def test_mid_side_odd_sums():
    """mid/side reconstruction must be exact when L+R is odd (the
    dropped low bit rides the side channel's parity)."""
    st = np.array([[3, 2], [-5, 2], [7, -4], [1, 0], [-1, -2]],
                  dtype=np.int64)
    p = write_flac(st, 8000, mode="verbatim", stereo_mode="mid_side",
                   blocksize=16)
    assert np.array_equal(parse_flac(p)["samples"], st)


def test_escape_partitions():
    sine = _sine(600)
    p = write_flac(sine, 8000, mode="fixed", escape_bits=16,
                   blocksize=256)
    assert np.array_equal(parse_flac(p)["samples"][:, 0], sine)


@pytest.mark.parametrize("bits,lo,hi", [
    (8, -120, 120), (12, -2000, 2000), (20, -400_000, 400_000),
    (24, -8_000_000, 8_000_000), (32, -2**31 + 1, 2**31 - 1)])
def test_bit_widths(bits, lo, hi):
    rng = np.random.default_rng(bits)
    x = rng.integers(lo, hi, size=300, dtype=np.int64)
    d = parse_flac(write_flac(x, 44100, bits=bits, blocksize=128,
                              mode="fixed"))
    assert d["bits"] == bits
    assert np.array_equal(d["samples"][:, 0], x)


def test_crc_containment_prefix_property():
    """A flipped bit fails that frame's CRC: the decode returns the
    intact frame prefix (or None), NEVER wrong samples and NEVER an
    exception; truncations behave the same."""
    sine = _sine()
    p = write_flac(sine, 8000, mode="fixed", blocksize=512)
    clean = parse_flac(p)["samples"][:, 0]
    assert np.array_equal(clean, sine)
    hdr_end = 4 + 4 + 34
    for i in range(hdr_end, len(p), 13):
        for bit in (0x01, 0x40):
            bb = bytearray(p)
            bb[i] ^= bit
            d = parse_flac(bytes(bb))
            if d is not None:
                got = d["samples"][:, 0]
                n = len(got)
                # whatever survives is a prefix of the true signal
                assert n <= len(sine)
                assert np.array_equal(got[:min(n, 512)],
                                      sine[:min(n, 512)])
    for cut in range(0, len(p), 97):
        d = parse_flac(p[:cut])
        assert d is None or len(d["samples"]) <= len(sine)


def test_non_flac_rejected():
    assert parse_flac(None) is None
    assert parse_flac(b"") is None
    assert parse_flac(b"RIFFxxxxWAVE") is None
    assert parse_flac(b"fLaC") is None
    assert flac_mono_samples(b"not flac at all") is None


def test_cross_container_hash_identity():
    """Lossless means lossless: the same PCM as WAV and as FLAC gives
    BIT-IDENTICAL mono arrays and therefore the IDENTICAL aHash —
    the cross-container twin of dHash's BMP==WebP invariance."""
    pcm = _chirp_pcm(1)
    wav = bytes(M.write_wav(pcm, 16000))
    flc = write_flac(pcm.astype(np.int64), 16000, mode="fixed")
    rw, mw = M.wav_mono_samples(wav)
    rf, mf = flac_mono_samples(flc)
    assert rw == rf == 16000
    assert np.array_equal(mw, mf)
    assert M.ahash64(wav) == M.ahash64(flc) is not None
    # anchor fingerprints agree too (containment matching sees through
    # the container) — onset-rich envelope clip so anchors exist
    rng = np.random.default_rng(3)
    t = np.arange(16000 * 20) / 16000.0
    tones = np.sin(2 * np.pi * np.geomspace(140, 3400, 8)[:, None]
                   * t[None, :])
    seg = (np.arange(len(t)) * 80) // len(t)
    env = 0.1 + 0.9 * rng.random((80, 8))
    x = (np.clip((tones * env[seg].T).sum(axis=0) / 8.0, -1, 1)
         * 20000).astype("<i2")
    aw = M.audio_anchor_hashes(bytes(M.write_wav(x, 16000)))
    af = M.audio_anchor_hashes(write_flac(x.astype(np.int64), 16000,
                                          mode="fixed"))
    assert aw is not None and aw == af


def test_decode_audio_flac_tier_matches_wav():
    pcm = _chirp_pcm(2)
    wav_feat = M.decode_audio(bytes(M.write_wav(pcm, 16000)))
    flac_feat = M.decode_audio(write_flac(pcm.astype(np.int64), 16000,
                                          mode="fixed"))
    assert flac_feat == wav_feat        # duration/rate/channels/rms
    # undecodable-but-valid-STREAMINFO stays on the flacmeta tier
    meta_only = M.write_flac_meta(16000, rate=16000, channels=1)
    with pytest.raises(NotImplementedError):
        M.decode_audio(meta_only)


def test_extract_features_flac_provenance(spark):
    pcm = _chirp_pcm(3)
    wav = bytes(M.write_wav(pcm, 16000))
    flc = write_flac(pcm.astype(np.int64), 16000, mode="fixed")
    meta_only = M.write_flac_meta(16000, rate=16000, channels=1)
    rows = [(1, "audio", bytearray(wav), "audio/wav", len(wav)),
            (2, "audio", bytearray(flc), "audio/flac", len(flc)),
            (3, "audio", bytearray(meta_only), "audio/flac",
             len(meta_only))]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    got = {r["media_id"]: (r["decoder"], r["feat"])
           for r in M.extract_features(media, mode="real").collect()}
    assert got[1][0] == "wav" and got[2][0] == "flac"
    assert got[1][1] == got[2][1]       # same features, either container
    assert got[3][0] == "flacmeta"      # no frames -> metadata tier


def test_resample_flac_real_path(spark):
    pcm = _chirp_pcm(4)
    flc = write_flac(pcm.astype(np.int64), 16000, mode="fixed")
    down = M.resample_flac(flc, 8000)
    d = parse_flac(down)
    assert d["rate"] == 8000
    assert abs(len(d["samples"]) - len(pcm) // 2) <= 2
    with pytest.raises(NotImplementedError):
        M.resample_flac(b"junk", 8000)
    # the Spark kernel routes FLAC through the real path (output is
    # decodable FLAC at the target rate, not a truncate-pad blob)
    rows = [(1, "audio", bytearray(flc), "audio/flac", len(flc))]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    out = M.resample_audio(media, target_rate=8000).collect()[0]
    d2 = parse_flac(bytes(out["payload"]))
    assert d2 is not None and d2["rate"] == 8000


def test_flac_neardup_via_banding_engine(spark):
    """FLAC clips ride the shared hamming engine end-to-end: a WAV
    clip and its FLAC re-container band into the same bucket (hamming
    0) while unrelated clips stay apart."""
    a_wav = bytes(M.write_wav(_chirp_pcm(5), 16000))
    a_flac = write_flac(_chirp_pcm(5).astype(np.int64), 16000,
                        mode="fixed")
    b_wav = bytes(M.write_wav(_chirp_pcm(11), 16000))
    rows = [(1, "audio", bytearray(a_wav), "audio/wav", len(a_wav)),
            (2, "audio", bytearray(a_flac), "audio/flac", len(a_flac)),
            (3, "audio", bytearray(b_wav), "audio/wav", len(b_wav))]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in M.audio_neardup_pairs(media).collect()}
    assert pairs == {(1, 2): 0}
    kept = {r["media_id"] for r in M.audio_dedup(media).collect()}
    assert kept == {1, 3}
