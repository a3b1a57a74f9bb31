"""Property-based tests (hypothesis) for the driver-side engine logic —
invariants rather than examples: assignment caps, coverage bounds,
validator partitioning, date clamping. (Spark-side operators get their
invariants from the DuckDB differential oracle instead — a property
runner per Spark action would cost ~0.5s/example.)"""

from __future__ import annotations

from datetime import date

from hypothesis import given, settings
from hypothesis import strategies as st

from dynamic_etl_pipeline_thesis_ii_spark.config import EngineConfig
from dynamic_etl_pipeline_thesis_ii_spark.operators import union_engine as U
from dynamic_etl_pipeline_thesis_ii_spark.plans.contracts import APIRequest
from dynamic_etl_pipeline_thesis_ii_spark.plans.validators import (
    OutputValidator,
    ParameterValidator,
)

CFG = EngineConfig()


def _greedy(cands, max_matches):
    """Reference greedy (same as SJ.assign_greedy's core, list input)."""
    out, c1, c2 = [], {}, {}
    for i, j, p in sorted(cands, key=lambda t: (-t[2], t[0], t[1])):
        if max_matches == 0 or (c1.get(i, 0) < max_matches
                                and c2.get(j, 0) < max_matches):
            out.append((i, j, p))
            c1[i] = c1.get(i, 0) + 1
            c2[j] = c2.get(j, 0) + 1
    return out


pairs_st = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20),
              st.floats(0, 1, allow_nan=False)),
    max_size=120)


@given(pairs_st, st.integers(1, 4))
@settings(max_examples=200, deadline=None)
def test_greedy_caps_respected(cands, k):
    out = _greedy(cands, k)
    c1: dict = {}
    c2: dict = {}
    for i, j, _ in out:
        c1[i] = c1.get(i, 0) + 1
        c2[j] = c2.get(j, 0) + 1
    assert all(v <= k for v in c1.values())
    assert all(v <= k for v in c2.values())
    assert set(out) <= set(cands)
    # greedy with cap 0 keeps everything
    assert len(_greedy(cands, 0)) == len(cands)


@given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=8,
                unique=True),
       st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=8,
                unique=True))
@settings(max_examples=200, deadline=None)
def test_coverage_bounds(cols_a, cols_b):
    mapping, avg = U.find_column_mapping(cols_a, cols_b, CFG)
    cov = U.coverage(mapping, cols_a, cols_b)
    assert 0.0 <= cov <= 1.0
    assert set(mapping.keys()) <= set(cols_b)
    assert set(mapping.values()) <= set(cols_a)
    if mapping:
        assert avg >= CFG.union_threshold


@given(st.lists(st.text(alphabet="abcdefg_ ", min_size=1, max_size=12),
                min_size=1, max_size=10, unique=True),
       st.lists(st.text(alphabet="abcdefg_ ", min_size=1, max_size=12),
                min_size=0, max_size=10, unique=True))
@settings(max_examples=200, deadline=None)
def test_output_validator_partitions(features, columns):
    rep = OutputValidator().validate_columns(columns, features, "api", "ep")
    fuzzy_feats = [f["feature"] for f in rep.fuzzy_matched_features]
    all_out = rep.found_features + fuzzy_feats + rep.missing_features
    assert sorted(all_out) == sorted(features)
    assert rep.validation_passed == (not rep.missing_features)


@given(st.dates(min_value=date(2000, 1, 1), max_value=date(2099, 12, 31)))
@settings(max_examples=100, deadline=None)
def test_future_dates_always_clamped(d):
    today = date(2024, 6, 1)
    v = ParameterValidator(today=today)
    req = v.validate_request(APIRequest(
        "polygon", "get_aggs",
        {"ticker": "AAPL", "from": d.strftime("%Y-%m-%d")}))
    parsed = req.parameters["from"]
    assert parsed <= today.strftime("%Y-%m-%d")


# ---------------------------------------------------------------------------
# PII scrub pattern design (driver-side `re` mirrors the Java/RE2 subset
# the patterns restrict themselves to)


import re

from dynamic_etl_pipeline_thesis_ii_spark.operators.text import PII_PATTERNS


def _scrub_py(text: str) -> str:
    for tag, pattern in PII_PATTERNS:
        text = re.sub(pattern, f"<{tag}>", text)
    return text


pii_text_st = st.text(
    alphabet=st.sampled_from("abc012.-+@ \n<>EMALPHONSIV"), max_size=60)


@given(pii_text_st)
@settings(max_examples=300, deadline=None)
def test_pii_scrub_idempotent(text):
    """Scrubbing twice equals scrubbing once: no placeholder (or text
    containing placeholder fragments) may re-match any PII pattern —
    the property that makes the operator safe to re-run on partially
    scrubbed corpora."""
    once = _scrub_py(text)
    assert _scrub_py(once) == once


@given(st.lists(st.sampled_from(
    ["a.b@x.io", "555-123-4567", "10.0.0.1", "123-45-6789"]),
    min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_pii_scrub_removes_every_injected_token(tokens):
    scrubbed = _scrub_py("start " + " pad ".join(tokens) + " end")
    assert "@" not in scrubbed
    assert not re.search(r"\d{3}[-.]", scrubbed)


# ---------------------------------------------------------------------------
# deterministic sampling arithmetic (same md5 bucket as the engine)


import hashlib
import math


def _bucket_py(key, salt="", mod=1_000_000):
    h = hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8]
    return int(h, 16) % mod


@given(st.lists(st.integers(0, 10**9), max_size=60, unique=True),
       st.floats(0, 1, allow_nan=False), st.floats(0, 1, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_hash_sample_threshold_monotone(keys, r1, r2):
    """rate1 <= rate2 => kept(rate1) is a subset of kept(rate2) for the
    same salt — the refresh-only-adds-rows property."""
    lo, hi = sorted((r1, r2))
    t_lo, t_hi = math.floor(lo * 1_000_000), math.floor(hi * 1_000_000)
    kept_lo = {k for k in keys if _bucket_py(k) < t_lo}
    kept_hi = {k for k in keys if _bucket_py(k) < t_hi}
    assert kept_lo <= kept_hi


@given(st.dictionaries(st.sampled_from("abcd"), st.integers(1, 10**6),
                       min_size=1),
       st.dictionaries(st.sampled_from("abcd"),
                       st.floats(0.01, 1, allow_nan=False), min_size=1))
@settings(max_examples=200, deadline=None)
def test_rebalance_rates_always_feasible(counts, shares):
    """T* = min(n_g / share_g) guarantees every per-stratum rate lands
    in [0, 1]: the rebalancer can always hit the target mix by pure
    downsampling, never needing to upsample."""
    groups = [g for g in shares if g in counts]
    if not groups:
        return
    t_star = min(counts[g] / shares[g] for g in groups)
    for g in groups:
        rate = shares[g] * t_star / counts[g]
        assert 0.0 <= rate <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# image codec round-trip properties (lossless formats exact; JPEG dims)
# ---------------------------------------------------------------------------

@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    import numpy as np

    from dynamic_etl_pipeline_thesis_ii_spark.operators import multimodal as M
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    parsed = M.parse_png(M.write_png(arr))
    assert parsed is not None
    assert (parsed[0], parsed[1]) == (w, h)
    assert np.array_equal(parsed[2], arr)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    import numpy as np

    from dynamic_etl_pipeline_thesis_ii_spark.operators import multimodal as M
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    parsed = M.parse_bmp(M.write_bmp(arr))
    assert parsed is not None
    assert (parsed[0], parsed[1]) == (w, h)
    assert np.array_equal(parsed[2], arr)


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    quality=st.integers(min_value=50, max_value=98),
    subsample=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_dims_and_bounded_error_property(h, w, quality, subsample,
                                              seed):
    """JPEG is lossy, so the property is: decode never fails on our own
    encoder's output, dims are exact at every size (incl. 1x1 and odd
    dims under 4:2:0), and pixel error stays within the quantization
    regime."""
    import numpy as np

    from dynamic_etl_pipeline_thesis_ii_spark.operators import jpeg as J
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(1, 1, 3))
    arr = np.clip(base + rng.normal(0, 12, size=(h, w, 3)),
                  0, 255).astype(np.uint8)
    parsed = J.parse_jpeg(J.write_jpeg(arr, quality=quality,
                                       subsample=subsample))
    assert parsed is not None
    assert (parsed[0], parsed[1]) == (w, h)
    assert np.abs(parsed[2].astype(int) - arr.astype(int)).mean() < 24


# ---------------------------------------------------------------------------
# codec-layer properties: the decoders run inside mapInPandas kernels,
# where ONE uncaught exception fails the whole task — "never raise on
# arbitrary bytes" is a load-bearing invariant, not a nicety
# ---------------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_parsers_never_raise_on_arbitrary_bytes(payload):
    from dynamic_etl_pipeline_thesis_ii_spark.operators import (
        jpeg as J,
        multimodal as M,
    )
    for parser in (M.parse_netpbm, M.parse_bmp, M.parse_png,
                   M.parse_gif, M.parse_tiff, M.parse_mp3_meta,
                   J.parse_jpeg):
        parser(payload)            # parsed-or-None, never an exception


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=8, max_size=400))
def test_parsers_never_raise_on_magic_prefixed_garbage(payload):
    """Garbage wearing each format's magic bytes exercises the deep
    parse paths, not just the signature gate."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators import (
        jpeg as J,
        multimodal as M,
    )
    cases = [(M.parse_png, M.PNG_SIG), (M.parse_gif, b"GIF89a"),
             (M.parse_tiff, b"II*\x00"), (M.parse_bmp, b"BM"),
             (M.parse_netpbm, b"P6\n"), (J.parse_jpeg, b"\xFF\xD8\xFF"),
             (M.parse_mp3_meta, b"\xFF\xFB")]
    for parser, magic in cases:
        parser(magic + payload)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=1, max_size=3000),
       st.integers(2, 8))
def test_gif_lzw_roundtrip_property(vals, min_code):
    """LZW decode(encode(x)) == x for any byte stream whose symbols
    fit the code size (table growth, clear-on-full, KwKwK included)."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )
    alphabet = 1 << min_code
    px = bytes(v % alphabet for v in vals)
    assert _gif_lzw_decode(_gif_lzw_encode(px, min_code),
                           min_code, len(px)) == px


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcd", min_size=0, max_size=12),
       st.lists(st.tuples(st.text(alphabet="abcd", min_size=1, max_size=3),
                          st.text(alphabet="abcd", min_size=1, max_size=3)),
                max_size=10))
def test_encode_word_never_raises_and_reassembles(word, merge_pairs):
    """encode_word tolerates ARBITRARY (even non-learned) merge
    tables and its output always reassembles the input word."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators import bpe as B
    ranks = {m: i for i, m in enumerate(dict.fromkeys(merge_pairs))}
    toks = B.encode_word(word, ranks)
    assert "".join(toks) == word + B.END


# ---------------------------------------------------------------------------
# WARC layer: never-raise on arbitrary bytes (crawl files are hostile)
# ---------------------------------------------------------------------------

@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_warc_rows_never_raise_on_arbitrary_bytes(data):
    from dynamic_etl_pipeline_thesis_ii_spark.sources import warc as W
    rows = W.warc_rows(data, "fuzz")
    for r in rows:  # every yielded record satisfies the schema contract
        assert isinstance(r["content_length"], int)
        assert r["text"] is None or isinstance(r["text"], str)


@given(st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_warc_magic_prefixed_fuzz(data):
    """Bytes that LOOK like WARC/gzip/HTTP must still never raise —
    the magic-prefix corpus is where naive parsers die."""
    from dynamic_etl_pipeline_thesis_ii_spark.sources import warc as W
    for prefix in (b"WARC/1.0\r\n", b"\x1f\x8b\x08\x00", b"HTTP/1.1 200 OK\r\n"):
        W.warc_rows(prefix + data, "fuzz")
        W.parse_http_response(prefix + data)
        W.gunzip_members(prefix + data) if prefix[:2] != b"\x1f\x8b" else None


@given(st.binary(max_size=1024))
@settings(max_examples=150, deadline=None)
def test_warc_gunzip_and_dechunk_never_raise(data):
    """gunzip_members returns the prefix decompressed before a corrupt
    member instead of raising (this fuzz originally caught a zlib
    error escaping warc_rows — one bad crawl file must never fail the
    task holding it); _dechunk tolerates any bytes."""
    from dynamic_etl_pipeline_thesis_ii_spark.sources import warc as W
    W.gunzip_members(data)
    W.gunzip_members(b"\x1f\x8b\x08\x00" + data)
    W._dechunk(data)
