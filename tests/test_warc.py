"""WARC ingestion tests: record walking, gzip members, HTTP split,
chunked transfer decode, charset handling, and the Spark read path
feeding html_to_lines -> boilerplate removal end-to-end. Fixtures are
built in-test from the ISO 28500 grammar — no binary blobs in the
repo."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators import text as T
from dynamic_etl_pipeline_thesis_ii_spark.sources import warc as W


def _record(headers: dict[str, str], block: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers.items())
    return (f"WARC/1.0\r\n{head}Content-Length: {len(block)}\r\n\r\n"
            .encode() + block + b"\r\n\r\n")


def _response_block(body: bytes, status: int = 200,
                    ctype: str = "text/html; charset=utf-8",
                    extra: str = "") -> bytes:
    return (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"{extra}Content-Length: {len(body)}\r\n\r\n"
            .encode("latin-1") + body)


HTML = (b"<html><head><title>T</title><script>var x=1;</script></head>"
        b"<body><p>Hello &amp; bye</p><p>Nav | Menu</p></body></html>")


def _warc_bytes() -> bytes:
    info = _record({"WARC-Type": "warcinfo",
                    "WARC-Record-ID": "<urn:uuid:0>",
                    "Content-Type": "application/warc-fields"},
                   b"software: test\r\n")
    req = _record({"WARC-Type": "request",
                   "WARC-Record-ID": "<urn:uuid:1>",
                   "WARC-Target-URI": "http://example.com/"},
                  b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n")
    resp = _record({"WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:2>",
                    "WARC-Target-URI": "http://example.com/",
                    "WARC-Date": "2026-01-02T03:04:05Z",
                    "Content-Type": "application/http; msgtype=response"},
                   _response_block(HTML))
    return info + req + resp


def test_iter_warc_records_walks_all_records():
    recs = list(W.iter_warc_records(_warc_bytes()))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "request", "response"]
    assert recs[2][0]["warc-target-uri"] == "http://example.com/"


def test_truncated_tail_record_is_dropped_not_raised():
    data = _warc_bytes()
    recs_full = list(W.iter_warc_records(data))
    recs_cut = list(W.iter_warc_records(data[:-20]))
    assert len(recs_cut) == len(recs_full) - 1


def test_gzip_members_roundtrip():
    """Per-record gzip members (the Common Crawl layout) decompress to
    the identical record walk."""
    records = [_record({"WARC-Type": "warcinfo",
                        "WARC-Record-ID": f"<urn:uuid:{i}>"},
                       f"n: {i}\r\n".encode())
               for i in range(3)]
    gz = b"".join(gzip.compress(r) for r in records)
    ids = [h["warc-record-id"] for h, _ in W.iter_warc_records(gz)]
    assert ids == ["<urn:uuid:0>", "<urn:uuid:1>", "<urn:uuid:2>"]


def test_http_response_split_and_rows():
    rows = W.warc_rows(_warc_bytes(), path="p")
    assert len(rows) == 3
    resp = rows[2]
    assert resp["http_status"] == 200
    assert resp["http_content_type"].startswith("text/html")
    assert resp["payload"] == HTML
    assert "Hello &amp; bye" in resp["text"]
    assert rows[0]["http_status"] is None and rows[0]["text"] is None


def test_chunked_transfer_decoding():
    body = b"5\r\nHello\r\n6\r\n world\r\n0\r\n\r\n"
    block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
             b"Transfer-Encoding: chunked\r\n\r\n" + body)
    status, headers, payload = W.parse_http_response(block)
    assert (status, payload) == (200, b"Hello world")


def test_charset_and_binary_payloads():
    latin = _response_block("caf\xe9".encode("latin-1"),
                            ctype="text/plain; charset=iso-8859-1")
    png = _response_block(b"\x89PNG\r\n\x1a\n....", ctype="image/png")
    assert W.decode_text(latin.split(b"\r\n\r\n", 1)[1],
                         "text/plain; charset=iso-8859-1") == "caf\xe9"
    status, headers, payload = W.parse_http_response(png)
    assert W.decode_text(payload, headers.get("content-type", "")) is None
    # unknown charset falls back to utf-8, never raises
    assert W.decode_text(b"ok", "text/plain; charset=not-a-charset") == "ok"


def test_non_http_response_block_passes_through():
    status, headers, payload = W.parse_http_response(b"raw bytes only")
    assert status is None and payload == b"raw bytes only"


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    (d / "a.warc").write_bytes(_warc_bytes())
    (d / "b.warc.gz").write_bytes(gzip.compress(_warc_bytes()))
    return str(d)


def test_read_warc_spark_path(spark, warc_dir):
    df = W.read_warc(spark, warc_dir)
    assert df.schema == W.WARC_SCHEMA
    rows = df.collect()
    assert len(rows) == 6  # 3 records x 2 files
    by_type = {r["warc_type"] for r in rows}
    assert by_type == {"warcinfo", "request", "response"}
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert all(r["http_status"] == 200 for r in resp)
    assert all(bytes(r["payload"]) == HTML for r in resp)


def test_warc_to_curated_lines_e2e(spark, warc_dir):
    """The intended chain: read_warc -> html_to_lines -> line-level
    boilerplate removal. The title/nav lines and script body must not
    survive into the text; the real paragraph must."""
    docs = (W.read_warc(spark, warc_dir)
            .filter(F.col("warc_type") == "response")
            .select(F.monotonically_increasing_id().alias("doc_id"),
                    T.html_to_lines(F.col("text")).alias("text")))
    out = docs.collect()
    assert len(out) == 2
    for r in out:
        lines = r["text"].split("\n")
        assert "Hello & bye" in lines
        assert "var x=1;" not in r["text"]
        assert "Nav | Menu" in lines  # present pre-boilerplate-pass
    cleaned = T.remove_boilerplate_lines(docs, max_line_df=1).collect()
    # every real line appears in BOTH docs (df=2 > 1), so they all
    # drop; the 1-char title line "T" is structural (below
    # min_line_chars) and is exempt from the frequency rule — pinning
    # that the html->lines output feeds the line-df machinery
    assert all(r["text_out"] == "T" and r["n_removed"] == 2
               for r in cleaned)


def test_read_warc_empty_file_yields_no_rows(spark, tmp_path):
    p = tmp_path / "empty.warc"
    p.write_bytes(b"")
    assert W.read_warc(spark, str(p)).count() == 0
