"""PDF ingestion (sources/pdf.py): filter chains, string forms,
text-operator semantics, corruption containment, the Spark reader,
and the NL ingest target."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.sources.pdf import (
    parse_pdf_meta,
    pdf_text,
    read_pdfs,
    write_pdf,
)

PAGES = ["Hello world\nsecond line", "Page two (with) \\ specials"]
WANT = "Hello world\nsecond line\nPage two (with) \\ specials"


@pytest.mark.parametrize("filters", [
    ("flate",), ("lzw",), ("ahx",), ("a85",), ("rl",),
    ("a85", "flate"), ("ahx", "lzw"), ()])
def test_filter_chains_round_trip(filters):
    assert pdf_text(write_pdf(PAGES, filters=filters)) == WANT


@pytest.mark.parametrize("kw", [{"hex_strings": True},
                                {"use_tj_array": True}])
def test_string_forms(kw):
    assert pdf_text(write_pdf(["alpha beta gamma"], **kw)) \
        == "alpha beta gamma"


def test_meta_walk():
    meta = parse_pdf_meta(write_pdf(PAGES))
    assert meta == {"version": "1.4", "n_pages": 2, "n_objects": 7,
                    "encrypted": False}
    assert parse_pdf_meta(b"plain text") is None
    enc = write_pdf(["x"]).replace(b"/Root", b"/Encrypt 9 0 R /Root")
    assert parse_pdf_meta(enc)["encrypted"] is True


def test_utf16_strings_and_octal_escapes():
    raw = write_pdf(["placeholder"], filters=())
    utf = (b"\xfe\xff" + "héllo".encode("utf-16-be")).hex().encode()
    patched = raw.replace(b"(placeholder) Tj", b"<" + utf + b"> Tj")
    assert pdf_text(patched) == "héllo"
    oct_patched = raw.replace(b"(placeholder) Tj", b"(\\101\\102C) Tj")
    assert pdf_text(oct_patched) == "ABC"


def test_unsupported_filters_and_cid_gate():
    """DCTDecode streams are skipped (image codec), and a stream
    showing mostly unprintable bytes (unmapped CID font shows) is
    gated out instead of landing as mojibake."""
    raw = write_pdf(["keep this text"], filters=())
    dct = raw.replace(b"/Length", b"/Filter /DCTDecode /Length", 1)
    # the content stream now claims an image codec -> no text at all
    assert pdf_text(dct) == ""
    cid = raw.replace(b"(keep this text) Tj",
                      b"(\\001\\002\\003\\004\\005\\006) Tj")
    assert pdf_text(cid) == ""


def test_corruption_containment():
    base = write_pdf(["Hello world"] * 3)
    for cut in range(0, len(base), 83):
        pdf_text(base[:cut])
        parse_pdf_meta(base[:cut])
    import random
    rng = random.Random(1)
    for _ in range(300):
        bb = bytearray(base)
        bb[rng.randrange(len(bb))] ^= 0x42
        pdf_text(bytes(bb))              # never raises
    assert pdf_text(None) is None
    assert pdf_text(b"") is None
    # valid PDF, no text operators
    assert pdf_text(b"%PDF-1.4\n%%EOF") == ""


def test_read_pdfs_spark_reader(spark, tmp_path):
    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(write_pdf(["doc a text"], filters=("flate",)))
    (d / "b.pdf").write_bytes(write_pdf(["doc b line1\nline2"],
                                        filters=("a85", "flate")))
    (d / "img.pdf").write_bytes(
        write_pdf(["x"]).replace(b"/Length", b"/Filter /DCTDecode /Length"))
    got = {r["path"].split("/")[-1]: r
           for r in read_pdfs(spark, str(d)).collect()}
    assert got["a.pdf"]["text"] == "doc a text"
    assert got["a.pdf"]["n_pages"] == 1
    assert got["b.pdf"]["text"] == "doc b line1\nline2"
    assert got["img.pdf"]["text"] is None     # no text tier, not ""


def test_nl_ingest_pdfs_target(spark, sf_dir, tmp_path):
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query("extract text from the pdfs at /data/docs")
    assert p == {"target": "ingest_pdfs", "pdf_path": "/data/docs"}
    assert parse_dataops_query(
        "ingest the pdfs in /x")["target"] == "ingest_pdfs"
    # crawl phrasing still routes to the WARC front door
    assert parse_dataops_query(
        "extract text from the crawl at /w")["target"] == "ingest_crawl"

    d = tmp_path / "corpus_pdfs"
    d.mkdir()
    (d / "one.pdf").write_bytes(write_pdf(
        ["the quick brown fox and the lazy dog"]))
    (d / "two.pdf").write_bytes(write_pdf(["a b c d e\nf g h"]))
    (d / "none.pdf").write_bytes(
        write_pdf(["x"]).replace(b"/Length", b"/Filter /DCTDecode /Length"))
    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    out = str(tmp_path / "docs_out")
    res = pipe.run_dataops(
        f"extract text from the pdfs at {d}", sf_dir, out)
    assert res["status"] == "complete"
    assert res["reports"]["files_seen"] == 3
    assert res["reports"]["rows_written"] == 2
    assert res["reports"]["files_without_text"] == 1
    back = spark.read.parquet(out)
    cols = {"doc_id", "url", "n_pages", "text", "n_chars", "lang",
            "source"}
    assert cols <= set(back.columns)
    rows = {r["url"].split("/")[-1]: r for r in back.collect()}
    assert rows["one.pdf"]["text"].startswith("the quick")
    assert rows["one.pdf"]["source"] == "corpus_pdfs"
    assert rows["one.pdf"]["n_chars"] == len(rows["one.pdf"]["text"])

    r = pipe.run_dataops("extract text from the pdfs", sf_dir, out)
    assert r["status"] == "rejected" and "path" in r["reason"]


def test_read_pdfs_stream_equals_batch(spark, tmp_path):
    """Continuous PDF ingestion: the streaming binaryFile face must
    produce exactly the batch reader's rows over the same landing
    directory (stateless kernel => streaming plan IS the batch
    plan)."""
    from dynamic_etl_pipeline_thesis_ii_spark.sources.pdf import (
        read_pdfs_stream,
    )

    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.pdf").write_bytes(write_pdf(["stream doc a"]))
    (d / "b.pdf").write_bytes(write_pdf(["stream doc b\nmore"],
                                        filters=("a85", "flate")))
    stream = read_pdfs_stream(spark, str(d))
    assert stream.isStreaming
    q = (stream.writeStream.format("memory")
         .queryName("stream_pdf_test")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["path"].rsplit("/", 1)[-1], r["text"], r["n_pages"])
                 for r in spark.sql(
                     "SELECT * FROM stream_pdf_test").collect())
    want = sorted((r["path"].rsplit("/", 1)[-1], r["text"], r["n_pages"])
                  for r in read_pdfs(spark, str(d)).collect())
    assert got == want and len(got) == 2
