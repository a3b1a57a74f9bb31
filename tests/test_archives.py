"""Archive ingestion (sources/archives.py): member explosion with
per-kind text tiers, cap reporting, corruption containment, the
Spark reader, and the NL ingest target."""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

from dynamic_etl_pipeline_thesis_ii_spark.sources.archives import (
    archive_members,
    read_archives,
)
from dynamic_etl_pipeline_thesis_ii_spark.sources.pdf import write_pdf


def _zip(members: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _tar(members: dict, gz: bool = False) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    return gzip.compress(raw) if gz else raw


MEMBERS = {
    "docs/readme.txt": b"plain text body",
    "site/page.html": b"<html><body><p>hello</p></body></html>",
    "paper.pdf": write_pdf(["pdf body text"]),
    "data/rows.jsonl": b'{"a": 1}\n{"a": 2}',
    "img/raw.bin": b"\x00\x01\x02\x03" * 10,
}


def _collect(payload):
    rows = list(archive_members(payload))
    trailer = rows[-1]
    assert trailer[1] == "__archive__"
    return {r[0]: r for r in rows[:-1]}, trailer


def test_zip_and_tar_member_tiers():
    for payload in (_zip(MEMBERS), _tar(MEMBERS), _tar(MEMBERS, gz=True)):
        got, trailer = _collect(payload)
        assert set(got) == set(MEMBERS)
        assert got["docs/readme.txt"][1] == "text"
        assert got["docs/readme.txt"][3] == "plain text body"
        assert got["site/page.html"][1] == "html"
        assert "<p>hello</p>" in got["site/page.html"][3]
        assert got["paper.pdf"][1] == "pdf"
        assert got["paper.pdf"][3] == "pdf body text"
        assert got["data/rows.jsonl"][1] == "json"
        assert got["img/raw.bin"][1] == "binary"
        assert got["img/raw.bin"][3] is None
        assert trailer[2] == 5 and trailer[3] == "0"


def test_caps_are_reported_not_silent():
    big = {"big.txt": b"x" * 2048, "ok.txt": b"fine"}
    out = list(archive_members(_zip(big), max_member_bytes=1024))
    names = [r[0] for r in out[:-1]]
    assert names == ["ok.txt"]
    assert out[-1][2] == 1 and out[-1][3] == "1"   # 1 kept, 1 skipped
    capped = list(archive_members(_zip(MEMBERS), max_members=2))
    assert capped[-1][2] + int(capped[-1][3]) <= 2


def test_corruption_containment():
    z = _zip(MEMBERS)
    t = _tar(MEMBERS)
    for payload in (z, t):
        for cut in range(0, len(payload), 211):
            rows = list(archive_members(payload[:cut]))
            assert rows[-1][1] == "__archive__"    # trailer always
    # tar with corrupted middle: readable prefix survives
    bb = bytearray(t)
    bb[len(bb) // 2] ^= 0xFF
    rows = list(archive_members(bytes(bb)))
    assert rows[-1][1] == "__archive__"
    assert list(archive_members(b"not an archive at all")) \
        [-1][2] == 0


def test_read_archives_spark(spark, tmp_path):
    (tmp_path / "a.zip").write_bytes(_zip(MEMBERS))
    (tmp_path / "b.tar.gz").write_bytes(_tar({"x.txt": b"tar text"},
                                             gz=True))
    df = read_archives(spark, str(tmp_path))
    rows = df.collect()
    summaries = [r for r in rows if r["kind"] == "__archive__"]
    assert len(summaries) == 2
    assert {r["n_bytes"] for r in summaries} == {5, 1}
    texts = {r["member"]: r["text"] for r in rows
             if r["kind"] == "text"}
    assert texts == {"docs/readme.txt": "plain text body",
                     "x.txt": "tar text"}


def test_nl_ingest_archives_target(spark, sf_dir, tmp_path):
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query("extract text from the zip at /data/c.zip")
    assert p == {"target": "ingest_archives",
                 "archive_path": "/data/c.zip"}
    assert parse_dataops_query(
        "ingest the tarball at /t")["target"] == "ingest_archives"
    # the container outranks its contents
    assert parse_dataops_query(
        "extract text from the zip of pdfs at /z")["target"] \
        == "ingest_archives"
    # bare pdf phrasing still routes to the pdf door
    assert parse_dataops_query(
        "extract text from the pdfs at /p")["target"] == "ingest_pdfs"

    (tmp_path / "corpus.zip").write_bytes(_zip(MEMBERS))
    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    out = str(tmp_path / "docs_out")
    res = pipe.run_dataops(
        f"extract text from the zip at {tmp_path / 'corpus.zip'}",
        sf_dir, out)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["archives_seen"] == 1
    assert rep["members_seen"] == 5
    assert rep["members_skipped"] == 0
    assert rep["rows_written"] == 4            # binary member dropped
    back = spark.read.parquet(out)
    rows = {r["url"].split("#")[-1]: r for r in back.collect()}
    assert rows["paper.pdf"]["text"] == "pdf body text"
    assert rows["site/page.html"]["text"] == "hello"  # html rendered
    assert all(r["source"] == "corpus.zip" for r in rows.values())

    r = pipe.run_dataops("ingest the zip", sf_dir, out)
    assert r["status"] == "rejected" and "path" in r["reason"]


def test_read_archives_stream_equals_batch(spark, tmp_path):
    from dynamic_etl_pipeline_thesis_ii_spark.sources.archives import (
        read_archives_stream,
    )

    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.zip").write_bytes(_zip(MEMBERS))
    (d / "b.tar").write_bytes(_tar({"x.txt": b"tar text"}))
    stream = read_archives_stream(spark, str(d))
    assert stream.isStreaming
    q = (stream.writeStream.format("memory")
         .queryName("stream_archive_test")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    key = lambda r: (r["archive"].rsplit("/", 1)[-1], r["member"] or "",
                     r["kind"], r["text"])
    got = sorted(key(r) for r in spark.sql(
        "SELECT * FROM stream_archive_test").collect())
    want = sorted(key(r) for r in read_archives(spark, str(d)).collect())
    assert got == want and len(got) == 8       # 6 members + 2 trailers
