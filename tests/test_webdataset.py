"""WebDataset tar-shard sink (``sources/sinks.py write_webdataset``).

The write-side twin of the archive ingestion door: rows become
``{key}.json`` / ``{key}.txt`` / ``{key}.{ext}`` members grouped in
``shard-%06d.tar`` files. Pins the contracts the 100 TB design leans
on: byte-deterministic shards under any input partitioning, exact
round-trip through ``read_archives``, unique-key rejection, manifest
fingerprints matching the files on disk, derived shard sizing, and
the replace/fail modes."""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import tarfile

import pytest

from dynamic_etl_pipeline_thesis_ii_spark.sources.archives import (
    read_archives,
)
from dynamic_etl_pipeline_thesis_ii_spark.sources.sinks import (
    SinkError,
    write_webdataset,
)


def _docs(spark, n=40):
    rows = [(f"doc{i:03d}", f"text body {i} " + "x" * (i % 7),
             f"src{i % 3}", i) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id string, text string, source string, n long")


def _clean(path):
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + "_manifest", ignore_errors=True)


def _tar_members(path):
    out = {}
    for t in sorted(glob.glob(os.path.join(path, "shard-*.tar"))):
        with tarfile.open(t) as tf:
            for m in tf.getmembers():
                out[m.name] = tf.extractfile(m).read()
    return out


def test_round_trip_members_and_text(spark, tmp_path):
    out = str(tmp_path / "wds")
    docs = _docs(spark)
    rep = write_webdataset(docs, out, key_col="doc_id", n_shards=3)
    assert rep["rows_written"] == 40
    # every row: one .json + one .txt
    assert rep["members_written"] == 80
    back = read_archives(spark, out + "/shard-*.tar")
    kinds = {r["kind"]: r["count"] for r in
             back.groupBy("kind").count().collect()}
    assert kinds["text"] == 40 and kinds["json"] == 40
    assert kinds["__archive__"] == rep["shards_written"] == 3
    # exact text parity, member-name join
    members = _tar_members(out)
    for r in docs.collect():
        assert members[r["doc_id"] + ".txt"].decode() == r["text"]
        meta = json.loads(members[r["doc_id"] + ".json"])
        # meta carries the non-key/text columns, sorted field order
        assert meta == {"n": r["n"], "source": r["source"]}


def test_deterministic_bytes_any_partitioning(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    docs = _docs(spark)
    write_webdataset(docs, a, key_col="doc_id", n_shards=3)
    write_webdataset(docs.repartition(7), b, key_col="doc_id",
                     n_shards=3)
    ha = {os.path.basename(f):
          hashlib.sha256(open(f, "rb").read()).hexdigest()
          for f in glob.glob(a + "/shard-*.tar")}
    hb = {os.path.basename(f):
          hashlib.sha256(open(f, "rb").read()).hexdigest()
          for f in glob.glob(b + "/shard-*.tar")}
    assert ha == hb and len(ha) == 3


def test_binary_payload_and_null_text(spark, tmp_path):
    out = str(tmp_path / "wds")
    rows = [("a", "alpha", b"\x00\x01PNG", "png"),
            ("b", None, b"RIFFdata", "wav"),
            ("c", "gamma", None, None)]
    df = spark.createDataFrame(
        rows, "doc_id string, text string, payload binary, ext string")
    rep = write_webdataset(df, out, key_col="doc_id", n_shards=1,
                           binary_col="payload", ext_col="ext")
    # a: json+txt+png, b: json+wav (no txt), c: json+txt (no payload)
    assert rep["members_written"] == 7
    members = _tar_members(out)
    assert members["a.png"] == b"\x00\x01PNG"
    assert members["b.wav"] == b"RIFFdata"
    assert "b.txt" not in members and "c.bin" not in members
    assert json.loads(members["b.json"]) == {}


def test_duplicate_keys_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [("k", "one"), ("k", "two")], "doc_id string, text string")
    with pytest.raises(SinkError, match="duplicate webdataset keys"):
        write_webdataset(df, str(tmp_path / "wds"), key_col="doc_id",
                         n_shards=1)
    # pre-validated pipelines can skip the key aggregate
    rep = write_webdataset(df, str(tmp_path / "wds2"),
                           key_col="doc_id", n_shards=1,
                           check_unique=False)
    assert rep["rows_written"] == 2


def test_bad_args_rejected(spark, tmp_path):
    docs = _docs(spark, 4)
    with pytest.raises(SinkError, match="key_col"):
        write_webdataset(docs, str(tmp_path / "w"), key_col="nope")
    with pytest.raises(SinkError, match="if_exists"):
        write_webdataset(docs, str(tmp_path / "w"), key_col="doc_id",
                         if_exists="append")


def test_manifest_matches_disk(spark, tmp_path):
    out = str(tmp_path / "wds")
    rep = write_webdataset(_docs(spark), out, key_col="doc_id",
                           n_shards=2)
    man = {r["file"]: r for r in
           spark.read.parquet(rep["manifest_path"]).collect()}
    files = glob.glob(out + "/shard-*.tar")
    assert set(man) == {os.path.basename(f) for f in files}
    for f in files:
        row = man[os.path.basename(f)]
        data = open(f, "rb").read()
        assert row["sha256"] == hashlib.sha256(data).hexdigest()
        assert row["n_bytes"] == len(data)
    assert sum(r["rows"] for r in man.values()) == 40


def test_derived_shard_count(spark, tmp_path):
    # ~40 rows x ~256B json/header floor + ~700B text ≈ 11 KB: a
    # 4 KB target must split into a few shards, and a degenerate 0
    # target clamps at one row per shard rather than dividing by zero
    out = str(tmp_path / "wds")
    rep = write_webdataset(_docs(spark), out, key_col="doc_id",
                           n_shards=None, target_shard_mb=0.004)
    assert 1 < rep["n_shards"] < 40
    rep0 = write_webdataset(_docs(spark), str(tmp_path / "wds0"),
                            key_col="doc_id", n_shards=None,
                            target_shard_mb=0)
    assert rep0["n_shards"] == 40


def test_replace_removes_stale_and_fail_raises(spark, tmp_path):
    out = str(tmp_path / "wds")
    write_webdataset(_docs(spark), out, key_col="doc_id", n_shards=4)
    assert len(glob.glob(out + "/shard-*.tar")) == 4
    # shrink to 1 shard: replace must remove the 3 stale tars
    write_webdataset(_docs(spark), out, key_col="doc_id", n_shards=1)
    assert len(glob.glob(out + "/shard-*.tar")) == 1
    with pytest.raises(SinkError, match="already exist"):
        write_webdataset(_docs(spark), out, key_col="doc_id",
                         n_shards=1, if_exists="fail")


def test_empty_corpus(spark, tmp_path):
    out = str(tmp_path / "wds")
    docs = _docs(spark).filter("n < 0")
    rep = write_webdataset(docs, out, key_col="doc_id", n_shards=2)
    assert rep["rows_written"] == 0 and rep["shards_written"] == 0
    assert glob.glob(out + "/shard-*.tar") == []
    assert spark.read.parquet(rep["manifest_path"]).count() == 0


def test_key_sanitization(spark, tmp_path):
    out = str(tmp_path / "wds")
    df = spark.createDataFrame(
        [("a/b\\c", "t")], "doc_id string, text string")
    write_webdataset(df, out, key_col="doc_id", n_shards=1)
    members = _tar_members(out)
    assert "a_b_c.txt" in members and "a_b_c.json" in members


# -- read side: sample-shaped ingestion (archives.read_webdataset) ----------


def test_read_webdataset_round_trip(spark, tmp_path):
    """write_webdataset -> read_webdataset is identity on (key, meta,
    text, payload) — the loader-shaped pivot of the tar door."""
    from dynamic_etl_pipeline_thesis_ii_spark.sources.archives import (
        read_webdataset,
    )

    out = str(tmp_path / "wds")
    rows = [("a", "alpha", b"\x89PNGdata", "png", "s1"),
            ("b", None, b"RIFFaudio", "wav", "s2"),
            ("c", "gamma", None, None, "s1")]
    df = spark.createDataFrame(
        rows, "doc_id string, text string, payload binary, "
              "ext string, source string")
    write_webdataset(df, out, key_col="doc_id", n_shards=2,
                     binary_col="payload", ext_col="ext")
    back = {r["key"]: r for r in
            read_webdataset(spark, out + "/shard-*.tar").collect()}
    assert set(back) == {"a", "b", "c"}
    assert back["a"]["text"] == "alpha"
    assert bytes(back["a"]["payloads"]["png"]) == b"\x89PNGdata"
    assert json.loads(back["a"]["meta"]) == {"source": "s1"}
    assert back["a"]["n_members"] == 3
    assert back["b"]["text"] is None
    assert bytes(back["b"]["payloads"]["wav"]) == b"RIFFaudio"
    assert back["c"]["payloads"] == {} and back["c"]["text"] == "gamma"


def test_read_webdataset_foreign_tar(spark, tmp_path):
    """A hand-built (foreign) tar: contiguous prefixes group into
    samples; an interleaved key yields one partial sample per
    contiguous run (the reference-loader behavior, not an error);
    corrupt payloads yield their readable prefix."""
    from dynamic_etl_pipeline_thesis_ii_spark.sources.archives import (
        webdataset_samples,
    )
    import io as _io

    buf = _io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("s1.txt", b"one"), ("s1.cls", b"7"),
                           ("s2.txt", b"two"),
                           ("s1.jpg", b"late")]:   # interleaved!
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
    samples = list(webdataset_samples(buf.getvalue()))
    keys = [s["key"] for s in samples]
    assert keys == ["s1", "s2", "s1"]              # per contiguous run
    assert samples[0]["text"] == "one"
    assert samples[0]["payloads"]["cls"] == b"7"
    assert samples[2]["payloads"]["jpg"] == b"late"
    # corrupt tail: readable prefix survives
    trunc = buf.getvalue()[:800]
    got = list(webdataset_samples(trunc))
    assert [s["key"] for s in got] <= keys
    assert list(webdataset_samples(b"not a tar")) == []


def test_read_webdataset_stream_equals_batch(spark, tmp_path):
    from dynamic_etl_pipeline_thesis_ii_spark.sources.archives import (
        read_webdataset,
        read_webdataset_stream,
    )

    out = str(tmp_path / "wds")
    write_webdataset(_docs(spark, 12), out, key_col="doc_id",
                     n_shards=2)
    stream = read_webdataset_stream(spark, out)
    assert stream.isStreaming
    q = (stream.writeStream.format("memory")
         .queryName("wds_stream_test")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    key = lambda r: (r["key"], r["meta"], r["text"], r["n_members"])
    got = sorted(key(r) for r in spark.sql(
        "SELECT * FROM wds_stream_test").collect())
    want = sorted(key(r) for r in
                  read_webdataset(spark, out + "/shard-*.tar").collect())
    assert got == want and len(got) == 12


def test_verify_webdataset(spark, tmp_path):
    """Receiving-side shipment check: intact shards verify ok; a
    flipped byte, a lost tar, and an extra tar are each flagged by
    file name."""
    from dynamic_etl_pipeline_thesis_ii_spark.sources.sinks import (
        verify_webdataset,
    )

    out = str(tmp_path / "wds")
    rep = write_webdataset(_docs(spark), out, key_col="doc_id",
                           n_shards=3)
    man = spark.read.parquet(rep["manifest_path"])
    assert verify_webdataset(spark, out, man) == {
        "ok": True, "n_shards": 3, "mismatched": []}
    # flip one byte mid-file
    victim = sorted(glob.glob(out + "/shard-*.tar"))[0]
    data = bytearray(open(victim, "rb").read())
    data[600] ^= 0xFF
    open(victim, "wb").write(bytes(data))
    chk = verify_webdataset(spark, out, man)
    assert not chk["ok"]
    assert chk["mismatched"] == [os.path.basename(victim)]
    # lost shard
    os.remove(victim)
    chk2 = verify_webdataset(spark, out, man)
    assert os.path.basename(victim) in chk2["mismatched"]
    # extra un-manifested tar is a mismatch too
    open(out + "/shard-000099.tar", "wb").write(b"stray")
    chk3 = verify_webdataset(spark, out, man)
    assert "shard-000099.tar" in chk3["mismatched"]


def test_verify_webdataset_nl(spark, sf_dir, tmp_path):
    """'verify the webdataset shards at /p against the manifest'
    detects the sha256 manifest kind and verifies tar bytes; the
    status frame is keyed by file."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
    )

    out = str(tmp_path / "wds")
    write_webdataset(_docs(spark), out, key_col="doc_id", n_shards=2)
    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    res = pipe.run_dataops(
        f"verify the shards at {out} against the manifest",
        sf_dir, str(tmp_path / "status"))
    assert res["status"] == "complete"
    assert res["reports"]["ok"] is True
    assert res["reports"]["n_shards"] == 2
    status = spark.read.parquet(str(tmp_path / "status"))
    assert status.columns == ["file", "status"]
    assert {r["status"] for r in status.collect()} == {"ok"}
    # corrupt a shard -> the run reports the mismatch by file
    victim = sorted(glob.glob(out + "/shard-*.tar"))[1]
    data = bytearray(open(victim, "rb").read())
    data[500] ^= 0x01
    open(victim, "wb").write(bytes(data))
    res2 = pipe.run_dataops(
        f"verify the shards at {out} against the manifest",
        sf_dir, str(tmp_path / "status2"))
    assert res2["reports"]["ok"] is False
    assert res2["reports"]["mismatched_shards"] == \
        [os.path.basename(victim)]


def test_container_ext_sniffing(spark):
    """Magic-byte -> extension column: every container the decode
    tier speaks, RIFF subtype split, kind-class fallback."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.multimodal import (
        container_ext,
    )

    rows = [(1, "image", b"\xff\xd8\xff\xe0jpeg"),
            (2, "image", b"\x89PNG\r\n\x1a\n"),
            (3, "image", b"GIF89a...."),
            (4, "image", b"BMxxxxxx"),
            (5, "image", b"P6\n2 2\n255\n"),
            (6, "audio", b"RIFF\x00\x00\x00\x00WAVEfmt "),
            (7, "video", b"RIFF\x00\x00\x00\x00AVI LIST"),
            (8, "image", b"RIFF\x00\x00\x00\x00WEBPVP8L"),
            (9, "audio", b"fLaC\x00\x00\x00\x22"),
            (10, "audio", b"ID3\x04\x00tag"),
            (11, "video", b"\x00\x00\x00\x18ftypisom"),
            (12, "image", b"II\x2a\x00tiff"),
            (13, "audio", b"JUNKJUNK"),
            (14, None, b"JUNKJUNK")]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r["e"] for r in
           df.select("media_id",
                     container_ext("payload", "kind").alias("e"))
           .collect()}
    assert got == {1: "jpg", 2: "png", 3: "gif", 4: "bmp", 5: "ppm",
                   6: "wav", 7: "avi", 8: "webp", 9: "flac",
                   10: "mp3", 11: "mp4", 12: "tif",
                   13: "aud", 14: "bin"}


def test_media_export_nl(spark, sf_dir, tmp_path):
    """'export the images as webdataset': media payload bytes become
    {media_id}.{sniffed-ext} members with exact byte parity; a dir
    without a media table rejects actionably."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
    )

    src = str(tmp_path / "media_src")
    os.makedirs(src, exist_ok=True)
    png = b"\x89PNG\r\n\x1a\n" + b"\x01" * 40
    wav = b"RIFF\x24\x00\x00\x00WAVEfmt " + b"\x02" * 24
    spark.createDataFrame(
        [(1, "image", png), (2, "audio", wav), (3, "image", b"JUNK")],
        "media_id long, kind string, payload binary") \
        .write.parquet(src + "/media.parquet")
    # the documents table must exist for Catalog? no — media face
    # reads only media.parquet
    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    out = str(tmp_path / "run")
    res = pipe.run_dataops("export the images as webdataset, 1 shards",
                           src, out)
    assert res["status"] == "complete"
    assert res["reports"]["rows_written"] == 3
    members = _tar_members(out + "/webdataset")
    assert members["1.png"] == png
    assert members["2.wav"] == wav
    assert members["3.img"] == b"JUNK"        # kind-class fallback
    assert json.loads(members["1.json"])["kind"] == "image"
    # no media table -> actionable rejection
    res2 = pipe.run_dataops("export the images as webdataset",
                            str(tmp_path / "empty_src"),
                            str(tmp_path / "run2"))
    assert res2["status"] == "rejected"
    assert "media" in res2["reason"]
