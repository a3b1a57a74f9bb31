"""ZIP / TAR archive ingestion: the bulk-document front door beside
WARC (``sources/warc.py``) and PDF (``sources/pdf.py``) — corpora
routinely arrive as archives of mixed files, and the kernel explodes
each archive into one row per member with the right text tier
applied per member kind:

- ``.txt/.md/.csv/.log`` -> UTF-8 text (latin-1 fallback, never a
  crash);
- ``.html/.htm`` -> raw markup (downstream ``html_to_lines`` is the
  rendering step, same as the WARC door);
- ``.pdf`` -> ``sources.pdf.pdf_text`` (the stdlib content-stream
  extractor);
- ``.json/.jsonl`` -> raw text (schema-free: the caller's
  ``F.from_json`` / ``F.get_json_object`` is the typed step);
- anything else -> payload-only row (text null), kind recorded — a
  fallback consumer can route media members to the multimodal tier.

Containment: stdlib ``zipfile``/``tarfile`` against in-memory bytes;
a corrupt archive yields its readable prefix of members (tar) or no
rows (zip central-directory damage) — never an exception out of the
kernel. Zip-bomb discipline: members above ``max_member_bytes``
decompressed are SKIPPED and counted in the ``skipped`` column of an
archive-summary row rather than silently dropped; ``max_members``
bounds adversarial member counts.

Scale shape: one archive = one kernel row in, members out — the
file-level parallelism of every front door here. Archives are not
splittable (single-member parallelism is bounded by the archive), so
at 100 TB the unit of work is the archive file; land many moderate
archives rather than one giant one — documented, not hidden."""

from __future__ import annotations

import io
import tarfile
import zipfile
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["archive_members", "read_archives", "ARCHIVE_SCHEMA",
           "webdataset_samples", "read_webdataset",
           "read_webdataset_stream", "WDS_SAMPLE_SCHEMA"]

ARCHIVE_SCHEMA = StructType([
    StructField("archive", StringType(), True),
    StructField("member", StringType(), True),   # null: summary row
    StructField("kind", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("text", StringType(), True),
    StructField("skipped", LongType(), True),    # summary row only
])

_TEXT_EXT = {"txt": "text", "md": "text", "csv": "text", "log": "text",
             "html": "html", "htm": "html",
             "json": "json", "jsonl": "json", "ndjson": "json",
             "pdf": "pdf"}


def _kind(name: str) -> str:
    ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
    return _TEXT_EXT.get(ext, "binary")


def _member_text(kind: str, data: bytes) -> Optional[str]:
    if kind in ("text", "html", "json"):
        try:
            return data.decode("utf-8")
        except UnicodeDecodeError:
            return data.decode("latin-1", "replace")
    if kind == "pdf":
        from dynamic_etl_pipeline_thesis_ii_spark.sources.pdf import (
            pdf_text,
        )
        t = pdf_text(data)
        return t if t else None
    return None


def archive_members(payload: bytes, max_member_bytes: int = 16 << 20,
                    max_members: int = 100_000):
    """Yield ``(member_name, kind, n_bytes, text)`` per member of a
    ZIP / TAR / TAR.GZ / TAR.BZ2 payload, then exactly one trailer
    tuple ``(None, '__archive__', n_members_emitted, str(n_skipped))``
    — the per-archive summary the reader turns into its summary row.
    Unrecognized / unreadable payloads yield only the trailer (0
    members). Never raises."""
    emitted = 0
    skipped = 0
    try:
        if payload[:2] == b"PK":
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    if emitted + skipped >= max_members:
                        break
                    if info.file_size > max_member_bytes:
                        skipped += 1
                        continue
                    try:
                        data = zf.read(info)
                    except Exception:
                        skipped += 1
                        continue
                    kind = _kind(info.filename)
                    yield (info.filename, kind, len(data),
                           _member_text(kind, data))
                    emitted += 1
        else:
            with tarfile.open(fileobj=io.BytesIO(payload), mode="r:*") \
                    as tf:
                while emitted + skipped < max_members:
                    try:
                        info = tf.next()
                    except Exception:
                        break                   # corrupt tail: stop
                    if info is None:
                        break
                    if not info.isfile():
                        continue
                    if info.size > max_member_bytes:
                        skipped += 1
                        continue
                    fh = tf.extractfile(info)
                    if fh is None:
                        skipped += 1
                        continue
                    data = fh.read(max_member_bytes)
                    kind = _kind(info.name)
                    yield (info.name, kind, len(data),
                           _member_text(kind, data))
                    emitted += 1
    except Exception:
        pass                                    # unreadable archive
    yield (None, "__archive__", emitted, str(skipped))


def _archive_kernel():
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                for name, kind, n, text in archive_members(b):
                    if kind == "__archive__":
                        rows.append({"archive": p, "member": None,
                                     "kind": kind, "n_bytes": n,
                                     "text": None,
                                     "skipped": int(text)})
                    else:
                        rows.append({"archive": p, "member": name,
                                     "kind": kind, "n_bytes": n,
                                     "text": text, "skipped": None})
            yield pd.DataFrame(
                rows, columns=[f.name for f in ARCHIVE_SCHEMA.fields])

    return kernel


def read_archives(spark: SparkSession, path: str) -> DataFrame:
    """Archive file(s) -> one row per member (text tier applied per
    kind) plus one summary row per archive (``member`` null,
    ``kind='__archive__'``, ``n_bytes`` = members emitted,
    ``skipped`` = members dropped by the size/count caps — caps are
    REPORTED, never silent). ``binaryFile`` scan + one Arrow kernel;
    archive = parallelism unit (archives are not splittable — land
    many moderate archives, not one giant one)."""
    files = spark.read.format("binaryFile").load(path)
    return (files.select("path", "content")
            .mapInPandas(_archive_kernel(), schema=ARCHIVE_SCHEMA))


def read_archives_stream(spark: SparkSession, path: str) -> DataFrame:
    """Continuous archive ingestion: the same stateless kernel over
    the Structured Streaming ``binaryFile`` source — every archive
    landing in the directory becomes member rows as it arrives
    (the ``read_warc_stream``/``read_pdfs_stream`` contract; stream
    == batch parity pinned in the tests)."""
    files = (spark.readStream.format("binaryFile")
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .load(path)
             .select("path", "content"))
    return files.mapInPandas(_archive_kernel(), schema=ARCHIVE_SCHEMA)


# ---------------------------------------------------------------------------
# WebDataset sample reader: the loader-shaped face of the tar door.
# ---------------------------------------------------------------------------

WDS_SAMPLE_SCHEMA = StructType([
    StructField("archive", StringType(), True),
    StructField("key", StringType(), True),
    StructField("meta", StringType(), True),      # {key}.json member
    StructField("text", StringType(), True),      # {key}.txt member
    StructField("payloads", MapType(StringType(), BinaryType()), True),
    StructField("n_members", LongType(), True),
])


def webdataset_samples(payload: bytes, archive: str = "",
                       max_member_bytes: int = 64 << 20):
    """Yield one dict per SAMPLE from a WebDataset-style tar payload:
    members sharing a basename prefix (``{key}.json`` metadata,
    ``{key}.txt`` text, anything else into the ``payloads`` ext→bytes
    map) group into one training sample — the pivot of
    :func:`archive_members`'s member-per-row view, and exactly what a
    webdataset/torchdata loader would assemble.

    Samples are assumed CONTIGUOUS in the tar (the WebDataset layout
    contract, which :func:`...sinks.write_webdataset` guarantees and
    streaming loaders rely on): a sample flushes when the key prefix
    changes, so memory is one sample, never the shard. A foreign tar
    that interleaves keys yields one partial sample per contiguous
    run — the same behavior as the reference loaders, not an error.
    Corrupt tars yield their readable prefix; never raises."""
    cur_key = None
    cur = None

    def _flush():
        nonlocal cur, cur_key
        if cur is not None:
            yield cur
        cur, cur_key = None, None

    try:
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r:*") as tf:
            while True:
                try:
                    info = tf.next()
                except Exception:
                    break                           # corrupt tail
                if info is None:
                    break
                if not info.isfile() or info.size > max_member_bytes:
                    continue
                fh = tf.extractfile(info)
                if fh is None:
                    continue
                data = fh.read(max_member_bytes)
                name = info.name.rsplit("/", 1)[-1]
                key, _, ext = name.rpartition(".")
                if not key:                         # extension-less
                    key, ext = name, ""
                if key != cur_key:
                    yield from _flush()
                    cur_key = key
                    cur = {"archive": archive, "key": key,
                           "meta": None, "text": None,
                           "payloads": {}, "n_members": 0}
                cur["n_members"] += 1
                if ext == "json":
                    cur["meta"] = _member_text("json", data)
                elif ext == "txt":
                    cur["text"] = _member_text("text", data)
                else:
                    cur["payloads"][ext] = data
    except Exception:
        pass                                        # unreadable tar
    yield from _flush()


def _wds_kernel():
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in WDS_SAMPLE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(webdataset_samples(bytes(content), archive=p))
            yield pd.DataFrame(rows, columns=cols)

    return kernel


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """WebDataset tar shard(s) -> one row per SAMPLE (``key``, json
    ``meta``, ``text``, ext→bytes ``payloads`` map) — the read-back
    twin of ``sinks.write_webdataset`` and the row shape a training
    loader consumes. Same scale contract as :func:`read_archives`:
    ``binaryFile`` scan + one Arrow kernel, shard = parallelism unit,
    one-sample memory (contiguous-sample layout)."""
    files = spark.read.format("binaryFile").load(path)
    return (files.select("path", "content")
            .mapInPandas(_wds_kernel(), schema=WDS_SAMPLE_SCHEMA))


def read_webdataset_stream(spark: SparkSession, path: str) -> DataFrame:
    """Continuous sample ingestion: the same stateless kernel over the
    Structured Streaming ``binaryFile`` source — every shard landing
    in the directory becomes sample rows as it arrives (stream ==
    batch parity, the ``read_archives_stream`` contract)."""
    files = (spark.readStream.format("binaryFile")
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .load(path)
             .select("path", "content"))
    return files.mapInPandas(_wds_kernel(), schema=WDS_SAMPLE_SCHEMA)
