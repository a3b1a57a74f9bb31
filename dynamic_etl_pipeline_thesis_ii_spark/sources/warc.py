"""WARC (Web ARChive, ISO 28500) ingestion — the Common Crawl front
door of a training-data pipeline.

Reference scope note: the reference system ingests REST APIs
(LLM_Ingestor); web-crawl ingestion is part of this repo's
training-data extension (SURVEY.md §2.12), built from the public WARC
spec only.

Spark shape: ``spark.read.format("binaryFile")`` lists and reads the
crawl files; an Arrow-batched ``mapInPandas`` kernel splits each file
into records (1 -> N expansion). The PARALLELISM UNIT IS THE FILE —
exactly how crawl corpora ship (Common Crawl: ~1 GB gzip files,
~64,000 per snapshot), so a 1000-executor cluster saturates on file
count long before any single task becomes a straggler. Per-task memory
is bounded by one file's decompressed size; the standard knob for
bigger-than-memory archives is splitting at the member boundary
upstream (WARC gzip members are independently decompressible), not a
code change here.

Record payloads larger than ``max_text_bytes`` keep their binary
payload but truncate the decoded ``text`` — a crawl corpus carries the
occasional 100 MB tarball mislabeled text/plain, and one row must not
blow the Arrow batch.
"""

from __future__ import annotations

import zlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType([
    StructField("warc_path", StringType()),
    StructField("record_id", StringType()),
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("warc_date", StringType()),
    StructField("content_type", StringType()),
    StructField("content_length", LongType()),
    StructField("http_status", IntegerType()),
    StructField("http_content_type", StringType()),
    StructField("payload", BinaryType()),
    StructField("text", StringType()),
])

_TEXTUAL_PREFIXES = ("text/",)
_TEXTUAL_EXACT = ("application/xhtml+xml", "application/xml",
                  "application/json", "application/javascript")


def gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — WARC files
    gzip each record as its own member so records stay independently
    seekable; plain (uncompressed) input passes through. A corrupt
    member yields whatever decompressed before it (never raises: one
    truncated crawl file must not fail the task that holds it)."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = []
    buf = data
    while buf.startswith(b"\x1f\x8b"):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(buf))
            out.append(d.flush())
        except zlib.error:
            break  # corrupt member: keep the records already walked
        buf = d.unused_data
    return b"".join(out)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, block)`` per WARC record: the version line is
    checked, named headers are lower-cased, and the block is exactly
    ``Content-Length`` bytes. Tolerant of the standard inter-record
    ``\\r\\n\\r\\n`` padding and of truncated tails (a partial final
    record is dropped, not raised — crawl files end mid-record when a
    fetcher dies)."""
    data = gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        end_hdr = data.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            break
        header_block = data[pos:end_hdr].decode("utf-8", "replace")
        lines = header_block.split("\r\n")
        if not lines[0].startswith("WARC/"):
            break
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            if k:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body = data[end_hdr + 4:end_hdr + 4 + length]
        if len(body) < length:
            break  # truncated tail
        yield headers, body
        pos = end_hdr + 4 + length


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer encoding (size lines are hex,
    optionally with extensions after ';'); malformed input returns the
    bytes decoded so far — never raises."""
    out, pos = [], 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        chunk = body[eol + 2:eol + 2 + size]
        out.append(chunk)
        if len(chunk) < size:
            break
        pos = eol + 2 + size + 2  # skip trailing CRLF
    return b"".join(out)


def parse_http_response(block: bytes) -> tuple[Optional[int], dict, bytes]:
    """Split a WARC response block into (status, headers, payload).
    Handles chunked transfer encoding; a block with no HTTP status
    line comes back as ``(None, {}, block)`` so resource records and
    exotic captures still carry their bytes."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, {}, block
    head = block[:sep].decode("latin-1", "replace")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    try:
        status: Optional[int] = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, block
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if k:
            headers[k.strip().lower()] = v.strip()
    payload = block[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        payload = _dechunk(payload)
    return status, headers, payload


def _is_textual(content_type: str) -> bool:
    base = content_type.split(";", 1)[0].strip().lower()
    return base.startswith(_TEXTUAL_PREFIXES) or base in _TEXTUAL_EXACT


def decode_text(payload: bytes, content_type: str,
                max_text_bytes: int = 4 << 20) -> Optional[str]:
    """Decode a textual payload using the header charset (default
    utf-8, errors=replace — a crawl NEVER gets to raise on bad bytes);
    non-textual content types return None."""
    if not _is_textual(content_type):
        return None
    charset = "utf-8"
    for tok in content_type.split(";")[1:]:
        k, _, v = tok.partition("=")
        if k.strip().lower() == "charset" and v.strip():
            charset = v.strip().strip("\"'")
    try:
        return payload[:max_text_bytes].decode(charset, "replace")
    except LookupError:
        return payload[:max_text_bytes].decode("utf-8", "replace")


def warc_rows(data: bytes, path: str = "",
              max_text_bytes: int = 4 << 20) -> list[dict]:
    """One WARC file's bytes -> row dicts matching :data:`WARC_SCHEMA`
    (the pure-python core of :func:`read_warc`, unit-testable without
    a SparkSession)."""
    rows = []
    for headers, block in iter_warc_records(data):
        warc_type = headers.get("warc-type", "")
        status, http_headers, payload = (None, {}, block)
        if warc_type == "response":
            status, http_headers, payload = parse_http_response(block)
        http_ct = http_headers.get("content-type", "")
        rows.append({
            "warc_path": path,
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": warc_type,
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "content_length": len(block),
            "http_status": status,
            "http_content_type": http_ct,
            "payload": payload,
            "text": decode_text(payload, http_ct, max_text_bytes)
            if warc_type == "response" else None,
        })
    return rows


def _warc_kernel(max_text_bytes: int = 4 << 20):
    """The Arrow kernel shared by the batch and streaming readers:
    (path, content) rows -> WARC record rows, one output frame per
    FILE so the Arrow batch is bounded at one file's records instead
    of one partition's files."""
    def kernel(batches):
        import pandas as pd
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                rows = warc_rows(bytes(content), p, max_text_bytes)
                yield pd.DataFrame(rows, columns=cols) if rows else \
                    pd.DataFrame({c: [] for c in cols})
    return kernel


def read_warc(spark: SparkSession, path: str,
              max_text_bytes: int = 4 << 20) -> DataFrame:
    """Read WARC file(s) (plain or .gz) into one row per record. See
    the module docstring for the scale contract; downstream text
    extraction is :func:`~..operators.text.html_to_lines` over the
    ``text`` column, then the normal curation stack."""
    files = spark.read.format("binaryFile").load(path)
    return (files.select("path", "content")
            .mapInPandas(_warc_kernel(max_text_bytes),
                         schema=WARC_SCHEMA))


def read_warc_stream(spark: SparkSession, path: str,
                     max_text_bytes: int = 4 << 20) -> DataFrame:
    """Continuous crawl ingestion: the same record kernel over the
    Structured Streaming ``binaryFile`` file source — point it at a
    landing directory and every new .warc/.warc.gz file becomes rows
    as it arrives. The kernel is stateless (one file -> its records),
    so the streaming plan IS the batch plan; parity is pinned in
    ``test_streaming.py``."""
    # streaming file sources require an explicit schema; binaryFile's
    # is fixed by the format
    files = (spark.readStream.format("binaryFile")
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .load(path)
             .select("path", "content"))
    return files.mapInPandas(_warc_kernel(max_text_bytes),
                             schema=WARC_SCHEMA)
