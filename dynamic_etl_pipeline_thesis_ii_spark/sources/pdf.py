"""PDF ingestion, stdlib-only: text extraction from content streams,
metadata walk, and a Spark ``binaryFile`` -> rows reader — the PDF
front door beside the WARC one (``sources/warc.py``).

Real tiers (the honest-decode discipline of the codec family):

- stream filters: FlateDecode (zlib), LZWDecode (the TIFF-variant
  early-change decoder shared with ``operators/multimodal.py``),
  ASCIIHexDecode, ASCII85Decode, RunLengthDecode — including filter
  CHAINS in array order. DCTDecode/JBIG2/JPX are image codecs (not
  text) and predictors are out of scope; streams that fail their
  filter chain are skipped, never guessed at.
- text operators: BT..ET blocks with Tj / ' / " / TJ shows, Td/TD/T*
  line moves, literal strings (nested parens, all escapes, octal,
  line continuations) and hex strings, UTF-16BE (BOM) and latin-1
  byte decodes. CID/Type0 2-byte encodings without their CMap are
  unmappable by construction — their garbled output is filtered by
  the printable-ratio gate rather than silently emitted.

Object discovery is SCAN-based (``N G obj .. endobj`` spans, stream
data delimited by ``stream``/``endstream``), not xref-based: corpus
PDFs routinely carry broken xref tables, and a linear scan degrades
gracefully (damaged objects drop, the rest still parse) — the same
containment stance as the FLAC/AVI walkers. :func:`write_pdf` is the
spec-valid fixture twin (proper xref + trailer, every supported
filter and string form) so all decoder paths round-trip without a
PDF library.

Scale shape: one file = one kernel row (Arrow ``mapInPandas``, the
WARC reader's contract); per-file cost is linear in bytes and the
whole ingest is embarrassingly parallel."""

from __future__ import annotations

import base64
import re
import zlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["parse_pdf_meta", "pdf_text", "write_pdf", "read_pdfs",
           "PDF_SCHEMA"]


# ---------------------------------------------------------------------------
# stream filters
# ---------------------------------------------------------------------------

def _ahx_decode(data: bytes) -> bytes:
    body = re.sub(rb"\s", b"", data.split(b">")[0])
    if len(body) % 2:
        body += b"0"
    return bytes.fromhex(body.decode("ascii"))


def _a85_decode(data: bytes) -> bytes:
    body = re.sub(rb"\s", b"", data)
    if body.endswith(b"~>"):
        body = body[:-2]
    return base64.a85decode(b"<~" + body + b"~>", adobe=True)


def _rl_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:
            break
        if n < 128:
            out += data[i + 1:i + 2 + n]
            i += 2 + n
        else:
            out += data[i + 1:i + 2] * (257 - n)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    # PDF LZWDecode is the TIFF variant (MSB-first, early change) —
    # one implementation serves both containers
    from dynamic_etl_pipeline_thesis_ii_spark.operators.multimodal import (
        _tiff_lzw_decode,
    )
    out = _tiff_lzw_decode(data, 1 << 26)
    if out is None:
        raise ValueError("bad LZW stream")
    return out


_FILTERS = {
    b"FlateDecode": lambda d: zlib.decompressobj().decompress(d),
    b"Fl": lambda d: zlib.decompressobj().decompress(d),
    b"LZWDecode": _lzw_decode,
    b"LZW": _lzw_decode,
    b"ASCIIHexDecode": _ahx_decode,
    b"AHx": _ahx_decode,
    b"ASCII85Decode": _a85_decode,
    b"A85": _a85_decode,
    b"RunLengthDecode": _rl_decode,
    b"RL": _rl_decode,
}

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_NAME_RE = re.compile(rb"/([A-Za-z0-9#]+)")


def _decode_stream(dict_part: bytes, data: bytes) -> Optional[bytes]:
    m = re.search(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9#]+)", dict_part)
    if m is None:
        return data
    names = _NAME_RE.findall(m.group(1))
    for name in names:
        fn = _FILTERS.get(name)
        if fn is None:
            return None                         # image/unsupported codec
        try:
            data = fn(data)
        except Exception:
            return None
    return data


def _streams(payload: bytes):
    """(dict_part, decoded_data) per decodable stream object —
    scan-based, xref-free."""
    for m in _OBJ_RE.finditer(payload):
        end = payload.find(b"endobj", m.end())
        if end < 0:
            end = len(payload)
        body = payload[m.end():end]
        sm = re.search(rb"stream\r?\n", body)
        if sm is None:
            continue
        se = body.rfind(b"endstream")
        if se < 0 or se < sm.end():
            continue
        raw = body[sm.end():se]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            raw = raw[:-1]
        decoded = _decode_stream(body[:sm.start()], raw)
        if decoded is not None:
            yield body[:sm.start()], decoded


# ---------------------------------------------------------------------------
# content-stream text extraction
# ---------------------------------------------------------------------------

_ESCAPES = {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
            ord("b"): b"\b", ord("f"): b"\f", ord("("): b"(",
            ord(")"): b")", ord("\\"): b"\\"}


def _literal_string(data: bytes, i: int):
    """Decode a ``(...)`` literal starting AT the open paren; returns
    (bytes, index past the close paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:                           # backslash
            if i + 1 >= n:
                break
            nxt = data[i + 1]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif 0x30 <= nxt <= 0x37:           # octal, up to 3 digits
                j = i + 1
                val = 0
                while j < n and j < i + 4 and 0x30 <= data[j] <= 0x37:
                    val = val * 8 + (data[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
            elif nxt in (0x0A, 0x0D):           # line continuation
                i += 2
                if nxt == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(nxt)
                i += 2
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _string_to_text(b: bytes) -> str:
    if b[:2] == b"\xfe\xff":
        try:
            return b[2:].decode("utf-16-be", "ignore")
        except Exception:
            return ""
    return b.decode("latin-1", "ignore")


_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _content_text(data: bytes) -> str:
    """Walk one decoded content stream's text operators; '' when the
    stream shows no text."""
    out: list = []
    stack: list = []
    i, n = 0, len(data)
    in_text = False

    def _emit_newline():
        if out and out[-1] != "\n":
            out.append("\n")

    while i < n:
        c = data[i]
        if c in b" \t\r\n\x00[]":
            i += 1
            continue
        if c == 0x28:                           # ( literal string
            s, i = _literal_string(data, i)
            stack.append(s)
            continue
        if c == 0x3C:                           # < hex string or <<
            if data[i:i + 2] == b"<<":
                depth = 1
                i += 2
                while i < n and depth:          # skip inline dicts
                    if data[i:i + 2] == b"<<":
                        depth += 1
                        i += 2
                    elif data[i:i + 2] == b">>":
                        depth -= 1
                        i += 2
                    else:
                        i += 1
                continue
            j = data.find(b">", i)
            if j < 0:
                break
            hx = re.sub(rb"\s", b"", data[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            try:
                stack.append(bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
            continue
        if c == 0x2F:                           # /Name
            m = _NAME_RE.match(data, i)
            i = m.end() if m else i + 1
            continue
        m = _NUM_RE.match(data, i)
        if m and not _OP_RE.match(data, i):
            stack.append(float(m.group()))
            i = m.end()
            continue
        m = _OP_RE.match(data, i)
        if m is None:
            i += 1
            continue
        op = m.group()
        i = m.end()
        if op == b"BT":
            in_text = True
            stack.clear()
        elif op == b"ET":
            in_text = False
            _emit_newline()
            stack.clear()
        elif not in_text:
            stack.clear()
        elif op == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                out.append(_string_to_text(stack[-1]))
            stack.clear()
        elif op in (b"'", b'"'):
            _emit_newline()
            if stack and isinstance(stack[-1], bytes):
                out.append(_string_to_text(stack[-1]))
            stack.clear()
        elif op == b"TJ":
            for item in stack:
                if isinstance(item, bytes):
                    out.append(_string_to_text(item))
                elif isinstance(item, float) and item < -180:
                    out.append(" ")             # kerning word gap
            stack.clear()
        elif op in (b"Td", b"TD", b"T*"):
            _emit_newline()
            stack.clear()
        else:
            stack.clear()
    return "".join(out)


def pdf_text(payload: bytes) -> Optional[str]:
    """All extractable text of a PDF, in stream order with the line
    structure the Td/T*/' operators imply — or None for non-PDF
    payloads (a valid PDF with no text yields ''). Never raises.
    Per-stream output must clear a printable-ratio gate (>= 60%),
    which drops the garbled shows of unmappable CID fonts instead of
    polluting the corpus with mojibake."""
    if payload is None or not payload.lstrip()[:5] == b"%PDF-":
        return None
    try:
        parts = []
        for _dict_part, data in _streams(payload):
            if b"BT" not in data:
                continue
            text = _content_text(data)
            if not text.strip():
                continue
            printable = sum(ch.isprintable() or ch in "\n\t"
                            for ch in text)
            if printable < 0.6 * len(text):
                continue                        # unmapped CID shows
            parts.append(text.strip("\n"))
        return "\n".join(parts)
    except Exception:
        return None


def parse_pdf_meta(payload: bytes) -> Optional[dict]:
    """Metadata walk without text extraction: ``{version, n_pages,
    n_objects, encrypted}``. Page count is the ``/Type /Page``
    census (not /Pages tree nodes); encrypted is the trailer
    ``/Encrypt`` flag. None for non-PDF."""
    if payload is None or not payload.lstrip()[:5] == b"%PDF-":
        return None
    try:
        head = payload.lstrip()[:16]
        m = re.match(rb"%PDF-(\d+\.\d+)", head)
        version = m.group(1).decode("ascii") if m else None
        n_pages = len(re.findall(rb"/Type\s*/Page\b(?!s)", payload))
        n_objects = len(_OBJ_RE.findall(payload))
        return {"version": version, "n_pages": n_pages,
                "n_objects": n_objects,
                "encrypted": b"/Encrypt" in payload}
    except Exception:
        return None


# ---------------------------------------------------------------------------
# writer twin
# ---------------------------------------------------------------------------

def _lzw_encode(data: bytes) -> bytes:
    """Minimal spec-valid TIFF/PDF LZW: literal 9-bit codes with a
    Clear before the table would force a width bump (early change at
    510 entries: 258 + 252 emitted codes) — trivially decodable by
    the shared early-change decoder, never wrong, never compressed."""
    bits = []
    count = 0
    bits.append((256, 9))                       # initial Clear
    for b in data:
        if count == 252:                        # stay inside 9-bit width
            bits.append((256, 9))
            count = 0
        bits.append((b, 9))
        count += 1
    bits.append((257, 9))                       # EOI
    out = bytearray()
    acc = nacc = 0
    for code, width in bits:
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _escape_literal(s: str) -> bytes:
    b = s.encode("latin-1", "replace")
    return (b.replace(b"\\", b"\\\\").replace(b"(", b"\\(")
            .replace(b")", b"\\)"))


_ENCODERS = {
    "flate": (b"/FlateDecode", zlib.compress),
    "lzw": (b"/LZWDecode", _lzw_encode),
    "ahx": (b"/ASCIIHexDecode",
            lambda d: d.hex().encode("ascii") + b">"),
    "a85": (b"/ASCII85Decode",
            lambda d: base64.a85encode(d) + b"~>"),
    "rl": (b"/RunLengthDecode",
           lambda d: b"".join(bytes([0]) + d[i:i + 1]
                              for i in range(len(d))) + b"\x80"),
}


def write_pdf(pages: list, filters: tuple = ("flate",),
              hex_strings: bool = False, use_tj_array: bool = False) -> bytes:
    """Spec-valid single-font PDF from page text strings — the
    fixture twin of :func:`pdf_text`/:func:`parse_pdf_meta` (proper
    xref + trailer; ``filters`` chains any of flate/lzw/ahx/a85/rl,
    applied left to right at decode time; ``hex_strings`` shows text
    as hex strings, ``use_tj_array`` via TJ arrays with word-gap
    kerning — every reader path is writable)."""
    objs: list = []                             # (num, bytes)

    def content_for(text: str) -> bytes:
        lines = text.split("\n")
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for li, line in enumerate(lines):
            if li:
                ops.append(b"0 -14 Td")
            if use_tj_array:
                words = line.split(" ")
                items = b" -250 ".join(
                    b"(" + _escape_literal(w) + b")" for w in words)
                ops.append(b"[" + items + b"] TJ")
            elif hex_strings:
                ops.append(b"<" + line.encode("latin-1", "replace")
                           .hex().encode("ascii") + b"> Tj")
            else:
                ops.append(b"(" + _escape_literal(line) + b") Tj")
        ops.append(b"ET")
        return b"\n".join(ops)

    n_pages = len(pages)
    # 1 catalog, 2 pages tree, 3 font; per page: page obj + content
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    objs.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objs.append((2, b"<< /Type /Pages /Kids [" + kids +
                 b"] /Count %d >>" % n_pages))
    objs.append((3, b"<< /Type /Font /Subtype /Type1 "
                 b"/BaseFont /Helvetica >>"))
    for i, text in enumerate(pages):
        pid, cid = page_ids[i], page_ids[i] + 1
        objs.append((pid, b"<< /Type /Page /Parent 2 0 R "
                     b"/MediaBox [0 0 612 792] "
                     b"/Resources << /Font << /F1 3 0 R >> >> "
                     b"/Contents %d 0 R >>" % cid))
        data = content_for(text)
        names = []
        for fname in reversed(filters):         # encode right-to-left
            fn_name, enc = _ENCODERS[fname]
            data = enc(data)
            names.append(fn_name)
        names.reverse()
        filt = (b"" if not names else
                b" /Filter " + (names[0] if len(names) == 1 else
                                b"[" + b" ".join(names) + b"]"))
        objs.append((cid, b"<< /Length %d%s >>\nstream\n" % (len(data),
                                                             filt)
                     + data + b"\nendstream"))
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num, body in objs:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for num in sorted(offsets):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF" % (len(objs) + 1, xref_at))
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

PDF_SCHEMA = StructType([
    StructField("path", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("version", StringType(), True),
    StructField("n_pages", LongType(), True),
    StructField("encrypted", BooleanType(), True),
    StructField("text", StringType(), True),    # null: no text tier
])


def _pdf_kernel():
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                meta = parse_pdf_meta(b) or {}
                text = pdf_text(b)
                rows.append({
                    "path": p, "n_bytes": len(b),
                    "version": meta.get("version"),
                    "n_pages": meta.get("n_pages"),
                    "encrypted": meta.get("encrypted"),
                    "text": text if text else None,
                })
            yield pd.DataFrame(rows, columns=[f.name
                                              for f in PDF_SCHEMA.fields])

    return kernel


def read_pdfs(spark: SparkSession, path: str) -> DataFrame:
    """PDF file(s) -> one row per file with metadata + extracted
    text (null when nothing extractable). ``binaryFile`` scan + one
    Arrow kernel; file = parallelism unit, same contract as
    :func:`sources.warc.read_warc`."""
    files = spark.read.format("binaryFile").load(
        path if path.endswith(".pdf") else path.rstrip("/") + "/*.pdf")
    return (files.select("path", "content")
            .mapInPandas(_pdf_kernel(), schema=PDF_SCHEMA))


def read_pdfs_stream(spark: SparkSession, path: str) -> DataFrame:
    """Continuous document ingestion: the same file kernel over the
    Structured Streaming ``binaryFile`` source — point it at a
    landing directory and every new .pdf becomes a row as it
    arrives. The kernel is stateless (one file -> its row), so the
    streaming plan IS the batch plan; parity is pinned in
    ``test_streaming.py`` (the :func:`sources.warc.read_warc_stream`
    contract)."""
    files = (spark.readStream.format("binaryFile")
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .load(path if path.endswith(".pdf")
                   else path.rstrip("/") + "/*.pdf")
             .select("path", "content"))
    return files.mapInPandas(_pdf_kernel(), schema=PDF_SCHEMA)
