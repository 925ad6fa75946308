"""WARC source — ISO 28500, the container format CommonCrawl publishes
crawls in, and therefore the byte-level front door of every web-scale
training-data pipeline (C4, CCNet, RefinedWeb, FineWeb all start from
``.warc.gz``).

Same scan architecture as ``sources/fastq.py``: one task per file via
the ``binaryFile`` source, decompress + frame + HTTP-parse inside an
``mapInArrow`` kernel so raw crawl bytes never leave the executor; at
cluster scale the parallel unit is the WARC segment file, exactly how
CommonCrawl shards its crawls (~1 GB gzip members, tens of thousands of
files per snapshot).

Framing: a WARC record is a ``WARC/1.x`` version line, CRLF headers, a
blank line, ``Content-Length`` payload bytes, then CRLF CRLF. A
``.warc.gz`` is a CONCATENATION of per-record gzip members —
``zlib``-walked member by member (Python's ``gzip.decompress`` also
handles multi-member streams; the framing below is member-agnostic
since it re-frames on WARC headers after one whole-file decompress).

HTTP payloads (``application/http``) are split into status line /
headers / body; chunked transfer encoding is decoded (CommonCrawl
stores the raw wire bytes, so chunked bodies do appear). Truncated or
malformed trailing records are dropped, not fatal — a real crawl file
ends mid-record now and then.
"""

from __future__ import annotations

import gzip
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "WARC_SCHEMA",
    "build_warc",
    "iter_warc_records",
    "parse_http_payload",
    "read_warc",
    "warc_record_bytes",
]

WARC_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_CRLF = b"\r\n"


def _maybe_gunzip(path: str, content: bytes) -> bytes:
    if path.endswith(".gz") or content[:2] == b"\x1f\x8b":
        return gzip.decompress(content)  # multi-member safe
    return content


def _parse_headers(block: bytes) -> dict[bytes, bytes]:
    headers: dict[bytes, bytes] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def iter_warc_records(data: bytes):
    """Yield (headers: dict[bytes, bytes], payload: bytes) per record.
    Tolerant of a truncated final record (dropped) and of leading
    padding between records."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            # not at a record boundary — find the next one or stop
            nxt = data.find(b"WARC/", pos)
            if nxt < 0:
                return
            pos = nxt
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            return
        body_start = head_end + 4
        if body_start + length > n:
            return  # truncated trailing record
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer encoding."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            break
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        out += body[eol + 2 : eol + 2 + size]
        pos = eol + 2 + size + 2  # skip chunk + trailing CRLF
    return bytes(out)


def parse_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from raw HTTP response bytes."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:sep]
    body = payload[sep + 4 :]
    status_line = head.split(_CRLF, 1)[0]
    parts = status_line.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    headers = _parse_headers(head.split(_CRLF, 1)[1] if _CRLF in head else b"")
    ctype = headers.get(b"content-type")
    if headers.get(b"transfer-encoding", b"").lower() == b"chunked":
        body = _dechunk(body)
    return status, ctype.decode("latin-1") if ctype else None, body


def read_warc(
    spark: SparkSession, path_glob, types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """Distributed WARC scan → WARC_SCHEMA rows, one task per file.
    ``types`` filters WARC-Type inside the kernel (default keeps only
    responses — the corpus payload; pass () for everything)."""
    import pyarrow as pa

    loader = spark.read.format("binaryFile")
    files = (
        loader.load(list(path_glob))
        if isinstance(path_glob, (list, tuple))
        else loader.load(path_glob)
    ).select("path", "content")
    arrow_schema = pa.schema(
        [
            ("source", pa.string()),
            ("record_id", pa.string()),
            ("warc_type", pa.string()),
            ("target_uri", pa.string()),
            ("warc_date", pa.string()),
            ("content_type", pa.string()),
            ("http_status", pa.int32()),
            ("http_content_type", pa.string()),
            ("payload", pa.binary()),
        ]
    )
    want = tuple(t.encode() for t in types)

    def kernel(batches) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            paths = rb.column(0).to_pylist()
            contents = rb.column(1)
            for i, path in enumerate(paths):
                local = path[len("file:"):] if str(path).startswith("file:") else str(path)
                stem = os.path.basename(local)
                for suf in (".gz", ".warc"):
                    if stem.endswith(suf):
                        stem = stem[: -len(suf)]
                data = _maybe_gunzip(local, contents[i].as_py())
                cols: dict[str, list] = {f.name: [] for f in arrow_schema}
                for h, payload in iter_warc_records(data):
                    wtype = h.get(b"warc-type", b"")
                    if want and wtype not in want:
                        continue
                    ctype = h.get(b"content-type", b"").decode("latin-1")
                    status = http_ctype = None
                    body = payload
                    if ctype.startswith("application/http"):
                        status, http_ctype, body = parse_http_payload(payload)
                    cols["source"].append(stem)
                    cols["record_id"].append(
                        h.get(b"warc-record-id", b"").decode("latin-1")
                    )
                    cols["warc_type"].append(wtype.decode("latin-1"))
                    cols["target_uri"].append(
                        h.get(b"warc-target-uri", b"").decode("latin-1") or None
                    )
                    cols["warc_date"].append(
                        h.get(b"warc-date", b"").decode("latin-1") or None
                    )
                    cols["content_type"].append(ctype or None)
                    cols["http_status"].append(status)
                    cols["http_content_type"].append(http_ctype)
                    cols["payload"].append(body)
                if cols["source"]:
                    yield pa.RecordBatch.from_pydict(cols, schema=arrow_schema)

    return files.mapInArrow(kernel, schema=WARC_SCHEMA)


# ---------------------------------------------------------------------------
# writer side (tests / fixtures / sinks)
# ---------------------------------------------------------------------------


def warc_record_bytes(
    warc_type: str,
    payload: bytes,
    record_id: str,
    target_uri: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: " + date.encode(),
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if target_uri is not None:
        head.insert(2, b"WARC-Target-URI: " + target_uri.encode())
    return _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def build_warc(records: list[bytes], per_record_gzip: bool = False) -> bytes:
    """Concatenate record byte blocks into one WARC file body;
    ``per_record_gzip`` emits the CommonCrawl member-per-record layout."""
    if per_record_gzip:
        return b"".join(gzip.compress(r) for r in records)
    return b"".join(records)
