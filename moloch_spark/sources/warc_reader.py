"""WARC (Web ARChive, ISO 28500) reader — the Common Crawl ingest
edge of the training-data pipeline. A 100 TB crawl arrives as tens of
thousands of ~1 GB `.warc.gz` segments; each segment is a sequence of
WARC records, and (per the Common Crawl convention) each record is its
own gzip MEMBER so a reader can stream records without decompressing
the whole file.

Like pcap (pcap_reader.py), a WARC stream is not byte-splittable —
record boundaries are only discoverable by walking Content-Length
headers — so the parallel unit is the FILE: `binaryFile` ships each
segment to one task and `mapInArrow` walks records Arrow-batched.
That maps a crawl dump to exactly segment-many parallel tasks with
zero shuffle, and the extracted (url, date, status, body) rows feed
straight into the documents pipeline (lang-id, dedup, LM filtering,
...).

Hostile-input posture mirrors the pcap reader: Content-Length is
sanity-bounded, truncated trailing records are dropped (a segment
mid-upload), bad gzip members end the walk for that file only, and
header parsing never throws on malformed bytes — a crawl always
contains garbage.
"""

from __future__ import annotations

import gzip as _gzip
import zlib as _zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "path string, rec_index long, warc_type string, url string, "
    "warc_date string, record_id string, content_type string, "
    "http_status int, http_content_type string, body binary"
)

_COLS = [
    "path",
    "rec_index",
    "warc_type",
    "url",
    "warc_date",
    "record_id",
    "content_type",
    "http_status",
    "http_content_type",
    "body",
]

# sanity bound on one record's content block (Common Crawl truncates
# response bodies at 1 MiB; we admit far larger but never unbounded)
_MAX_CONTENT_BYTES = 256 * 1024 * 1024


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the Common Crawl
    record-per-member layout). Trailing garbage / a truncated final
    member yields what decompressed cleanly so far."""
    out = []
    pos = 0
    while pos < len(buf) and buf[pos : pos + 2] == b"\x1f\x8b":
        d = _zlib.decompressobj(16 + _zlib.MAX_WBITS)
        try:
            out.append(d.decompress(buf[pos:]))
        except _zlib.error:
            break
        if not d.eof:  # truncated member
            break
        rest = d.unused_data
        pos = len(buf) - len(rest)
        if not rest:
            break
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Lenient RFC-822-style header parse: first line skipped by the
    caller, malformed lines ignored, keys lowercased."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" not in line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
            "latin-1", "replace"
        )
    return headers


def _parse_http(content: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an HTTP response payload into (status, content-type,
    body). Non-HTTP content comes back (None, None, content)."""
    if not content.startswith(b"HTTP/"):
        return None, None, content
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, content
    head = content[:sep]
    first, _, rest = head.partition(b"\r\n")
    parts = first.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, content
    ctype = _parse_headers(rest).get("content-type")
    return status, ctype, content[sep + 4 :]


def parse_warc_bytes(path: str, buf: bytes) -> Iterator[tuple]:
    """Yield one tuple per WARC record. Accepts plain WARC and
    gzip-member WARC (sniffed); response records additionally get
    their HTTP envelope split off."""
    if buf[:2] == b"\x1f\x8b":
        buf = _gunzip_members(buf)
    pos = 0
    idx = 0
    n = len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not buf.startswith(b"WARC/", pos):
            break  # lost sync: stop walking this file
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break  # truncated header block
        ver_end = buf.find(b"\r\n", pos)
        headers = _parse_headers(buf[ver_end + 2 : hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        if clen < 0 or clen > _MAX_CONTENT_BYTES:
            break
        start = hdr_end + 4
        if start + clen > n:
            break  # truncated content (segment mid-upload)
        content = buf[start:clen + start]
        wtype = headers.get("warc-type", "")
        status, http_ctype, body = (None, None, content)
        if wtype == "response":
            status, http_ctype, body = _parse_http(content)
        yield (
            path,
            idx,
            wtype,
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("warc-record-id"),
            headers.get("content-type"),
            status,
            http_ctype,
            body,
        )
        idx += 1
        pos = start + clen


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC segments -> one row per record, file-parallel."""
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        for b in batches:
            paths = b.column(0).to_pylist()
            contents = b.column(1).to_pylist()
            for p, c in zip(paths, contents):
                rows = list(parse_warc_bytes(p, c))
                if not rows:
                    continue
                cols = list(zip(*rows))
                yield pa.RecordBatch.from_pydict(
                    {name: list(col) for name, col in zip(_COLS, cols)},
                    schema=pa.schema(
                        [
                            ("path", pa.string()),
                            ("rec_index", pa.int64()),
                            ("warc_type", pa.string()),
                            ("url", pa.string()),
                            ("warc_date", pa.string()),
                            ("record_id", pa.string()),
                            ("content_type", pa.string()),
                            ("http_status", pa.int32()),
                            ("http_content_type", pa.string()),
                            ("body", pa.binary()),
                        ]
                    ),
                )

    return files.mapInArrow(parse, WARC_SCHEMA)


# ---------------------------------------------------------------------------
# encoder (round-trip tests + gate synthesis)
# ---------------------------------------------------------------------------


def encode_warc_record(
    *,
    warc_type: str,
    url: str | None = None,
    date: str = "2024-01-01T00:00:00Z",
    record_id: str = "<urn:uuid:0>",
    content: bytes = b"",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Date: " + date.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(content)).encode(),
    ]
    if url is not None:
        lines.insert(2, b"WARC-Target-URI: " + url.encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + content + b"\r\n\r\n"


def encode_http_response(
    body: bytes, *, status: int = 200, content_type: str = "text/html"
) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )


def encode_warc_file(records: list[bytes], *, gzip_members: bool = False) -> bytes:
    if not gzip_members:
        return b"".join(records)
    return b"".join(
        _gzip.compress(r, mtime=0) for r in records
    )
