"""HTTP message parser — second exemplar protocol field extractor
(ref capture/parsers/http.c:829-1042: http_parser callbacks filling
http.method / http.uri / http.host / http.useragent / http.statuscode
/ http.bodyMagic onto the session).

Same Spark shape as dns_parser: payload bytes stream through one
Arrow-batched UDF doing pure per-row parsing (scan-parallel, no
shuffle). Handles request and response messages, header folding is NOT
supported (obsolete per RFC 7230), hostile input never throws.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HTTP_SCHEMA = (
    "kind string, method string, uri string, version string, "
    "status_code bigint, host string, user_agent string, "
    "content_type string, content_length bigint, header_cnt bigint, "
    "body_len bigint, parse_error string"
)

_METHODS = {
    b"GET", b"POST", b"PUT", b"DELETE", b"HEAD", b"OPTIONS", b"PATCH",
    b"TRACE", b"CONNECT", b"PROPFIND", b"REPORT",  # http.c method list
}

_EMPTY = {
    "kind": None, "method": None, "uri": None, "version": None,
    "status_code": None, "host": None, "user_agent": None,
    "content_type": None, "content_length": None, "header_cnt": None,
    "body_len": None, "parse_error": None,
}


def parse_http_message(buf: bytes) -> dict:
    """One HTTP/1.x message (request or response) -> field dict."""
    out = dict(_EMPTY)
    try:
        head, sep, body = buf.partition(b"\r\n\r\n")
        if not sep:
            head, sep, body = buf.partition(b"\n\n")
        lines = head.replace(b"\r\n", b"\n").split(b"\n")
        if not lines or not lines[0]:
            raise ValueError("empty message")
        start = lines[0]
        parts = start.split(b" ", 2)
        if start.startswith(b"HTTP/"):
            if len(parts) < 2:
                raise ValueError("bad status line")
            out["kind"] = "response"
            out["version"] = parts[0].decode("ascii", "replace")
            out["status_code"] = int(parts[1])
        else:
            if len(parts) != 3 or parts[0] not in _METHODS:
                raise ValueError("bad request line")
            out["kind"] = "request"
            out["method"] = parts[0].decode("ascii")
            out["uri"] = parts[1].decode("utf-8", "replace")
            out["version"] = parts[2].decode("ascii", "replace")
        n_hdrs = 0
        for ln in lines[1:]:
            if not ln:
                continue
            name, colon, value = ln.partition(b":")
            if not colon:
                raise ValueError(f"bad header line {ln[:30]!r}")
            n_hdrs += 1
            key = name.strip().lower()
            val = value.strip()
            if key == b"host":
                out["host"] = val.decode("utf-8", "replace")
            elif key == b"user-agent":
                out["user_agent"] = val.decode("utf-8", "replace")
            elif key == b"content-type":
                out["content_type"] = val.decode("utf-8", "replace")
            elif key == b"content-length":
                out["content_length"] = int(val)
        out["header_cnt"] = n_hdrs
        out["body_len"] = len(body) if sep else 0
    except (ValueError, IndexError) as exc:
        # keep whatever parsed BEFORE the error (http.c's callback model:
        # one junk header must not discard an already-extracted
        # method/uri/host from real dirty traffic)
        out["parse_error"] = str(exc)[:120]
    return out


def parse_http(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    hex_input: bool = False,
    prefix: str = "http_",
) -> DataFrame:
    """Parse an HTTP payload column into typed http_* field columns."""

    @F.pandas_udf(HTTP_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        rows = []
        for v in col:
            if v is None:
                rows.append(parse_http_message(b""))
            elif hex_input:
                try:
                    rows.append(parse_http_message(bytes.fromhex(str(v))))
                except ValueError:
                    rows.append(parse_http_message(b""))
            else:
                rows.append(parse_http_message(bytes(v)))
        return pd.DataFrame(rows)

    out = df.withColumn("_http", parse(F.col(payload_col)))
    for name in (
        "kind", "method", "uri", "version", "status_code", "host",
        "user_agent", "content_type", "content_length", "header_cnt",
        "body_len", "parse_error",
    ):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_http.{name}"))
    return out.drop("_http")
