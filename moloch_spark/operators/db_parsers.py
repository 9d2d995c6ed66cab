"""Database wire-protocol parsers — exemplars thirteen and fourteen.

MySQL (ref capture/parsers/mysql.c:29-116): server greeting carries the
NUL-terminated version string at offset 5 (protocol byte 0x0a); the
client login packet carries the username at offset 36, lowercased like
the reference's string_add_lower, with printable-only validation and
the CLIENT_SSL capability bit at byte5 & 0x08.

PostgreSQL (ref capture/parsers/postgresql.c:28-82): startup message =
u32 length, u32 version (major 3), then NUL-terminated key/value pairs
(user / database / application_name); the 8-byte SSLRequest magic
00 00 00 08 04 d2 16 2f classifies without fields.

Same Arrow-batched scan-side shape as the other parsers; hostile input
never throws.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MYSQL_SCHEMA = (
    "version string, user string, client_ssl boolean, parse_error string"
)

_MYSQL_EMPTY = {
    "version": None, "user": None, "client_ssl": None, "parse_error": None,
}


def parse_mysql(server_buf: bytes, client_buf: bytes | None = None) -> dict:
    """Server greeting (+ optional client login) -> version/user (total)."""
    out = dict(_MYSQL_EMPTY)
    try:
        if len(server_buf) < 6 or server_buf[4] != 0x0A:
            raise ValueError("not a MySQL greeting")
        nul = server_buf.find(b"\x00", 5)
        if nul <= 5:
            raise ValueError("empty/unterminated version")
        ver = server_buf[5:nul]
        if not all(0x20 <= b < 0x7F for b in ver):
            raise ValueError("non-printable version")
        out["version"] = ver.decode("ascii")
        if client_buf and len(client_buf) >= 36:
            # ref mysql.c:42: length must fit one byte, seq <= 2
            if client_buf[1] or client_buf[2] or client_buf[3] > 2:
                raise ValueError("bad login packet framing")
            out["client_ssl"] = bool(client_buf[5] & 0x08)
            nul = client_buf.find(b"\x00", 36)
            end = nul if nul >= 0 else len(client_buf)
            user = client_buf[36:end]
            if any(b < 0x20 or b >= 0x7F for b in user):
                raise ValueError("non-printable user")
            if user:
                out["user"] = user.decode("ascii").lower()
    except (ValueError, IndexError) as exc:
        out = dict(_MYSQL_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_mysql_greeting(*, version: str = "8.0.33") -> bytes:
    body = b"\x0a" + version.encode() + b"\x00" + b"\x00" * 20
    return struct.pack("<I", len(body))[:3] + b"\x00" + body


def encode_mysql_login(*, user: str = "root", ssl: bool = False) -> bytes:
    caps = 0x0800 if ssl else 0x0000  # CLIENT_SSL is bit 11 -> byte5 & 0x08
    body = struct.pack("<I", caps) + struct.pack("<I", 1 << 24) + b"\x2d"
    body += b"\x00" * 23  # filler to put user at offset 36
    body += user.encode() + b"\x00"
    hdr = struct.pack("<I", len(body))[:3] + b"\x01"
    pkt = hdr + body
    assert pkt.find(user.encode()) == 36
    return pkt


POSTGRESQL_SCHEMA = (
    "pg_user string, pg_database string, pg_application string, "
    "is_sslrequest boolean, parse_error string"
)

_PG_EMPTY = {
    "pg_user": None, "pg_database": None, "pg_application": None,
    "is_sslrequest": False, "parse_error": None,
}

_SSL_REQUEST = b"\x00\x00\x00\x08\x04\xd2\x16\x2f"


def parse_postgresql(buf: bytes) -> dict:
    """Startup message -> user/database/application_name (total)."""
    out = dict(_PG_EMPTY)
    try:
        if buf == _SSL_REQUEST:
            out["is_sslrequest"] = True
            return out
        if len(buf) < 16:
            raise ValueError("short startup message")
        plen, version = struct.unpack(">II", buf[:8])
        if plen > len(buf) or plen < 16:
            raise ValueError("bad startup length")
        if version >> 16 != 3:
            raise ValueError("unsupported protocol major")
        pos = 8
        while pos < plen and buf[pos] != 0:
            knul = buf.find(b"\x00", pos, plen)
            if knul < 0:
                break
            vnul = buf.find(b"\x00", knul + 1, plen)
            if vnul < 0:
                break
            key = buf[pos:knul].decode("utf-8", "replace")
            val = buf[knul + 1 : vnul].decode("utf-8", "replace")
            if key == "user":
                out["pg_user"] = val
            elif key == "database":
                out["pg_database"] = val
            elif key == "application_name":
                out["pg_application"] = val
            pos = vnul + 1
        if out["pg_user"] is None:
            raise ValueError("startup without user")
    except (ValueError, IndexError) as exc:
        out = dict(_PG_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_pg_startup(
    *,
    user: str = "alice",
    database: str | None = "app_db",
    application: str | None = "psql",
) -> bytes:
    kv = b"user\x00" + user.encode() + b"\x00"
    if database is not None:
        kv += b"database\x00" + database.encode() + b"\x00"
    if application is not None:
        kv += b"application_name\x00" + application.encode() + b"\x00"
    kv += b"\x00"
    plen = 8 + len(kv)
    return struct.pack(">II", plen, 3 << 16) + kv


def encode_mysql_udf(**fixed):
    """(version_col, user_col) -> (greeting, login) struct of binaries."""

    @F.pandas_udf("greeting binary, login binary")
    def encode(version: pd.Series, user: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "greeting": [
                    encode_mysql_greeting(version=str(v)) for v in version
                ],
                "login": [
                    encode_mysql_login(user=str(u), ssl=fixed.get("ssl", False))
                    for u in user
                ],
            }
        )

    return encode


def encode_pg_udf(**fixed):
    """(user_col, database_col) -> startup bytes."""

    @F.pandas_udf("binary")
    def encode(user: pd.Series, database: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_pg_startup(
                    user=str(u), database=str(d),
                    application=fixed.get("application", "psql"),
                )
                for u, d in zip(user, database)
            ]
        )

    return encode


def parse_mysql_df(
    df: DataFrame,
    *,
    server_col: str = "server_payload",
    client_col: str = "client_payload",
    prefix: str = "mysql_",
) -> DataFrame:
    """Parse MySQL handshake payload columns into typed mysql_* fields."""

    @F.pandas_udf(MYSQL_SCHEMA)
    def parse(server: pd.Series, client: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [
                parse_mysql(
                    bytes(s) if s is not None else b"",
                    bytes(c) if c is not None else None,
                )
                for s, c in zip(server, client)
            ]
        )

    out = df.withColumn("_my", parse(F.col(server_col), F.col(client_col)))
    for name in ("version", "user", "client_ssl", "parse_error"):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_my.{name}"))
    return out.drop("_my")


def parse_postgresql_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = ""
) -> DataFrame:
    """Parse a PostgreSQL startup payload column into typed pg_* fields."""

    @F.pandas_udf(POSTGRESQL_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [
                parse_postgresql(bytes(v)) if v is not None else dict(_PG_EMPTY)
                for v in col
            ]
        )

    out = df.withColumn("_pg", parse(F.col(payload_col)))
    for name in (
        "pg_user", "pg_database", "pg_application", "is_sslrequest",
        "parse_error",
    ):
        out = out.withColumn(f"{prefix}{name}" if prefix else name, F.col(f"_pg.{name}"))
    return out.drop("_pg")
