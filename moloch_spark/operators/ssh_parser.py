"""SSH protocol parser + HASSH fingerprint — fifth exemplar field
extractor (ref capture/parsers/ssh.c: version banner into ssh.ver,
KEXINIT algorithm lists into the hassh client fingerprint).

HASSH is the public Salesforce algorithm: md5 over the semicolon-joined
KEXINIT name-lists "kex;ciphers_c2s;macs_c2s;compression_c2s". The
banner is a text line; KEXINIT is a binary packet of length-prefixed
comma-separated name-lists. Same Arrow-batched scan-side shape as the
other parsers; hostile input never throws.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SSH_SCHEMA = (
    "banner string, version string, software string, "
    "kex_algos array<string>, ciphers_c2s array<string>, "
    "hassh_string string, hassh string, parse_error string"
)

_EMPTY = {
    "banner": None, "version": None, "software": None,
    "kex_algos": [], "ciphers_c2s": [],
    "hassh_string": None, "hassh": None, "parse_error": None,
}


def _name_list(buf: bytes, off: int) -> tuple[list[str], int]:
    if off + 4 > len(buf):
        raise ValueError("truncated name-list length")
    (n,) = struct.unpack(">I", buf[off : off + 4])
    off += 4
    if off + n > len(buf):
        raise ValueError("truncated name-list")
    raw = buf[off : off + n].decode("ascii", "replace")
    return ([] if not raw else raw.split(",")), off + n


def parse_ssh(buf: bytes) -> dict:
    """Banner line and, if present, the KEXINIT packet following it ->
    field dict + HASSH (client side)."""
    out = dict(_EMPTY)
    try:
        nl = buf.find(b"\n")
        if nl < 0 or not buf.startswith(b"SSH-"):
            raise ValueError("no SSH banner")
        banner = buf[:nl].rstrip(b"\r").decode("ascii", "replace")
        out["banner"] = banner
        parts = banner.split("-", 2)
        if len(parts) < 3:
            raise ValueError("bad banner form")
        out["version"] = parts[1]
        out["software"] = parts[2].split(" ")[0]
        rest = buf[nl + 1 :]
        if len(rest) >= 6:
            # binary packet: uint32 length, byte padding_len, payload
            (plen,) = struct.unpack(">I", rest[:4])
            pad = rest[4]
            payload = rest[5 : 5 + plen - pad - 1]
            if payload[:1] == b"\x14":  # SSH_MSG_KEXINIT
                off = 1 + 16  # msg type + cookie
                kex, off = _name_list(payload, off)
                _hostkey, off = _name_list(payload, off)
                enc_c2s, off = _name_list(payload, off)
                _enc_s2c, off = _name_list(payload, off)
                mac_c2s, off = _name_list(payload, off)
                _mac_s2c, off = _name_list(payload, off)
                comp_c2s, off = _name_list(payload, off)
                out["kex_algos"] = kex
                out["ciphers_c2s"] = enc_c2s
                hs = ";".join(
                    [",".join(kex), ",".join(enc_c2s), ",".join(mac_c2s), ",".join(comp_c2s)]
                )
                out["hassh_string"] = hs
                out["hassh"] = hashlib.md5(hs.encode()).hexdigest()
    except (ValueError, IndexError, struct.error) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_kexinit(
    *,
    banner: str = "SSH-2.0-OpenSSH_9.6",
    kex: tuple[str, ...] = ("curve25519-sha256", "ecdh-sha2-nistp256"),
    enc: tuple[str, ...] = ("chacha20-poly1305@openssh.com", "aes128-ctr"),
    mac: tuple[str, ...] = ("hmac-sha2-256",),
    comp: tuple[str, ...] = ("none",),
) -> bytes:
    """Minimal banner + KEXINIT encoder (test/gate synthesis helper)."""

    def nl(names: tuple[str, ...]) -> bytes:
        raw = ",".join(names).encode()
        return struct.pack(">I", len(raw)) + raw

    payload = (
        b"\x14" + b"\x00" * 16
        + nl(kex) + nl(("ssh-ed25519",))
        + nl(enc) + nl(enc) + nl(mac) + nl(mac) + nl(comp) + nl(comp)
        + nl(()) + nl(())  # languages
        + b"\x00" + b"\x00\x00\x00\x00"  # first_kex_follows + reserved
    )
    pad = 4
    pkt = struct.pack(">I", len(payload) + pad + 1) + bytes([pad]) + payload + b"\x00" * pad
    return banner.encode() + b"\r\n" + pkt


def parse_ssh_df(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    prefix: str = "ssh_",
) -> DataFrame:
    """Parse an SSH payload column into typed ssh_* field columns."""

    @F.pandas_udf(SSH_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_ssh(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_ssh", parse(F.col(payload_col)))
    for name in (
        "banner", "version", "software", "kex_algos", "ciphers_c2s",
        "hassh_string", "hassh", "parse_error",
    ):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_ssh.{name}"))
    return out.drop("_ssh")


def encode_kexinit_udf(**fixed):
    """Lazy pandas-UDF factory: (software_col) -> banner+KEXINIT bytes
    with the given fixed algorithm config (gate-synthesis helper)."""

    @F.pandas_udf("binary")
    def encode(software: pd.Series) -> pd.Series:
        return pd.Series(
            [encode_kexinit(banner=f"SSH-2.0-{s}", **fixed) for s in software]
        )

    return encode
