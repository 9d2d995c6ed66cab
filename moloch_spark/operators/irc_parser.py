"""IRC parser — eighth exemplar field extractor
(ref capture/parsers/irc.c:26-86: NICK and JOIN tokens from the client
stream, token ends at space/CR/LF; classification rejects server
notices and FTP-lookalike USER lines).

Text line protocol over the client direction only (ref `which == 1`
early-return). Same Arrow-batched scan-side shape as the other
parsers; hostile input never throws.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IRC_SCHEMA = "nick string, channels array<string>, parse_error string"

_EMPTY = {"nick": None, "channels": [], "parse_error": None}


def parse_irc(buf: bytes) -> dict:
    """Client-side IRC stream -> nick + joined channels (total)."""
    out = dict(_EMPTY)
    try:
        if len(buf) < 8:
            raise ValueError("short stream")
        # ref irc.c classify: leading ':' without NOTICE = server stream
        if buf[:1] == b":" and b" NOTICE " not in buf:
            raise ValueError("server-direction stream")
        # USER without NICK/+iw is FTP, not IRC (ref irc.c:104-106)
        if buf[:1] == b"U" and b"\nNICK " not in buf and b" +iw " not in buf:
            raise ValueError("USER without NICK: likely FTP")
        text = buf.decode("utf-8", "replace")
        channels: list[str] = []
        for raw in text.split("\n"):
            line = raw.strip("\x00").rstrip("\r")
            # token ends at space / CR / LF, exactly like the BSB walk
            if line.startswith("NICK "):
                tok = line[5:].split(" ", 1)[0]
                if tok:
                    out["nick"] = tok  # last one wins, ref re-adds per line
            elif line.startswith("JOIN "):
                tok = line[5:].split(" ", 1)[0]
                if tok:
                    channels.append(tok)
        out["channels"] = channels
        if out["nick"] is None and not channels:
            raise ValueError("no IRC commands")
    except ValueError as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_irc(
    *, nick: str = "alice", channels: tuple[str, ...] = ("#spark",)
) -> bytes:
    """Minimal client stream (test/gate synthesis helper)."""
    lines = [f"NICK {nick}", f"USER {nick} 0 * :{nick}"]
    lines += [f"JOIN {c}" for c in channels]
    return ("\r\n".join(lines) + "\r\n").encode()


def encode_irc_udf(**fixed):
    """(nick_col, channel_col) -> stream bytes (gate-synthesis helper)."""

    @F.pandas_udf("binary")
    def encode(nick: pd.Series, channel: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_irc(nick=str(n), channels=fixed.get("channels", (str(c),)))
                for n, c in zip(nick, channel)
            ]
        )

    return encode


def parse_irc_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "irc_"
) -> DataFrame:
    """Parse an IRC payload column into typed irc_* field columns."""

    @F.pandas_udf(IRC_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_irc(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_irc", parse(F.col(payload_col)))
    for name in ("nick", "channels", "parse_error"):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_irc.{name}"))
    return out.drop("_irc")
