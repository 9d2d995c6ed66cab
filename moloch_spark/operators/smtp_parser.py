"""SMTP session parser — sixth exemplar field extractor
(ref capture/parsers/smtp.c: EHLO/MAIL FROM/RCPT TO envelope plus the
DATA section's Subject/From/To headers into email.* session fields).

Text line protocol: the client stream parses line-at-a-time like the
reference's state machine, envelope commands case-insensitively, DATA
headers up to the first blank line. Same Arrow-batched scan-side shape
as the other parsers; hostile input never throws.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SMTP_SCHEMA = (
    "helo string, mail_from string, rcpt_to array<string>, "
    "subject string, hdr_from string, hdr_to string, "
    "has_data boolean, parse_error string"
)

_EMPTY = {
    "helo": None, "mail_from": None, "rcpt_to": [],
    "subject": None, "hdr_from": None, "hdr_to": None,
    "has_data": False, "parse_error": None,
}

_ADDR = re.compile(r"<([^>]*)>")


def parse_smtp(buf: bytes) -> dict:
    """Client-side SMTP stream -> envelope + DATA header fields."""
    out = dict(_EMPTY)
    try:
        text = buf.decode("utf-8", "replace")
        lines = text.replace("\r\n", "\n").split("\n")
        rcpt: list[str] = []
        in_data = False
        saw_cmd = False
        for ln in lines:
            if in_data:
                if ln == "":
                    break  # end of DATA headers
                low = ln.lower()
                if low.startswith("subject:"):
                    out["subject"] = ln[8:].strip()
                elif low.startswith("from:"):
                    out["hdr_from"] = ln[5:].strip()
                elif low.startswith("to:"):
                    out["hdr_to"] = ln[3:].strip()
                continue
            up = ln.upper()
            if up.startswith(("HELO ", "EHLO ")):
                out["helo"] = ln[5:].strip()
                saw_cmd = True
            elif up.startswith("MAIL FROM:"):
                m = _ADDR.search(ln)
                out["mail_from"] = m.group(1) if m else ln[10:].strip()
                saw_cmd = True
            elif up.startswith("RCPT TO:"):
                m = _ADDR.search(ln)
                rcpt.append(m.group(1) if m else ln[8:].strip())
                saw_cmd = True
            elif up.strip() == "DATA":
                in_data = True
                out["has_data"] = True
                saw_cmd = True
        out["rcpt_to"] = rcpt
        if not saw_cmd:
            raise ValueError("no SMTP commands")
    except ValueError as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_smtp(
    *,
    helo: str = "client.example",
    mail_from: str = "a@example.com",
    rcpt: tuple[str, ...] = ("b@example.com",),
    subject: str = "hello",
) -> bytes:
    """Minimal client-stream encoder (test/gate synthesis helper)."""
    lines = [f"EHLO {helo}", f"MAIL FROM:<{mail_from}>"]
    lines += [f"RCPT TO:<{r}>" for r in rcpt]
    lines += ["DATA", f"From: <{mail_from}>", f"Subject: {subject}", "", "body text", "."]
    return ("\r\n".join(lines) + "\r\n").encode()


def encode_smtp_udf(**fixed):
    """Lazy pandas-UDF factory: (mail_from_col, subject_col) -> stream
    bytes; unless overridden, the sender is echoed as the sole recipient
    (gate-synthesis helper)."""

    @F.pandas_udf("binary")
    def encode(mail_from: pd.Series, subject: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_smtp(
                    mail_from=str(m),
                    subject=str(s),
                    rcpt=fixed.get("rcpt", (str(m),)),
                    **{k: v for k, v in fixed.items() if k != "rcpt"},
                )
                for m, s in zip(mail_from, subject)
            ]
        )

    return encode


def parse_smtp_df(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    prefix: str = "smtp_",
) -> DataFrame:
    """Parse an SMTP payload column into typed smtp_* field columns."""

    @F.pandas_udf(SMTP_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_smtp(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_smtp", parse(F.col(payload_col)))
    for name in (
        "helo", "mail_from", "rcpt_to", "subject", "hdr_from", "hdr_to",
        "has_data", "parse_error",
    ):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_smtp.{name}"))
    return out.drop("_smtp")
