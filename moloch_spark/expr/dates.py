"""Relative/absolute date parsing with moment.js-compatible semantics.

Mirrors parseSeconds/str2format (viewer/molochparser.jison:836-895):
  * "-5d", "+2h" ..... now +/- N units
  * "-5d@h" .......... snap to start of unit AFTER snapping, then add
                       (moment: startOf(snap) happens BEFORE the add)
  * "@w3" ............ start of week (Sunday, moment en locale), then
                       set day-of-week to 3 (Wednesday)
  * bare "@h" ........ start of current hour
  * absolute ......... "YYYY/MM/DD HH:mm:ss" (+ optional zone) or ISO8601
Returns unix epoch seconds (int).
"""

from __future__ import annotations

import datetime as dt
import re

_UNITS = [
    (r"^(s|sec|secs|second|seconds)$", "seconds"),
    (r"^(m|min|mins|minute|minutes)$", "minutes"),
    (r"^(h|hr|hrs|hour|hours)$", "hours"),
    (r"^(d|day|days)$", "days"),
    (r"^(w|week|weeks)\d*$", "weeks"),
    (r"^(M|mon|mons|month|months)$", "months"),
    (r"^(q|qtr|qtrs|quarter|quarters)$", "quarters"),
    (r"^(y|yr|yrs|year|years)$", "years"),
]


def str2format(s: str) -> str | None:
    for pat, name in _UNITS:
        if re.match(pat, s):
            return name
    return None


def _start_of(d: dt.datetime, unit: str) -> dt.datetime:
    if unit == "seconds":
        return d.replace(microsecond=0)
    if unit == "minutes":
        return d.replace(second=0, microsecond=0)
    if unit == "hours":
        return d.replace(minute=0, second=0, microsecond=0)
    if unit == "days":
        return d.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "weeks":
        # moment startOf('week') = Sunday in the default (en) locale
        day0 = d.replace(hour=0, minute=0, second=0, microsecond=0)
        dow = (day0.weekday() + 1) % 7  # Sunday=0
        return day0 - dt.timedelta(days=dow)
    if unit == "months":
        return d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "quarters":
        month = 3 * ((d.month - 1) // 3) + 1
        return d.replace(month=month, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "years":
        return d.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    raise ValueError(f"unknown unit {unit}")


def _add(d: dt.datetime, n: int, unit: str) -> dt.datetime:
    if unit == "seconds":
        return d + dt.timedelta(seconds=n)
    if unit == "minutes":
        return d + dt.timedelta(minutes=n)
    if unit == "hours":
        return d + dt.timedelta(hours=n)
    if unit == "days":
        return d + dt.timedelta(days=n)
    if unit == "weeks":
        return d + dt.timedelta(weeks=n)
    if unit in ("months", "quarters", "years"):
        months = n * {"months": 1, "quarters": 3, "years": 12}[unit]
        total = d.month - 1 + months
        year = d.year + total // 12
        month = total % 12 + 1
        # moment clamps the day to the target month's length
        last = [31, 29 if _leap(year) else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][
            month - 1
        ]
        return d.replace(year=year, month=month, day=min(d.day, last))
    raise ValueError(f"unknown unit {unit}")


def _leap(y: int) -> bool:
    return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)


def _set_weekday(d: dt.datetime, n: int) -> dt.datetime:
    """moment .day(n): set day-of-week within the current week (Sunday=0)."""
    dow = (d.weekday() + 1) % 7
    return d + dt.timedelta(days=n - dow)


def parse_seconds(s: str, now: dt.datetime | None = None) -> int:
    s = s.strip().strip('"')
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)

    m = re.match(r"^([+-])(\d*)([a-z]*)([@]*)([a-z0-9]*)", s)
    if m and (m.group(2) or str2format(m.group(3) or "")):
        d = now
        fmt = str2format(m.group(3)) if m.group(3) else None
        snap = str2format(m.group(5)) if m.group(5) else None
        n = int(m.group(2)) if m.group(2) else 1
        if snap:
            d = _start_of(d, snap)
            wk = re.match(r"^(w|week|weeks)(\d+)$", m.group(5))
            if wk:
                d = _set_weekday(d, int(wk.group(2)))
        if fmt:
            d = _add(d, -n if m.group(1) == "-" else n, fmt)
        return int(d.timestamp() if d.tzinfo else d.replace(tzinfo=dt.timezone.utc).timestamp())

    m = re.match(r"^@([a-z0-9]+)", s)
    if m:
        snap = str2format(m.group(1))
        if snap is None:
            raise ValueError(f"unknown snap unit {m.group(1)!r}")
        d = _start_of(now, snap)
        wk = re.match(r"^(w|week|weeks)(\d+)$", m.group(1))
        if wk:
            d = _set_weekday(d, int(wk.group(2)))
        return int(d.replace(tzinfo=dt.timezone.utc).timestamp())

    # absolute: "YYYY/MM/DD HH:mm:ss" family, then ISO8601; bare epoch numbers
    if re.fullmatch(r"\d+", s):
        return int(s)
    for fmt in ("%Y/%m/%d %H:%M:%S", "%Y/%m/%d %H:%M", "%Y/%m/%d"):
        try:
            d = dt.datetime.strptime(s, fmt)
            return int(d.replace(tzinfo=dt.timezone.utc).timestamp())
        except ValueError:
            pass
    d = dt.datetime.fromisoformat(s)
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp())
