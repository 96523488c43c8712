"""DateTools (core/document/DateTools.java): dates as sortable,
resolution-truncated strings for term-indexing and range queries.

Reference semantics: ``dateToString(date, resolution)`` formats the
UTC instant as a prefix of ``yyyyMMddHHmmssSSS`` — YEAR keeps 4 chars,
MONTH 6, DAY 8, HOUR 10, MINUTE 12, SECOND 14, MILLISECOND 17 — so
string order equals time order at every resolution and a coarser
resolution is a PREFIX of a finer one (DateTools.java:174-200 formatLen
table). ``round`` truncates an instant down to its resolution;
``stringToDate`` parses any of the seven widths back.

Spark mapping: ``date_to_string_column`` is one ``date_format`` in UTC
(JVM, codegen) — the encoded column sorts/ranges exactly like the
term strings the reference indexes; ``round_column`` is ``date_trunc``.
Python twins handle query-side literals.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, functions as F

_FORMATS = {
    "year": "yyyy",
    "month": "yyyyMM",
    "day": "yyyyMMdd",
    "hour": "yyyyMMddHH",
    "minute": "yyyyMMddHHmm",
    "second": "yyyyMMddHHmmss",
    "millisecond": "yyyyMMddHHmmssSSS",
}
_PY_FORMATS = {
    4: "%Y", 6: "%Y%m", 8: "%Y%m%d", 10: "%Y%m%d%H",
    12: "%Y%m%d%H%M", 14: "%Y%m%d%H%M%S", 17: "%Y%m%d%H%M%S",
}
# date_trunc unit per resolution (Spark + reference round() agree:
# truncate every finer field to its floor)
_TRUNC = {
    "year": "year", "month": "month", "day": "day", "hour": "hour",
    "minute": "minute", "second": "second", "millisecond": "millisecond",
}

RESOLUTIONS = tuple(_FORMATS)


def date_to_string(d: _dt.datetime, resolution: str) -> str:
    """DateTools.dateToString (DateTools.java:78): UTC, truncated to
    the resolution's format length. Naive datetimes are taken as UTC
    (the reference formats in GMT)."""
    fmt = _FORMATS[resolution]
    if d.tzinfo is not None:
        d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    s = d.strftime("%Y%m%d%H%M%S") + f"{d.microsecond // 1000:03d}"
    return s[: len(fmt)]


def time_to_string(ms: int, resolution: str) -> str:
    """DateTools.timeToString: epoch millis -> encoded string."""
    d = _dt.datetime.fromtimestamp(ms / 1000.0, _dt.timezone.utc)
    d = d.replace(microsecond=(ms % 1000) * 1000)
    return date_to_string(d, resolution)


def string_to_date(s: str) -> _dt.datetime:
    """DateTools.stringToDate (DateTools.java:115): any of the seven
    widths; absent fields floor (month/day to 1, times to 0)."""
    if len(s) not in _PY_FORMATS:
        raise ValueError(f"not a DateTools string: {s!r}")
    d = _dt.datetime.strptime(s[:14], _PY_FORMATS[len(s)])
    if len(s) == 17:
        d = d.replace(microsecond=int(s[14:17]) * 1000)
    return d.replace(tzinfo=_dt.timezone.utc)


def round_time(ms: int, resolution: str) -> int:
    """DateTools.round(long) (DateTools.java:146): floor the instant
    to its resolution, in epoch millis."""
    d = _dt.datetime.fromtimestamp(ms / 1000.0, _dt.timezone.utc)
    d = d.replace(microsecond=(ms % 1000) * 1000)
    floors = {
        "year": dict(month=1, day=1, hour=0, minute=0, second=0,
                     microsecond=0),
        "month": dict(day=1, hour=0, minute=0, second=0, microsecond=0),
        "day": dict(hour=0, minute=0, second=0, microsecond=0),
        "hour": dict(minute=0, second=0, microsecond=0),
        "minute": dict(second=0, microsecond=0),
        "second": dict(microsecond=0),
        "millisecond": dict(microsecond=(d.microsecond // 1000) * 1000),
    }
    f = d.replace(**floors[resolution])
    return int(f.timestamp()) * 1000 + f.microsecond // 1000


def date_to_string_column(ts: Column, resolution: str) -> Column:
    """Encode a timestamp column — one JVM date_format (the engine
    session pins spark.sql.session.timeZone=UTC, session.py:70, so the
    rendered digits are the reference's GMT digits)."""
    return F.date_format(ts, _FORMATS[resolution])


def round_column(ts: Column, resolution: str) -> Column:
    """DateTools.round as a Column (date_trunc)."""
    return F.date_trunc(_TRUNC[resolution], ts)


def date_range(col_encoded: Column, lo: str, hi: str) -> Column:
    """TermRangeQuery over encoded date strings (the idiom
    DateTools.java's class doc prescribes: index the encoded term, use
    string ranges). A coarser encoding is a PREFIX of a finer one, so a
    coarser inclusive upper bound extends with '9' padding — every
    instant inside that coarser period has an encoding <= the padded
    bound, and all encoded chars are digits."""
    return (col_encoded >= F.lit(lo)) & (
        col_encoded <= F.lit(hi.ljust(17, "9")[: 17])
    )
