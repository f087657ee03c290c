"""DateTools — index-format date strings whose lexicographic order is
chronological (document/DateTools.java:52).

``date_to_string(d, resolution)`` truncates to the resolution and formats
GMT digits (yyyy / yyyyMM / yyyyMMdd / yyyyMMddHH / +mm / +ss / +SSS —
DateTools.java:106-130), so TermRange over the strings equals a range
over the times. ``string_to_date`` inverts any resolution's format
(DateTools.java:158). Used by the query parser's date-range handling
(QueryParser.java:709 getRangeQuery → DateTools.dateToString) and usable
directly for indexing date keyword fields."""

from __future__ import annotations

import datetime as _dt

RESOLUTIONS = ("year", "month", "day", "hour", "minute", "second",
               "millisecond")
_FMT = {"year": "%Y", "month": "%Y%m", "day": "%Y%m%d",
        "hour": "%Y%m%d%H", "minute": "%Y%m%d%H%M",
        "second": "%Y%m%d%H%M%S"}
_LEN = {4: "year", 6: "month", 8: "day", 10: "hour", 12: "minute",
        14: "second", 17: "millisecond"}


def round_date(d: _dt.datetime, resolution: str) -> _dt.datetime:
    """Truncate to the resolution (DateTools.round — floor, GMT)."""
    if resolution not in RESOLUTIONS:
        raise ValueError(f"resolution must be one of {RESOLUTIONS}")
    r = resolution
    kw = {}
    if r == "year":
        kw = dict(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    elif r == "month":
        kw = dict(day=1, hour=0, minute=0, second=0, microsecond=0)
    elif r == "day":
        kw = dict(hour=0, minute=0, second=0, microsecond=0)
    elif r == "hour":
        kw = dict(minute=0, second=0, microsecond=0)
    elif r == "minute":
        kw = dict(second=0, microsecond=0)
    elif r == "second":
        kw = dict(microsecond=0)
    else:  # millisecond
        kw = dict(microsecond=(d.microsecond // 1000) * 1000)
    return d.replace(**kw)


def date_to_string(d: _dt.datetime, resolution: str = "day") -> str:
    d = round_date(d, resolution)
    if resolution == "millisecond":
        return d.strftime("%Y%m%d%H%M%S") + f"{d.microsecond // 1000:03d}"
    return d.strftime(_FMT[resolution])


def string_to_date(s: str) -> _dt.datetime:
    res = _LEN.get(len(s))
    if res is None:
        raise ValueError(f"not a DateTools string: {s!r}")
    if res == "millisecond":
        base = _dt.datetime.strptime(s[:14], "%Y%m%d%H%M%S")
        return base.replace(microsecond=int(s[14:]) * 1000)
    return _dt.datetime.strptime(s, _FMT[res])
