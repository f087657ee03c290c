"""DateTools index strings + QueryParser date-resolved ranges
(document/DateTools.java:52,106-130; queryParser/QueryParser.java:709
getRangeQuery — VERDICT r4 missing #4)."""

import datetime as dt

import pytest

from lucene_spark.queries.datetools import (date_to_string, round_date,
                                            string_to_date)
from lucene_spark.queries.parser import parse_query
from lucene_spark.queries.ast import TermRange

D = dt.datetime(2004, 2, 3, 22, 8, 56, 333000)


def test_formats_per_resolution():
    # DateTools.java:106-130 format table
    assert date_to_string(D, "year") == "2004"
    assert date_to_string(D, "month") == "200402"
    assert date_to_string(D, "day") == "20040203"
    assert date_to_string(D, "hour") == "2004020322"
    assert date_to_string(D, "minute") == "200402032208"
    assert date_to_string(D, "second") == "20040203220856"
    assert date_to_string(D, "millisecond") == "20040203220856333"


def test_round_trip_and_rounding():
    for res in ("year", "month", "day", "hour", "minute", "second",
                "millisecond"):
        s = date_to_string(D, res)
        assert string_to_date(s) == round_date(D, res)
    with pytest.raises(ValueError):
        date_to_string(D, "week")
    with pytest.raises(ValueError):
        string_to_date("20")


def test_lexicographic_equals_chronological():
    times = [dt.datetime(2003, 12, 31, 23, 59), D,
             dt.datetime(2004, 2, 3, 22, 9), dt.datetime(2010, 1, 1)]
    ss = [date_to_string(t, "minute") for t in times]
    assert ss == sorted(ss)


def test_parser_date_range_resolution():
    q = parse_query("[2004-02-03 TO 2004-02-05]", date_resolution="day")
    assert isinstance(q, TermRange)
    assert q.lo == "20040203" and q.hi == "20040205"
    # US and EU slash/dot forms parse too (lenient SHORT-format analog)
    q = parse_query("[02/03/2004 TO 02/05/2004]", date_resolution="day")
    assert q.lo == "20040203" and q.hi == "20040205"
    q = parse_query("[03.02.2004 TO 05.02.2004]", date_resolution="day")
    assert q.lo == "20040203" and q.hi == "20040205"


def test_parser_inclusive_upper_covers_whole_day():
    q = parse_query("[2004-02-03 TO 2004-02-05]", date_resolution="second")
    assert isinstance(q, TermRange)
    assert q.lo == "20040203000000"
    assert q.hi == "20040205235959"  # 23:59:59 — the getRangeQuery rule
    # exclusive upper keeps the day's start
    q2 = parse_query("{2004-02-03 TO 2004-02-05}",
                     date_resolution="second")
    assert q2.hi == "20040205000000"


def test_non_dates_fall_through_and_default_off():
    q = parse_query("[apple TO pear]", date_resolution="day")
    assert isinstance(q, TermRange) and q.lo == "apple" and q.hi == "pear"
    q = parse_query("[2004-02-03 TO 2004-02-05]")  # no resolution set
    assert q.lo == "2004-02-03"
    # the call-scoped resolution does not leak into the next parse
    q = parse_query("[2004-02-03 TO 2004-02-05]")
    assert q.lo == "2004-02-03"
