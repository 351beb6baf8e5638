"""Table-driven unit tests for E9/E10 fuzzy date/time parsing
(FIXTURES.md §4; SURVEY.md §5.2 layer 1)."""

import datetime as dt

import pytest

from mre.core.fuzzydate import (FuzzyDate, FuzzyTime, parse_date,
                                parse_iso_datetime, parse_time,
                                to_datetime_utc)

D = FuzzyDate

DATE_CASES = [
    # ISO-8601
    ("2024-03-15", D(2024, 3, 15)),
    ("published 2024-03-15T10:30:00Z ok", D(2024, 3, 15)),
    ("2024-03-15T10:30:00+02:00", D(2024, 3, 15)),
    # day-monthname-year
    ("15 March 2024", D(2024, 3, 15)),
    ("15th March 2024", D(2024, 3, 15)),
    ("1st of May 2023", D(2023, 5, 1)),
    ("2nd June 2022", D(2022, 6, 2)),
    ("3rd Sept 2021", D(2021, 9, 3)),
    ("22nd Aug. 2020", D(2020, 8, 22)),
    ("Tuesday 15 March 2024", D(2024, 3, 15)),
    ("15 Mar 24", D(2024, 3, 15)),
    ("15 Mar 99", D(1999, 3, 15)),
    ("15 March", D(None, 3, 15)),          # partial: no year
    # monthname-day-year (US)
    ("March 15, 2024", D(2024, 3, 15)),
    ("Mar 15 2024", D(2024, 3, 15)),
    ("March 15th, 2024", D(2024, 3, 15)),
    ("March 15th", D(None, 3, 15)),        # partial
    # month-year
    ("March 2024", D(2024, 3, None)),
    ("in February 1995 it", D(1995, 2, None)),
    # numeric y-m-d
    ("2024/03/15", D(2024, 3, 15)),
    ("2024.03.15", D(2024, 3, 15)),
    # numeric d/m/y — dayfirst default
    ("03/04/2024", D(2024, 4, 3)),
    ("03/04/24", D(2024, 4, 3)),
    ("3-4-2024", D(2024, 4, 3)),
    ("03.04.24", D(2024, 4, 3)),
    # impossible dayfirst → flips to m/d
    ("04/15/2024", D(2024, 4, 15)),
    ("12/25/2023", D(2023, 12, 25)),
    # 2-digit year windowing
    ("25/12/69", D(2069, 12, 25)),
    ("25/12/70", D(1970, 12, 25)),
    # bare year
    ("sometime in 2019 probably", D(2019, None, None)),
    ("© 1998 Example", D(1998, None, None)),
    # junk → None
    ("", None),
    ("no date here", None),
    ("13/13/13", None),  # month 13 impossible both ways
    ("99/99/9999", None),
    ("0/0/2024", D(2024, None, None)),  # numeric invalid → bare-year cue
    # range-valid but calendar-invalid: kept partial-level, .date() is None
    ("2024-02-31", D(2024, 2, 31)),
    ("31st February 2024", D(2024, 2, 31)),
]


@pytest.mark.parametrize("s,expected", DATE_CASES)
def test_parse_date(s, expected):
    assert parse_date(s) == expected


def test_invalid_calendar_date_resolves_none():
    fd = parse_date("31st February 2024")
    assert fd is not None and fd.date() is None


def test_dayfirst_false():
    assert parse_date("03/04/2024", dayfirst=False) == D(2024, 3, 4)


TIME_CASES = [
    ("10:30", FuzzyTime(10, 30, None, None)),
    ("10:30:45", FuzzyTime(10, 30, 45, None)),
    ("2:30pm", FuzzyTime(14, 30, None, None)),
    ("2:30 PM", FuzzyTime(14, 30, None, None)),
    ("2.30pm", FuzzyTime(14, 30, None, None)),
    ("12:15am", FuzzyTime(0, 15, None, None)),
    ("12:15pm", FuzzyTime(12, 15, None, None)),
    ("9 pm", FuzzyTime(21, 0, None, None)),
    ("11 a.m.", FuzzyTime(11, 0, None, None)),
    ("noon", FuzzyTime(12, 0, None, None)),
    ("midday", FuzzyTime(12, 0, None, None)),
    ("midnight", FuzzyTime(0, 0, None, None)),
    ("10:30 GMT", FuzzyTime(10, 30, None, 0)),
    ("10:30 BST", FuzzyTime(10, 30, None, 60)),
    ("10:30 EST", FuzzyTime(10, 30, None, -300)),
    ("10:30+02:00", FuzzyTime(10, 30, None, 120)),
    ("10:30-0500", FuzzyTime(10, 30, None, -300)),
    ("no time", None),
    ("", None),
]


@pytest.mark.parametrize("s,expected", TIME_CASES)
def test_parse_time(s, expected):
    assert parse_time(s) == expected


ISO_DT_CASES = [
    ("2024-03-15T10:30:00Z", dt.datetime(2024, 3, 15, 10, 30, 0)),
    ("2024-03-15T10:30:00+02:00", dt.datetime(2024, 3, 15, 8, 30, 0)),
    ("2024-03-15T10:30:00-05:00", dt.datetime(2024, 3, 15, 15, 30, 0)),
    ("2024-03-15T23:30:00+02:00", dt.datetime(2024, 3, 15, 21, 30, 0)),
    ("2024-03-15", dt.datetime(2024, 3, 15, 0, 0, 0)),
    ("2024-03-15 10:30:00", dt.datetime(2024, 3, 15, 10, 30, 0)),
    ("garbage", None),
]


@pytest.mark.parametrize("s,expected", ISO_DT_CASES)
def test_parse_iso_datetime(s, expected):
    assert parse_iso_datetime(s) == expected


def test_merge_and_match():
    a = D(None, 3, 15)
    b = D(2024, 3, None)
    assert a.match(b)
    assert a.merge(b) == D(2024, 3, 15)
    assert not a.match(D(2024, 4, None))


def test_to_datetime_utc_tz_applied():
    out = to_datetime_utc(D(2024, 3, 15), FuzzyTime(10, 30, None, 120))
    assert out == dt.datetime(2024, 3, 15, 8, 30)


def test_to_datetime_partial_time_midnight():
    assert to_datetime_utc(D(2024, 3, 15), None) == dt.datetime(2024, 3, 15)


RELATIVE_CASES = [
    ("3 hours ago", dt.timedelta(hours=3)),
    ("posted 45 minutes ago", dt.timedelta(minutes=45)),
    ("an hour ago", dt.timedelta(hours=1)),
    ("a minute ago", dt.timedelta(minutes=1)),
    ("2 days ago", dt.timedelta(days=2)),
    ("1 week ago", dt.timedelta(weeks=1)),
    ("just now", dt.timedelta(0)),
    ("yesterday", dt.timedelta(days=1)),
    ("15 March 2024", None),
    ("ages ago", None),
    ("", None),
]


@pytest.mark.parametrize("s,expected", RELATIVE_CASES)
def test_parse_relative(s, expected):
    from mre.core.fuzzydate import parse_relative
    assert parse_relative(s) == expected
