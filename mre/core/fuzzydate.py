"""E9/E10 — fuzzy partial date & time parsing (SURVEY.md §2A).

Re-creates the semantics of the reference's fuzzydate module
[PUB:fuzzydate.parse_date / parse_time]: scan free text for date/time cues,
return *partial* records (each field optionally None), merge partials, and
resolve dd/mm-vs-mm/dd ambiguity with a dayfirst preference (the reference
has UK-news lineage) that flips only when the dayfirst reading is impossible
(month > 12).

All regexes compile at module import — once per Python worker process
(SURVEY.md §4.3).
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass
from typing import Optional

# --- data types -------------------------------------------------------------


@dataclass(frozen=True)
class FuzzyDate:
    year: Optional[int] = None
    month: Optional[int] = None
    day: Optional[int] = None

    def complete(self) -> bool:
        return self.year is not None and self.month is not None \
            and self.day is not None

    def empty(self) -> bool:
        return self.year is None and self.month is None and self.day is None

    def merge(self, other: "FuzzyDate") -> "FuzzyDate":
        """Fill this partial's gaps from ``other`` (self wins conflicts)."""
        return FuzzyDate(
            self.year if self.year is not None else other.year,
            self.month if self.month is not None else other.month,
            self.day if self.day is not None else other.day,
        )

    def match(self, other: "FuzzyDate") -> bool:
        """Non-conflicting: every field present in both is equal."""
        for a, b in ((self.year, other.year), (self.month, other.month),
                     (self.day, other.day)):
            if a is not None and b is not None and a != b:
                return False
        return True

    def date(self) -> Optional[_dt.date]:
        if not self.complete():
            return None
        try:
            return _dt.date(self.year, self.month, self.day)
        except ValueError:
            return None


@dataclass(frozen=True)
class FuzzyTime:
    hour: Optional[int] = None
    minute: Optional[int] = None
    second: Optional[int] = None
    tzoffset_min: Optional[int] = None  # minutes east of UTC

    def empty(self) -> bool:
        return self.hour is None

    def time(self) -> Optional[_dt.time]:
        if self.hour is None:
            return None
        return _dt.time(self.hour, self.minute or 0, self.second or 0)


# --- vocab ------------------------------------------------------------------

_MONTHS = {
    "jan": 1, "january": 1,
    "feb": 2, "february": 2,
    "mar": 3, "march": 3,
    "apr": 4, "april": 4,
    "may": 5,
    "jun": 6, "june": 6,
    "jul": 7, "july": 7,
    "aug": 8, "august": 8,
    "sep": 9, "sept": 9, "september": 9,
    "oct": 10, "october": 10,
    "nov": 11, "november": 11,
    "dec": 12, "december": 12,
}
_MONTH_RX = r"(?P<monthname>" + "|".join(
    sorted(_MONTHS, key=len, reverse=True)) + r")\.?"

_TZ_ABBREV = {
    "utc": 0, "gmt": 0, "z": 0,
    "bst": 60, "ist": 330,
    "est": -300, "edt": -240,
    "cst": -360, "cdt": -300,
    "mst": -420, "mdt": -360,
    "pst": -480, "pdt": -420,
}

_ORDINAL = r"(?:st|nd|rd|th)?"

# --- date patterns (tried in order; first hit wins) -------------------------

_ISO_RX = re.compile(
    r"(?P<y>\d{4})-(?P<m>\d{2})-(?P<d>\d{2})"
    r"(?:[T ](?P<H>\d{2}):(?P<M>\d{2})(?::(?P<S>\d{2})(?:\.\d+)?)?"
    r"(?P<tz>Z|[+-]\d{2}:?\d{2})?)?"
)

# "15th March 2024", "15 Mar 24", "Tuesday 15 March 2024"
_DMY_NAME_RX = re.compile(
    r"\b(?P<d>\d{1,2})" + _ORDINAL + r"\s+(?:of\s+)?" + _MONTH_RX
    + r"(?:[,\s]+(?P<y>\d{4}|\d{2})\b)?",
    re.I,
)

# "March 15, 2024", "Mar 15 2024", "March 15th" — (?!\d) stops the day
# from eating the first digits of a 4-digit year ("March 2024")
_MDY_NAME_RX = re.compile(
    _MONTH_RX + r"\s+(?P<d>\d{1,2})(?!\d)" + _ORDINAL
    + r"(?:[,\s]+(?P<y>\d{4}|\d{2})\b)?",
    re.I,
)

# "March 2024" (month-year partial)
_MY_NAME_RX = re.compile(_MONTH_RX + r"[,\s]+(?P<y>\d{4})\b", re.I)

# numeric "03/04/2024", "03-04-24", "2024/03/15"
_YMD_NUM_RX = re.compile(r"\b(?P<y>\d{4})[/\-.](?P<m>\d{1,2})[/\-.](?P<d>\d{1,2})\b")
_DMY_NUM_RX = re.compile(r"\b(?P<a>\d{1,2})[/\-.](?P<b>\d{1,2})[/\-.](?P<y>\d{4}|\d{2})\b")

_YEAR_RX = re.compile(r"\b(?P<y>(?:19|20)\d{2})\b")


def _fix_year(y: Optional[str]) -> Optional[int]:
    if y is None:
        return None
    n = int(y)
    if n < 100:  # 2-digit window: 00-69 → 2000s, 70-99 → 1900s
        n += 2000 if n < 70 else 1900
    return n


def _valid(fd: FuzzyDate) -> bool:
    if fd.month is not None and not 1 <= fd.month <= 12:
        return False
    if fd.day is not None and not 1 <= fd.day <= 31:
        return False
    if fd.year is not None and not 1000 <= fd.year <= 2999:
        return False
    return True


def parse_date(s: str, dayfirst: bool = True) -> Optional[FuzzyDate]:
    """First date cue in ``s`` as a (possibly partial) FuzzyDate, or None.

    Preference order mirrors the reference [PUB:fuzzydate.parse_date]:
    ISO-8601 > day-monthname > monthname-day > monthname-year > numeric
    (dayfirst, flipped only when impossible) > bare year.
    """
    if not s:
        return None
    m = _ISO_RX.search(s)
    if m:
        fd = FuzzyDate(int(m.group("y")), int(m.group("m")), int(m.group("d")))
        if _valid(fd):
            return fd
    m = _DMY_NAME_RX.search(s)
    if m:
        fd = FuzzyDate(_fix_year(m.group("y")),
                       _MONTHS[m.group("monthname").lower().rstrip(".")],
                       int(m.group("d")))
        if _valid(fd):
            return fd
    m = _MDY_NAME_RX.search(s)
    if m:
        fd = FuzzyDate(_fix_year(m.group("y")),
                       _MONTHS[m.group("monthname").lower().rstrip(".")],
                       int(m.group("d")))
        if _valid(fd):
            return fd
    m = _MY_NAME_RX.search(s)
    if m:
        fd = FuzzyDate(_fix_year(m.group("y")),
                       _MONTHS[m.group("monthname").lower().rstrip(".")], None)
        if _valid(fd):
            return fd
    m = _YMD_NUM_RX.search(s)
    if m:
        fd = FuzzyDate(int(m.group("y")), int(m.group("m")), int(m.group("d")))
        if _valid(fd):
            return fd
    m = _DMY_NUM_RX.search(s)
    if m:
        a, b = int(m.group("a")), int(m.group("b"))
        y = _fix_year(m.group("y"))
        if dayfirst:
            day, month = a, b
        else:
            day, month = b, a
        if month > 12 and day <= 12:  # impossible → flip
            day, month = month, day
        fd = FuzzyDate(y, month, day)
        if _valid(fd):
            return fd
    m = _YEAR_RX.search(s)
    if m:
        return FuzzyDate(int(m.group("y")), None, None)
    return None


# --- time patterns ----------------------------------------------------------

_TIME_RX = re.compile(
    r"\b(?P<H>\d{1,2})[:.](?P<M>\d{2})(?::(?P<S>\d{2}))?"
    r"\s*(?P<ampm>am|pm|a\.m\.|p\.m\.)?"
    r"\s*(?P<tz>" + "|".join(k for k in _TZ_ABBREV if k != "z")
    + r"|[+-]\d{2}:?\d{2})?(?!\w)",
    re.I,
)
# (?!\w) instead of \b: "a.m." ends in '.', where \b can't match
_AMPM_ONLY_RX = re.compile(
    r"\b(?P<H>\d{1,2})\s*(?P<ampm>am|pm|a\.m\.|p\.m\.)(?!\w)", re.I
)
_WORD_TIME = {"noon": 12, "midday": 12, "midnight": 0}
_WORD_TIME_RX = re.compile(r"\b(noon|midday|midnight)\b", re.I)


def _tz_minutes(tz: Optional[str]) -> Optional[int]:
    if not tz:
        return None
    t = tz.lower().replace(":", "")
    if t in _TZ_ABBREV:
        return _TZ_ABBREV[t]
    if t and t[0] in "+-" and len(t) == 5 and t[1:].isdigit():
        sign = 1 if t[0] == "+" else -1
        return sign * (int(t[1:3]) * 60 + int(t[3:5]))
    return None


def parse_time(s: str) -> Optional[FuzzyTime]:
    """First time cue in ``s`` [PUB:fuzzydate.parse_time], or None."""
    if not s:
        return None
    m = _TIME_RX.search(s)
    if m:
        h = int(m.group("H"))
        ampm = (m.group("ampm") or "").replace(".", "").lower()
        if ampm == "pm" and h < 12:
            h += 12
        elif ampm == "am" and h == 12:
            h = 0
        if 0 <= h <= 23:
            return FuzzyTime(h, int(m.group("M")),
                             int(m.group("S")) if m.group("S") else None,
                             _tz_minutes(m.group("tz")))
    m = _AMPM_ONLY_RX.search(s)
    if m:
        h = int(m.group("H"))
        ampm = m.group("ampm").replace(".", "").lower()
        if ampm == "pm" and h < 12:
            h += 12
        elif ampm == "am" and h == 12:
            h = 0
        if 0 <= h <= 23:
            return FuzzyTime(h, 0, None, None)
    m = _WORD_TIME_RX.search(s)
    if m:
        return FuzzyTime(_WORD_TIME[m.group(1).lower()], 0, None, None)
    return None


_RELATIVE_RX = re.compile(
    r"\b(?:(?P<n>\d{1,3})|an?)\s+"
    r"(?P<unit>second|sec|minute|min|hour|hr|day|week)s?\s+ago\b", re.I)
_REL_WORD_RX = re.compile(r"\b(just now|moments ago|yesterday|today)\b", re.I)
_REL_UNIT_SECONDS = {"second": 1, "sec": 1, "minute": 60, "min": 60,
                     "hour": 3600, "hr": 3600, "day": 86400,
                     "week": 7 * 86400}


def parse_relative(s: str) -> Optional[_dt.timedelta]:
    """Relative date cue ("3 hours ago", "yesterday") → timedelta before
    the reference instant (the crawl capture time in the pipeline); None
    when no relative cue exists. Never uses the wall clock."""
    if not s:
        return None
    m = _RELATIVE_RX.search(s)
    if m:
        n = int(m.group("n")) if m.group("n") else 1
        return _dt.timedelta(
            seconds=n * _REL_UNIT_SECONDS[m.group("unit").lower()])
    m = _REL_WORD_RX.search(s)
    if m:
        word = m.group(1).lower()
        if word in ("just now", "moments ago", "today"):
            return _dt.timedelta(0)
        return _dt.timedelta(days=1)  # yesterday
    return None


def parse_iso_datetime(s: str) -> Optional[_dt.datetime]:
    """Strict-ish ISO-8601 datetime → **UTC-naive** datetime (tz applied then
    dropped), for meta tags like article:published_time (E7)."""
    m = _ISO_RX.search(s or "")
    if not m:
        return None
    fd = FuzzyDate(int(m.group("y")), int(m.group("m")), int(m.group("d")))
    d = fd.date()
    if d is None:
        return None
    h = int(m.group("H")) if m.group("H") else 0
    mi = int(m.group("M")) if m.group("M") else 0
    sec = int(m.group("S")) if m.group("S") else 0
    if h > 23 or mi > 59 or sec > 60:
        return None
    dt = _dt.datetime(d.year, d.month, d.day, h, min(mi, 59), min(sec, 59))
    off = _tz_minutes(m.group("tz"))
    if off:
        dt -= _dt.timedelta(minutes=off)
    return dt


def to_datetime_utc(fd: FuzzyDate, ft: Optional[FuzzyTime]) -> Optional[_dt.datetime]:
    """Complete FuzzyDate (+optional time) → UTC-naive datetime; partial
    times resolve missing fields to zero (reference emits midnight when no
    time cue exists [PUB:pubdate])."""
    d = fd.date()
    if d is None:
        return None
    if ft is None or ft.empty():
        return _dt.datetime(d.year, d.month, d.day)
    dt = _dt.datetime(d.year, d.month, d.day, ft.hour, ft.minute or 0,
                      ft.second or 0)
    if ft.tzoffset_min:
        dt -= _dt.timedelta(minutes=ft.tzoffset_min)
    return dt


__all__ = [
    "FuzzyDate",
    "FuzzyTime",
    "parse_date",
    "parse_time",
    "parse_iso_datetime",
    "to_datetime_utc",
]
