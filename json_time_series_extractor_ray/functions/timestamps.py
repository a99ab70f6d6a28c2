"""Timestamp parsing with .NET ``System.Text.Json`` parity, at nanosecond
resolution.

The reference parses timestamps with ``JsonElement.TryGetDateTimeOffset``
(ISO 8601-1 extended profile, up to 7 fractional digits = 100 ns ticks) and
treats integer JSON numbers as Unix *milliseconds*
(``TimeSeriesExtractor.cs:660-671``).  .NET's 100 ns tick resolution exceeds
Python ``datetime``'s microseconds (the reference's own fixture uses
``2021-05-28T17:41:09.7031076+03:00``,
``JsonTimeSeriesExtractorTests.cs:17``), so this engine represents every
timestamp as ``int`` nanoseconds since the Unix epoch (UTC) — exact, totally
ordered, and directly usable for integer window arithmetic in the rollup
ladder.

Accepted string forms (mirroring the documented System.Text.Json profile):

* ``yyyy-MM-dd``
* ``yyyy-MM-ddTHH:mm``
* ``yyyy-MM-ddTHH:mm:ss``
* ``yyyy-MM-ddTHH:mm:ss.F`` with 1..16 fractional digits (only the first 7
  are significant; the rest are validated and discarded, as in .NET)
* any time form followed by an offset: ``Z``, ``±hh:mm`` or ``±hh``

Deviation (documented): a timestamp without an explicit offset is treated as
UTC.  .NET assumes the *local* offset, which is machine-dependent and
therefore nondeterministic in a distributed engine; the execution containers
run in UTC so the behaviours coincide there, and every reference test fixture
specifies an explicit offset.
"""

from __future__ import annotations

import datetime as _dt
import enum
import re
import time

NS_PER_SEC = 1_000_000_000
NS_PER_MS = 1_000_000
_EPOCH = _dt.date(1970, 1, 1)

_ISO_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})"
    r"(?:T(\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,16}))?)?"
    r"(Z|[+-]\d{2}(?::?\d{2})?)?)?$"
)


class TimestampSource(enum.IntEnum):
    """Provenance of a sample timestamp.

    Mirrors the declaration order of the reference enum
    (``TimestampSource.cs:6-30``).
    """

    UNSPECIFIED = 0
    DOCUMENT = 1
    FALLBACK_PROVIDER = 2
    CURRENT_TIME = 3


_DATE_CACHE: dict = {}
_MINUTE_CACHE: dict = {}


def parse_iso_timestamp_ns(text: str):
    """Parse an ISO 8601 string to int nanoseconds since epoch (UTC).

    Returns ``None`` when the string is not a valid timestamp (mirrors
    ``TryGetDateTimeOffset`` returning ``false``).
    """
    # Fast path for the dominant machine-generated shape
    # 'YYYY-MM-DDTHH:MM:SS.ffffffZ' (6-digit fraction, UTC): slice + int,
    # with a per-process date memo (corpora cluster on few distinct days).
    # Any malformed input falls through to the full-profile parser.
    if (
        len(text) == 27
        and text[26] == "Z"
        and text[10] == "T"
        and text[4] == "-"
        and text[7] == "-"
        and text[13] == ":"
        and text[16] == ":"
        and text[19] == "."
        # one whole-string ASCII check (instead of one per sliced part):
        # str.isdigit alone accepts non-ASCII digits that int() rejects
        and text.isascii()
    ):
        # Minute-prefix memo: corpora cluster on a narrow time range, so the
        # distinct 'YYYY-MM-DDTHH:MM' prefixes are few — one dict hit
        # replaces date construction + hour/minute validation.
        minute_seconds = _MINUTE_CACHE.get(text[:16])
        if minute_seconds is not None:
            ss, frac = text[17:19], text[20:26]
            if ss.isdigit() and frac.isdigit():
                s = int(ss)
                if s > 59:
                    return None
                return (minute_seconds + s) * NS_PER_SEC + int(frac) * 1000
            return None
        hh, mi, ss, frac = text[11:13], text[14:16], text[17:19], text[20:26]
        if (hh.isdigit() and mi.isdigit()
                and ss.isdigit() and frac.isdigit()):
            date_key = text[:10]
            day_seconds = _DATE_CACHE.get(date_key)
            if day_seconds is None:
                try:
                    day_seconds = (
                        _dt.date(int(text[0:4]), int(text[5:7]), int(text[8:10]))
                        - _EPOCH
                    ).days * 86400
                except ValueError:
                    return None
                _DATE_CACHE[date_key] = day_seconds
            h, m_, s = int(hh), int(mi), int(ss)
            if h > 23 or m_ > 59 or s > 59:
                return None
            if len(_MINUTE_CACHE) < 65536:
                _MINUTE_CACHE[text[:16]] = day_seconds + h * 3600 + m_ * 60
            return (day_seconds + h * 3600 + m_ * 60 + s) * NS_PER_SEC + int(frac) * 1000
    m = _ISO_RE.match(text)
    if m is None:
        return None
    year, month, day, hh, mm, ss, frac, offset = m.groups()
    try:
        days = (_dt.date(int(year), int(month), int(day)) - _EPOCH).days
    except ValueError:
        return None
    seconds = days * 86400
    if hh is not None:
        h = int(hh)
        mi = int(mm)
        if h > 23 or mi > 59:
            return None
        seconds += h * 3600 + mi * 60
        if ss is not None:
            s = int(ss)
            if s > 59:
                return None
            seconds += s
    ns = seconds * NS_PER_SEC
    if frac:
        # .NET keeps the first 7 digits (100 ns ticks) and discards the rest.
        ticks = int(frac[:7].ljust(7, "0"))
        ns += ticks * 100
    if offset and offset != "Z":
        sign = 1 if offset[0] == "+" else -1
        body = offset[1:].replace(":", "")
        oh = int(body[:2])
        om = int(body[2:4]) if len(body) >= 4 else 0
        if oh > 14 or om > 59:
            return None
        ns -= sign * (oh * 3600 + om * 60) * NS_PER_SEC
    return ns


def unix_ms_to_ns(ms: int) -> int:
    """Integer JSON timestamp: Unix milliseconds (``TimeSeriesExtractor.cs:666-671``)."""
    return ms * NS_PER_MS


def now_ns() -> int:
    """Wall clock fallback (``DateTimeOffset.UtcNow``, ``TimeSeriesExtractor.cs:461``).

    Nondeterministic by nature; distributed pipelines must inject a
    deterministic fallback instead (see ``stages/extract.py``).
    """
    return time.time_ns()


def ns_to_datetime(ns: int) -> _dt.datetime:
    """Convenience conversion (truncates to microseconds)."""
    return _dt.datetime.fromtimestamp(ns // NS_PER_SEC, tz=_dt.timezone.utc).replace(
        microsecond=(ns % NS_PER_SEC) // 1000
    )


def datetime_to_ns(dt: _dt.datetime) -> int:
    """Exact conversion from an aware (or naive-UTC) datetime to epoch ns."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    delta = dt - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    return (delta.days * 86400 + delta.seconds) * NS_PER_SEC + delta.microseconds * 1000
