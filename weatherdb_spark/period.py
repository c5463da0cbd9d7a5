"""TimestampPeriod — the reference's period value object
(utils/TimestampPeriod.py:5-368), driver-side and Spark-free.

Only the algebra the engine uses: inner/outer union, containment, empty
checks, and expansion of date-precision bounds to timestamp bounds
(TimestampPeriod.py:343-350).
"""

from __future__ import annotations

import datetime as dt
from typing import Optional

Bound = Optional[dt.datetime]


def _coerce(v) -> Bound:
    if v is None:
        return None
    if isinstance(v, dt.datetime):
        return v
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day)
    if isinstance(v, str):
        return dt.datetime.fromisoformat(v)
    raise TypeError(f"cannot interpret {v!r} as a period bound")


class TimestampPeriod:
    """Half-open-agnostic [start, end] period; None = unbounded."""

    def __init__(self, start, end):
        self.start = _coerce(start)
        self.end = _coerce(end)

    def is_empty(self) -> bool:
        return self.start is None and self.end is None

    def has_NaT(self) -> bool:
        return self.start is None or self.end is None

    def union(self, other: "TimestampPeriod", how: str = "outer") -> "TimestampPeriod":
        """Reference semantics (TimestampPeriod.py:66-127): NaT bounds are
        *skipped* in the comparison (not treated as unbounded); inner with
        an empty operand is empty; a result with start >= end collapses to
        empty."""
        if how not in ("outer", "inner"):
            raise ValueError(f"how={how!r} not in ('outer', 'inner')")
        a, b = self, other
        if how == "inner" and (a.is_empty() or b.is_empty()):
            return TimestampPeriod(None, None)
        starts = [x for x in (a.start, b.start) if x is not None]
        ends = [x for x in (a.end, b.end) if x is not None]
        start_fn, end_fn = (min, max) if how == "outer" else (max, min)
        start = start_fn(starts) if starts else None
        end = end_fn(ends) if ends else None
        if start is not None and end is not None and start >= end:
            return TimestampPeriod(None, None)
        return TimestampPeriod(start, end)

    def inside(self, other: "TimestampPeriod") -> bool:
        """True when self is fully inside other (TimestampPeriod.py:131+)."""
        lo_ok = other.start is None or (self.start is not None and self.start >= other.start)
        hi_ok = other.end is None or (self.end is not None and self.end <= other.end)
        return lo_ok and hi_ok

    def contains(self, other: "TimestampPeriod") -> bool:
        return other.inside(self)

    def expand_to_timestamp(self) -> "TimestampPeriod":
        """Date-precision bounds widen to full-day timestamps
        (TimestampPeriod.py:343-350): end date -> 23:59:59.999999."""
        end = self.end
        if end is not None and end.time() == dt.time(0, 0):
            end = end.replace(hour=23, minute=59, second=59, microsecond=999999)
        return TimestampPeriod(self.start, end)

    def strftime(self, fmt: str = "%Y-%m-%d %H:%M:%S") -> tuple[str | None, str | None]:
        return (
            self.start.strftime(fmt) if self.start else None,
            self.end.strftime(fmt) if self.end else None,
        )

    def __iter__(self):
        """Unpack like the ``(start, end)`` tuples the read path also
        accepts — ``start, end = period`` works for both shapes, so a
        TimestampPeriod can flow into any ``period=`` parameter."""
        yield self.start
        yield self.end

    def __eq__(self, other) -> bool:
        # raw (start, end) tuples coerce like the reference's
        # _check_period (TimestampPeriod.py:162-168)
        if not isinstance(other, TimestampPeriod):
            try:
                other = self._as_period(other)
            except (TypeError, ValueError):
                return NotImplemented
        return self.start == other.start and self.end == other.end

    def __repr__(self) -> str:
        return f"TimestampPeriod({self.start!r}, {self.end!r})"

    # ---------------- accessor/comparison parity with the reference
    # value object (utils/TimestampPeriod.py:131-352). Comparison
    # operators are CONTAINMENT, not ordering: a < b means "a inside b"
    # (TimestampPeriod.py:173-184).
    def get_period(self) -> tuple[Bound, Bound]:
        return (self.start, self.end)

    def __getitem__(self, key):
        if key in (0, "start"):
            return self.start
        if key in (1, "end"):
            return self.end
        raise KeyError(key)

    def __setitem__(self, key, value) -> None:
        if key in (0, "start"):
            self.start = _coerce(value)
        elif key in (1, "end"):
            self.end = _coerce(value)
        else:
            raise KeyError(key)

    @staticmethod
    def _as_period(other) -> "TimestampPeriod":
        """The reference's _check_period coercion
        (TimestampPeriod.py:212-230): comparisons accept raw
        (start, end) tuples."""
        if isinstance(other, TimestampPeriod):
            return other
        return TimestampPeriod(*other)

    def __ne__(self, other) -> bool:
        eq = self.__eq__(other)
        # propagate NotImplemented: `not NotImplemented` would claim
        # equality with arbitrary objects (and TypeError on 3.14+)
        return eq if eq is NotImplemented else not eq

    def __lt__(self, other) -> bool:
        return self.inside(self._as_period(other))

    def __le__(self, other) -> bool:
        return self.inside(self._as_period(other))

    def __gt__(self, other) -> bool:
        return self.contains(self._as_period(other))

    def __ge__(self, other) -> bool:
        return self.contains(self._as_period(other))

    def __str__(self) -> str:
        lo, hi = self.strftime()
        return f"TimestampPeriod: {lo} - {hi}"

    def has_only_NaT(self) -> bool:
        """Reference name for :meth:`is_empty`
        (TimestampPeriod.py:199-210)."""
        return self.is_empty()

    def copy(self) -> "TimestampPeriod":
        return TimestampPeriod(self.start, self.end)

    def get_interval(self) -> dt.timedelta | None:
        """end − start (TimestampPeriod.py:304-313); None when a bound
        is open — the reference's NaT arithmetic would yield NaT."""
        if self.has_NaT():
            return None
        return self.end - self.start

    def get_middle(self) -> dt.datetime | None:
        """Midpoint timestamp (TimestampPeriod.py:315-329)."""
        iv = self.get_interval()
        if iv is None:
            return None
        return self.start + iv / 2

    def get_sql_format_dict(self, format: str = "'%Y%m%d %H:%M'") -> dict:
        """{min_tstp, max_tstp} as quoted SQL literals, open bounds as
        the string ``NULL`` (TimestampPeriod.py:286-302) — usable with
        ``Broker.sql`` period predicates the way the reference templates
        its Postgres statements."""
        lo, hi = self.strftime(format)
        return dict(
            min_tstp="NULL" if lo is None else lo,
            max_tstp="NULL" if hi is None else hi,
        )

    def set_tz(self, tzinfo) -> "TimestampPeriod":
        """Attach a timezone to both bounds and return self
        (TimestampPeriod.py:352-368). The engine stores tz-naive UTC
        (the session timezone is pinned to UTC), so this only matters
        when handing bounds to tz-aware consumers."""
        if self.start is not None and self.start.tzinfo is None:
            self.start = self.start.replace(tzinfo=tzinfo)
        if self.end is not None and self.end.tzinfo is None:
            self.end = self.end.replace(tzinfo=tzinfo)
        return self
