"""Calendar bucketing with the reference's exact (non-standard) rules.

Window builders (driver-side, mirror /root/reference/src/main.rs):

* year:  [Y-01-01, +12 months)            (main.rs:361-372, :554-579)
* month: [Y-M-01, +1 month)               (main.rs:374-385, :525-552)
* week-of-month (main.rs:387-412): weeks start Monday; week w of month
  starts on day ``(w-1)*7 + base_day`` with ``base_day = 1 +
  number_from_monday(weekday of the 1st)`` (Mon=1..Sun=7, so base_day in
  2..8 — the reference's own off-by-one is preserved verbatim); length
  is always 7 days (main.rs:508-509); a week belongs to the month it
  STARTS in; day > days-in-month → invalid week (reference's day-32
  overflow, main.rs:406).

All query windows are CLOSED intervals [from, to] — the reference
filters ``date BETWEEN from AND to`` (src/cache.rs:176) and its stream
scan keeps ``from_date <= date <= to_date`` (src/post.rs:31-37).

``week_of_month_cols`` is the inverse mapping as pure built-in Column
expressions (whole-stage-codegen friendly, no UDF): label every row
with the (year, month, week) bucket its date falls into under the same
rule.
"""

from __future__ import annotations

import calendar as _cal
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, functions as F

UTC = timezone.utc


def _number_from_monday(d: datetime) -> int:
    return d.weekday() + 1  # Mon=1 .. Sun=7 (chrono's number_from_monday)


def year_window(year: int) -> tuple[datetime, datetime]:
    start = datetime(year, 1, 1, tzinfo=UTC)
    return start, datetime(year + 1, 1, 1, tzinfo=UTC)


def month_window(year: int, month: int) -> tuple[datetime, datetime]:
    if not 1 <= month <= 12:
        raise ValueError("Provided month is not allowed")
    start = datetime(year, month, 1, tzinfo=UTC)
    ny, nm = (year + 1, 1) if month == 12 else (year, month + 1)
    return start, datetime(ny, nm, 1, tzinfo=UTC)


def base_day(year: int, month: int) -> int:
    """1 + weekday-from-Monday of the month's first day (reference
    main.rs:398-403) — week 1 of the month starts on this day."""
    return 1 + _number_from_monday(datetime(year, month, 1, tzinfo=UTC))


def week_window(year: int, month: int, week: int) -> tuple[datetime, datetime]:
    if not 1 <= week <= 5:
        raise ValueError("Provided week is not allowed")  # day-32 overflow
    day = (week - 1) * 7 + base_day(year, month)
    if day > _cal.monthrange(year, month)[1]:
        raise ValueError("Provided week is not allowed")
    start = datetime(year, month, day, tzinfo=UTC)
    return start, start + timedelta(days=7)


def assign_week_of_month(d: datetime) -> tuple[int, int, int]:
    """Python oracle for the inverse mapping: date → (year, month, week)
    bucket under the reference rule (weeks belong to their start month;
    days before the month's week 1 belong to the previous month)."""
    y, m, dom = d.year, d.month, d.day
    bd = base_day(y, m)
    if dom >= bd:
        return y, m, (dom - bd) // 7 + 1
    py, pm = (y - 1, 12) if m == 1 else (y, m - 1)
    prev_days = _cal.monthrange(py, pm)[1]
    return py, pm, (dom + prev_days - base_day(py, pm)) // 7 + 1


def week_of_month_cols(ts: Column) -> tuple[Column, Column, Column]:
    """(wm_year, wm_month, wm_week) Column expressions — pure built-ins.

    number_from_monday = ((dayofweek + 5) % 7) + 1 since Spark's
    dayofweek is Sun=1..Sat=7.
    """
    d = F.to_date(ts)
    first = F.trunc(d, "month")
    nfm = ((F.dayofweek(first) + F.lit(5)) % F.lit(7)) + F.lit(1)
    bd = F.lit(1) + nfm
    dom = F.dayofmonth(d)

    prev_first = F.add_months(first, -1)
    prev_nfm = ((F.dayofweek(prev_first) + F.lit(5)) % F.lit(7)) + F.lit(1)
    prev_bd = F.lit(1) + prev_nfm
    prev_days = F.dayofmonth(F.last_day(prev_first))

    in_cur = dom >= bd
    wm_year = F.when(in_cur, F.year(first)).otherwise(F.year(prev_first))
    wm_month = F.when(in_cur, F.month(first)).otherwise(F.month(prev_first))
    wm_week = F.when(in_cur, F.floor((dom - bd) / 7) + 1).otherwise(
        F.floor((dom + prev_days - prev_bd) / 7) + 1
    )
    return (
        wm_year.cast("int").alias("wm_year"),
        wm_month.cast("int").alias("wm_month"),
        wm_week.cast("int").alias("wm_week"),
    )


# SQL fragment implementing the same rule for the DuckDB oracle
# (isodow: Mon=1..Sun=7 — exactly number_from_monday).
WEEK_OF_MONTH_SQL = """
    CASE WHEN DAYOFMONTH(__TS__) >= 2 + ISODOW(DATE_TRUNC('month', __TS__))
         THEN {field}
         ELSE {prev_field}
    END
"""
