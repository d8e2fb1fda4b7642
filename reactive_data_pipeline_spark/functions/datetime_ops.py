"""Date/time functions (SURVEY.md section 2.8 F1-F3).

The reference renders daily partition keys as ``"%Y%m%d"`` strings
(``/root/reference/dagster_repository/schedules.py:17``, ``jobs.py:27``)
and buckets days in the Asia/Bangkok timezone
(``schedules.py:10``, ``jobs.py:44-46``).

Bangkok is UTC+7 with no DST, so the day bucket is an exact 7-hour shift
of the naive-UTC timestamps - expressed arithmetically (not via session
timezone) so the same expression is valid in the DuckDB oracle SQL and
under any Spark session timezone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Asia/Bangkok offset (no DST).
BANGKOK_OFFSET = "INTERVAL 7 HOURS"


def bangkok_day(ts: Column | str) -> Column:
    """F3: timezone-aware daily bucket (Asia/Bangkok calendar day)."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(ts + F.expr(BANGKOK_OFFSET))


def partition_key(day: Column | str) -> Column:
    """F1: render a date as the reference's ``yyyyMMdd`` partition key
    (``schedules.py:17``)."""
    day = F.col(day) if isinstance(day, str) else day
    return F.date_format(day, "yyyyMMdd")
