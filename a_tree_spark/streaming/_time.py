"""Shared event-time conversion for the stateful stream operators.

Every applyInPandasWithState twin needs the same two things: the
session timezone (naive pandas Timestamps arriving in the worker are
session-local), and an integer epoch at MICROSECOND precision — the
precision of Spark's TimestampType. Quantizing to milliseconds here
was a real divergence (round-7 review): two same-day events 800µs
apart tie at ms precision and the id tie-break picks the WRONG anchor
relative to the batch operator's full-precision struct-min.

Watermarks from ``GroupState.getCurrentWatermarkMs`` stay in ms (the
engine's unit); comparisons multiply up to µs rather than truncating
event times down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

US_PER_MS = 1_000


def session_timezone(df: DataFrame) -> str:
    return (
        df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
        or "UTC"
    )


def epoch_us(ts, tz: str) -> int:
    """Microseconds since epoch for a pandas Timestamp (naive values
    are session-local; ``.value`` of an aware Timestamp is UTC ns)."""
    aware = ts if ts.tzinfo else ts.tz_localize(tz)
    return aware.value // 1_000
