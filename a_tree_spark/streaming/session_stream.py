"""Streaming sessionization via Spark's native session_window.

The batch twin (`pipeline.temporal.sessionize`) numbers sessions with
a lag/cumsum sweep; streams can't see "the previous row" that way, so
the streaming form uses the engine's built-in merging session window:
``groupBy(session_window(ts, gap), key)`` keeps one open window per
(key, session) in state, merges windows as events arrive, and closes a
session once the watermark passes last-event + gap. Same gap rule as
the batch operator — an event extends the session iff it lands within
``gap`` of the previous event — so closed streaming sessions equal the
batch sessions exactly (pinned in tests/test_streaming.py).

At scale: state is one row per OPEN session (bounded by active keys),
eviction is watermark-driven, and the shuffle key is the session key —
the same shape Spark documents for sessionization workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..pipeline.temporal import SESSION_GAP_SECONDS, session_aggs


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Append-mode output: one row per CLOSED session, columns matching
    the batch `sessionize` (minus session_idx, which is a batch-only
    numbering; sessions are identified by (key, session_start))."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    gap = f"{gap_seconds} seconds"
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            F.col(key_col),
        )
        .agg(*session_aggs(ts_col, id_col))
        .select(
            F.col(key_col),
            "session_start",
            "session_end",
            "n_events",
            "first_event",
            "last_event",
            (F.col("session_end") - F.col("session_start")).alias("duration_s"),
        )
    )
