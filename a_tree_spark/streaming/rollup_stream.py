"""Watermarked streaming twin of the batch windowed rollup.

``pipeline.temporal.windowed_rollup`` is a pure tumbling-window
transformation, so the streaming form is literally the same plan over a
watermarked source — Structured Streaming's windowed-aggregation path
(incremental state per (window, key), map-side partial agg per
micro-batch, state evicted once the watermark passes window end).
Stream/batch parity is therefore pinned by construction and verified in
tests/test_streaming.py: the same events through readStream == the
batch rollup, row for row.

At scale: state size is bounded by (#live windows x #active keys);
late events beyond the watermark are dropped by the engine (the batch
twin, which sees all data, is the ground truth the parity test uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..pipeline.temporal import windowed_rollup


def windowed_rollup_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    window_duration: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "cell_id",
) -> DataFrame:
    """events must be a streaming DataFrame with ``ts_col`` event time.
    Append-mode sinks emit each (window, key) row exactly once, when the
    watermark passes the window end; complete/update modes emit
    running values."""
    # parquet timestamps arrive as TIMESTAMP_NTZ; watermarks require
    # TIMESTAMP (LTZ). The session pins UTC (engine/session.py), so the
    # cast is instant-identical and stream windows == batch windows.
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return windowed_rollup(
        events.withWatermark(ts_col, watermark),
        window_duration=window_duration,
        ts_col=ts_col,
        key_col=key_col,
    )
