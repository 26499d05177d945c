"""Stream-stream interval join (the last big Structured Streaming
surface the engine didn't exercise): enrich each left event with every
right event of the same key in the trailing time horizon.

Spark's stream-stream inner join with watermarks on BOTH sides and a
time-range condition bounds state on each side to the horizon + the
watermark delay; rows outside are evicted. The batch twin is the SAME
join predicate on static frames — stream==batch parity on the pairs
whose windows the watermark has closed is pinned in
tests/test_streaming.py.

At scale: per-key state is (events within horizon) x 2 sides; the
shuffle key is the join key. This is Spark's documented ad-click /
impression attribution shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    horizon_seconds: int = 3600,
    watermark: str = "1 hour",
    streaming: bool = False,
) -> DataFrame:
    """Inner join: every (left, right) pair of the same ``on`` key with
    right.ts in (left.ts - horizon, left.ts]. One definition serves
    batch (streaming=False) and streaming (True: adds watermarks, which
    Spark requires on both inputs to bound join state).

    Output: (left event id, key, right event id, lag_s) — epoch-delta
    seconds as BIGINT, engine-neutral."""
    l = left.select(
        F.col("event_id").alias("l_event"),
        F.col(on),
        F.col(ts_col).cast("timestamp").alias("l_ts"),
    )
    r = right.select(
        F.col("event_id").alias("r_event"),
        F.col(on).alias("_r_key"),
        F.col(ts_col).cast("timestamp").alias("r_ts"),
    )
    if streaming:
        l = l.withWatermark("l_ts", watermark)
        r = r.withWatermark("r_ts", watermark)
    joined = l.join(
        r,
        (F.col(on) == F.col("_r_key"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") > F.col("l_ts") - F.expr(f"INTERVAL {horizon_seconds} SECONDS")),
    )
    # FLOOR before the BIGINT cast: CAST(double AS BIGINT) truncates in
    # Spark but rounds in DuckDB; FLOOR makes them agree on sub-second
    # lags (the repo-wide dialect rule)
    return joined.select(
        "l_event",
        F.col(on),
        "r_event",
        F.floor(
            F.col("l_ts").cast("double") - F.col("r_ts").cast("double")
        ).cast("bigint").alias("lag_s"),
    )


def interval_join_oracle_sql(
    left_sql: str,
    right_sql: str,
    on: str = "user_id",
    horizon_seconds: int = 3600,
) -> str:
    return f"""
WITH l AS ({left_sql}), r AS ({right_sql})
SELECT l.event_id AS l_event, l.{on}, r.event_id AS r_event,
       CAST(FLOOR(epoch(l.ts) - epoch(r.ts)) AS BIGINT) AS lag_s
FROM l JOIN r ON l.{on} = r.{on}
 AND r.ts <= l.ts
 AND r.ts > l.ts - INTERVAL {horizon_seconds} SECONDS
""".strip()
