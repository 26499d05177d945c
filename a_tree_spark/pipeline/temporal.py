"""Temporal operators: as-of join and windowed time rollups.

Two operators a web-scale event/page pipeline needs that plain SQL
joins express badly at scale:

- ``asof_join``: for every left row, the single most recent right row
  at-or-before its timestamp, per key. The naive SQL form is an
  inequality join (left x right per key) followed by a top-1 — O(n*m)
  per key. The Spark-native form here is the union-tag pattern: one
  shuffle on the key, one per-key ordered sweep with a running
  ``last(..., ignorenulls)`` window — O((n+m) log(n+m)) per key and no
  join blow-up. The DuckDB oracle keeps the inequality-join form
  (exact, fine at gate scale), pinning that the two formulations agree.

- ``windowed_rollup``: epoch-aligned tumbling-window x cell rollup of
  an event stream (the "hypertable rollup" idiom). Batch form is a
  single map-side-combined groupBy; the streaming twin in
  ``streaming/rollup_stream.py`` shares this module's column
  definitions so stream/batch parity is pinned by construction.

Both stay entirely in Catalyst expressions — no Python rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

def sum_cents_sql(value_col: str = "value") -> str:
    """cents-exact value sum: ROUND first because value*100 lands
    off-integer in IEEE doubles (12.31*100 = 1230.9999...); after ROUND
    the double is integral so the BIGINT cast agrees between Spark
    (truncating) and DuckDB (rounding). Values are non-negative, so
    HALF_UP (Spark) and half-away-from-zero (DuckDB) agree too."""
    return f"CAST(SUM(CAST(ROUND({value_col} * 100) AS BIGINT)) AS BIGINT)"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_id: str = "event_id",
    right_vals: dict[str, str] | None = None,
) -> DataFrame:
    """For each left row: the most recent right row with
    ``right.ts <= left.ts`` for the same ``on`` key (ASOF backward
    join; ties among right rows break to the greatest ``right_id``).
    Left rows with no prior right row keep NULLs.

    Output: all left columns + ``asof_<right_id>`` + one
    ``asof_<alias>`` per entry of ``right_vals`` (alias -> right col).

    Scale shape: both sides are tagged and unioned, then a single
    shuffle partitions by ``on`` and sorts by (ts, side, id); a running
    ``last(ignorenulls=True)`` carries the latest right attributes
    forward into each left row. Right rows sort BEFORE left rows at an
    equal timestamp (side 0 < 1), giving inclusive <= semantics. One
    shuffle, zero joins, no per-key quadratic work — the standard
    distributed as-of formulation (Flink temporal join / Pandas
    merge_asof do the same sweep).
    """
    merged, left_cols, carried = _asof_tagged_union(
        left, right, on, ts_col, right_id, right_vals
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_side"), F.col(f"asof_{right_id}"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        *[F.col(c) for c in left_cols],
        F.col("_side"),
        F.last("_packed", ignorenulls=True).over(w).alias("_p"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"_p.{c}").alias(c) for c in carried],
    )


def _asof_tagged_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_id: str,
    right_vals: dict[str, str] | None,
) -> tuple[DataFrame, list[str], list[str]]:
    """Shared front half of the as-of sweep: tag both sides, align
    schemas, union, and pack the carried right attributes into one
    struct. Returns (merged, left_cols, carried)."""
    right_vals = right_vals or {}
    carried = [f"asof_{right_id}"] + [f"asof_{a}" for a in right_vals]
    left_cols = left.columns
    # a NULL-ts right row has no position on the time axis: drop it,
    # matching the oracle's join predicate (r.ts <= l.ts is never true
    # for NULL) — otherwise NULLS FIRST ordering would sort it before
    # every left row and last(ignorenulls) could carry it spuriously
    right = right.filter(F.col(ts_col).isNotNull())
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(right_id).alias(f"asof_{right_id}"),
        *[F.col(c).alias(f"asof_{a}") for a, c in right_vals.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (on, ts_col)],
    )
    l = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_id].dataType).alias(f"asof_{right_id}"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"asof_{a}")
          for a, c in right_vals.items()],
        *[F.col(c) for c in left_cols if c not in (on, ts_col)],
    )
    # all carried right attributes travel as ONE struct so they always
    # come from the SAME right row (independent per-column last() could
    # mix rows if a right value column were NULL)
    merged = r.unionByName(l).withColumn(
        "_packed",
        F.when(F.col("_side") == 0, F.struct(*[F.col(c) for c in carried])),
    )
    return merged, left_cols, carried


def asof_join_skewed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_id: str = "event_id",
    right_vals: dict[str, str] | None = None,
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """Skew-proof as-of join — identical output to `asof_join` (pinned
    by test and by sharing its driver oracle), different plan for hot
    keys, following the proven two-phase shape of `sessionize_skewed` /
    `trajectory_stats_skewed`.

    `asof_join` partitions its ordered sweep by key alone, so a key
    holding a billion rows serializes through ONE task. Here:

      1. LOCAL: the same union-tag sweep partitioned by
         (key, time-bucket) — a hot key spreads over span/bucket_seconds
         tasks; each left row learns the latest right row within its
         OWN bucket (NULL if the bucket has no earlier right row);
      2. BRIDGE: per (key, bucket), the last right row's packed
         attributes (ONE row per key x bucket, independent of event
         count) are carried forward across buckets with a tiny per-key
         window — bucket b's carry-in is the last right row of the
         nearest earlier bucket that has one;
      3. MERGE: left rows take their local hit, else the carry-in.

    Correctness: any right row in an earlier bucket has ts < the left
    row's bucket start <= left ts, so every carried row satisfies the
    as-of predicate; the LATEST one is by definition the last right row
    of the latest earlier non-empty bucket — exactly the bridge value.
    Within a bucket the local sweep applies the exact (ts, id)
    tie-break, and equal timestamps can never span buckets, so the
    composition is exact for ANY bucket_seconds (a pure parallelism
    knob)."""
    merged, left_cols, carried = _asof_tagged_union(
        left, right, on, ts_col, right_id, right_vals
    )
    sec = F.col(ts_col).cast("timestamp").cast("double")
    merged = merged.withColumn(
        "_bucket", F.floor(sec / float(bucket_seconds)).cast("bigint")
    )
    # 1. local sweep, partitioned by (key, bucket)
    w = (
        Window.partitionBy(on, "_bucket")
        .orderBy(F.col(ts_col), F.col("_side"), F.col(f"asof_{right_id}"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = merged.select(
        *[F.col(c) for c in left_cols],
        F.col("_bucket"),
        F.col("_side"),
        F.last("_packed", ignorenulls=True).over(w).alias("_p"),
    ).filter(F.col("_side") == 1)
    # 2. bridge: one summary row per (key, bucket) that HAS right rows,
    #    then carry the latest earlier summary into every (key, bucket)
    #    either side touches. max_by orders by (ts, id) — same
    #    tie-break as the sweep.
    last_right = (
        merged.filter(F.col("_side") == 0)
        .groupBy(on, "_bucket")
        .agg(
            F.max_by(
                "_packed",
                F.struct(F.col(ts_col), F.col(f"asof_{right_id}")),
            ).alias("_last")
        )
    )
    buckets = merged.select(on, "_bucket").distinct()
    wcarry = (
        Window.partitionBy(on)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        buckets.join(last_right, [on, "_bucket"], "left")
        .select(
            F.col(on),
            F.col("_bucket"),
            F.last("_last", ignorenulls=True).over(wcarry).alias("_carry"),
        )
    )
    # 3. merge: the carry relation is one row per (key, bucket) —
    #    orders of magnitude smaller than the data — joined back on the
    #    exact partitioning the local pass already established
    return (
        local.join(carry, [on, "_bucket"], "left")
        .withColumn("_best", F.coalesce(F.col("_p"), F.col("_carry")))
        .select(
            *[F.col(c) for c in left_cols],
            *[F.col(f"_best.{c}").alias(c) for c in carried],
        )
    )


def asof_join_oracle_sql(
    left_sql: str,
    right_sql: str,
    on: str,
    left_cols: list[str],
    ts_col: str = "ts",
    right_id: str = "event_id",
    right_vals: dict[str, str] | None = None,
) -> str:
    """DuckDB oracle in the inequality-join + top-1 form (the semantics
    spec; exponentially more expensive than the engine's sweep but
    exact at gate scale). LEFT JOIN keeps no-match rows as NULLs, and
    the ORDER BY (r.ts DESC, r.id DESC) mirrors the engine's
    greatest-id tie-break.

    PRECONDITION: ``left_cols`` must uniquely key the left relation
    (the ROW_NUMBER partitions by them, so duplicate left rows would
    collapse to one here while the engine emits one row per input
    row). Driver usage includes the unique event_id."""
    right_vals = right_vals or {}
    keep = ", ".join(f"l.{c}" for c in left_cols)
    rv_sel = "".join(f", r.{c} AS asof_{a}" for a, c in right_vals.items())
    part = ", ".join(f"l.{c}" for c in left_cols)
    return f"""
WITH l AS ({left_sql}), r AS ({right_sql})
SELECT * EXCLUDE (rn) FROM (
    SELECT {keep}, r.{right_id} AS asof_{right_id}{rv_sel},
           ROW_NUMBER() OVER (
               PARTITION BY {part}
               ORDER BY r.{ts_col} DESC, r.{right_id} DESC
           ) AS rn
    FROM l LEFT JOIN r ON l.{on} = r.{on} AND r.{ts_col} <= l.{ts_col}
) WHERE rn = 1
""".strip()


def rollup_aggs(value_col: str = "value", id_col: str = "event_id") -> list:
    """Shared aggregate list for batch and streaming rollups — exact
    integer aggregates only, so stream==batch==oracle bit-for-bit."""
    return [
        F.count("*").alias("n_events"),
        F.expr(sum_cents_sql(value_col)).alias("sum_cents"),
        F.min(id_col).alias("first_event"),
        F.max(id_col).alias("last_event"),
    ]


def windowed_rollup(
    events: DataFrame,
    window_duration: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "cell_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Tumbling-window x key rollup. Epoch-aligned windows (Spark's
    `window()` semantics) reported as BIGINT epoch seconds so the
    value is engine-neutral (no timestamp serialization in the hash).
    One shuffle keyed by (window, key), partial agg map-side."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col(key_col),
        )
        .agg(*rollup_aggs(value_col, id_col))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            F.col(key_col),
            "n_events",
            "sum_cents",
            "first_event",
            "last_event",
        )
    )


def windowed_rollup_oracle_sql(
    events_sql: str,
    trunc_unit: str = "day",
    key_col: str = "cell_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB mirror. Spark's `window(ts, '1 day')` start equals
    date_trunc('day', ts) under the UTC session both engines pin
    (epoch-aligned tumbling windows; 1970-01-01 is a day boundary)."""
    return f"""
WITH ev AS ({events_sql})
SELECT CAST(epoch(date_trunc('{trunc_unit}', ts)) AS BIGINT) AS window_start,
       {key_col},
       COUNT(*) AS n_events,
       {sum_cents_sql(value_col)} AS sum_cents,
       MIN({id_col}) AS first_event,
       MAX({id_col}) AS last_event
FROM ev GROUP BY 1, 2
""".strip()


# ------------------------------------------------------ sessionization


SESSION_GAP_SECONDS = 12 * 3600


def session_aggs(ts_col: str = "ts", id_col: str = "event_id") -> list:
    """Aggregates shared by batch `sessionize` and the streaming
    `session_window` twin — ONE definition so stream/batch parity is by
    construction, not by keeping two copies in sync. Epoch floors on
    the NTZ->TIMESTAMP hop (identity under the pinned UTC session)."""
    ep = f"CAST(CAST({ts_col} AS TIMESTAMP) AS DOUBLE)"
    return [
        F.expr(f"CAST(FLOOR(MIN({ep})) AS BIGINT)").alias("session_start"),
        F.expr(f"CAST(FLOOR(MAX({ep})) AS BIGINT)").alias("session_end"),
        F.count("*").alias("n_events"),
        F.min(id_col).alias("first_event"),
        F.max(id_col).alias("last_event"),
    ]


def sessionize(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: consecutive events of one key belong
    to the same session while the gap to the PREVIOUS event is
    <= gap_seconds; a larger gap starts a new session. One row per
    session: (key, session_idx 1-based, session_start/end epoch
    seconds, duration, n_events, first/last event id).

    Plan: the classic two-window formulation — lag() flags session
    starts, a running sum numbers them, then one groupBy collapses to
    sessions. All three steps share the same partitioning key, so
    Spark plans ONE Exchange (window and groupBy reuse it; the test
    pins single-Exchange). Timestamp arithmetic happens on epoch
    DOUBLE seconds (microsecond-exact in IEEE double through 2100+),
    the one form Spark and DuckDB compute identically.

    The streaming twin is Spark's native session_window
    (streaming/session_stream.py) — same gap rule with watermarked
    state; parity pinned in tests/test_streaming.py.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # NTZ can't cast straight to DOUBLE; hop through TIMESTAMP (identity
    # under the pinned UTC session) for epoch seconds
    sec = F.col(ts_col).cast("timestamp").cast("double")
    flagged = events.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(id_col),
        F.when(
            F.lag(sec).over(w).isNull()
            | (sec - F.lag(sec).over(w) > float(gap_seconds)),
            1,
        ).otherwise(0).alias("is_new"),
    ).withColumn("session_idx", F.sum("is_new").over(wrun))
    return flagged.groupBy(key_col, "session_idx").agg(
        *session_aggs(ts_col, id_col)
    ).withColumn(
        "duration_s", (F.col("session_end") - F.col("session_start"))
    )


def sessionize_oracle_sql(
    events_sql: str,
    gap_seconds: int = SESSION_GAP_SECONDS,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB mirror of the lag/cumsum formulation. epoch(ts) is the
    same epoch-seconds DOUBLE Spark's CAST(ts AS DOUBLE) yields."""
    return f"""
WITH e AS ({events_sql}),
flagged AS (
    SELECT {key_col}, {ts_col}, {id_col},
           CASE WHEN LAG(epoch({ts_col})) OVER w IS NULL
                  OR epoch({ts_col}) - LAG(epoch({ts_col})) OVER w > {gap_seconds}
                THEN 1 ELSE 0 END AS is_new
    FROM e WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col})
),
numbered AS (
    SELECT *, SUM(is_new) OVER (
        PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
        ROWS UNBOUNDED PRECEDING
    ) AS session_idx FROM flagged
)
SELECT {key_col},
       -- HUGEINT trap (round-2 raster_vector, round-5 sessionize): the
       -- windowed SUM is HUGEINT, which pandas' .df() renders float64
       -- while Spark emits int64 — the driver's value hash is
       -- byte-sensitive, so the cast is load-bearing.
       CAST(session_idx AS BIGINT) AS session_idx,
       CAST(FLOOR(MIN(epoch({ts_col}))) AS BIGINT) AS session_start,
       CAST(FLOOR(MAX(epoch({ts_col}))) AS BIGINT) AS session_end,
       COUNT(*) AS n_events,
       MIN({id_col}) AS first_event,
       MAX({id_col}) AS last_event,
       CAST(FLOOR(MAX(epoch({ts_col}))) AS BIGINT)
         - CAST(FLOOR(MIN(epoch({ts_col}))) AS BIGINT) AS duration_s
FROM numbered GROUP BY {key_col}, session_idx
""".strip()


# ------------------------------------------------- cube / grouping sets


def cell_day_cube(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "cell_id",
    value_col: str = "value",
) -> DataFrame:
    """Multi-dimensional rollup: CUBE(day, cell) — per-(day, cell)
    counts plus all three subtotal planes in ONE pass (Spark expands
    the grouping sets inside a single shuffle; map-side partial aggs
    apply per set). Subtotal dimensions surface as -1 (not NULL: the
    driver hash needs NULL-free columns and both day and cell are
    nonnegative) with ``gid`` = the standard grouping bitmask (MSB =
    first dim), identical in Spark's grouping_id() and DuckDB's
    GROUPING()."""
    day = f"CAST(FLOOR(CAST(CAST({ts_col} AS TIMESTAMP) AS DOUBLE) / 86400) AS BIGINT)"
    base = events.selectExpr(
        f"{day} AS day", key_col, f"CAST(ROUND({value_col} * 100) AS BIGINT) AS cents"
    )
    return (
        base.cube("day", key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .select(
            F.expr("coalesce(day, -1)").alias("day"),
            F.expr(f"coalesce({key_col}, -1)").alias(key_col),
            "n_events",
            "sum_cents",
            "gid",
        )
    )


def cell_day_cube_oracle_sql(
    events_sql: str,
    key_col: str = "cell_id",
) -> str:
    return f"""
WITH ev AS ({events_sql}),
base AS (
    SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day, {key_col},
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM ev
)
SELECT coalesce(day, -1) AS day, coalesce({key_col}, -1) AS {key_col},
       COUNT(*) AS n_events, CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(GROUPING(day, {key_col}) AS BIGINT) AS gid
FROM base GROUP BY CUBE (day, {key_col})
""".strip()


def sessionize_skewed(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    bucket_seconds: int = 7 * 86400,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Skew-proof sessionization — identical output to `sessionize`
    (pinned by test), different plan for hot keys.

    `sessionize` partitions the window by key alone, so a key holding
    a billion events lands its entire history in ONE task. This
    variant splits the ordered pass in two:

      1. LOCAL: sessionize within (key, time-bucket) — the partition
         key gains the bucket, so a hot key spreads over
         span/bucket_seconds tasks and no task ever sorts more than
         one bucket of one key;
      2. MERGE: the per-bucket session SUMMARIES (start, end, n,
         first, last — a few rows per key per bucket, independent of
         event count) go through the SAME lag/cumsum sweep per key,
         merging adjacent summaries whose boundary gap is <= gap.
         Chains spanning many buckets collapse in this one pass
         because the summaries arrive time-ordered per key.

    Correctness: inside a bucket the local pass applies the exact gap
    rule; across buckets the only information needed is each local
    session's (start, end), and merging on start - prev_end <= gap is
    the same rule — so the composition is exact, not approximate.
    ``bucket_seconds`` is a pure parallelism knob (any value works;
    more buckets = more parallelism, more summary rows).
    """
    ep = f"CAST(CAST({ts_col} AS TIMESTAMP) AS DOUBLE)"
    bucketed = events.withColumn(
        "_bucket", F.expr(f"CAST(FLOOR({ep} / {bucket_seconds}) AS BIGINT)")
    )
    # local pass: same sweep, partitioned by (key, bucket)
    w = Window.partitionBy(key_col, "_bucket").orderBy(
        F.col(ts_col), F.col(id_col)
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sec = F.col(ts_col).cast("timestamp").cast("double")
    flagged = bucketed.select(
        F.col(key_col),
        F.col("_bucket"),
        F.col(ts_col),
        F.col(id_col),
        F.when(
            F.lag(sec).over(w).isNull()
            | (sec - F.lag(sec).over(w) > float(gap_seconds)),
            1,
        ).otherwise(0).alias("is_new"),
    ).withColumn("local_idx", F.sum("is_new").over(wrun))
    local = flagged.groupBy(key_col, "_bucket", "local_idx").agg(
        F.expr(f"MIN({ep})").alias("start_s"),
        F.expr(f"MAX({ep})").alias("end_s"),
        F.count("*").alias("n_events"),
        F.min(id_col).alias("first_event"),
        F.max(id_col).alias("last_event"),
    )
    # merge pass: sessionize the summaries (tiny per key) by start time
    wm = Window.partitionBy(key_col).orderBy("start_s", "first_event")
    wmrun = wm.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = local.select(
        F.col(key_col),
        "start_s", "end_s", "n_events", "first_event", "last_event",
        F.when(
            F.lag("end_s").over(wm).isNull()
            | (F.col("start_s") - F.lag("end_s").over(wm) > float(gap_seconds)),
            1,
        ).otherwise(0).alias("is_new"),
    ).withColumn("session_idx", F.sum("is_new").over(wmrun))
    return merged.groupBy(key_col, "session_idx").agg(
        F.expr("CAST(FLOOR(MIN(start_s)) AS BIGINT)").alias("session_start"),
        F.expr("CAST(FLOOR(MAX(end_s)) AS BIGINT)").alias("session_end"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.min("first_event").alias("first_event"),
        F.max("last_event").alias("last_event"),
    ).withColumn(
        "duration_s", F.col("session_end") - F.col("session_start")
    )


# --------------------------------------------- origin-destination flows

EPOCH_DAY_SQL = (
    "CAST(FLOOR(CAST(CAST({ts} AS TIMESTAMP) AS DOUBLE) / 86400) AS BIGINT)"
)


def od_flows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    cell_col: str = "cell_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Origin-destination flow matrix: where do users start each day,
    and how do those anchors move between consecutive OBSERVED days?
    Each user's daily anchor is the cell of the day's first event
    (earliest ts, ties to the smallest id — deterministic); a flow is
    the (from_cell -> to_cell) transition between a user's successive
    anchor days, counted over all users.

    Scale shape (100 TB): the only event-sized operation is the
    per-(user, day) anchor aggregation — min over a (ts, id, cell)
    struct (lexicographic struct order = event order, the
    trajectory_stats_skewed trick), map-side combined, ONE shuffle.
    The lag window and the flow groupBy run over the user-day anchor
    relation, orders of magnitude smaller than the events. A hot user
    is bounded by their day count, not their event count.
    """
    moves = od_moves(events, ts_col, key_col, cell_col, id_col)
    return moves.groupBy("from_cell", "to_cell").agg(
        F.count("*").alias("n_moves"),
        F.countDistinct(key_col).alias("n_users"),
    )


def od_moves(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    cell_col: str = "cell_id",
    id_col: str = "event_id",
) -> DataFrame:
    """The transition relation under ``od_flows``: one row per
    consecutive pair of a user's observed anchor days —
    (key, day, from_cell, to_cell) with ``day`` the destination day.
    Factored out so the streaming twin (streaming/flows_stream.py)
    shares these exact semantics at the row level.

    NULL timestamps are dropped up front: a NULL has no day, and
    leaving it in produced engine-DIVERGENT phantom flows (Spark
    groups NULL day NULLS FIRST in the lag window, DuckDB NULLS LAST —
    opposite transition directions for the same input; round-7 review
    repro). The stream twin drops them for the same reason (no place
    on the watermark axis)."""
    day = EPOCH_DAY_SQL.format(ts=ts_col)
    anchors = (
        events.where(F.col(ts_col).isNotNull())
        .selectExpr(key_col, f"{day} AS day", ts_col, id_col, cell_col)
        .groupBy(key_col, "day")
        .agg(F.min(F.struct(ts_col, id_col, cell_col)).alias("s"))
        .select(key_col, "day", F.col(f"s.{cell_col}").alias("to_cell"))
    )
    w = Window.partitionBy(key_col).orderBy("day")
    return anchors.select(
        key_col, "day", "to_cell", F.lag("to_cell").over(w).alias("from_cell")
    ).where(F.col("from_cell").isNotNull())


def od_flows_oracle_sql(
    events_sql: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
    cell_col: str = "cell_id",
    id_col: str = "event_id",
) -> str:
    """Spec form: ROW_NUMBER picks each day's first event (same ts, id
    tie-break), LAG walks consecutive observed days."""
    day = f"CAST(FLOOR(epoch({ts_col}) / 86400) AS BIGINT)"
    return f"""
WITH ev AS ({events_sql}),
anchors AS (
    SELECT {key_col}, day, {cell_col} AS to_cell FROM (
        SELECT {key_col}, {day} AS day, {cell_col},
               ROW_NUMBER() OVER (
                   PARTITION BY {key_col}, {day}
                   ORDER BY {ts_col}, {id_col}
               ) AS rn
        FROM ev WHERE {ts_col} IS NOT NULL
    ) q WHERE rn = 1
),
moves AS (
    SELECT {key_col}, to_cell,
           LAG(to_cell) OVER (PARTITION BY {key_col} ORDER BY day) AS from_cell
    FROM anchors
)
SELECT from_cell, to_cell, COUNT(*) AS n_moves,
       COUNT(DISTINCT {key_col}) AS n_users
FROM moves WHERE from_cell IS NOT NULL
GROUP BY from_cell, to_cell
""".strip()
