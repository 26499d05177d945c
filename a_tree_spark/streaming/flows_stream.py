"""Streaming origin-destination moves — the stream twin of
``pipeline.temporal.od_moves`` (and, after the downstream aggregation,
``od_flows``).

A user-day's anchor (the day's FIRST event: minimal (ts, id), carrying
its cell) is only final once the watermark passes the END of that day —
any earlier event of the same day may still arrive until then. When a
day finalizes, the transition from the user's previous finalized anchor
day emits as (key, day, from_cell, to_cell), matching ``od_moves``
row-for-row.

State per key is O(pending days + 1), independent of event rate:

- ``carry``: the (day, cell) of the newest FINALIZED anchor — one slot,
  kept forever (consecutive observed days may be arbitrarily far apart,
  the same unbounded-backward shape as the as-of carry);
- ``pending``: {day -> running (ts_ms, id, cell) minimum} for days the
  watermark has not yet closed — each incoming event folds into its
  day's minimum immediately, so a million-event hot day costs ONE state
  entry (the skew story: per-trigger work is bounded by the trigger's
  input, state by the watermark horizon in DAYS).

Keys idle after their last day flush via event-time timeout, same as
``asof_stream``.

Reference capability this generalizes: the reference is a pure
event-at-a-time matcher (src/atree.rs `search`); stateful cross-event
flows are part of the Spark graft surface (SURVEY.md §2.4).
"""

from __future__ import annotations

import pickle

from pyspark.sql import DataFrame, functions as F

from ._time import epoch_us, session_timezone

DAY_MS = 86_400_000
DAY_US = 86_400_000_000


def flows_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    cell_col: str = "cell_id",
    id_col: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """``events``: a *streaming* DataFrame with ``ts_col`` (event time),
    ``key_col``, ``cell_col``, ``id_col``. Returns an append-mode
    stream of finalized transitions: (key, day, from_cell, to_cell) —
    the batch ``od_moves`` schema and values exactly. NULL event times
    cannot finalize on the watermark axis and are dropped, matching
    the batch operator's explicit NULL-ts filter.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(key_col, ts_col, id_col, cell_col)
    )
    session_tz = session_timezone(events)
    output_type = f"{key_col} long, day long, from_cell long, to_cell long"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        carry, pending = (
            pickle.loads(state.get[0]) if state.exists else (None, {})
        )
        wm_ms = state.getCurrentWatermarkMs()
        for pdf in pdfs:
            for d in pdf.to_dict("records"):
                ts_us = epoch_us(d[ts_col], session_tz)
                day = ts_us // DAY_US
                cand = (ts_us, int(d[id_col]), int(d[cell_col]))
                prev = pending.get(day)
                if prev is None or cand < prev:
                    pending[day] = cand
        out: list[tuple] = []
        wm_us = wm_ms * 1_000
        for day in sorted(d for d in pending if (d + 1) * DAY_US <= wm_us):
            cell = pending.pop(day)[2]
            if carry is not None:
                out.append((int(key[0]), day, carry[1], cell))
            carry = (day, cell)
        state.update((pickle.dumps((carry, pending)),))
        if pending:
            # wake when the watermark closes the oldest pending day
            state.setTimeoutTimestamp(
                max(wm_ms + 1, (min(pending) + 1) * DAY_MS)
            )
        if out:
            yield pd.DataFrame(
                out, columns=[key_col, "day", "from_cell", "to_cell"]
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_type,
        stateStructType="blob binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
