"""Streaming as-of join — the stream twin of ``pipeline.temporal.
asof_join`` / ``asof_join_skewed`` (VERDICT r6 item 5).

For every left event: the most recent right event with
``right.ts <= left.ts`` on the same key, ties among right rows breaking
to the greatest ``right_id`` — identical semantics to the batch sweep,
emitted in append mode once the watermark guarantees the answer is
final.

Why a custom stateful operator: Spark's built-in stream-stream joins
need a RANGE condition bounding how far back the right side may reach
(that is the interval join, ``interval_join_stream.py``); as-of
semantics are unbounded backward ("the latest right ever"), which no
watermarked join condition can express — but ONE carried row per key
can. The operator keeps exactly:

- ``carry``: the single latest right row at-or-before the watermark
  (O(1) per key, FOREVER — this is what makes unbounded-backward
  semantics watermark-compatible), and
- ``pending``: rows newer than the watermark, not yet safe to finalize
  (bounded by the watermark horizon x the key's arrival rate).

A left row finalizes when the watermark passes its timestamp: any
still-arriving right row must carry ``ts >= watermark`` (older rows
are dropped as late), so nothing can retroactively beat the carry.

Skew story (the batch ``asof_join_skewed`` concern, restated for
streams): the batch hazard is a hot key serializing its ENTIRE history
through one task, which the bucketed two-phase plan spreads over
time-buckets. In the streaming form that hazard is structurally
smaller — per-trigger work for a hot key is bounded by the trigger's
input for that key plus the watermark-horizon pending set, never by
the key's total history, and the carried state does not grow at all.
The residual concentration (one state-store partition does the hot
key's per-trigger sweep) is the same local sort the batch LOCAL phase
runs per bucket; if a single trigger's input for one key exceeds a
task's comfort, shorten the trigger interval — the stream equivalent
of shrinking ``bucket_seconds``. See BENCH/PLANS.md "skew-proof
streaming twins".

Reference semantics: the as-of tie-break and inclusive-<= behavior are
pinned to the same oracle as the batch rows (`asof_join_oracle_sql`);
stream/batch parity is pinned by
tests/test_streaming.py::test_asof_stream_matches_batch.
"""

from __future__ import annotations

import pickle

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType

from ..pipeline.temporal import _asof_tagged_union


def asof_stream(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_id: str = "event_id",
    right_vals: dict[str, str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """``left``/``right``: *streaming* DataFrames sharing ``on`` and
    ``ts_col``. Returns an append-mode stream of finalized left rows:
    all left columns + ``asof_<right_id>`` + one ``asof_<alias>`` per
    ``right_vals`` entry (NULL when no prior right row exists) — the
    batch ``asof_join`` output schema exactly.

    A left row is emitted in the first trigger whose watermark exceeds
    its timestamp; keys idle in a trigger flush via event-time timeout,
    so emission needs no per-key traffic after the watermark moves.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    left = left.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    right = right.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    merged, left_cols, carried = _asof_tagged_union(
        left, right, on, ts_col, right_id, right_vals
    )
    # a NULL event time has no place on the watermark axis; the batch
    # twin keeps NULL-ts left rows (with NULL asof columns) but a
    # stream cannot ever finalize them — drop, and document the
    # divergence here (right-side NULL ts is already dropped by
    # _asof_tagged_union in both forms)
    merged = (
        merged.drop("_packed")
        .filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
    )

    from ._time import epoch_us, session_timezone

    session_tz = session_timezone(merged)
    mschema = {f.name: f for f in merged.schema.fields}
    out_fields = [mschema[c] for c in left_cols] + [
        mschema[c] for c in carried
    ]
    output_type = StructType(out_fields)
    data_cols = left_cols + carried  # ts/key live inside left_cols
    rid = f"asof_{right_id}"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        carry, pending = (
            tuple(pickle.loads(state.get[0])) if state.exists else (None, [])
        )
        wm_us = state.getCurrentWatermarkMs() * 1_000
        for pdf in pdfs:
            # dict records, not itertuples: pandas renames
            # underscore-prefixed columns (_side) to positional _N there
            for d in pdf.to_dict("records"):
                sort_id = d[rid]
                pending.append((
                    # µs, not ms: sub-ms ts ties must order exactly as
                    # the batch sweep's full-precision timestamps do
                    # (shared helper, round-7 review)
                    epoch_us(d[ts_col], session_tz),
                    int(d["_side"]),
                    -1 if sort_id is None or pd.isna(sort_id) else int(sort_id),
                    {c: d[c] for c in data_cols},
                ))
        # finalize everything below the watermark in (ts, side, id)
        # order — right before left at equal ts gives inclusive <=,
        # greatest right_id wins a right-side ts tie (the batch sweep's
        # exact ordering)
        pending.sort(key=lambda r: (r[0], r[1], r[2]))
        out_rows: list[dict] = []
        still: list = []
        for row in pending:
            if row[0] >= wm_us:
                still.append(row)
            elif row[1] == 0:
                carry = {c: row[3][c] for c in carried}
            else:
                vals = dict(row[3])
                for c in carried:
                    vals[c] = carry[c] if carry is not None else None
                out_rows.append(vals)
        state.update((pickle.dumps((carry, still)),))
        if still:
            # wake this key when the watermark passes its oldest
            # pending row, even if no further traffic arrives for it
            # the timeout API is in ms; round the oldest pending µs UP
            # so the wake strictly exceeds that row's event time
            oldest_ms = -(-min(r[0] for r in still) // 1_000)
            state.setTimeoutTimestamp(max(wm_us // 1_000, oldest_ms) + 1)
        if out_rows:
            yield pd.DataFrame(
                {c: [r[c] for r in out_rows] for c in data_cols}
            )

    return merged.groupBy(on).applyInPandasWithState(
        update,
        outputStructType=output_type,
        stateStructType="blob binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
