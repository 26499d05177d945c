"""Structured Streaming variant of the matcher (SURVEY.md §2.4 bottom
row): micro-batches reuse the exact batch matcher via foreachBatch, so
streaming and batch semantics are identical by construction — the
reference's event-at-a-time search becomes match-per-micro-batch.

Watermarking on the event-time column bounds state for windowed
downstream aggregations; the match stage itself is stateless (the
broadcast forest is the only state, owned by the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..engine.matcher import match_events
from ..expr import ForestBuilder


def match_stream(
    stream: DataFrame,
    forest: ForestBuilder,
    sink,
    event_id_col: str = "event_id",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """stream: a readStream DataFrame with the attribute columns.
    sink: fn(matches_df, batch_id) — e.g. write to a table/topic.
    Returns the started StreamingQuery."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        matches = match_events(batch_df, forest, event_id_col=event_id_col)
        sink(matches, batch_id)

    writer = stream.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_match_totals(
    matches_stream: DataFrame,
    emit_sink,
):
    """Custom stateful streaming operator (applyInPandasWithState):
    running per-subscription cumulative match totals across micro-
    batches — state survives between triggers via the state store,
    the pattern for any custom accumulator the built-in windowed
    aggregations can't express.

    matches_stream: a *streaming* DataFrame with a sub_id column (e.g.
    produced inside foreachBatch is not allowed — feed the eventized
    stream through match_events first; match_events is stream-safe
    because mapInArrow is stateless).
    emit_sink: fn(totals_df, batch_id) for foreachBatch-free testing we
    instead return the writer; see tests.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        new_matches = 0
        for pdf in pdfs:
            new_matches += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += new_matches
        state.update((total,))
        yield pd.DataFrame({
            "sub_id": [key[0]],
            "total_matches": [total],
            "batch_matches": [new_matches],
        })

    return matches_stream.groupBy("sub_id").applyInPandasWithState(
        update,
        outputStructType="sub_id bigint, total_matches bigint, batch_matches bigint",
        stateStructType="total bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_match_counts(
    stream: DataFrame,
    forest: ForestBuilder,
    ts_col: str = "ts",
    event_id_col: str = "event_id",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """Stateful variant: per-(window, sub_id) match counts with a
    watermark so late events older than the watermark are dropped and
    state stays bounded. Use with writeStream in update/append mode.

    The watermark is applied to the match_events OUTPUT: mapInArrow
    emits fresh attributes, so a watermark declared upstream does not
    survive the Python stage and the windowed aggregation would run
    unbounded (ADVICE.md round 1). ts rides through via carry_cols and
    the watermark is (re)declared on the carried column — verified by a
    real streaming run in tests/test_streaming.py."""
    matches = match_events(
        stream, forest, event_id_col=event_id_col, carry_cols=[ts_col]
    )
    return matches.withWatermark(ts_col, watermark).groupBy(
        F.window(F.col(ts_col), window).alias("time_window"),
        F.col("sub_id"),
    ).agg(F.count("*").alias("n_matches"))
