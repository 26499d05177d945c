"""Custom stateful streaming operator: cumulative per-subscription
totals must accumulate ACROSS micro-batches (state-store persistence),
and the final totals must equal the batch matcher's counts."""

import pytest

from tests.conftest import SF_DIR


def test_stateful_totals_accumulate_across_batches(spark, tmp_path):
    from pyspark.sql import functions as F

    from a_tree_spark.engine.eventize import (
        EVENT_ATTRIBUTES,
        STANDING_SUBSCRIPTIONS,
        eventize_events,
    )
    from a_tree_spark.engine.matcher import match_events
    from a_tree_spark.expr import ForestBuilder
    from a_tree_spark.streaming import stateful_match_totals

    eventized = eventize_events(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    src = str(tmp_path / "src")
    # two files + maxFilesPerTrigger=1 => two micro-batches
    eventized.where("event_id % 2 = 0").coalesce(1).write.parquet(src)
    eventized.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    builder = ForestBuilder(EVENT_ATTRIBUTES)
    for sub_id, expression in STANDING_SUBSCRIPTIONS.items():
        builder.insert(sub_id, expression)

    stream = (
        spark.readStream.schema(eventized.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    matches = match_events(stream, builder)
    totals = stateful_match_totals(matches, None)

    emitted: list = []

    def sink(df, batch_id):
        for row in df.collect():
            emitted.append((batch_id, row["sub_id"], row["total_matches"],
                            row["batch_matches"]))

    query = (
        totals.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)

    batch_ids = sorted({b for b, *_ in emitted})
    assert len(batch_ids) >= 2  # state really crossed a batch boundary

    # final cumulative totals == batch matcher counts
    final: dict[int, int] = {}
    for _, sub_id, total, _ in sorted(emitted):
        final[sub_id] = total
    expected = {
        row["sub_id"]: row["n"]
        for row in match_events(eventized, builder)
        .groupBy("sub_id").agg(F.count("*").alias("n")).collect()
    }
    assert final == expected

    # cumulative = monotone across batches for any sub seen twice
    per_sub: dict[int, list] = {}
    for batch_id, sub_id, total, batch_matches in sorted(emitted):
        per_sub.setdefault(sub_id, []).append((batch_id, total, batch_matches))
    crossed = [s for s, rows in per_sub.items() if len(rows) > 1]
    assert crossed
    for sub in crossed:
        rows = per_sub[sub]
        assert rows[-1][1] == sum(r[2] for r in rows)  # total == sum of batches
