"""Streaming matcher == batch matcher on the same data (micro-batch
reuse makes this equality structural; the test pins it end-to-end
through a real file-source stream)."""

import pytest

from tests.conftest import SF_DIR


def test_stream_matches_equal_batch(spark, tmp_path):
    from a_tree_spark.engine.eventize import (
        EVENT_ATTRIBUTES,
        STANDING_SUBSCRIPTIONS,
        eventize_events,
    )
    from a_tree_spark.engine.matcher import match_events
    from a_tree_spark.expr import ForestBuilder
    from a_tree_spark.streaming import match_stream

    eventized = eventize_events(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    src_dir = str(tmp_path / "stream_src")
    eventized.repartition(4).write.parquet(src_dir)

    builder = ForestBuilder(EVENT_ATTRIBUTES)
    for sub_id, expression in STANDING_SUBSCRIPTIONS.items():
        builder.insert(sub_id, expression)

    stream = spark.readStream.schema(eventized.schema).parquet(src_dir)
    collected: list = []

    def sink(matches, batch_id):
        collected.extend(map(tuple, matches.select("event_id", "sub_id").collect()))

    query = match_stream(
        stream, builder, sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    query.awaitTermination(120)

    batch = sorted(map(tuple, match_events(eventized, builder)
                       .select("event_id", "sub_id").collect()))
    assert sorted(collected) == batch and len(batch) > 0


def test_windowed_match_counts_plan(spark):
    """Stateful windowed aggregation builds with watermark + window
    (plan-level check; semantics ride on match_events equality)."""
    from a_tree_spark.engine.eventize import EVENT_ATTRIBUTES, eventize_events
    from a_tree_spark.expr import ForestBuilder
    from a_tree_spark.streaming import windowed_match_counts
    from pyspark.sql import functions as F

    eventized = eventize_events(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    ).withColumn("ts", F.current_timestamp())
    builder = ForestBuilder(EVENT_ATTRIBUTES)
    builder.insert(1, "event_type = 'click'")

    out = windowed_match_counts(eventized, builder)
    assert set(out.columns) == {"time_window", "sub_id", "n_matches"}
    assert out.count() > 0  # batch-mode execution of the same plan works
