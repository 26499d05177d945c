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


def test_windowed_match_counts_streams_in_append_mode(spark, tmp_path):
    """ADVICE round 1: the watermark declared upstream of match_events
    did not survive the mapInPandas stage, so append mode would be
    rejected and update-mode state grew unbounded. This runs the REAL
    streaming plan end-to-end in append mode — Spark refuses to even
    start an append-mode windowed aggregation without an event-time
    watermark, so a successful run is the regression proof — and checks
    the emitted closed-window counts against batch groundtruth."""
    from pyspark.sql import functions as F
    from a_tree_spark.engine.eventize import EVENT_ATTRIBUTES, eventize_events
    from a_tree_spark.expr import ForestBuilder
    from a_tree_spark.streaming import windowed_match_counts

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    eventized = eventize_events(events).join(
        events.select("event_id", F.col("ts").cast("timestamp").alias("ts")),
        "event_id",
    )
    src = str(tmp_path / "win_src")
    eventized.where("event_id % 2 = 0").coalesce(1).write.parquet(src)
    eventized.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    builder = ForestBuilder(EVENT_ATTRIBUTES)
    builder.insert(1, "event_type = 'click'")

    stream = (
        spark.readStream.schema(eventized.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = windowed_match_counts(stream, builder, window="1 hour", watermark="1 hour")
    query = (
        out.writeStream.format("memory")
        .queryName("win_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    query.awaitTermination(180)

    got = {
        (r["time_window"]["start"], r["sub_id"]): r["n_matches"]
        for r in spark.sql("SELECT * FROM win_append").collect()
    }
    want = {
        (r["time_window"]["start"], r["sub_id"]): r["n_matches"]
        for r in windowed_match_counts(
            eventized, builder, window="1 hour", watermark="1 hour"
        ).collect()
    }
    # append emits only watermark-closed windows; every emitted window
    # must match the batch result exactly, and some must have emitted
    assert len(got) > 0
    for key, n in got.items():
        assert want.get(key) == n


def test_streaming_dedup_drops_in_horizon_copies(spark, tmp_path):
    """Streaming exact dedup: planted copies inside the watermark
    horizon are dropped; one row per distinct content hash survives,
    verified end-to-end through a real file-source stream."""
    from pyspark.sql import functions as F

    from a_tree_spark.streaming import dedup_stream

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(200)
        .select(
            "doc_id",
            "text",
            (F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id"))).alias("ts"),
        )
    )
    # plant copies: every doc_id % 4 == 0 ingested twice (seconds apart)
    dupes = docs.where("doc_id % 4 = 0").withColumn(
        "doc_id", F.col("doc_id") + 100000
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 5 SECONDS"))
    src = docs.unionByName(dupes)
    src_dir = str(tmp_path / "docs_src")
    src.repartition(4).write.parquet(src_dir)

    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    out: list = []
    query = (
        dedup_stream(stream, watermark="10 minutes")
        .writeStream.foreachBatch(
            lambda df, _id: out.extend(
                (r["content_hash"],) for r in df.select("content_hash").collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    n_docs = docs.count()
    distinct_hashes = {h for (h,) in out}
    assert len(out) == n_docs              # one survivor per distinct text
    assert len(distinct_hashes) == n_docs  # no duplicate made it through
