"""Streaming deduplication: exact dedup over a continuously-ingested
document stream — the streaming form of ``pipeline/dedup.py``'s
exact_duplicates (a training-data pipeline ingesting crawl batches
needs dedup as a standing stream job, not a batch sweep).

Built on Structured Streaming's stateful ``dropDuplicatesWithinWatermark``
keyed by the content fingerprint: the state store keeps one entry per
distinct md5 inside the watermark horizon, so state is bounded by
(dedup window x ingest rate) — at 1e12 docs the horizon is the
dedup-contract window (exactly how production crawl dedup bounds its
key-value state), while EXACT all-time dedup composes this stream with
a periodic batch `exact_duplicates` compaction over the sink.

Semantics: the FIRST document with a given md5(text) inside the horizon
passes; later copies are dropped. Late documents older than the
watermark may pass again (documented bound, not silent loss) — the
batch compaction catches them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    documents: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """documents: a *streaming* DataFrame with (doc_id, text, ts_col).
    Returns the deduplicated stream (append mode), one row per distinct
    content hash within the watermark horizon."""
    fingerprinted = documents.withColumn("content_hash", F.md5("text"))
    return fingerprinted.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(["content_hash"])
