"""Multimodal columns: opaque binary payloads with typed metadata.

The container ships no image/audio codecs, so the DECODE step is a
clearly marked stub (deterministic fake features) behind the real Spark
plumbing — schema, Arrow batch shape, partitioning and UDF signatures
are production-shaped (north_rule: multimodal ops are first-class
pipeline components; the codec swap is a one-function change).

Layout: media table (doc_id, kind, payload binary, width, height,
duration_ms) synthesized deterministically from the documents table.
Metadata derivations are SQL-parity (oracle-checked); feature
extraction / frame sampling run as Arrow-batched kernels (rows-only
driver check + pytest oracle).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       {unhex}(md5(text) || md5('p|' || text)) AS payload,
       CAST(64 + (doc_id % 8) * 32 AS BIGINT) AS width,
       CAST(64 + (doc_id % 5) * 48 AS BIGINT) AS height,
       CAST(1000 + (doc_id % 97) * 250 AS BIGINT) AS duration_ms
FROM {table}
""".strip()


def media_table(documents: DataFrame) -> DataFrame:
    """Deterministic opaque payloads (32 bytes of md5 material) + typed
    metadata — the engine-side media source."""
    documents.createOrReplaceTempView("_media_base")
    return documents.sparkSession.sql(
        MEDIA_SQL.format(table="_media_base", unhex="unhex")
    )


def media_metadata_oracle(table: str = "documents") -> str:
    """Metadata-only oracle (payload bytes stay engine-side; DuckDB's
    from_hex and Spark's unhex agree but binary columns don't hash
    portably in the driver harness)."""
    return f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(64 + (doc_id % 8) * 32 AS BIGINT) AS width,
       CAST(64 + (doc_id % 5) * 48 AS BIGINT) AS height,
       CAST(1000 + (doc_id % 97) * 250 AS BIGINT) AS duration_ms,
       CAST((64 + (doc_id % 8) * 32) * (64 + (doc_id % 5) * 48) AS BIGINT)
           AS n_pixels
FROM {table}
""".strip()


def media_metadata(documents: DataFrame) -> DataFrame:
    media = media_table(documents)
    return media.select(
        "doc_id", "kind", "width", "height", "duration_ms",
        (F.col("width") * F.col("height")).alias("n_pixels"),
    )


def decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB for the real codec (PIL/ffmpeg are not in this container).

    Deterministic fake feature vector from the payload bytes; the real
    implementation would decode and pool actual pixels/samples. Raises
    for unknown kinds exactly like a real decoder would."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind {kind!r}")
    body = bytes(payload)
    return [
        float(sum(body)) / len(body),
        float(max(body)),
        float(min(body)),
        float(body[0] ^ body[-1]),
    ]


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads — the
    production plumbing (mapInPandas, batch-shaped, partition-parallel);
    only decode_stub is fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            features = [
                decode_stub(payload, kind)
                for payload, kind in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "features": features,
            })

    return media.mapInPandas(
        run, schema="doc_id bigint, kind string, features array<double>"
    )


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Video' frame sampling: pick n byte offsets spread across the
    payload (stands in for timestamp-spread frame grabs); JVM-side
    slicing, no Python."""
    frames = F.expr(
        f"transform(sequence(0, {n_frames - 1}), "
        f"i -> substring(payload, 1 + i * greatest(length(payload) div {n_frames}, 1), 4))"
    )
    return (
        media.where(F.col("kind") == "video")
        .select("doc_id", F.explode(frames).alias("frame_bytes"))
        .withColumn("frame_crc", F.crc32("frame_bytes"))
        .drop("frame_bytes")
    )
