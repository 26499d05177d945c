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


#: the ONE hex-side definition of the synthetic media payload, shared
#: by every oracle that reads bytes (features / frames / resize) — the
#: kind derivation and payload recipe must never fork across oracles
_MEDIA_HEX_CTE = """
SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           md5(text) || md5('p|' || text) AS hx
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


PAYLOAD_BYTES = 32  # md5 || md5 = 32 bytes, fixed-width by construction

_KNOWN_KINDS = ("image", "audio", "video")


def decode_stub(payload: bytes, kind: str) -> list[float]:
    """Scalar STUB for the real codec (PIL/ffmpeg are not in this
    container) — the per-row reference used by pytest. The engine path
    is ``decode_stub_batch`` (vectorized); this stays as documentation
    of the contract + test oracle. Raises for unknown kinds exactly like
    a real decoder would."""
    if kind not in _KNOWN_KINDS:
        raise NotImplementedError(f"no decoder for kind {kind!r}")
    body = bytes(payload)
    return [
        float(sum(body)) / len(body),
        float(max(body)),
        float(min(body)),
        float(body[0] ^ body[-1]),
    ]


def decode_stub_batch(payloads, kinds) -> "object":
    """Vectorized STUB codec: one numpy pass over the whole Arrow batch
    (round 1 looped decode_stub per row — the forbidden per-row-Python
    shape). A real codec swap keeps this exact signature: a batch of
    payload buffers in, an (n, 4) float64 feature matrix out."""
    import numpy as np

    kinds_arr = np.asarray(kinds, dtype=object)
    bad = ~np.isin(kinds_arr, _KNOWN_KINDS)
    if bad.any():
        raise NotImplementedError(
            f"no decoder for kind {kinds_arr[bad][0]!r}"
        )
    # every payload must be exactly PAYLOAD_BYTES: mixed lengths whose
    # total happens to be a multiple of 32 would otherwise reshape into
    # wrong per-row features instead of failing (ADVICE.md round 2)
    lengths = np.fromiter(
        (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
    )
    if (lengths != PAYLOAD_BYTES).any():
        bad_i = int(np.flatnonzero(lengths != PAYLOAD_BYTES)[0])
        raise ValueError(
            f"payload {bad_i} has {lengths[bad_i]} bytes; the stub codec "
            f"requires exactly {PAYLOAD_BYTES}"
        )
    arr = np.frombuffer(b"".join(payloads), dtype=np.uint8).reshape(
        len(payloads), PAYLOAD_BYTES
    )
    sums = arr.sum(axis=1, dtype=np.int64)
    return np.column_stack([
        sums / float(PAYLOAD_BYTES),
        arr.max(axis=1).astype(np.float64),
        arr.min(axis=1).astype(np.float64),
        (arr[:, 0] ^ arr[:, -1]).astype(np.float64),
    ])


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads — the
    production plumbing (mapInPandas, batch-shaped, partition-parallel);
    only the codec is stubbed, and it is batch-vectorized. Output is
    fixed-width (f0..f3 double): feature vectors of a known extractor
    have static arity, and fixed columns stay pruneable/hashable all the
    way through Parquet + the driver harness (round 1's array<double>
    crashed the harness canonicalizer)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = decode_stub_batch(list(pdf["payload"]), pdf["kind"])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "f0": feats[:, 0],
                "f1": feats[:, 1],
                "f2": feats[:, 2],
                "f3": feats[:, 3],
            })

    return media.mapInPandas(
        run,
        schema="doc_id bigint, kind string, f0 double, f1 double, "
               "f2 double, f3 double",
    )


def media_features_oracle(table: str = "documents") -> str:
    """DuckDB oracle for the stubbed features: the payload is
    hex-definable (md5 strings), so per-byte stats are expressible
    relationally — nibble pairs via strpos over the hex alphabet, then
    SUM/MIN/MAX/XOR per doc. Division by 32 (a power of two) is IEEE-
    exact, so even f0 hashes identically."""
    return f"""
WITH media AS ({_MEDIA_HEX_CTE.format(table=table)}),
bytes AS (
    SELECT doc_id, kind, i,
           (strpos('0123456789abcdef', substring(hx, 2 * i - 1, 1)) - 1) * 16
           + strpos('0123456789abcdef', substring(hx, 2 * i, 1)) - 1 AS b
    FROM media, generate_series(1, {PAYLOAD_BYTES}) t(i)
)
SELECT doc_id, kind,
       CAST(SUM(b) AS DOUBLE) / {PAYLOAD_BYTES}.0 AS f0,
       CAST(MAX(b) AS DOUBLE) AS f1,
       CAST(MIN(b) AS DOUBLE) AS f2,
       CAST(xor(MAX(CASE WHEN i = 1 THEN b END),
                MAX(CASE WHEN i = {PAYLOAD_BYTES} THEN b END)) AS DOUBLE) AS f3
FROM bytes GROUP BY doc_id, kind
""".strip()


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Video' frame sampling: pick n byte offsets spread across the
    payload (stands in for timestamp-spread frame grabs); JVM-side
    slicing, no Python. Frames surface as hex so the driver gets a full
    value-level DuckDB oracle (round 1 emitted crc32, which DuckDB
    lacks — this was the last rows-only query)."""
    frames = F.expr(
        f"transform(sequence(0, {n_frames - 1}), "
        f"i -> hex(substring(payload, 1 + i * greatest(length(payload) div {n_frames}, 1), 4)))"
    )
    return (
        media.where(F.col("kind") == "video")
        .select("doc_id", F.posexplode(frames))
        .select(
            "doc_id",
            F.col("pos").cast("bigint").alias("frame_id"),
            F.col("col").alias("frame_hex"),
        )
    )


def sample_frames_oracle(n_frames: int = 4, table: str = "documents") -> str:
    """DuckDB rendering: the payload is hex-definable, so a 4-byte frame
    at byte offset 1+i*step is the 8-char hex slice at 1+2*i*step."""
    # mirror the Spark side's greatest(length div n, 1) clamp: for
    # n_frames > PAYLOAD_BYTES the unclamped step would be 0 and the
    # oracle would diverge (ADVICE.md round 2)
    step = max(PAYLOAD_BYTES // n_frames, 1)
    return f"""
WITH media AS ({_MEDIA_HEX_CTE.format(table=table)})
SELECT doc_id, CAST(i AS BIGINT) AS frame_id,
       upper(substring(hx, 1 + 2 * i * {step}, 8)) AS frame_hex
FROM media, generate_series(0, {n_frames - 1}) t(i)
WHERE kind = 'video'
""".strip()


def resize_media(
    media: DataFrame, out_w: int = 4, out_h: int = 4
) -> DataFrame:
    """'Image' resize: strided byte downsampling of the payload to
    out_w*out_h bytes — the codec itself is the documented stub (a real
    pipeline decodes pixels; the image libs aren't in this container),
    but the Spark-side shape is the real one: a per-row JVM expression
    over the binary column, no Python, no shuffle, output surfaced as
    hex so the driver gets a full value-level DuckDB oracle (same
    contract as sample_frames). Step clamps to 1 when the target
    exceeds the payload (the sample_frames ADVICE-r2 lesson);
    ``n_bytes`` reports the ACTUAL emitted byte count — when the
    clamp fires it is smaller than width*height, and consumers must
    size buffers from n_bytes, never from the requested dims."""
    out_len = min(out_w * out_h, PAYLOAD_BYTES)
    step = max(PAYLOAD_BYTES // out_len, 1)
    pixels = F.expr(
        f"array_join(transform(sequence(0, {out_len - 1}), "
        f"i -> hex(substring(payload, 1 + i * {step}, 1))), '')"
    )
    return (
        media.where(F.col("kind") == "image")
        .select(
            "doc_id",
            F.lit(out_w).cast("bigint").alias("width"),
            F.lit(out_h).cast("bigint").alias("height"),
            F.lit(out_len).cast("bigint").alias("n_bytes"),
            pixels.alias("pixels_hex"),
        )
    )


def resize_media_oracle(
    out_w: int = 4, out_h: int = 4, table: str = "documents"
) -> str:
    """DuckDB rendering over the hex-definable payload: byte i*step is
    the 2-char hex slice at 1 + 2*i*step."""
    out_len = min(out_w * out_h, PAYLOAD_BYTES)
    step = max(PAYLOAD_BYTES // out_len, 1)
    return f"""
WITH media AS ({_MEDIA_HEX_CTE.format(table=table)})
SELECT doc_id, CAST({out_w} AS BIGINT) AS width,
       CAST({out_h} AS BIGINT) AS height,
       CAST({out_len} AS BIGINT) AS n_bytes,
       upper(array_to_string(
           [substring(hx, 1 + 2 * i * {step}, 2)
            for i in generate_series(0, {out_len - 1})], '')) AS pixels_hex
FROM media WHERE kind = 'image'
""".strip()
