"""Deterministic synthetic Common-Crawl-style web pages.

The north_rule input (BASELINE.json input_hint) is an Iceberg table
(url string, warc_ts timestamp, html binary, text string, lang string).
No external data is allowed, so pages are synthesized as a pure function
of page_id (splitmix64 bit mixing — no RNG state), which makes the
generator distributable (spark.range -> mapInPandas) and reproducible:
the same id yields the same page on any executor, any partition layout.

Skew realism (SURVEY.md §7.3.5): ccTLD draw is Zipf-hot (.de/.fr/.jp
take ~60% of pages) and geotags cluster at country centroids, so cell
histograms at level 12 have hot cells that actually exercise salting +
AQE skew handling in the benchmark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

WARC_EPOCH = np.datetime64("2026-06-01T00:00:00")

# (tld, lang, centroid_lat, centroid_lon, weight%) — cumulative draw
TLD_TABLE = [
    ("de", "de", 51.1657, 10.4515, 28),
    ("fr", "fr", 46.2276, 2.2137, 18),
    ("jp", "ja", 36.2048, 138.2529, 14),
    ("com", "en", 39.8283, -98.5795, 12),
    ("co-uk", "en", 55.3781, -3.4360, 8),
    ("ca", "en", 56.1304, -106.3468, 5),
    ("br", "pt", -14.2350, -51.9253, 4),
    ("in", "hi", 20.5937, 78.9629, 4),
    ("it", "it", 41.8719, 12.5674, 3),
    ("nl", "nl", 52.1326, 5.2913, 2),
    ("au", "en", -25.2744, 133.7751, 1),
    ("org", "en", 37.0902, -95.7129, 1),
]
_CUM = np.cumsum([row[4] for row in TLD_TABLE])
assert _CUM[-1] == 100

GEO_META_PCT = 35  # pages carrying an explicit <meta geo.position>


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based hash: deterministic, vectorized, uniform."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _h(page_id: np.ndarray, stream: int) -> np.ndarray:
    return _splitmix64(page_id.astype(np.uint64) * np.uint64(1000003) + np.uint64(stream))


def synth_batch(page_ids: np.ndarray) -> pd.DataFrame:
    """Vectorized page synthesis for an array of ids."""
    ids = np.asarray(page_ids, dtype=np.int64)
    n = len(ids)

    tld_draw = (_h(ids, 1) % np.uint64(100)).astype(np.int64)
    tld_idx = np.searchsorted(_CUM, tld_draw, side="right")
    tlds = np.array([row[0] for row in TLD_TABLE])[tld_idx]
    langs = np.array([row[1] for row in TLD_TABLE])[tld_idx]
    c_lat = np.array([row[2] for row in TLD_TABLE])[tld_idx]
    c_lon = np.array([row[3] for row in TLD_TABLE])[tld_idx]

    host_id = (_h(ids, 2) % np.uint64(50000)).astype(np.int64)
    path_id = (_h(ids, 3) % np.uint64(1000000)).astype(np.int64)

    # geotag jitter: +-2 degrees around the centroid, deterministic
    jitter_lat = ((_h(ids, 4) % np.uint64(40000)).astype(np.float64) / 10000.0) - 2.0
    jitter_lon = ((_h(ids, 5) % np.uint64(40000)).astype(np.float64) / 10000.0) - 2.0
    geo_lat = np.round(c_lat + jitter_lat, 4)
    geo_lon = np.round(c_lon + jitter_lon, 4)
    has_geo = (_h(ids, 6) % np.uint64(100)).astype(np.int64) < GEO_META_PCT

    n_tokens = (20 + (_h(ids, 7) % np.uint64(61))).astype(np.int64)
    token_seed = _h(ids, 8).astype(np.int64)

    ts_offset = (_h(ids, 9) % np.uint64(30 * 86400)).astype("timedelta64[s]")
    warc_ts = WARC_EPOCH + ts_offset

    texts = []
    for i in range(n):
        seed = token_seed[i]
        count = n_tokens[i]
        # multiplicative token stream; vocabulary of 5000 tokens
        toks = (seed + 2654435761 * np.arange(count, dtype=np.int64)) % 5000
        texts.append(" ".join(f"tok{t}" for t in toks.tolist()))

    urls = [
        f"https://site{host_id[i]}.{tlds[i].replace('-', '.')}/page/{path_id[i]}"
        for i in range(n)
    ]
    htmls = []
    for i in range(n):
        meta = (
            f'<meta name="geo.position" content="{geo_lat[i]};{geo_lon[i]}">'
            if has_geo[i]
            else ""
        )
        htmls.append(
            f"<html><head><title>site{host_id[i]}</title>{meta}</head>"
            f"<body><p>{texts[i]}</p></body></html>".encode("utf-8")
        )

    return pd.DataFrame({
        "url": urls,
        "warc_ts": pd.Series(warc_ts),
        "html": htmls,
        "text": texts,
        "lang": langs,
    })


def synth_page(page_id: int) -> dict:
    """Single-row oracle — must equal the vectorized batch byte-for-byte."""
    row = synth_batch(np.array([page_id]))
    return {col: row[col][0] for col in row.columns}


def synth_pages_df(spark, n_pages: int, partitions: int | None = None):
    """Distributed generation: spark.range drives ids; each Arrow batch
    synthesizes its pages locally (pure function of id — no shuffle, no
    driver data movement, arbitrarily parallel)."""
    rng = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)

    def generate(batches):
        for pdf in batches:
            yield synth_batch(pdf["id"].to_numpy())

    return rng.mapInPandas(
        generate,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
