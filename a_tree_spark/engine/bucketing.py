"""Bucketed-table plumbing: co-located joins without a shuffle.

At 100 TB the dominant recurring cost of the spatial pipeline is
re-shuffling big tables onto their join keys. Spark's native bucketing
amortizes that shuffle into the WRITE: a table written with
``bucketBy(n, key)`` is physically partitioned by ``hash(key) % n``,
and a join between two tables bucketed the same way (same key, same
bucket count) reads bucket i against bucket i — the executed plan has
NO Exchange on either side (pinned by ``tests/test_sources.py``).

Where this pays in this engine:

- the eventized-pages table keyed by ``cell_id`` is joined repeatedly
  (per-cell polygon refinement, per-cell stats history, match-output
  expansion); one bucketed write of the nightly crawl makes every
  downstream cell join shuffle-free;
- dedup pair verification re-joins the documents table per candidate
  batch — a ``doc_id``-bucketed documents table turns each into a
  local join;
- the subscriptions side is always broadcast (6 MB at 1e6 subs,
  BENCH/BASELINE.md) — bucketing is for the BIG-big joins that
  broadcast can't cover.

Bucket-count sizing: buckets are the unit of read parallelism AND the
file count per write task, so pick ``n_buckets`` ~ cluster cores at
the target scale (a power of two keeps re-bucketing to k*n cheap).
Bucketed tables require the session catalog (``saveAsTable``); pass
``path`` to keep the data external to the warehouse directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list,
    sort_cols: list | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally per-bucket sorted) table.
    Sorting by the join key additionally removes the join's Sort nodes
    (sort-merge join reads presorted buckets)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def is_exchange_free_join(joined: DataFrame) -> bool:
    """True when the executed plan contains no Exchange — the property
    a co-located bucketed join must have (used by tests and by
    deployment smoke checks; AQE re-plans can only REMOVE exchanges
    that were speculative, never add one to a bucketed join)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
