"""A/B: cell_id-bucketed flagship join vs the plain shuffled join.

Writes the eventized crawl once as a bucketed table and once as plain
parquet, then interleaves the per-cell history query over both inside
one JVM (min-of-N). Prints one JSON line.

Usage: python scripts/bench_bucketing.py [n_pages] [rounds]
"""

from __future__ import annotations

import json
import shutil
import sys
import time


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from a_tree_spark.engine.bucketing import (
        is_exchange_free_join,
        write_bucketed,
    )
    from a_tree_spark.engine.session import get_spark
    from a_tree_spark.web.pipeline import (
        bucketed_cell_history,
        bucketed_page_enrichment,
        eventize_pages,
        run_pipeline,
        write_eventized_bucketed,
    )
    from a_tree_spark.web.synth import synth_pages_df

    spark = get_spark("bench_bucketing")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/tmp/bench_bucketing_tables"
    shutil.rmtree(base, ignore_errors=True)

    pages = synth_pages_df(spark, n_pages)
    eventized = eventize_pages(pages)
    stats = run_pipeline(spark, n_pages, 10_000, pages=pages).where(
        F.col("cell_id").isNotNull()
    )

    spark.sql("DROP TABLE IF EXISTS bb_pages")
    spark.sql("DROP TABLE IF EXISTS bb_stats")
    t0 = time.time()
    write_eventized_bucketed(eventized, "bb_pages", 32, path=f"{base}/pages")
    t_bucket_write = round(time.time() - t0, 3)
    t0 = time.time()
    eventized.where(F.col("cell_id").isNotNull()).write.mode(
        "overwrite"
    ).parquet(f"{base}/pages_plain")
    t_plain_write = round(time.time() - t0, 3)
    write_bucketed(stats, "bb_stats", 32, ["cell_id"],
                   sort_cols=["cell_id"], path=f"{base}/stats")
    stats.write.mode("overwrite").parquet(f"{base}/stats_plain")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    joined = bucketed_cell_history(spark, "bb_pages", "bb_stats")
    assert is_exchange_free_join(joined), "bucketed join must be exchange-free"

    enriched = bucketed_page_enrichment(spark, "bb_pages", "bb_stats")
    assert is_exchange_free_join(enriched), "enrichment must be exchange-free"

    # final global agg so the join output isn't collected (1M rows) but
    # the join itself can't be elided or pre-aggregated away
    final = [F.count("*").alias("n"), F.sum("n_matches").alias("s")]

    def hist_bucketed():
        bucketed_cell_history(spark, "bb_pages", "bb_stats").collect()

    def hist_plain():
        p = spark.read.parquet(f"{base}/pages_plain")
        s = spark.read.parquet(f"{base}/stats_plain")
        (
            p.groupBy("cell_id")
            .agg(F.count("*").alias("n_pages"),
                 F.avg("n_tokens").alias("avg_tokens"))
            .join(s, "cell_id")
            .select("cell_id", "n_pages", "avg_tokens",
                    "n_matches", "n_distinct_subs")
        ).collect()

    def enrich_bucketed():
        bucketed_page_enrichment(spark, "bb_pages", "bb_stats").agg(
            *final
        ).collect()

    def enrich_plain():
        p = spark.read.parquet(f"{base}/pages_plain")
        s = spark.read.parquet(f"{base}/stats_plain")
        p.join(s, "cell_id").agg(*final).collect()

    cases = [
        ("hist_bucketed", hist_bucketed),
        ("hist_shuffled", hist_plain),
        ("enrich_bucketed", enrich_bucketed),
        ("enrich_shuffled", enrich_plain),
    ]
    for _, fn in cases:
        fn()  # warm
    times: dict[str, list[float]] = {name: [] for name, _ in cases}
    for _ in range(rounds):
        for name, fn in cases:
            t0 = time.time()
            fn()
            times[name].append(round(time.time() - t0, 3))

    best = {k: min(v) for k, v in times.items()}
    print(json.dumps({
        "n_pages": n_pages, "runs": times, "best": best,
        "hist_speedup": round(best["hist_shuffled"] / best["hist_bucketed"], 3),
        "enrich_speedup": round(
            best["enrich_shuffled"] / best["enrich_bucketed"], 3
        ),
        "write_sec": {"bucketed": t_bucket_write, "plain": t_plain_write},
    }))
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
