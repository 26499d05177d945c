"""spark-submit entry point for the fused web pipeline (north_rule:
"runs via spark-submit --py-files on a multi-executor cluster").

Usage (see scripts/run_submit.sh which builds the --py-files zip):

    spark-submit --master <cluster> --py-files a_tree_spark.zip \
        scripts/submit_pipeline.py \
        --pages <parquet path or synth:N> --subscriptions 100000 \
        --output /path/out --checkpoint-root /path/ckpt

Stages checkpoint per-unit lineage through StageCheckpoint, so a killed
job resumes exactly where it stopped.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pages", default="synth:1000000",
                        help="pages parquet path, or synth:N")
    parser.add_argument("--subscriptions", type=int, default=100000)
    parser.add_argument("--output", default="/tmp/a_tree_spark_out")
    parser.add_argument("--checkpoint-root", default="/tmp/a_tree_spark_ckpt")
    parser.add_argument("--units", type=int, default=64,
                        help="resume granularity (work units)")
    def shards_arg(value: str):
        # validate at parse time: a typo must fail BEFORE Spark startup
        # and input synthesis, not minutes later with a raw ValueError
        if value == "auto":
            return value
        try:
            return int(value)
        except ValueError:
            raise argparse.ArgumentTypeError(
                f"--shards expects an integer or 'auto', got {value!r}"
            )

    parser.add_argument("--shards", type=shards_arg, default=1,
                        help="partition the subscription set into k "
                             "independent forests (10M+ distinct-root "
                             "scale; see web.pipeline.sharded_root_partials)"
                             " — or 'auto' to derive k from the exact "
                             "node count (count_forest_nodes)")
    args = parser.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from functools import reduce

    from pyspark.sql import DataFrame

    from a_tree_spark.pipeline.checkpoint import StageCheckpoint
    from a_tree_spark.web import build_page_forest, synth_pages_df
    from a_tree_spark.web.pipeline import (
        build_forests,
        choose_shards,
        count_forest_nodes,
        fused_match_pages,
        salted_cell_stats,
        shard_subscriptions,
        standing_page_subscriptions,
    )

    # on a cluster the master/conf come from spark-submit; fall back to
    # the tuned local session for standalone runs
    spark = SparkSession.getActiveSession()
    if spark is None:
        builder = SparkSession.builder.appName("a_tree_spark-pipeline")
        spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.pages.startswith("synth:"):
        pages = synth_pages_df(spark, int(args.pages.split(":", 1)[1]))
    else:
        pages = spark.read.parquet(args.pages)

    subs = None
    if args.shards == "auto":
        subs = standing_page_subscriptions(args.subscriptions)
        n_shards = choose_shards(count_forest_nodes(subs))
        print(f"auto-sharding: {n_shards} forest(s)")
    else:
        n_shards = args.shards
    if n_shards > 1:
        # subscription-set sharding: k independent forests; the
        # sub-level match streams union directly (sub ids are globally
        # unique across shards, no root disambiguation needed)
        if subs is None:
            subs = standing_page_subscriptions(args.subscriptions)
        forests = build_forests(shard_subscriptions(subs, n_shards))
    else:
        forests = [build_page_forest(args.subscriptions)]
    keyed = pages.withColumn("page_key", F.xxhash64("url")).withColumn(
        "unit_id", F.pmod(F.xxhash64("url"), F.lit(args.units))
    )

    ckpt = StageCheckpoint(spark, args.checkpoint_root, "match")
    units = spark.range(args.units).select(F.col("id").alias("unit_id"))

    def compute(pending):
        subset = keyed.join(F.broadcast(pending), "unit_id")
        matched = reduce(
            DataFrame.union,
            [fused_match_pages(subset, f) for f in forests],
        )
        return matched.join(
            keyed.select("page_key", "unit_id").distinct(), "page_key"
        )

    matches = ckpt.run_stage(units, compute)
    stats = salted_cell_stats(matches)
    stats.write.mode("overwrite").parquet(args.output)
    print(f"wrote per-cell stats: {stats.count()} cells -> {args.output}")
    print(f"lineage audit mismatches: {ckpt.verify().count()}")


if __name__ == "__main__":
    main()
