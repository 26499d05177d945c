"""A/B: single-forest vs k-shard flagship at the same page count.

Forests are built and compiled OUTSIDE the timed region (driver-side
insert of 1e6 expressions costs ~60s one-time and would otherwise
dominate); the timed region is the distributed pipeline only, matching
bench.py's convention. Levels interleave inside ONE JVM (min-of-N per
level) so host CPU-steal streaks hit both sides alike. Prints one JSON
line.

Usage: python scripts/bench_sharding.py [n_pages] [n_subs] [rounds] [shard_list]
e.g.   python scripts/bench_sharding.py 2000000 1000000 2 1,4
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_subs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    shard_list = (
        [int(x) for x in sys.argv[4].split(",")] if len(sys.argv) > 4
        else [1, 2, 4]
    )

    from pyspark.sql import functions as F

    from a_tree_spark.engine.session import get_spark
    from a_tree_spark.web.pipeline import (
        build_forests,
        cell_stats_from_root_partials,
        fused_match_pages,
        root_subscription_map,
        run_pipeline,
        shard_subscriptions,
        sharded_root_partials,
        standing_page_subscriptions,
    )
    from a_tree_spark.web.synth import synth_pages_df

    spark = get_spark("bench_sharding")
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth_pages_df(spark, n_pages)
    keyed = pages.withColumn("page_key", F.monotonically_increasing_id())

    subs = standing_page_subscriptions(n_subs)
    t0 = time.time()
    forests_by_k = {
        k: build_forests(shard_subscriptions(subs, k)) for k in shard_list
    }
    build_sec = round(time.time() - t0, 1)
    broadcast_mb = {}
    for k, forests in forests_by_k.items():
        import pickle

        from a_tree_spark.expr.vector import BatchEvaluator

        sizes = [
            len(pickle.dumps(BatchEvaluator(f.compile()))) for f in forests
        ]
        broadcast_mb[f"shards_{k}"] = [round(s / 1e6, 2) for s in sizes]

    # warm every python worker
    run_pipeline(spark, 50_000, 1_000, pages=synth_pages_df(spark, 50_000)
                 ).collect()

    def run(k):
        forests = forests_by_k[k]
        if k == 1:
            partials = fused_match_pages(
                keyed, forests[0], emit="cell_root_partials"
            )
            root_map = root_subscription_map(spark, forests[0])
        else:
            partials, root_map = sharded_root_partials(keyed, forests)
        cell_stats_from_root_partials(partials, root_map).collect()

    times: dict[str, list[float]] = {f"shards_{k}": [] for k in shard_list}
    for _ in range(rounds):
        for k in shard_list:
            t0 = time.time()
            run(k)
            times[f"shards_{k}"].append(round(time.time() - t0, 3))

    best = {k: min(v) for k, v in times.items()}
    base = best[f"shards_{shard_list[0]}"]
    print(json.dumps({
        "n_pages": n_pages, "n_subs": n_subs, "runs": times, "best": best,
        "overhead_vs_first": {k: round(v / base, 3) for k, v in best.items()},
        "docs_per_sec": {k: round(n_pages / v, 1) for k, v in best.items()},
        "forest_build_sec_total": build_sec,
        "broadcast_mb": broadcast_mb,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
