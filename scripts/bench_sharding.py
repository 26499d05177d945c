"""A/B: single-forest vs k-shard flagship at the same page count.

Interleaves the levels inside ONE JVM (min-of-N per level) so host
CPU-steal streaks hit both sides alike. Prints one JSON line.

Usage: python scripts/bench_sharding.py [n_pages] [n_subs] [rounds]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_subs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from a_tree_spark.engine.session import get_spark
    from a_tree_spark.web.pipeline import run_pipeline
    from a_tree_spark.web.synth import synth_pages_df

    spark = get_spark("bench_sharding")
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth_pages_df(spark, n_pages)

    # warm every python worker (first-touch imports cost seconds/worker)
    run_pipeline(spark, 50_000, 1_000, pages=synth_pages_df(spark, 50_000)
                 ).collect()

    times: dict[str, list[float]] = {"shards_1": [], "shards_2": [],
                                     "shards_4": []}
    for _ in range(rounds):
        for name, k in [("shards_1", 1), ("shards_2", 2), ("shards_4", 4)]:
            t0 = time.time()
            run_pipeline(spark, n_pages, n_subs, strategy="fused",
                         pages=pages, n_shards=k).collect()
            times[name].append(round(time.time() - t0, 3))

    best = {k: min(v) for k, v in times.items()}
    print(json.dumps({
        "n_pages": n_pages, "n_subs": n_subs, "runs": times, "best": best,
        "overhead_2shard": round(best["shards_2"] / best["shards_1"], 3),
        "overhead_4shard": round(best["shards_4"] / best["shards_1"], 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
