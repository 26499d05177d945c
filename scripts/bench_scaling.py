"""Two-parallelism scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 between N and 4N executors; sandboxed per BASELINE.md
as the same job at two parallelism levels).

Protocol: one local[32] session; the flagship job runs with its input
coalesced to 8 vs 64 partitions (8 vs 32 concurrent tasks — "N vs 4N
cores"), with shuffle partitions scaled to match. The two levels are
INTERLEAVED run-by-run and each level takes its best time: the sandbox
host steals CPU in multi-minute streaks, and interleaving at ~10s
granularity exposes both levels to the same noise instead of letting a
streak poison one side (separate-JVM local[8]/local[32] runs measured
anything from 0.06 to 0.5 "efficiency" purely by luck of the window).

Writes BENCH/BASELINE.md with throughputs and
  eff = (docs_per_sec@4N / docs_per_sec@N) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _pages_parquet
    from a_tree_spark.engine.session import get_spark
    from a_tree_spark.web import build_page_forest
    from a_tree_spark.web.pipeline import (
        cell_stats_from_root_partials,
        fused_match_pages,
        root_subscription_map,
    )

    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "400000"))
    n_subs = int(os.environ.get("SPARK_GRAFT_SUBS", "10000"))
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "5"))
    low_cores, high_cores = 8, 32

    spark = get_spark(
        "a_tree_spark-scaling",
        cpus=high_cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    pages_path = _pages_parquet(spark, n_pages)
    forest = build_page_forest(n_subs)
    forest.compile()
    root_map = root_subscription_map(spark, forest).cache()
    root_map.count()

    def run_at(cores: int) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(2 * cores))
        pages = (
            spark.read.parquet(pages_path)
            .coalesce(cores)
            .withColumn("page_key", F.monotonically_increasing_id())
        )
        t0 = time.time()
        cell_stats_from_root_partials(
            fused_match_pages(pages, forest, emit="cell_root_partials"),
            root_map,
        ).count()
        return time.time() - t0

    # warm every worker + buffers at both partition counts
    run_at(high_cores)
    run_at(low_cores)

    times = {low_cores: [], high_cores: []}
    for _ in range(rounds):
        times[low_cores].append(run_at(low_cores))
        times[high_cores].append(run_at(high_cores))

    best_low, best_high = min(times[low_cores]), min(times[high_cores])
    thr_low, thr_high = n_pages / best_low, n_pages / best_high
    efficiency = (thr_high / thr_low) / (high_cores / low_cores)
    spark.stop()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — two-parallelism scaling evidence",
        "",
        "north_rule criterion: throughput scaling efficiency >= 0.8 between",
        "N and 4N executors. Sandbox evidence (per BASELINE.md): the same",
        f"job and input at {low_cores} vs {high_cores} concurrent cores,",
        "interleaved run-by-run inside one JVM to cancel host CPU-steal",
        "streaks (this VM shows 4-21% steal in bursts; separate-process",
        "local[8]/local[32] measurements swing 4x on identical code).",
        "",
        f"Measured {datetime.now(timezone.utc).isoformat(timespec='seconds')}",
        "",
        "## Flagship: fused web pipeline",
        "",
        f"{n_pages} pages (materialized parquet), {n_subs} standing "
        "subscriptions; extract -> geotag -> cell encode -> vectorized "
        "match -> salted per-cell agg, single fused Python stage.",
        "",
        "| parallelism | best docs/sec | best sec | all runs (sec) |",
        "|---|---|---|---|",
        f"| {low_cores} cores (N) | {thr_low:,.0f} | {best_low:.2f} | "
        f"{[round(t, 2) for t in times[low_cores]]} |",
        f"| {high_cores} cores (4N) | {thr_high:,.0f} | {best_high:.2f} | "
        f"{[round(t, 2) for t in times[high_cores]]} |",
        "",
        f"**speedup at 4x cores: {thr_high / thr_low:.2f}x  ->  "
        f"scaling efficiency: {efficiency:.3f}**"
        + ("  (>= 0.8: PASS)" if efficiency >= 0.8 else "  (< 0.8: FAIL)"),
        "",
        "Raw JSON:",
        "```json",
        json.dumps({
            "n_pages": n_pages, "n_subscriptions": n_subs,
            "times_low": times[low_cores], "times_high": times[high_cores],
            "efficiency": round(efficiency, 4),
        }),
        "```",
        "",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"efficiency={efficiency:.3f} -> {path}")


if __name__ == "__main__":
    main()
