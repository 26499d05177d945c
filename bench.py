"""Benchmark runner — prints ONE JSON line with per-query seconds.

Headline: the north-star fused pipeline (web pages -> extract -> geotag
-> cell encode -> match 10k standing subscriptions -> salted per-cell
aggregation), measured in docs/sec from a materialized parquet pages
table (generation cost excluded — the north_rule input is a pre-existing
Iceberg/parquet table). Plus the operator suite over the driver tables
at $SPARK_GRAFT_SF_DIR.

Scaling evidence (BASELINE.md): run with SPARK_GRAFT_CPUS=8 and =32 on
the same input; scripts/bench_scaling.py writes BENCH/BASELINE.md.

Round-6 protocol change: every timed action is a noop-sink write (full
materialization of every output column); rounds 1-5 used df.count(),
under which Catalyst prunes operators the count does not need (the
as-of sweep's Window vanished entirely). Per-query times are therefore
not strictly comparable to BENCH_r05 and earlier — where a row got
slower, suspect the old number, not a regression.

Round-7 protocol change: the final stdout line carries ONLY per-query
min seconds + scalars (~2 KB); per-run walls and steal%% go to
BENCH/RUNS_latest.json (round 6 put them on the parsed line and blew
the driver's tail capture — BENCH_r06 recorded parsed:null).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _cpu_stat() -> tuple[int, int]:
    """(total jiffies, steal jiffies) from the aggregate /proc/stat line."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals), (vals[7] if len(vals) > 7 else 0)


def _timed_with_steal(fn) -> tuple[float, float]:
    """Wall seconds + host CPU steal%% observed DURING the run — the
    round-5 driver window recorded a 2.6x flagship regression that the
    builder's same-code quiet windows contradicted, but the artifact
    had no steal data to adjudicate it (VERDICT r5 item 3)."""
    total0, steal0 = _cpu_stat()
    t0 = time.time()
    fn()
    wall = time.time() - t0
    total1, steal1 = _cpu_stat()
    steal = 100.0 * (steal1 - steal0) / max(1, total1 - total0)
    return wall, round(steal, 2)


def _min_of_n(fn, min_runs: int, cap: int, extended_cap: int, budget_s: float = 60.0):
    """Adaptive min-of-N: run until the two best agree within 20%%.

    Extension rule (round 7): extend the cap ONCE, and only when the
    original cap is exhausted with the best two still disagreeing —
    the round-6 rule (spread > 1.5x anywhere post-warmup) let a single
    fast outlier extend the window even when the answer was already
    settled, burning ~2x runs on flagship-scale jobs (ADVICE r6).

    ``budget_s`` bounds total wall per query: with the noop sink
    forcing full materialization of 45 queries, an unconverged
    steal-heavy row could stretch the suite past the driver's bench
    budget (one cause of the truncated r6 artifact). A row cut short
    by budget is still adjudicable — its per-run steal%% is recorded
    in the side artifact."""
    runs: list[float] = []
    steals: list[float] = []
    i = 0
    extended = False
    while i < cap:
        wall, steal = _timed_with_steal(fn)
        runs.append(round(wall, 3))
        steals.append(steal)
        i += 1
        converged = False
        if i >= min_runs:
            best_two = sorted(runs)[:2]
            converged = best_two[1] <= best_two[0] * 1.2
        if converged:
            break
        if sum(runs) >= budget_s and i >= min_runs:
            break
        if i == cap and not extended:
            extended = True
            cap = extended_cap
    return runs, steals


def _pages_parquet(spark, n_pages: int, cache_dir: str = "/tmp/spark_graft_bench") -> str:
    """Materialize the synthetic pages table once; benches read parquet."""
    path = os.path.join(cache_dir, f"pages_{n_pages}.parquet")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from a_tree_spark.web import synth_pages_df

        # many small files -> plenty of scan splits at any parallelism
        synth_pages_df(spark, n_pages, partitions=128).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run(cpus: int, sf_dir: str, n_pages: int, n_subs: int) -> dict:
    from a_tree_spark.engine.session import get_spark

    # small split size: the bench tables are ~10 MB/file, and the
    # python match stage needs every core fed — at 100 TB the defaults
    # (128m) are right, here they'd give a 3-split scan
    spark = get_spark(
        "a_tree_spark-bench",
        cpus=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entry_mod

    from pyspark.sql import functions as F

    from a_tree_spark.web import build_page_forest, eventize_pages
    from a_tree_spark.web.pipeline import (
        cell_stats_from_root_partials,
        fused_match_pages,
        match_pages,
        root_subscription_map,
        salted_cell_stats,
    )

    pages_path = _pages_parquet(spark, n_pages)
    forest = build_page_forest(n_subs)
    forest.compile()  # driver-side compile excluded from the timed run
    root_map = root_subscription_map(spark, forest).cache()
    root_map.count()

    def keyed(df):
        return df.withColumn("page_key", F.monotonically_increasing_id())

    # warmup: touch EVERY python worker (imports numpy/pyarrow once per
    # worker process) — a single-partition warmup leaves the rest cold
    pages_small = (
        spark.read.parquet(pages_path).limit(20 * cpus).repartition(2 * cpus)
    )
    cell_stats_from_root_partials(
        fused_match_pages(keyed(pages_small), forest, emit="cell_root_partials"),
        root_map,
    ).count()
    salted_cell_stats(match_pages(eventize_pages(pages_small), forest)).count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        result = fn()
        timings[name] = round(time.time() - t0, 3)
        return result

    def _force(df):
        # full materialization via the noop sink: df.count() is NOT a
        # valid bench action — Catalyst prunes columns the count does
        # not need, which deletes whole operators from projection-
        # shaped results (measured: count() of the as-of sweep plans NO
        # Window node, so the round-5 asof_join row timed scan+filter
        # only) and strips aggregate expressions down to keys elsewhere
        df.write.format("noop").mode("overwrite").save()

    def flagship():
        # no repartition: the scan itself yields enough splits, so the
        # single python stage reads straight from the scan with zero
        # shuffles before aggregation. 16m splits for the multi-GB
        # pages table ONLY (round 7 measured ~130ms of per-task python-
        # runner setup: 4m splits manufacture 4x the tasks and cost
        # 19-29% of wall at both 8 and 32 cores); the ~10 MB/file
        # driver tables keep 4m below or the suite underparallelizes
        prev_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
        try:
            pages = spark.read.parquet(pages_path)
            partials = fused_match_pages(
                keyed(pages), forest, emit="cell_root_partials"
            )
            return _force(cell_stats_from_root_partials(partials, root_map))
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)

    # steady-state: min-of-N — the sandbox VM sees intermittent host
    # CPU steal (2-4x swings on identical runs); keep running until the
    # two best runs agree within 20%, extending the cap (7 -> 14) when
    # the post-warmup spread exceeds 1.5x, and record per-run steal%
    # so a poisoned window is adjudicable from the artifact alone
    runs, steals = _min_of_n(flagship, min_runs=4, cap=7, extended_cap=14, budget_s=150.0)
    timings["web_pipeline"] = min(runs)
    query_runs: dict[str, list[float]] = {"web_pipeline": runs}
    query_steal: dict[str, list[float]] = {"web_pipeline": steals}
    extras["docs_per_sec"] = round(n_pages / timings["web_pipeline"], 1)
    extras["n_pages"] = n_pages
    extras["n_subscriptions"] = n_subs

    queries = entry_mod.queries()
    # pin Catalyst/janino compilation of the 27-expression codegen plan
    # outside the timed run (first-run codegen cost was a bench-variance
    # source, VERDICT.md round 1)
    queries["match_codegen"](spark, sf_dir).limit(1).count()

    # EVERY driver query gets a perf row (round 2 omitted 6 of 22), and
    # every row is adaptive min-of-N: host CPU steal makes single runs
    # swing 2-4x (VERDICT.md round 2 flagged three apparent regressions
    # that were exactly this), so run at least 3 and keep re-running
    # until the two best agree within 20% (cap 6), then report the min.
    # Round 4 raised the floor from 2: a CONSISTENT steal streak makes
    # two adjacent runs agree on a bad number, and a 2-run early stop
    # locked that in (measured: ann_ivf 4.28s in a streak vs 1.12s one
    # session later on identical code).
    for name in sorted(queries):
        def once(name=name):
            return _force(queries[name](spark, sf_dir))

        runs, steals = _min_of_n(once, min_runs=3, cap=6, extended_cap=9, budget_s=25.0)
        timings[name] = min(runs)
        query_runs[name] = runs
        query_steal[name] = steals

    # per-run diagnostics live in a SIDE artifact: round 6 folded them
    # into the single parsed stdout line, which blew past the driver's
    # tail capture and left BENCH_r06 with parsed:null (VERDICT r6 #1) —
    # the final line must stay ~2 KB (per-query mins + scalars only)
    runs_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "RUNS_latest.json"
    )
    os.makedirs(os.path.dirname(runs_path), exist_ok=True)
    with open(runs_path, "w") as f:
        json.dump(
            {"query_runs": query_runs, "query_steal_pct": query_steal},
            f,
            indent=1,
        )
    all_steal = [s for ss in query_steal.values() for s in ss]
    extras["steal_max_pct"] = max(all_steal) if all_steal else 0.0
    extras["runs_artifact"] = "BENCH/RUNS_latest.json"

    result = {
        "metric": "spatial-join + predicate-match throughput (docs/sec) + operator suite",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }
    spark.stop()
    return result


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # 4M pages: the root-partials flagship plan trades ~2s of fixed
    # per-job cost (second aggregation stage + broadcast expansion) for
    # 1.75x throughput at scale — at 200k pages the fixed cost dominates
    # and the headline under-reports the engine by ~10x (200k pages is
    # a <1s job for a pipeline built for 1e12)
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "4000000"))
    n_subs = int(os.environ.get("SPARK_GRAFT_SUBS", "10000"))
    result = run(cpus, sf_dir, n_pages, n_subs)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    sys.exit(main())
