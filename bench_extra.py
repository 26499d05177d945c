"""Per-query isolation bench for the optimization rounds (guide §1.4).

NOT the driver bench — ``bench.py`` is frozen for measurement. This
harness times individual declared queries with the noop sink against an
arbitrary SF dir, prints one JSON line per invocation, and can dump
``.explain("formatted")`` for the plans/ artifacts.

Usage:
    python bench_extra.py --sf /root/testdata/sf1.0 --runs 3 q1 q2 ...
    python bench_extra.py --sf /root/testdata/sf1.0 --explain-dir plans/r08 --suffix before q1
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--explain-dir", default=None,
                    help="write <query>_<suffix>.txt explain output here")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from a_tree_spark.engine.session import get_spark

    spark = get_spark(
        "a_tree_spark-bench-extra",
        cpus=args.cpus,
        extra_conf={
            # mirror the frozen bench's split sizing so numbers compare
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, list[float]] = {}
    for name in args.queries:
        fn = queries[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            with open(
                os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            _force(fn(spark, args.sf))
            runs.append(round(time.time() - t0, 3))
        results[name] = runs
        print(json.dumps({"query": name, "runs": runs,
                          "min": min(runs) if runs else None,
                          "sf": args.sf, "cpus": args.cpus}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
