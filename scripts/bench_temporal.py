"""Scale bench for the temporal family: asof sweep vs naive join,
sessionize + rollup at 10M rows.

The as-of A/B is the point: the union-tag sweep is O((n+m) log) per
key while the inequality-join formulation (what a SQL engine does
without an ASOF operator) is O(n*m) per key — so we hold total rows
FIXED and sweep per-key density. The sweep should stay ~flat; the
join's candidate set grows linearly with density (quadratically in
the per-key sense). Equality of the two formulations is asserted at
the smallest density (exit nonzero on mismatch).

Inputs are prebuilt and materialized OUTSIDE timed regions
(bench-protocol convention: never time synthesis).

Run: python scripts/bench_temporal.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F

from a_tree_spark.engine.session import get_spark
from a_tree_spark.pipeline.temporal import asof_join, sessionize, windowed_rollup


def synth_events(spark, n: int, n_users: int) -> DataFrame:
    """Deterministic event stream: ids dense, ts scattered over 30
    days with microsecond offsets, value in [0, 10)."""
    # user derives from id DIV 2 so the even/odd left-right split below
    # covers EVERY user on both sides (id % n_users with even n_users
    # made parity(user) == parity(id): disjoint key sets, vacuous A/B)
    return spark.range(n).selectExpr(
        "id AS event_id",
        f"CAST((id DIV 2) % {n_users} AS BIGINT) AS user_id",
        "timestamp_micros(CAST(1704067200000000 + (id * 2654435761) % 2592000000000 AS BIGINT)) AS ts",
        "CAST((id % 1000) / 100.0 AS DOUBLE) AS value",
        "CAST(id % 4096 AS BIGINT) AS cell_id",
    )


def naive_asof(left: DataFrame, right: DataFrame) -> DataFrame:
    """The inequality-join + top-1 formulation (the oracle's shape) as
    a Spark plan — the control arm of the A/B."""
    from pyspark.sql import Window

    # rename the right key: left and right derive from the SAME frame,
    # so left["user_id"]/r["user_id"] share an attribute id and a
    # predicate-join + drop resolves ambiguously (the no-match NULL
    # side leaked into the output). Distinct names sidestep it.
    r = right.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("asof_event_id"),
    )
    # the time bound belongs IN the join predicate: post-filtering a
    # plain left join drops left rows whose matches are all in the
    # future instead of emitting a NULL as-of
    joined = left.join(
        r,
        (F.col("user_id") == F.col("r_user")) & (F.col("r_ts") <= F.col("ts")),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("r_ts").desc_nulls_last(), F.col("asof_event_id").desc_nulls_last()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("event_id", "user_id", "asof_event_id")
    )


def timed(label: str, df: DataFrame) -> float:
    t0 = time.monotonic()
    n = df.count()
    dt = time.monotonic() - t0
    print(f"  {label}: {dt:.2f}s ({n} rows)", flush=True)
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    args = ap.parse_args()

    spark = get_spark("bench-temporal", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # ---- as-of A/B across per-key density, total rows fixed at 2M
    total = 2_000_000
    for density in (20, 200, 2000):
        n_users = total // density
        ev = synth_events(spark, total, n_users).localCheckpoint()  # prebuilt
        left = ev.where("event_id % 2 = 0").select("event_id", "user_id", "ts")
        right = ev.where("event_id % 2 = 1").select("event_id", "user_id", "ts")
        print(f"density={density} ({n_users} users):", flush=True)
        sweep = asof_join(left, right, on="user_id").select(
            "event_id", "user_id", "asof_event_id"
        )
        t_sweep = timed("sweep", sweep)
        t_join = timed("join ", naive_asof(left, right))
        if density == 20:
            a = sorted(map(tuple, sweep.collect()))
            b = sorted(map(tuple, naive_asof(left, right).collect()))
            if a != b:
                print("MISMATCH between sweep and join formulations")
                return 1
            print("  equality check: OK", flush=True)

    # ---- sessionize + rollup at --rows
    ev = synth_events(spark, args.rows, 100_000).localCheckpoint()
    print(f"n={args.rows}:", flush=True)
    timed("sessionize", sessionize(ev))
    timed("rollup    ", windowed_rollup(ev, "1 hour"))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
