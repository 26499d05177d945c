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
from a_tree_spark.pipeline.temporal import (
    asof_join,
    asof_join_skewed,
    sessionize,
    windowed_rollup,
)


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


def synth_skewed_events(spark, n: int, n_users: int) -> DataFrame:
    """50%-hot-key stream: half of all rows land on user 0, the rest
    spread uniformly. Hot rows take ids {0,1} mod 4 so BOTH parities —
    i.e. both arms of the left/right split below — see the hot key
    (the round-5 vacuous-A/B lesson: check the match sets, not just
    the wall clock)."""
    return spark.range(n).selectExpr(
        "id AS event_id",
        f"CAST(CASE WHEN id % 4 < 2 THEN 0 "
        f"ELSE 1 + (id DIV 4) % {n_users} END AS BIGINT) AS user_id",
        "timestamp_micros(CAST(1704067200000000 + (id * 2654435761) % 2592000000000 AS BIGINT)) AS ts",
    )


def skew_ab(spark, n: int, rounds: int) -> None:
    """asof_join vs asof_join_skewed at a 50%-hot key, interleaved
    min-of-N in one JVM (steal protocol). Output equality is asserted
    in-run via count + id checksum (full row equality is pinned by
    pytest; at bench n a sorted collect would dominate the run)."""
    ev = synth_skewed_events(spark, n, 100_000).localCheckpoint()
    left = ev.where("event_id % 2 = 0")
    right = ev.where("event_id % 2 = 1")

    def plain() -> DataFrame:
        return asof_join(left, right, on="user_id").select(
            "event_id", "user_id", "asof_event_id"
        )

    def skewed() -> DataFrame:
        return asof_join_skewed(
            left, right, on="user_id", bucket_seconds=86400
        ).select("event_id", "user_id", "asof_event_id")

    def checksum(df: DataFrame) -> tuple:
        # order-insensitive PER-ROW hash, not column sums: compensating
        # errors (asof ids permuted across left rows) pass a sum check
        # but flip xxhash64(event_id, asof_event_id) rows (ADVICE r6)
        return tuple(
            df.agg(
                F.count("*"),
                F.sum(
                    F.xxhash64(
                        "event_id",
                        F.coalesce(F.col("asof_event_id"), F.lit(-1)),
                    )
                ),
            ).collect()[0]
        )

    print(f"50%-hot-key as-of A/B, n={n} (1-day buckets):", flush=True)
    t_plain, t_skewed = [], []
    for _ in range(rounds):
        t_plain.append(timed("plain  asof_join", plain()))
        t_skewed.append(timed("skewed asof_join", skewed()))
    if checksum(plain()) != checksum(skewed()):
        print("MISMATCH between plain and skewed as-of outputs")
        raise SystemExit(1)
    print("  equality checksum: OK", flush=True)
    print(
        f"  min plain={min(t_plain):.2f}s skewed={min(t_skewed):.2f}s "
        f"ratio={min(t_plain) / min(t_skewed):.2f}x",
        flush=True,
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
    """Time a FULL materialization via the noop sink. df.count() is NOT
    a valid bench action for projection-shaped results: Catalyst prunes
    unused columns under count, and for the as-of sweep that deletes
    the Window operator entirely (measured: the optimized count() plan
    of asof_join has no Window node — the 'sweep' arm was timing scan +
    filter only). The noop sink computes every output column."""
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    print(f"  {label}: {dt:.2f}s", flush=True)
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--skew-rows", type=int, default=16_000_000)
    ap.add_argument("--skew-rounds", type=int, default=3)
    ap.add_argument("--skew-only", action="store_true")
    args = ap.parse_args()

    spark = get_spark("bench-temporal", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    if args.skew_only:
        skew_ab(spark, args.skew_rows, args.skew_rounds)
        spark.stop()
        return 0

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

    # ---- asof skew A/B (VERDICT r5 item 5)
    skew_ab(spark, args.skew_rows, args.skew_rounds)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
