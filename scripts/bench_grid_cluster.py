"""Scale evidence for grid_cluster: synthetic blob+noise points (the
shape density clustering exists for), measuring wall, CC rounds, and
the cell-relation sizes at local[32].

The driver-gate corpus exercises the operator at 10k points / ~650
core cells; this bench shows the point-sized work stays at two scans +
one aggregation when points grow 2000x, and the component resolution
stays log-round on a cell relation that grew only with AREA, not with
point count.

Input (deterministic, JVM-only arithmetic): ``n_blobs`` Gaussian-ish
blobs of ``blob_pts`` points each (center from a splitmix-style integer
hash, offsets from two more hashes, box-muller-free triangular spread)
plus ``noise_pts`` uniform background points. Points are materialized
to parquet OUTSIDE the timed region (bench.py convention).

Usage: python scripts/bench_grid_cluster.py [n_blobs] [blob_pts] [noise_pts] [level] [min_pts] [rounds]
Prints one JSON line (plus incremental per-run lines).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

MASK = (1 << 63) - 1


def _h(expr: str, salt: int) -> str:
    """Integer mix usable in both a comment and the generator below —
    xxhash64 is JVM-side and deterministic across runs."""
    return f"(xxhash64({expr}, {salt}) & {MASK})"


def main() -> int:
    n_blobs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    blob_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 9000
    noise_pts = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
    level = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    min_pts = int(sys.argv[5]) if len(sys.argv) > 5 else 20
    rounds = int(sys.argv[6]) if len(sys.argv) > 6 else 3

    from a_tree_spark.engine.session import get_spark
    from a_tree_spark.spatial.ops import grid_cluster

    spark = get_spark("bench_grid_cluster")
    spark.sparkContext.setLogLevel("ERROR")

    n_points = n_blobs * blob_pts + noise_pts
    path = f"/tmp/spark_graft_bench/grid_pts_{n_blobs}_{blob_pts}_{noise_pts}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # blob b center: hash-uniform in [-60, 60] x [-120, 120];
        # member offset: difference of two hash-uniforms (triangular,
        # ~0.05 deg half-width — a few level-10 cells across)
        blob = spark.range(n_blobs * blob_pts).selectExpr(
            "id AS event_id",
            f"id % {n_blobs} AS b",
        ).selectExpr(
            "event_id",
            f"({_h('b', 1)} % 1200000) / 10000.0 - 60.0 AS clat",
            f"({_h('b', 2)} % 2400000) / 10000.0 - 120.0 AS clon",
            f"(({_h('event_id', 3)} % 1000) - ({_h('event_id', 4)} % 1000)) / 10000.0 AS dlat",
            f"(({_h('event_id', 5)} % 1000) - ({_h('event_id', 6)} % 1000)) / 10000.0 AS dlon",
        ).selectExpr(
            "event_id", "clat + dlat AS lat", "clon + dlon AS lon"
        )
        noise = spark.range(n_points - noise_pts, n_points).selectExpr(
            "id AS event_id",
            f"({_h('id', 7)} % 1800000) / 10000.0 - 90.0 AS lat",
            f"({_h('id', 8)} % 3600000) / 10000.0 - 180.0 AS lon",
        )
        blob.union(noise).repartition(64).write.mode("overwrite").parquet(path)

    points = spark.read.parquet(path)
    # warm: python-free plan, but touch the scan + a tiny CC
    grid_cluster(points.limit(50_000), level, min_pts).count()

    runs = []
    stats: dict = {}
    for r in range(rounds):
        stats = {}
        t0 = time.time()
        out = grid_cluster(points, level, min_pts, stats=stats)
        out.write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        runs.append(sec)
        print(json.dumps({"run": {"round": r, "sec": sec,
                                  "cc_rounds": stats.get("rounds")}}),
              flush=True)

    clustered = grid_cluster(points, level, min_pts)
    n_clustered = clustered.count()
    n_clusters = clustered.select("cluster_id").distinct().count()
    n_cells = clustered.select("cell_id").distinct().count()

    print(json.dumps({
        "n_points": n_points, "n_blobs": n_blobs, "level": level,
        "min_pts": min_pts, "runs": runs, "best_sec": min(runs),
        "points_per_sec": round(n_points / min(runs), 1),
        "cc_rounds": stats.get("rounds"),
        "n_clustered_points": n_clustered,
        "n_core_cells": n_cells, "n_clusters": n_clusters,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
