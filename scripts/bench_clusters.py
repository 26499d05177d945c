"""Scale evidence for duplicate_clusters: a synthetic 1M-edge pair
graph (mixed stars + chains, the shapes real near-dup graphs take),
measuring rounds + wall at local[32].

The driver-gate corpus only exercises the operator at ~3k pairs where
per-round job latency dominates; this bench shows the round count stays
logarithmic and the wall stays shuffle-bound when the label set is
millions of rows.

Usage: python scripts/bench_clusters.py [n_stars] [star_size] [n_chains] [chain_len]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    n_stars = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    star_size = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_chains = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    chain_len = int(sys.argv[4]) if len(sys.argv) > 4 else 20

    from pyspark.sql import functions as F

    from a_tree_spark.engine.session import get_spark
    from a_tree_spark.pipeline.dedup import duplicate_clusters

    spark = get_spark("bench_clusters")
    spark.sparkContext.setLogLevel("ERROR")

    # stars: hub h = s*star_size, members h+1..h+star_size-1
    stars = spark.range(n_stars * (star_size - 1)).select(
        (F.col("id") / (star_size - 1)).cast("long").alias("s"),
        (F.col("id") % (star_size - 1)).alias("m"),
    ).select(
        (F.col("s") * star_size).alias("doc_a"),
        (F.col("s") * star_size + F.col("m") + 1).alias("doc_b"),
    )
    # chains: node base+i -- base+i+1, offset past the star id space
    base = n_stars * star_size
    chains = spark.range(n_chains * (chain_len - 1)).select(
        (F.col("id") / (chain_len - 1)).cast("long").alias("c"),
        (F.col("id") % (chain_len - 1)).alias("i"),
    ).select(
        (base + F.col("c") * chain_len + F.col("i")).alias("doc_a"),
        (base + F.col("c") * chain_len + F.col("i") + 1).alias("doc_b"),
    )
    pairs = stars.union(chains)
    pairs = pairs.repartition(32).localCheckpoint()  # freeze input outside timing
    n_edges = pairs.count()
    n_nodes = n_stars * star_size + n_chains * chain_len

    stats: dict = {}
    t0 = time.time()
    clusters = duplicate_clusters(pairs, stats=stats)
    # noop sink, not count(): the iterative CC rounds materialize via
    # the loop's own actions either way, but count() lets Catalyst prune
    # the final projection — keep the timed action on the same protocol
    # as bench.py's _force (VERDICT r6 item 4)
    clusters.write.format("noop").mode("overwrite").save()
    wall = round(time.time() - t0, 2)
    # post-timing: re-derives from the CC loop's internal checkpoint
    n_rows = clusters.count()

    # correctness spot-check: every star collapses to its hub id, every
    # chain to its base id -> component count must equal stars + chains
    n_components = clusters.select("cluster_id").distinct().count()
    ok = n_components == n_stars + n_chains and n_rows == n_nodes

    print(json.dumps({
        "n_edges": n_edges, "n_nodes": n_nodes,
        "rounds": stats.get("rounds"), "wall_sec": wall,
        "n_components": n_components, "correct": ok,
    }))
    spark.stop()
    # a wrong run must not be recordable as scale evidence
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
