"""Spatial operator queries over the driver tables, each paired with a
DuckDB oracle built from the SAME constants and arithmetic (fixtures).

These are the north_rule operators (SURVEY.md §2.4) made driver-checkable:
cell encode, per-cell aggregation, point-in-polygon, kNN, raster↔vector.
Points/queries derive from driver tables via integer arithmetic both
engines evaluate identically (spatial/fixtures.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..spatial.cells import cell_id_sql, cell_xy, grid_size, ray_cast_sql
from ..spatial.fixtures import (
    POINT_LAT_SQL,
    POINT_LON_SQL,
    QUERY_LAT_SQL,
    QUERY_LON_SQL,
    TILE_VALUE_SQL,
    test_polygons,
)
from ..spatial.ops import knn_join, point_in_polygon_join, raster_vector_join

ENCODE_LEVEL = 12   # density-appropriate at 1e12 docs (north_rule)
JOIN_LEVEL = 6      # density-appropriate at driver-table scale


def event_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_id",
            "user_id",
            f"{POINT_LAT_SQL} AS lat",
            f"{POINT_LON_SQL} AS lon",
        )
    )


def _points_cte(sf: str = "events") -> str:
    return (
        f"SELECT event_id, user_id, {POINT_LAT_SQL} AS lat, "
        f"{POINT_LON_SQL} AS lon FROM {sf}"
    )


# ---------------------------------------------------------- cell encode


def q_cell_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_points(spark, sf_dir).select(
        "event_id", F.expr(cell_id_sql("lat", "lon", ENCODE_LEVEL)).alias("cell_id")
    )


def oracle_cell_encode() -> str:
    return (
        f"WITH pts AS ({_points_cte()}) "
        f"SELECT event_id, {cell_id_sql('lat', 'lon', ENCODE_LEVEL)} AS cell_id FROM pts"
    )


# ------------------------------------------------------ per-cell stats


def q_cell_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match-aggregation analog (SURVEY.md §2.4 bottom row): per-cell
    page/point statistics. Partial aggregation is map-side; the single
    shuffle is keyed by cell_id."""
    pts = event_points(spark, sf_dir).withColumn(
        "cell_id", F.expr(cell_id_sql("lat", "lon", JOIN_LEVEL))
    )
    return pts.groupBy("cell_id").agg(
        F.count("*").alias("n_points"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("event_id").alias("first_event"),
    )


def oracle_cell_agg() -> str:
    return (
        f"WITH pts AS ({_points_cte()}) "
        f"SELECT {cell_id_sql('lat', 'lon', JOIN_LEVEL)} AS cell_id, "
        f"COUNT(*) AS n_points, COUNT(DISTINCT user_id) AS n_users, "
        f"MIN(event_id) AS first_event FROM pts GROUP BY 1"
    )


# -------------------------------------------------- point in polygon


def q_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    result = point_in_polygon_join(
        event_points(spark, sf_dir),
        test_polygons(),
        level=JOIN_LEVEL,
        refine="sql",
    )
    return result.select("event_id", "shape_id")


def q_point_in_polygon_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    result = point_in_polygon_join(
        event_points(spark, sf_dir),
        test_polygons(),
        level=JOIN_LEVEL,
        refine="pandas",
    )
    return result.select("event_id", "shape_id")


def oracle_point_in_polygon() -> str:
    selects = []
    for polygon in test_polygons():
        condition = ray_cast_sql("lat", "lon", list(polygon.ring))
        selects.append(
            f"SELECT event_id, CAST({polygon.shape_id} AS BIGINT) AS shape_id "
            f"FROM pts WHERE {condition}"
        )
    union = " UNION ALL ".join(selects)
    return f"WITH pts AS ({_points_cte()}) {union}"


# ----------------------------------------------------------------- kNN


def knn_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/nation.parquet").selectExpr(
        "n_nationkey AS query_id",
        f"{QUERY_LAT_SQL} AS lat",
        f"{QUERY_LON_SQL} AS lon",
    )


KNN_K = 3


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn_join(
        knn_queries(spark, sf_dir),
        event_points(spark, sf_dir).withColumnRenamed("event_id", "point_id"),
        k=KNN_K,
        level=JOIN_LEVEL,
    ).select("query_id", "point_id", F.col("rank").cast("bigint").alias("rank"))


def oracle_knn() -> str:
    return f"""
WITH pts AS ({_points_cte()}),
q AS (SELECT n_nationkey AS query_id, {QUERY_LAT_SQL} AS lat,
      {QUERY_LON_SQL} AS lon FROM nation)
SELECT query_id, event_id AS point_id,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY (q.lat - pts.lat) * (q.lat - pts.lat)
                  + (q.lon - pts.lon) * (q.lon - pts.lon), event_id
       ) AS BIGINT) AS rank
FROM q CROSS JOIN pts
QUALIFY rank <= {KNN_K}
""".strip()


# ------------------------------------------------- raster ↔ vector


def raster_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic raster layer: the distinct cells the point set
    occupies, valued by exact integer arithmetic on the cell id."""
    pts = event_points(spark, sf_dir).withColumn(
        "cell_id", F.expr(cell_id_sql("lat", "lon", JOIN_LEVEL))
    )
    return pts.select("cell_id").distinct().withColumn(
        "tile_value", F.expr(TILE_VALUE_SQL)
    )


def q_raster_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..spatial.ops import polygon_cover_df

    raster = raster_tiles(spark, sf_dir)
    cover = polygon_cover_df(spark, test_polygons(), JOIN_LEVEL)
    return raster_vector_join(raster, cover)


def oracle_raster_vector() -> str:
    n = grid_size(JOIN_LEVEL)
    covers = []
    for polygon in test_polygons():
        lats = [p[0] for p in polygon.ring]
        lons = [p[1] for p in polygon.ring]
        x0, y0 = cell_xy(min(lats), min(lons), JOIN_LEVEL)
        x1, y1 = cell_xy(max(lats), max(lons), JOIN_LEVEL)
        covers.append(
            f"SELECT CAST({polygon.shape_id} AS BIGINT) AS shape_id, "
            f"CAST(y * {n} + x AS BIGINT) AS cell_id "
            f"FROM generate_series({int(y0)}, {int(y1)}) t1(y), "
            f"generate_series({int(x0)}, {int(x1)}) t2(x)"
        )
    cover_union = " UNION ALL ".join(covers)
    return f"""
WITH pts AS ({_points_cte()}),
raster AS (
    SELECT cell_id, {TILE_VALUE_SQL} AS tile_value FROM (
        SELECT DISTINCT {cell_id_sql('lat', 'lon', JOIN_LEVEL)} AS cell_id FROM pts
    )
),
cover AS ({cover_union})
SELECT shape_id, COUNT(*) AS n_tiles, CAST(SUM(tile_value) AS BIGINT) AS sum_value,
       MIN(tile_value) AS min_value, MAX(tile_value) AS max_value
FROM cover JOIN raster USING (cell_id)
GROUP BY shape_id
""".strip()


# ------------------------------------------- k-ring neighbor smoothing


RING_RADIUS = 1


def q_cell_ring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focal smoothing of the per-cell stats over the radius-1 disk —
    the H3 grid_disk hotspot-smoothing idiom (SURVEY.md §2.4 spatial
    family, beyond-reference)."""
    from ..spatial.ops import ring_smooth

    return ring_smooth(
        q_cell_agg(spark, sf_dir),
        value_cols=["n_points", "n_users"],
        radius=RING_RADIUS,
        level=JOIN_LEVEL,
    )


def oracle_cell_ring_stats() -> str:
    from ..spatial.ops import ring_smooth_oracle_sql

    return ring_smooth_oracle_sql(
        oracle_cell_agg(),
        value_cols=["n_points", "n_users"],
        stats_cols=["cell_id", "n_points", "n_users", "first_event"],
        radius=RING_RADIUS,
        level=JOIN_LEVEL,
    )


# --------------------------------------- tumbling-window cell rollup


def rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id",
        "ts",
        "value",
        f"{cell_id_sql(POINT_LAT_SQL, POINT_LON_SQL, JOIN_LEVEL)} AS cell_id",
    )


def q_cell_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aligned daily window x cell rollup (hypertable-rollup
    idiom); the streaming twin (streaming/rollup_stream.py) shares this
    exact plan over a watermarked source."""
    from ..pipeline.temporal import windowed_rollup

    return windowed_rollup(rollup_events(spark, sf_dir), "1 day")


def oracle_cell_time_rollup() -> str:
    from ..pipeline.temporal import windowed_rollup_oracle_sql

    events_sql = (
        f"SELECT event_id, ts, value, "
        f"{cell_id_sql(POINT_LAT_SQL, POINT_LON_SQL, JOIN_LEVEL)} AS cell_id "
        f"FROM events"
    )
    return windowed_rollup_oracle_sql(events_sql, "day")


# ------------------------------------------------------- as-of join


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user backward as-of join: each purchase event picks the most
    recent prior click (inclusive at equal ts, greatest-event_id tie
    break). Engine = single-shuffle union-tag sweep; oracle = the
    inequality-join spec form."""
    from ..pipeline.temporal import asof_join

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = events.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter("event_type = 'click'").selectExpr(
        "event_id", "user_id", "ts",
        "CAST(ROUND(value * 100) AS BIGINT) AS cents",
    )
    joined = asof_join(
        purchases, clicks, on="user_id",
        right_vals={"cents": "cents"},
    )
    # no-prior-click rows surface as -1 (not NULL): the driver's value
    # hash needs NULL-free columns, and -1 is outside both id/cents
    # domains so the sentinel is lossless
    return joined.select(
        "event_id", "user_id",
        F.expr("coalesce(asof_event_id, -1)").alias("asof_event_id"),
        F.expr("coalesce(asof_cents, -1)").alias("asof_cents"),
    )


def q_asof_join_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-phase skew-proof as-of variant on the same inputs as
    `q_asof_join` — it shares that row's driver oracle (the
    matcher-strategy pattern: one spec, two plans). bucket_seconds=3d
    over the 30-day events table means ~10 buckets per key, so the
    cross-bucket carry path is genuinely exercised at the gate."""
    from ..pipeline.temporal import asof_join_skewed

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = events.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter("event_type = 'click'").selectExpr(
        "event_id", "user_id", "ts",
        "CAST(ROUND(value * 100) AS BIGINT) AS cents",
    )
    joined = asof_join_skewed(
        purchases, clicks, on="user_id",
        right_vals={"cents": "cents"},
        bucket_seconds=3 * 86400,
    )
    return joined.select(
        "event_id", "user_id",
        F.expr("coalesce(asof_event_id, -1)").alias("asof_event_id"),
        F.expr("coalesce(asof_cents, -1)").alias("asof_cents"),
    )


def oracle_asof_join() -> str:
    from ..pipeline.temporal import asof_join_oracle_sql

    inner = asof_join_oracle_sql(
        "SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'",
        "SELECT event_id, user_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS cents "
        "FROM events WHERE event_type = 'click'",
        on="user_id",
        left_cols=["event_id", "user_id"],
        right_vals={"cents": "cents"},
    )
    return (
        "SELECT event_id, user_id, "
        "coalesce(asof_event_id, -1) AS asof_event_id, "
        "coalesce(asof_cents, -1) AS asof_cents "
        f"FROM ({inner})"
    )


# --------------------------------------------------- sessionization


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based user sessions over the events table (12h gap). The
    streaming twin (session_window) is parity-pinned in pytest."""
    from ..pipeline.temporal import sessionize

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    return sessionize(events)


def oracle_sessionize() -> str:
    from ..pipeline.temporal import sessionize_oracle_sql

    return sessionize_oracle_sql("SELECT event_id, user_id, ts FROM events")


# -------------------------------------------------- trajectory stats


def q_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user movement trajectories over the event points (ordered by
    event time): path length + bbox in exact micro-degrees."""
    from ..spatial.ops import trajectory_stats

    pts = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id",
        "user_id",
        "ts",
        f"{POINT_LAT_SQL} AS lat",
        f"{POINT_LON_SQL} AS lon",
    )
    return trajectory_stats(pts)


def oracle_trajectory_stats() -> str:
    from ..spatial.ops import trajectory_stats_oracle_sql

    return trajectory_stats_oracle_sql(
        f"SELECT event_id, user_id, ts, {POINT_LAT_SQL} AS lat, "
        f"{POINT_LON_SQL} AS lon FROM events"
    )


# ------------------------------------------------ cube / grouping sets


def q_cell_day_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(day, cell) over the events: per-pair counts plus all
    subtotal planes in one shuffle; gid is the standard grouping
    bitmask (identical convention in Spark and DuckDB)."""
    from ..pipeline.temporal import cell_day_cube

    return cell_day_cube(rollup_events(spark, sf_dir))


def oracle_cell_day_cube() -> str:
    from ..pipeline.temporal import cell_day_cube_oracle_sql

    return cell_day_cube_oracle_sql(
        f"SELECT event_id, ts, value, "
        f"{cell_id_sql(POINT_LAT_SQL, POINT_LON_SQL, JOIN_LEVEL)} AS cell_id "
        f"FROM events"
    )


# ----------------------------------------------- interval (range) join


INTERVAL_HORIZON_S = 6 * 3600


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch arm of the stream-stream interval join: every purchase
    paired with ALL clicks by the same user in the trailing 6h. The
    streaming twin (both sides watermarked) is parity-pinned in
    tests/test_streaming.py."""
    from ..streaming.interval_join_stream import interval_join

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = events.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter("event_type = 'click'").select(
        "event_id", "user_id", "ts"
    )
    return interval_join(
        purchases, clicks, horizon_seconds=INTERVAL_HORIZON_S
    )


def oracle_interval_join() -> str:
    from ..streaming.interval_join_stream import interval_join_oracle_sql

    return interval_join_oracle_sql(
        "SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'",
        "SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'",
        horizon_seconds=INTERVAL_HORIZON_S,
    )


def q_sessionize_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase skew-proof variant under the SAME oracle as
    `sessionize` (the two are output-identical; the driver hash proves
    it on real data, the way the three matcher strategies share one
    oracle). 1-day buckets at the driver tables exercise cross-bucket
    merging heavily (12h gap)."""
    from ..pipeline.temporal import sessionize_skewed

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    return sessionize_skewed(events, bucket_seconds=86400)


def q_trajectory_stats_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase skew-proof trajectory under trajectory_stats' oracle
    (output-identical: bucketed local paths + boundary bridges)."""
    from ..spatial.ops import trajectory_stats_skewed

    pts = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id", "user_id", "ts",
        f"{POINT_LAT_SQL} AS lat",
        f"{POINT_LON_SQL} AS lon",
    )
    return trajectory_stats_skewed(pts, bucket_seconds=86400)


# ------------------------------------------------ cell-cover compaction

COMPACT_BASE_LEVEL = 5   # 32x32 base grid: 736 occupied cells at sf0.01,
COMPACT_MIN_LEVEL = 3    # 32 full level-4 parents -> promotions exercised


def q_cell_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-resolution compaction of the event points' cell cover
    (H3 `compact` idiom): a parent cell replaces its 4 children iff
    all 4 are covered, cascading base_level -> min_level; output is
    the unique minimal (level, cell_id) cover. One distinct over the
    scan, then cell-relation-sized aggregations only."""
    from ..spatial.ops import compact_cell_cover

    return compact_cell_cover(
        event_points(spark, sf_dir), COMPACT_BASE_LEVEL, COMPACT_MIN_LEVEL
    )


def oracle_cell_compact() -> str:
    from ..spatial.ops import compact_cell_cover_oracle_sql

    return compact_cell_cover_oracle_sql(
        _points_cte(), COMPACT_BASE_LEVEL, COMPACT_MIN_LEVEL
    )


# ------------------------------------------------- grid density clustering

CLUSTER_LEVEL = 6    # avg ~7 pts/cell at sf0.01 — a real core/noise split
CLUSTER_MIN_PTS = 8  # 646 core cells -> 192 clusters at sf0.01 (merging
                     # and singletons both exercised)


def q_spatial_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN-style grid clustering (spatial/ops.py::grid_cluster):
    density-core cells + 8-adjacency connected components, labels
    joined back to the points. The component step reuses the dedup
    CC machinery — log-round label propagation over the CELL relation
    (never the points)."""
    from ..spatial.ops import grid_cluster

    return grid_cluster(
        event_points(spark, sf_dir), CLUSTER_LEVEL, CLUSTER_MIN_PTS
    )


def oracle_spatial_cluster() -> str:
    from ..spatial.ops import grid_cluster_oracle_sql

    return grid_cluster_oracle_sql(
        _points_cte(), CLUSTER_LEVEL, CLUSTER_MIN_PTS
    )


# ---------------------------------------------- origin-destination flows


def q_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-anchor origin-destination matrix (pipeline/temporal.py::
    od_flows): ONE event-sized aggregation; lag + flow counting run on
    the user-day anchor relation."""
    from ..pipeline.temporal import od_flows

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id",
        "user_id",
        "ts",
        f"{cell_id_sql(POINT_LAT_SQL, POINT_LON_SQL, JOIN_LEVEL)} AS cell_id",
    )
    return od_flows(ev)


def oracle_od_flows() -> str:
    from ..pipeline.temporal import od_flows_oracle_sql

    return od_flows_oracle_sql(
        f"SELECT event_id, user_id, ts, "
        f"{cell_id_sql(POINT_LAT_SQL, POINT_LON_SQL, JOIN_LEVEL)} AS cell_id "
        f"FROM events"
    )
