"""Spatial layer: numpy unit tests + Spark-vs-DuckDB oracle integration."""

import numpy as np
import pytest

from tests.conftest import SF_DIR, assert_matches_duckdb

from a_tree_spark.spatial import (
    Polygon,
    cell_center,
    cell_id,
    disk_cells,
    grid_size,
    min_outside_distance,
    points_in_polygon,
    polygon_bbox_cover,
    ring_cells,
)
from a_tree_spark.engine import spatial_queries as SQ


# ------------------------------------------------------------ unit (numpy)


def test_cell_id_corners_and_center():
    n = grid_size(12)
    assert cell_id(-90.0, -180.0, 12) == 0
    assert cell_id(89.9999, 179.9999, 12) == n * n - 1
    # exact boundary clamps into the last cell
    assert cell_id(90.0, 180.0, 12) == n * n - 1
    mid = cell_id(0.0, 0.0, 12)
    assert mid == (n // 2) * n + (n // 2)


def test_cell_center_roundtrip():
    cells = np.array([0, 12345, 999999], dtype=np.int64)
    lat, lon = cell_center(cells, 12)
    assert np.array_equal(cell_id(lat, lon, 12), cells)


def test_disk_and_ring_cells():
    c = int(cell_id(0.0, 0.0, 6))
    disk1 = disk_cells(np.array([c]), 1, 6)[0]
    assert len(disk1) == 9 and c in disk1
    ring1 = ring_cells(c, 1, 6)
    assert len(ring1) == 8 and c not in ring1
    assert set(ring1).issubset(set(disk1.tolist()))
    # corner clamping: cell 0's disk has only 4 cells
    assert len(disk_cells(np.array([0]), 1, 6)[0]) == 4


def test_min_outside_distance_guarantee():
    # brute-force check at a coarse level: points in cells outside disk(r)
    # really are farther than the bound
    level, r = 4, 2
    bound = min_outside_distance(r, level)
    c = int(cell_id(10.0, 10.0, level))
    lat0, lon0 = 10.0, 10.0
    rng = np.random.default_rng(0)
    lats = rng.uniform(-90, 90, 5000)
    lons = rng.uniform(-180, 180, 5000)
    cells = cell_id(lats, lons, level)
    inside_disk = np.isin(cells, disk_cells(np.array([c]), r, level)[0])
    dist = np.sqrt((lats - lat0) ** 2 + (lons - lon0) ** 2)
    assert (dist[~inside_disk] >= bound).all()


def test_ray_cast_convex_and_concave():
    square = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    lats = np.array([5.0, 15.0, 9.9, -0.1])
    lons = np.array([5.0, 5.0, 9.9, 5.0])
    assert points_in_polygon(lats, lons, square).tolist() == [True, False, True, False]

    # chevron: concave notch at the midpoint
    chevron = [(10.0, -10.0), (10.0, 10.0), (0.0, 0.0), (-10.0, 10.0), (-10.0, -10.0)]
    assert points_in_polygon(np.array([0.0]), np.array([5.0]), chevron).tolist() == [False]
    assert points_in_polygon(np.array([0.0]), np.array([-5.0]), chevron).tolist() == [True]


def test_bbox_cover_contains_polygon_cells():
    square = [(1.0, 1.0), (1.0, 9.0), (9.0, 9.0), (9.0, 1.0)]
    cover = set(polygon_bbox_cover(square, 6).tolist())
    inner = cell_id(np.array([5.0]), np.array([5.0]), 6)[0]
    assert inner in cover


# ------------------------------------------------------- Spark vs DuckDB


def test_q_cell_encode(spark):
    assert_matches_duckdb(SQ.q_cell_encode(spark, SF_DIR), SQ.oracle_cell_encode())


def test_q_cell_agg(spark):
    assert_matches_duckdb(SQ.q_cell_agg(spark, SF_DIR), SQ.oracle_cell_agg())


def test_q_point_in_polygon_sql_refine(spark):
    df = SQ.q_point_in_polygon(spark, SF_DIR)
    assert df.count() > 0
    assert_matches_duckdb(df, SQ.oracle_point_in_polygon())


def test_q_point_in_polygon_pandas_refine_agrees(spark):
    a = sorted(map(tuple, SQ.q_point_in_polygon(spark, SF_DIR).collect()))
    b = sorted(map(tuple, SQ.q_point_in_polygon_pandas(spark, SF_DIR).collect()))
    assert a == b


def test_q_knn(spark):
    df = SQ.q_knn(spark, SF_DIR)
    assert_matches_duckdb(df, SQ.oracle_knn())


def test_q_raster_vector(spark):
    assert_matches_duckdb(SQ.q_raster_vector(spark, SF_DIR), SQ.oracle_raster_vector())


def test_cell_encode_is_jvm_only(spark):
    plan = SQ.q_cell_encode(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan


def test_pip_sql_refine_is_jvm_only(spark):
    plan = SQ.q_point_in_polygon(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------- ring smoothing


def test_q_cell_ring_stats(spark):
    df = SQ.q_cell_ring_stats(spark, SF_DIR)
    assert df.count() > 0
    assert_matches_duckdb(df, SQ.oracle_cell_ring_stats())


def test_ring_smooth_single_cell_identity(spark):
    """A lone occupied cell's smoothed value is its own (n_ring_cells=1)
    and an adjacent pair sums both ways (n_ring_cells=2)."""
    from a_tree_spark.spatial.ops import ring_smooth

    n = 1 << 6
    stats = spark.createDataFrame(
        [(5 * n + 5, 10), (5 * n + 6, 3), (40 * n + 40, 7)],
        "cell_id long, v long",
    )
    out = {
        r["cell_id"]: (r["n_ring_cells"], r["ring_v"])
        for r in ring_smooth(stats, ["v"], radius=1, level=6).collect()
    }
    assert out[5 * n + 5] == (2, 13)
    assert out[5 * n + 6] == (2, 13)
    assert out[40 * n + 40] == (1, 7)


def test_ring_smooth_edge_clipping(spark):
    """Corner cell (0,0): disk clipped to 4 in-grid cells, none wrap."""
    from a_tree_spark.spatial.ops import ring_smooth

    n = 1 << 6
    # corner + its wrap-around "neighbors" if arithmetic were unclipped
    stats = spark.createDataFrame(
        [(0, 1), (n - 1, 100), ((n - 1) * n, 100)],  # (0,0), (0,n-1), (n-1,0)
        "cell_id long, v long",
    )
    out = {
        r["cell_id"]: (r["n_ring_cells"], r["ring_v"])
        for r in ring_smooth(stats, ["v"], radius=1, level=6).collect()
    }
    assert out[0] == (1, 1)  # wrap rows must NOT leak into the corner


def test_ring_smooth_is_jvm_only(spark):
    plan = (
        SQ.q_cell_ring_stats(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------- windowed rollup


def test_q_cell_time_rollup(spark):
    df = SQ.q_cell_time_rollup(spark, SF_DIR)
    assert df.count() > 0
    assert_matches_duckdb(df, SQ.oracle_cell_time_rollup())


def test_rollup_window_starts_are_day_aligned(spark):
    rows = SQ.q_cell_time_rollup(spark, SF_DIR).select("window_start").collect()
    assert all(r["window_start"] % 86400 == 0 for r in rows)


# ------------------------------------------------------ as-of join


def test_q_asof_join(spark):
    df = SQ.q_asof_join(spark, SF_DIR)
    assert df.count() > 0
    assert_matches_duckdb(df, SQ.oracle_asof_join())


def test_asof_join_semantics_handcrafted(spark):
    """Inclusive <=, greatest-id tie-break, NULL before any right row,
    per-key isolation — pinned on a 2-user fixture."""
    from datetime import datetime

    from a_tree_spark.pipeline.temporal import asof_join

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 10, t(5)), (2, 10, t(2)), (3, 10, t(1)), (4, 20, t(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, t(2), 7), (101, 10, t(2), 8), (102, 10, t(4), 9),
         (103, 20, t(9), 1), (104, 30, t(0), 5)],
        "event_id long, user_id long, ts timestamp, cents long",
    )
    out = {
        r["event_id"]: (r["asof_event_id"], r["asof_cents"])
        for r in asof_join(
            left, right, on="user_id", right_vals={"cents": "cents"}
        ).collect()
    }
    assert out[1] == (102, 9)      # latest prior
    assert out[2] == (101, 8)      # equal-ts inclusive, greatest id wins
    assert out[3] == (None, None)  # nothing prior
    assert out[4] == (103, 1)      # other key, inclusive at its own ts
    assert len(out) == 4           # user 30's rows never leak


def test_q_asof_join_skewed(spark):
    """Driver row: the skew-proof variant under the SAME oracle as
    asof_join (one spec, two plans)."""
    df = SQ.q_asof_join_skewed(spark, SF_DIR)
    assert df.count() > 0
    assert_matches_duckdb(df, SQ.oracle_asof_join())


def test_asof_join_skewed_equals_plain(spark):
    """Two-phase (bucketed local sweep + per-(key,bucket) carry) ==
    single-sweep asof_join on real events, with buckets much smaller
    than the 30-day span so the cross-bucket carry path is exercised
    on most rows."""
    from a_tree_spark.pipeline.temporal import asof_join, asof_join_skewed

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    purchases = events.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter("event_type = 'click'").selectExpr(
        "event_id", "user_id", "ts",
        "CAST(ROUND(value * 100) AS BIGINT) AS cents",
    )
    kw = dict(on="user_id", right_vals={"cents": "cents"})
    plain = sorted(
        map(tuple, asof_join(purchases, clicks, **kw).collect())
    )
    two = sorted(
        map(
            tuple,
            asof_join_skewed(
                purchases, clicks, bucket_seconds=86400, **kw
            ).collect(),
        )
    )
    assert two == plain and len(plain) > 0


def test_asof_join_skewed_cross_bucket_fixture(spark):
    """Crafted cross-bucket cases: carry skips EMPTY buckets, picks the
    last right row of the nearest non-empty earlier bucket, local hits
    shadow the carry, and a left row before any right row stays NULL."""
    from datetime import datetime, timedelta

    from a_tree_spark.pipeline.temporal import asof_join_skewed

    t0 = datetime(2024, 1, 1)
    bucket = 100  # seconds
    t = lambda s: t0 + timedelta(seconds=s)
    # rights: bucket 0 has two (tie at s=50 -> greatest id), buckets
    # 1-2 empty, bucket 3 has one at s=310
    right = spark.createDataFrame(
        [(100, 1, t(50), 7), (101, 1, t(50), 8), (102, 1, t(310), 9)],
        "event_id long, user_id long, ts timestamp, cents long",
    )
    left = spark.createDataFrame(
        [
            (1, 1, t(10)),    # bucket 0, before any right -> NULL
            (2, 1, t(60)),    # bucket 0, local hit (tie -> id 101)
            (3, 1, t(150)),   # bucket 1 (empty) -> carry from bucket 0
            (4, 1, t(250)),   # bucket 2 (empty) -> still bucket 0's last
            (5, 1, t(305)),   # bucket 3 before its right -> carry
            (6, 1, t(320)),   # bucket 3 after its right -> local hit
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r["event_id"]: (r["asof_event_id"], r["asof_cents"])
        for r in asof_join_skewed(
            left, right, on="user_id", right_vals={"cents": "cents"},
            bucket_seconds=bucket,
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (101, 8)
    assert out[3] == (101, 8)
    assert out[4] == (101, 8)
    assert out[5] == (101, 8)
    assert out[6] == (102, 9)
    assert len(out) == 6


def test_asof_join_single_shuffle_no_join(spark):
    """The sweep formulation: exactly zero join operators and one
    Exchange (the per-key sort partitioning) in the physical plan."""
    df = SQ.q_asof_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# --------------------------------------------------- sessionization


def test_q_sessionize(spark):
    df = SQ.q_sessionize(spark, SF_DIR)
    assert df.count() > 0
    assert_matches_duckdb(df, SQ.oracle_sessionize())


def test_sessionize_semantics_handcrafted(spark):
    """Gap strictly-greater splits; boundary-equal gap keeps the
    session; sessions are per-key; idx is 1-based per key."""
    from datetime import datetime, timedelta

    from a_tree_spark.pipeline.temporal import sessionize

    t0 = datetime(2024, 1, 1)
    gap = 600
    rows = [
        (1, 10, t0),
        (2, 10, t0 + timedelta(seconds=gap)),          # == gap: same session
        (3, 10, t0 + timedelta(seconds=2 * gap + 1)),  # > gap: new session
        (4, 20, t0 + timedelta(seconds=1)),            # other key
    ]
    out = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["first_event"],
                                           r["last_event"], r["duration_s"])
        for r in sessionize(
            spark.createDataFrame(
                rows, "event_id long, user_id long, ts timestamp"
            ),
            gap_seconds=gap,
        ).collect()
    }
    assert out[(10, 1)] == (2, 1, 2, gap)
    assert out[(10, 2)] == (1, 3, 3, 0)
    assert out[(20, 1)] == (1, 4, 4, 0)
    assert len(out) == 3


def test_sessionize_single_exchange(spark):
    """lag-flag window, cumsum window, and the session groupBy all key
    on user_id — Spark must plan exactly ONE hash Exchange."""
    plan = (
        SQ.q_sessionize(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


# -------------------------------------------------- trajectory stats


def test_q_trajectory_stats(spark):
    df = SQ.q_trajectory_stats(spark, SF_DIR)
    assert df.count() > 0
    assert_matches_duckdb(df, SQ.oracle_trajectory_stats())


def test_trajectory_stats_handcrafted(spark):
    """3-4-5 triangle legs: path length is the sum of both segments in
    exact micro-degrees; bbox covers all points; single-point user has
    zero path."""
    from datetime import datetime, timedelta

    from a_tree_spark.spatial.ops import trajectory_stats

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, 10, t0, 0.0, 0.0),
        (2, 10, t0 + timedelta(minutes=1), 3.0, 4.0),   # dist 5
        (3, 10, t0 + timedelta(minutes=2), 3.0, 0.0),   # dist 4
        (4, 20, t0, 7.25, -1.5),
    ]
    out = {
        r["user_id"]: r
        for r in trajectory_stats(
            spark.createDataFrame(
                rows,
                "event_id long, user_id long, ts timestamp, lat double, lon double",
            )
        ).collect()
    }
    assert out[10]["n_points"] == 3
    assert out[10]["path_len_micro"] == 9_000_000
    assert (out[10]["min_lat_micro"], out[10]["max_lat_micro"]) == (0, 3_000_000)
    assert (out[10]["min_lon_micro"], out[10]["max_lon_micro"]) == (0, 4_000_000)
    assert out[20]["n_points"] == 1 and out[20]["path_len_micro"] == 0
    assert out[20]["min_lon_micro"] == -1_500_000


def test_trajectory_single_exchange(spark):
    plan = (
        SQ.q_trajectory_stats(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_ignores_null_ts_right_rows(spark):
    """A right row with NULL ts has no position on the time axis: it
    must never be carried (NULLS FIRST ordering would otherwise sort it
    before every left row), matching the oracle's join predicate."""
    from datetime import datetime

    from a_tree_spark.pipeline.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, datetime(2024, 1, 1))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, None, 7)],
        "event_id long, user_id long, ts timestamp, cents long",
    )
    rows = asof_join(
        left, right, on="user_id", right_vals={"cents": "cents"}
    ).collect()
    assert len(rows) == 1
    assert rows[0]["asof_event_id"] is None and rows[0]["asof_cents"] is None


# ------------------------------------------------ cube / grouping sets


def test_q_cell_day_cube(spark):
    df = SQ.q_cell_day_cube(spark, SF_DIR)
    assert df.count() > 0
    assert_matches_duckdb(df, SQ.oracle_cell_day_cube())


def test_cube_planes_are_consistent(spark):
    """The grand total (gid=3) equals the sum of each subtotal plane —
    the invariant that catches a wrong grouping expansion."""
    rows = SQ.q_cell_day_cube(spark, SF_DIR).collect()
    total = sum(r["n_events"] for r in rows if r["gid"] == 3)
    by_day = sum(r["n_events"] for r in rows if r["gid"] == 1)
    by_cell = sum(r["n_events"] for r in rows if r["gid"] == 2)
    detail = sum(r["n_events"] for r in rows if r["gid"] == 0)
    assert total == by_day == by_cell == detail > 0


# ----------------------------------------------- interval (range) join


def test_q_interval_join(spark):
    df = SQ.q_interval_join(spark, SF_DIR)
    assert df.count() > 0
    assert_matches_duckdb(df, SQ.oracle_interval_join())


def test_interval_join_bounds_handcrafted(spark):
    """Inclusive at lag 0 and at the horizon-1; exclusive at exactly
    the horizon; cross-user pairs never join."""
    from datetime import datetime, timedelta

    from a_tree_spark.streaming.interval_join_stream import interval_join

    t0 = datetime(2024, 1, 1, 12)
    left = spark.createDataFrame(
        [(1, 10, t0), (2, 20, t0)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, t0),                               # lag 0: in
            (101, 10, t0 - timedelta(seconds=3599)),     # in
            (102, 10, t0 - timedelta(seconds=3600)),     # == horizon: out
            (103, 10, t0 + timedelta(seconds=1)),        # future: out
            (104, 30, t0),                               # other user: out
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = sorted(
        (r["l_event"], r["r_event"], r["lag_s"])
        for r in interval_join(left, right, horizon_seconds=3600).collect()
    )
    assert got == [(1, 100, 0), (1, 101, 3599)]


def test_sessionize_skewed_equals_plain(spark):
    """Two-phase (bucketed local + summary merge) == single-pass
    sessionize on real events, with buckets much smaller than the data
    span so cross-bucket merging is exercised heavily."""
    from a_tree_spark.pipeline.temporal import sessionize, sessionize_skewed

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    plain = sorted(map(tuple, sessionize(events).collect()))
    two = sorted(map(tuple, sessionize_skewed(
        events, bucket_seconds=86400  # 1-day buckets, 12h gap
    ).collect()))
    assert two == plain and len(plain) > 0


def test_sessionize_skewed_chain_across_buckets(spark):
    """A single session whose events are spaced just under the gap,
    spanning MANY buckets, must collapse to one merged session."""
    from datetime import datetime, timedelta

    from a_tree_spark.pipeline.temporal import sessionize_skewed

    t0 = datetime(2024, 1, 1)
    gap = 3600
    rows = [(i, 1, t0 + timedelta(seconds=i * (gap - 1))) for i in range(50)]
    out = sessionize_skewed(
        spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp"),
        gap_seconds=gap,
        bucket_seconds=2 * gap,  # chain crosses ~25 bucket boundaries
    ).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 50
    assert out[0]["first_event"] == 0 and out[0]["last_event"] == 49


def test_trajectory_skewed_equals_plain(spark):
    """Two-phase (bucketed + boundary bridges) == single-pass
    trajectory_stats on real points, with 1-day buckets over a 30-day
    span so every user crosses many boundaries."""
    from a_tree_spark.spatial.fixtures import POINT_LAT_SQL, POINT_LON_SQL
    from a_tree_spark.spatial.ops import trajectory_stats_skewed

    pts = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "event_id", "user_id", "ts",
        f"{POINT_LAT_SQL} AS lat",
        f"{POINT_LON_SQL} AS lon",
    )
    plain = sorted(map(tuple, SQ.q_trajectory_stats(spark, SF_DIR)
                       .select("user_id", "n_points", "path_len_micro",
                               "min_lat_micro", "max_lat_micro",
                               "min_lon_micro", "max_lon_micro").collect()))
    two = sorted(map(tuple, trajectory_stats_skewed(
        pts, bucket_seconds=86400
    ).select("user_id", "n_points", "path_len_micro",
             "min_lat_micro", "max_lat_micro",
             "min_lon_micro", "max_lon_micro").collect()))
    assert two == plain and len(plain) > 0


def test_q_cell_compact(spark):
    df = SQ.q_cell_compact(spark, SF_DIR)
    assert_matches_duckdb(df, SQ.oracle_cell_compact())


def test_cell_compact_footprint_exact(spark):
    """The compacted cover is lossless: expanding every output cell
    back to base level reproduces EXACTLY the occupied base cells —
    no gap, no overreach, no overlap."""
    from a_tree_spark.spatial.ops import compact_cell_cover

    base, lo = SQ.COMPACT_BASE_LEVEL, SQ.COMPACT_MIN_LEVEL
    pts = SQ.event_points(spark, SF_DIR)
    out = compact_cell_cover(pts, base, lo).collect()
    nb = 1 << base
    occupied = {
        (r["x"], r["y"])
        for r in pts.selectExpr(
            f"CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * {nb}), 0), {nb - 1}) AS BIGINT) AS x",
            f"CAST(LEAST(GREATEST(FLOOR((lat + 90.0) / 180.0 * {nb}), 0), {nb - 1}) AS BIGINT) AS y",
        ).distinct().collect()
    }
    footprint = set()
    for r in out:
        n = 1 << r["level"]
        y, x = r["cell_id"] // n, r["cell_id"] % n
        f = 1 << (base - r["level"])
        for dy in range(f):
            for dx in range(f):
                cell = (x * f + dx, y * f + dy)
                assert cell not in footprint, "overlapping cover cells"
                footprint.add(cell)
    assert footprint == occupied


def test_cell_compact_deep_cascade(spark):
    """A fully covered 8x8 base-3 block must cascade level 3 -> 2 -> 1
    -> 0 into the single level-0 root cell; one extra isolated cell in
    a different base cell stays at base level... except at base 3 every
    cell shares root 0 — so craft the isolated point OUTSIDE a 4x4
    sub-block at base 2 instead: fill cells (0..3, 0..3) of the 8x8
    grid (one full level-1 cell after two promotions) plus cell (7, 7)
    which must surface at level 3 untouched."""
    from a_tree_spark.spatial.ops import compact_cell_cover

    n = 8  # base level 3
    pts = []
    for y in range(4):
        for x in range(4):
            pts.append((
                (y + 0.5) / n * 180.0 - 90.0,
                (x + 0.5) / n * 360.0 - 180.0,
            ))
    pts.append(((7 + 0.5) / n * 180.0 - 90.0, (7 + 0.5) / n * 360.0 - 180.0))
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = sorted(
        (r["level"], r["cell_id"])
        for r in compact_cell_cover(df, base_level=3, min_level=0).collect()
    )
    # (0..3, 0..3) at level 3 -> 4 full parents at level 2 -> 1 full
    # cell at level 1 (x=0, y=0 -> id 0); (7,7) stays: id 7*8+7 = 63
    assert got == [(1, 0), (3, 63)]


# ------------------------------------------------- grid density clustering


def test_q_spatial_cluster(spark):
    assert_matches_duckdb(
        SQ.q_spatial_cluster(spark, SF_DIR), SQ.oracle_spatial_cluster()
    )


def test_grid_cluster_semantics(spark):
    """Crafted DBSCAN-grid case: E/diagonal merging, singleton core
    cells, noise dropping, and row-major wrap-safety (ids y*n+(n-1) and
    (y+1)*n+0 are consecutive integers but NOT neighbors)."""
    from a_tree_spark.spatial.ops import grid_cluster

    level = 3
    n = grid_size(level)

    def pt(pid, y, x):
        lat, lon = cell_center(np.array([y * n + x]), level)
        return (pid, float(lat[0]), float(lon[0]))

    rows = []
    pid = 0
    # A=(1,1) core, B=(1,2) core E-adjacent, C=(2,3) core SE-diagonal
    # of B -> one merged cluster labeled min cell id (cell A)
    for cell, k in [((1, 1), 3), ((1, 2), 2), ((2, 3), 2)]:
        for _ in range(k):
            rows.append(pt(pid, *cell)); pid += 1
    # D=(5, 5): isolated core -> singleton cluster labeled itself
    for _ in range(2):
        rows.append(pt(pid, 5, 5)); pid += 1
    # sparse cell (6, 0): one point -> noise, dropped
    rows.append(pt(pid, 6, 0)); pid += 1
    # wrap probe: (3, n-1) and (4, 0) both core; consecutive ids,
    # not adjacent -> two distinct singleton clusters
    for cell in [(3, n - 1), (4, 0)]:
        for _ in range(2):
            rows.append(pt(pid, *cell)); pid += 1

    points = spark.createDataFrame(rows, ["event_id", "lat", "lon"])
    got = {
        r.event_id: (r.cell_id, r.cluster_id)
        for r in grid_cluster(points, level, 2).collect()
    }
    cid = lambda y, x: y * n + x
    merged = cid(1, 1)
    assert len(got) == 13 and 9 not in got  # noise point absent
    for e in range(7):
        assert got[e][1] == merged
    assert got[7] == (cid(5, 5), cid(5, 5))
    assert got[8] == (cid(5, 5), cid(5, 5))
    assert got[10][1] == cid(3, n - 1) and got[11][1] == cid(3, n - 1)
    assert got[12][1] == cid(4, 0) and got[13][1] == cid(4, 0)
    assert got[10][1] != got[12][1]


# --------------------------------------------- origin-destination flows


def test_q_od_flows(spark):
    assert_matches_duckdb(SQ.q_od_flows(spark, SF_DIR), SQ.oracle_od_flows())


def test_od_flows_semantics(spark):
    """Anchor = day's first event (ts, then id tie-break); flows walk
    consecutive OBSERVED days (calendar gaps allowed); single-day users
    contribute nothing."""
    import datetime as dt

    from a_tree_spark.pipeline.temporal import od_flows

    utc = dt.timezone.utc
    t = lambda d, h: dt.datetime(2024, 1, 1 + d, h, tzinfo=utc)
    rows = [
        # user 1 day 0: two events at the SAME ts — id 10 < 11 wins,
        # anchor cell 100 (cell 200 at the same instant loses)
        (10, 1, t(0, 5), 100),
        (11, 1, t(0, 5), 200),
        (12, 1, t(0, 9), 300),   # later that day: ignored
        (13, 1, t(1, 1), 200),   # day 1 -> flow 100 -> 200
        (14, 1, t(3, 1), 100),   # day 3 (gap) -> flow 200 -> 100
        (20, 2, t(0, 1), 100),   # user 2: one day only, no flow
        (30, 3, t(2, 1), 100),   # user 3: 100 -> 200 (distinct user
        (31, 3, t(3, 1), 200),   #   for the n_users count)
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "cell_id"])
    got = {
        (r.from_cell, r.to_cell): (r.n_moves, r.n_users)
        for r in od_flows(ev).collect()
    }
    assert got == {
        (100, 200): (2, 2),   # user 1 day0->1 and user 3 day2->3
        (200, 100): (1, 1),   # user 1 day1->3
    }


def test_od_flows_window_runs_over_anchors(spark):
    """The ONLY event-sized operation is the (user, day) anchor
    aggregate: exactly one Window (lag over anchors), planned ABOVE the
    aggregate (top-down string order), and three exchanges total —
    (user, day) anchors, (user) lag, (from, to) flows; the distinct-user
    partials run map-side without a fourth shuffle."""
    plan = (
        SQ.q_od_flows(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 3
    assert plan.index("Window") < plan.index("Aggregate(key=[user_id")


def test_grid_cluster_no_pointwise_blowups(spark):
    """No nested-loop/cartesian join and no Window anywhere in the
    assembled clustering plan — adjacency is an equi-join on neighbor
    ids and every post-count operator is cell-relation-sized (the CC
    rounds run behind a checkpoint boundary)."""
    plan = (
        SQ.q_spatial_cluster(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_grid_cluster_all_isolated_cores(spark):
    """Zero adjacency edges (empty CC input): every core cell must
    still surface as its own singleton cluster."""
    from a_tree_spark.spatial.ops import grid_cluster

    level = 3
    n = grid_size(level)

    def pt(pid, y, x):
        lat, lon = cell_center(np.array([y * n + x]), level)
        return (pid, float(lat[0]), float(lon[0]))

    rows = [pt(0, 1, 1), pt(1, 1, 1), pt(2, 5, 5), pt(3, 5, 5)]
    points = spark.createDataFrame(rows, ["event_id", "lat", "lon"])
    got = {
        r.event_id: r.cluster_id for r in grid_cluster(points, level, 2).collect()
    }
    assert got == {0: n + 1, 1: n + 1, 2: 5 * n + 5, 3: 5 * n + 5}


def test_grid_cluster_checkpoint_hook(spark):
    """VERDICT r7 item 6: grid_cluster exposes a lineage-cut hook for
    the core-cell relation, so a real cluster can substitute a
    reliable checkpoint for the sandbox's localCheckpoint. The hook
    must be called exactly once, its RETURN must be what the operator
    builds on (the plan cut — the core lineage below the hook never
    reaches the output plan), and output rows must be identical to the
    default."""
    import numpy as np

    from a_tree_spark.spatial.cells import cell_center, grid_size
    from a_tree_spark.spatial.ops import grid_cluster

    level = 3
    n = grid_size(level)

    def pt(pid, y, x):
        lat, lon = cell_center(np.array([y * n + x]), level)
        return (pid, float(lat[0]), float(lon[0]))

    rows = [pt(0, 1, 1), pt(1, 1, 1), pt(2, 1, 2), pt(3, 1, 2)]
    points = spark.createDataFrame(rows, ["event_id", "lat", "lon"])
    calls: list = []

    def hook(df):
        calls.append(df)
        return df.localCheckpoint(eager=True)

    out = grid_cluster(points, level, 2, checkpoint=hook)
    assert len(calls) == 1
    assert calls[0].columns == ["cell_id"]
    # the plan builds on the hook's RETURN: the materialized checkpoint
    # scan replaces the point aggregation in the output plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    got = {r.event_id: r.cluster_id for r in out.collect()}
    default = {
        r.event_id: r.cluster_id
        for r in grid_cluster(points, level, 2).collect()
    }
    assert got == default == {i: n + 1 for i in range(4)}


def test_od_moves_null_ts_dropped_engine_identically(spark):
    """Round-7 review repro: a NULL-ts event used to produce OPPOSITE
    phantom flows in the two engines (Spark windows order NULL day
    NULLS FIRST, DuckDB NULLS LAST). Both now drop NULL timestamps."""
    import datetime as dt

    import duckdb

    from a_tree_spark.pipeline.temporal import od_flows, od_moves, od_flows_oracle_sql

    utc = dt.timezone.utc
    rows = [
        (1, 7, None, 50),
        (2, 7, dt.datetime(2024, 1, 6, tzinfo=utc), 9),
        (3, 7, dt.datetime(2024, 1, 7, tzinfo=utc), 4),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, cell_id long")
    moves = sorted(
        (r.from_cell, r.to_cell) for r in od_moves(ev).collect()
    )
    assert moves == [(9, 4)]  # no transition touches the NULL-ts row

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev_src(event_id BIGINT, user_id BIGINT, ts TIMESTAMP, cell_id BIGINT)"
    )
    con.executemany(
        "INSERT INTO ev_src VALUES (?, ?, ?, ?)",
        [(i, u, t.replace(tzinfo=None) if t else None, c) for i, u, t, c in rows],
    )
    oracle = con.execute(
        od_flows_oracle_sql("SELECT * FROM ev_src")
    ).fetchall()
    spark_flows = sorted(map(tuple, od_flows(ev).collect()))
    assert sorted(map(tuple, oracle)) == spark_flows == [(9, 4, 1, 1)]
