"""Deterministic spatial fixtures shared by engine queries, the DuckDB
oracle, and tests (FIXTURES.md F3/F4) — no external data, no RNG at
query time; everything is integer arithmetic on driver-table ids that
both Spark SQL and DuckDB evaluate bit-identically.
"""

from __future__ import annotations

from .ops import Polygon

# lat/lon derived from event ids: integer modular arithmetic then one
# exact double division — identical in Spark and DuckDB.
POINT_LAT_SQL = "(CAST((event_id % 1800) * 7 % 1800 AS DOUBLE) / 10.0 - 90.0 + 0.05)"
POINT_LON_SQL = "(CAST((event_id % 3600) * 11 % 3600 AS DOUBLE) / 10.0 - 180.0 + 0.05)"

# query points (for kNN) from nation ids — 25 queries, same trick
QUERY_LAT_SQL = "(CAST((n_nationkey * 131) % 1700 AS DOUBLE) / 10.0 - 84.0 + 0.03)"
QUERY_LON_SQL = "(CAST((n_nationkey * 377) % 3500 AS DOUBLE) / 10.0 - 174.0 + 0.03)"

# raster tile value from the cell id — exact integer both engines
TILE_VALUE_SQL = "(cell_id % 97)"


def _diamond(shape_id: int, lat: float, lon: float, r: float) -> Polygon:
    return Polygon(shape_id, (
        (lat + r, lon), (lat, lon + r), (lat - r, lon), (lat, lon - r),
    ))


def _box(shape_id: int, lat: float, lon: float, h: float, w: float) -> Polygon:
    return Polygon(shape_id, (
        (lat + h, lon - w), (lat + h, lon + w), (lat - h, lon + w), (lat - h, lon - w),
    ))


def _chevron(shape_id: int, lat: float, lon: float, s: float) -> Polygon:
    """Concave polygon (arrowhead) — exercises non-convex ray casting."""
    return Polygon(shape_id, (
        (lat + s, lon - s), (lat + s, lon + s), (lat, lon),
        (lat - s, lon + s), (lat - s, lon - s),
    ))


def test_polygons() -> list[Polygon]:
    """A fixed polygon set spanning hot and cold regions; vertices chosen
    off cell boundaries and off the synthetic point lattice (points sit
    at *.x5 offsets; vertices at *.x1/*.x7) to avoid on-edge ties."""
    polygons = [
        _box(1, 10.01, 20.07, 15.2, 30.4),
        _box(2, -35.11, -60.17, 12.6, 25.2),
        _diamond(3, 48.21, 2.31, 18.7),
        _diamond(4, -5.07, 110.13, 22.1),
        _chevron(5, 40.17, -100.23, 17.9),
        _chevron(6, 60.31, 80.07, 14.3),
        _box(7, 0.01, 0.03, 80.0, 180.0 - 0.07),  # hot: covers most of the globe
        _diamond(8, -70.13, -150.21, 9.9),
    ]
    return polygons
