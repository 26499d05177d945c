"""Deterministic lat/lon cell index ("GLQ" — grid-level-quad).

The north_rule asks for H3 res-7 / S2 level-12 style tiling; neither
library ships in this container, so the engine defines its own exact,
documented scheme shared by engine and oracle (SURVEY.md §7.1 step 5):

- level L splits the lat/lon rectangle [-90,90] x [-180,180] into a
  2^L x 2^L grid (level 12 -> 4096x4096 cells, ~0.04° x 0.09°/cell —
  comparable footprint to S2 level 12);
- cell_x = clamp(floor((lon+180)/360 * 2^L)), same for lat;
- cell_id = cell_y * 2^L + cell_x (row-major, SQL-expressible in any
  engine; a Morton/Hilbert shuffle would only change locality of ids,
  not join semantics, so we keep the arithmetic form the oracle can run).

Geometry is planar in degrees (no longitude wraparound, no great-circle
math) — declared metric for kNN/PIP; the oracle uses the same metric, so
results match exactly. All functions are numpy-vectorized and also
emitted as SQL strings for Spark (JVM-side, no UDF) and DuckDB.
"""

from __future__ import annotations

import numpy as np

DEFAULT_LEVEL = 12


def grid_size(level: int = DEFAULT_LEVEL) -> int:
    return 1 << level


def cell_xy(lat: np.ndarray, lon: np.ndarray, level: int = DEFAULT_LEVEL):
    n = grid_size(level)
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n)
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int64)
    y = np.clip(y, 0, n - 1).astype(np.int64)
    return x, y


def cell_id(lat, lon, level: int = DEFAULT_LEVEL) -> np.ndarray:
    x, y = cell_xy(lat, lon, level)
    return y * grid_size(level) + x


def cell_center(cell: np.ndarray, level: int = DEFAULT_LEVEL):
    n = grid_size(level)
    cell = np.asarray(cell, dtype=np.int64)
    y, x = cell // n, cell % n
    lon = (x + 0.5) / n * 360.0 - 180.0
    lat = (y + 0.5) / n * 180.0 - 90.0
    return lat, lon


def cell_id_sql(lat_expr: str, lon_expr: str, level: int = DEFAULT_LEVEL) -> str:
    """Identical arithmetic as SQL — valid in both Spark SQL and DuckDB.
    IEEE double ops + FLOOR are bit-identical across engines."""
    n = grid_size(level)
    x = f"LEAST(GREATEST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}), 0), {n - 1})"
    y = f"LEAST(GREATEST(FLOOR(({lat_expr} + 90.0) / 180.0 * {n}), 0), {n - 1})"
    return f"CAST({y} * {n} + {x} AS BIGINT)"


def disk_cells(cell: np.ndarray, radius: int, level: int = DEFAULT_LEVEL) -> list[np.ndarray]:
    """All cells within Chebyshev distance ``radius`` of each input cell
    (clamped at the grid edge, no wraparound). Returns per-input arrays."""
    n = grid_size(level)
    cell = np.asarray(cell, dtype=np.int64)
    y, x = cell // n, cell % n
    out = []
    for yi, xi in zip(y.tolist(), x.tolist()):
        y0, y1 = max(0, yi - radius), min(n - 1, yi + radius)
        x0, x1 = max(0, xi - radius), min(n - 1, xi + radius)
        ys = np.arange(y0, y1 + 1, dtype=np.int64)
        xs = np.arange(x0, x1 + 1, dtype=np.int64)
        out.append((ys[:, None] * n + xs[None, :]).ravel())
    return out


def ring_cells(cell: int, radius: int, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """Cells at exactly Chebyshev distance ``radius`` (the ring), clamped."""
    n = grid_size(level)
    y, x = cell // n, cell % n
    if radius == 0:
        return np.array([cell], dtype=np.int64)
    cells = []
    for dy in range(-radius, radius + 1):
        yy = y + dy
        if yy < 0 or yy >= n:
            continue
        if abs(dy) == radius:
            xs = range(max(0, x - radius), min(n - 1, x + radius) + 1)
        else:
            xs = [c for c in (x - radius, x + radius) if 0 <= c < n]
        for xx in xs:
            cells.append(yy * n + xx)
    return np.array(sorted(set(cells)), dtype=np.int64)


def min_outside_distance(radius: int, level: int = DEFAULT_LEVEL) -> float:
    """Lower bound on planar-degree distance from any point in a cell to
    any point in a cell at Chebyshev distance > radius — the kNN ring
    termination guarantee: once the kth-best candidate distance is below
    this, no cell outside the disk can improve the answer."""
    n = grid_size(level)
    dx = 360.0 / n
    dy = 180.0 / n
    return radius * min(dx, dy)


# --------------------------------------------------------------- polygons


def polygon_bbox_cover(ring: list[tuple[float, float]], level: int = DEFAULT_LEVEL) -> np.ndarray:
    """Conservative cell cover = all cells intersecting the polygon's
    bounding box. Candidate generation only — exactness comes from the
    ray-cast refine, so a loose cover is correct (just less selective)."""
    lats = np.array([p[0] for p in ring])
    lons = np.array([p[1] for p in ring])
    n = grid_size(level)
    x0, y0 = cell_xy(lats.min(), lons.min(), level)
    x1, y1 = cell_xy(lats.max(), lons.max(), level)
    ys = np.arange(int(y0), int(y1) + 1, dtype=np.int64)
    xs = np.arange(int(x0), int(x1) + 1, dtype=np.int64)
    return (ys[:, None] * n + xs[None, :]).ravel()


def points_in_polygon(lat: np.ndarray, lon: np.ndarray, ring: list[tuple[float, float]]) -> np.ndarray:
    """Vectorized even-odd ray cast (ray toward +lon). Points exactly on
    an edge are undefined (synthetic fixtures avoid them). The identical
    crossing test is emitted as SQL by ``ray_cast_sql`` so engine and
    oracle agree bit-for-bit."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    inside = np.zeros(lat.shape, dtype=bool)
    m = len(ring)
    for i in range(m):
        y1, x1 = ring[i]
        y2, x2 = ring[(i + 1) % m]
        crosses = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at = x1 + (x2 - x1) * (lat - y1) / (y2 - y1)
        inside ^= crosses & (lon < x_at)
    return inside


def ray_cast_sql(
    lat_expr: str, lon_expr: str, ring: list[tuple[float, float]]
) -> str:
    """The same even-odd test as a SQL boolean (odd crossing count)."""
    terms = []
    m = len(ring)
    for i in range(m):
        y1, x1 = ring[i]
        y2, x2 = ring[(i + 1) % m]
        terms.append(
            f"(CASE WHEN (({y1!r} > {lat_expr}) <> ({y2!r} > {lat_expr})) "
            f"AND ({lon_expr} < {x1!r} + ({x2!r} - {x1!r}) * "
            f"({lat_expr} - {y1!r}) / ({y2!r} - {y1!r})) THEN 1 ELSE 0 END)"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"
