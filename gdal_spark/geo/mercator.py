"""Web-mercator (EPSG:4326 <-> EPSG:3857) and zoom-pyramid tile math.

Closed-form formulas matching the reference's gdal2tiles GlobalMercator
(reference: swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:423-502) and
the `gdal raster tile` index math (apps/gdalalg_raster_tile.cpp:435-504).
No PROJ dependency is needed for this CRS pair — the transform is exact
closed-form math, so it runs JVM-side as Spark column expressions
(whole-stage codegen, no Python) and as vectorized numpy for raster
kernels.

Each function exists in up to three parallel forms that must agree:
  *_np      — numpy arrays (used inside raster/warp kernels)
  *_col     — pyspark Column expressions (used in DataFrame plans)
  *_sql     — ANSI SQL text (used to generate DuckDB oracle queries)
The Column and SQL forms use only +,-,*,/, ln, tan, radians, floor —
arithmetic is IEEE-exact in both engines; transcendentals may differ in
the last ulp, which only matters for points within ~1e-16 of a tile
boundary (probability ~0 on our fixtures).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS = 6378137.0
ORIGIN_SHIFT = np.pi * EARTH_RADIUS  # 20037508.342789244
TILE_SIZE = 256
# Max latitude of the square web-mercator world (gdal2tiles.py:432 inverse)
MERCATOR_MAX_LAT = 85.05112877980659


# ---------------------------------------------------------------- numpy

#: the one blessed operand order for mercator-Y, shared bit-for-bit by
#: the numpy, Column, and SQL forms: ln(tan((90 + lat) * DEG2) * R with
#: DEG2 = double(pi/360) folded to a literal BEFORE the multiply.
DEG2 = np.pi / 360.0
LON2M = ORIGIN_SHIFT / 180.0


def lonlat_to_meters_np(lon: np.ndarray, lat: np.ndarray):
    """EPSG:4326 -> EPSG:3857 (gdal2tiles.py:423 LatLonToMeters)."""
    mx = lon * LON2M
    my = np.log(np.tan((90.0 + lat) * DEG2)) * EARTH_RADIUS
    # canonical form: my = R * ln(tan(pi/4 + lat*pi/360))
    return mx, my


def meters_to_lonlat_np(mx: np.ndarray, my: np.ndarray):
    """EPSG:3857 -> EPSG:4326 (gdal2tiles.py:432 MetersToLatLon)."""
    lon = mx / ORIGIN_SHIFT * 180.0
    lat = np.degrees(2.0 * np.arctan(np.exp(my / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


def resolution(zoom: int) -> float:
    """Meters per pixel at zoom (gdal2tiles.py:498 Resolution = 2*pi*R/256/2^z)."""
    return 2.0 * ORIGIN_SHIFT / TILE_SIZE / (1 << zoom)


def tile_xy_np(lon: np.ndarray, lat: np.ndarray, zoom: int, xyz: bool = True):
    """Point -> (tx, ty) tile index at zoom.

    tx from plain longitude fraction; ty from mercator Y. `xyz=True`
    gives XYZ/slippy orientation (y=0 at north), `False` gives TMS
    (y=0 at south) — the reference supports both via GetFileY
    (apps/gdalalg_raster_tile.cpp:509-513).
    """
    n = 1 << zoom
    tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    _, my = lonlat_to_meters_np(lon, np.clip(lat, -MERCATOR_MAX_LAT, MERCATOR_MAX_LAT))
    ty_tms = np.floor((my + ORIGIN_SHIFT) / (2.0 * ORIGIN_SHIFT) * n).astype(np.int64)
    tx = np.clip(tx, 0, n - 1)
    ty_tms = np.clip(ty_tms, 0, n - 1)
    return (tx, (n - 1) - ty_tms) if xyz else (tx, ty_tms)


def tile_bounds_m(tx: int, ty_tms: int, zoom: int):
    """Bounds of a TMS tile in EPSG:3857 meters (gdal2tiles.py:480 TileBounds)."""
    res = resolution(zoom)
    minx = tx * TILE_SIZE * res - ORIGIN_SHIFT
    miny = ty_tms * TILE_SIZE * res - ORIGIN_SHIFT
    return minx, miny, minx + TILE_SIZE * res, miny + TILE_SIZE * res


# ------------------------------------------------------------- columns

def merc_x_col(lon: Column) -> Column:
    return lon * F.lit(LON2M)


def merc_y_col(lat: Column) -> Column:
    lat_c = F.greatest(F.least(lat, F.lit(MERCATOR_MAX_LAT)), F.lit(-MERCATOR_MAX_LAT))
    return F.log(F.tan((F.lit(90.0) + lat_c) * F.lit(DEG2))) * F.lit(EARTH_RADIUS)


def tile_x_col(lon: Column, zoom: int) -> Column:
    n = 1 << zoom
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.greatest(F.least(raw, F.lit(n - 1)), F.lit(0)).cast("long")


def tile_y_col(lat: Column, zoom: int, xyz: bool = True) -> Column:
    n = 1 << zoom
    my = merc_y_col(lat)
    raw = F.floor((my + F.lit(ORIGIN_SHIFT)) / F.lit(2.0 * ORIGIN_SHIFT) * F.lit(float(n)))
    tms = F.greatest(F.least(raw, F.lit(n - 1)), F.lit(0)).cast("long")
    return (F.lit(n - 1) - tms) if xyz else tms


# ----------------------------------------------------------------- sql

def merc_y_sql(lat_expr: str) -> str:
    """DuckDB SQL for mercator Y of a latitude expression (clamped).
    Operand order mirrors merc_y_col / lonlat_to_meters_np exactly so
    all three engines round identically."""
    clamped = (
        f"greatest(least({lat_expr}, {MERCATOR_MAX_LAT!r}), {-MERCATOR_MAX_LAT!r})"
    )
    return f"ln(tan((90.0 + {clamped}) * {DEG2!r})) * {EARTH_RADIUS!r}"


def tile_x_sql(lon_expr: str, zoom: int) -> str:
    n = 1 << zoom
    raw = f"floor(({lon_expr} + 180.0) / 360.0 * {float(n)!r})"
    return f"cast(greatest(least({raw}, {n - 1}), 0) as bigint)"


def tile_y_sql(lat_expr: str, zoom: int, xyz: bool = True) -> str:
    n = 1 << zoom
    my = merc_y_sql(lat_expr)
    raw = f"floor(({my} + {ORIGIN_SHIFT!r}) / {2.0 * ORIGIN_SHIFT!r} * {float(n)!r})"
    tms = f"cast(greatest(least({raw}, {n - 1}), 0) as bigint)"
    return f"({n - 1} - {tms})" if xyz else tms
