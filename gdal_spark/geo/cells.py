"""Hierarchical spatial cell index: Morton (Z-order) quadkey cells.

Our from-scratch analog of H3/S2 cell encoding (the environment has no
h3 library; a web-mercator quadtree Morton code gives the same three
properties the engine needs, with pure bit math that runs JVM-side):

  1. hierarchical      — parent(cell) = cell >> 2 (like S2);
  2. space-filling     — Z-order: range-partitioning by cell id is a
                         spatial sort (reference analog: the Hilbert
                         spatial sort, apps/gdalalg_vector_sort.cpp:39
                         and alg/hilbert.cpp:80 — Morton has the same
                         clustering property up to a constant factor);
  3. cheap neighbors   — ring expansion via (tx±k, ty±k) re-encode.

cell id layout at resolution r: (1 << (2r)) | interleave(tx, ty) — the
leading 1 bit makes ids self-describing (resolution recoverable), like
S2's trailing-bit scheme. tx, ty are web-mercator XYZ tile coords at
zoom r, so a cell IS a tile: the spatial partitioning of joins and the
tile pyramid share one addressing scheme.

Forms: *_col (Spark columns — bitwise ops, whole-stage codegen),
*_np (numpy), *_sql (DuckDB oracle text). All three bit-identical.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from . import mercator

#: default cell resolution for join partitioning: 128x128 world grid.
#: At 10^12 rows that is ~6e7 rows/cell on average — the shuffle path
#: re-salts hot cells above a threshold, and the resolution is a knob.
DEFAULT_RES = 7

_MAX_RES = 26  # 2*26+1 = 53 bits < int64, and < double mantissa


def _spread_bits_np(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 26 bits of v (Morton spread)."""
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def _compact_bits_np(v: np.ndarray) -> np.ndarray:
    v = v & 0x5555555555555555
    v = (v | (v >> 1)) & 0x3333333333333333
    v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
    v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
    v = (v | (v >> 16)) & 0x00000000FFFFFFFF
    return v


def cell_from_tile_np(tx: np.ndarray, ty: np.ndarray, res: int) -> np.ndarray:
    return (np.int64(1) << np.int64(2 * res)) | _spread_bits_np(tx) | (_spread_bits_np(ty) << 1)


def cell_encode_np(lon: np.ndarray, lat: np.ndarray, res: int = DEFAULT_RES) -> np.ndarray:
    tx, ty = mercator.tile_xy_np(np.asarray(lon, float), np.asarray(lat, float), res)
    return cell_from_tile_np(tx, ty, res)


def cell_to_tile_np(cell: np.ndarray):
    """-> (tx, ty, res) arrays."""
    cell = cell.astype(np.int64)
    # resolution = floor(log2(cell)) / 2; vectorized via float log2 is
    # safe (53-bit mantissa covers all valid cells)
    res = (np.log2(cell.astype(np.float64)).astype(np.int64)) // 2
    body = cell ^ (np.int64(1) << (2 * res))
    return _compact_bits_np(body), _compact_bits_np(body >> 1), res


def cell_parent_np(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    return cell >> np.int64(2 * steps)


def neighbors_np(cell: int, ring: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance `ring` (grid_disk analog)."""
    tx, ty, res = cell_to_tile_np(np.asarray([cell]))
    r = int(res[0])
    n = 1 << r
    xs = np.arange(int(tx[0]) - ring, int(tx[0]) + ring + 1)
    ys = np.arange(int(ty[0]) - ring, int(ty[0]) + ring + 1)
    gx, gy = np.meshgrid(xs % n, np.clip(ys, 0, n - 1))  # wrap x, clamp y
    cells = cell_from_tile_np(gx.ravel(), gy.ravel(), r)
    return np.unique(cells)


def covering_cells(min_lon, min_lat, max_lon, max_lat, res: int = DEFAULT_RES) -> np.ndarray:
    """All cells whose tile bbox intersects the given lon/lat bbox.

    Used to explode polygons to candidate cells for the shuffle join
    (the analog of GDAL driver R-tree probes, SURVEY §2.3).
    """
    tx0, ty1 = mercator.tile_xy_np(np.asarray([min_lon]), np.asarray([min_lat]), res)
    tx1, ty0 = mercator.tile_xy_np(np.asarray([max_lon]), np.asarray([max_lat]), res)
    xs = np.arange(int(tx0[0]), int(tx1[0]) + 1)
    ys = np.arange(int(ty0[0]), int(ty1[0]) + 1)  # XYZ y grows southward
    gx, gy = np.meshgrid(xs, ys)
    return cell_from_tile_np(gx.ravel(), gy.ravel(), res)


# ------------------------------------------------------------- columns

def _spread_bits_col(v: Column) -> Column:
    v = (v.bitwiseOR(F.shiftleft(v, 16))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = (v.bitwiseOR(F.shiftleft(v, 8))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = (v.bitwiseOR(F.shiftleft(v, 4))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = (v.bitwiseOR(F.shiftleft(v, 2))).bitwiseAND(F.lit(0x3333333333333333))
    v = (v.bitwiseOR(F.shiftleft(v, 1))).bitwiseAND(F.lit(0x5555555555555555))
    return v


def cell_from_tile_col(tx: Column, ty: Column, res: int) -> Column:
    return (
        F.lit(1 << (2 * res))
        .bitwiseOR(_spread_bits_col(tx))
        .bitwiseOR(F.shiftleft(_spread_bits_col(ty), 1))
    )


def cell_encode_col(lon: Column, lat: Column, res: int = DEFAULT_RES) -> Column:
    """Vectorized cell encode as a pure column expression (no Python)."""
    tx = mercator.tile_x_col(lon, res)
    ty = mercator.tile_y_col(lat, res)
    return cell_from_tile_col(tx, ty, res)


def cell_parent_col(cell: Column, steps: int = 1) -> Column:
    return F.shiftright(cell, 2 * steps)


# ----------------------------------------------------------------- sql

def _spread_bits_sql(e: str) -> str:
    e = f"(({e}) | (({e}) << 16)) & {0x0000FFFF0000FFFF}"
    e = f"(({e}) | (({e}) << 8)) & {0x00FF00FF00FF00FF}"
    e = f"(({e}) | (({e}) << 4)) & {0x0F0F0F0F0F0F0F0F}"
    e = f"(({e}) | (({e}) << 2)) & {0x3333333333333333}"
    e = f"(({e}) | (({e}) << 1)) & {0x5555555555555555}"
    return e


def cell_from_tile_sql(tx_name: str, ty_name: str, res: int = DEFAULT_RES) -> str:
    """DuckDB SQL computing the identical cell id from tile-coord column
    NAMES (not full expressions — the spread nests its input 32x, so
    compute tx/ty in an inner SELECT first)."""
    return (
        f"({1 << (2 * res)} | ({_spread_bits_sql(tx_name)})"
        f" | (({_spread_bits_sql(ty_name)}) << 1))"
    )
