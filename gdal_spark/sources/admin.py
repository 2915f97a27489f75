"""Deterministic admin/coverage polygon fixture table.

The north star joins pages against "admin/coverage polygons". With no
external data allowed, this module generates a deterministic world of
convex polygons (rotated hexagons/octagons of varying size, spread over
the globe, some overlapping). Vertices are plain Python floats baked as
literals, so the DuckDB oracle can embed the identical half-plane
predicates (geo.geom.convex_halfplane_sql) — bit-exact cross-engine.

The engine itself does NOT assume convexity (operators.pip_join uses
the general even-odd test on WKB rings); convexity is only what makes
the SQL oracle expressible.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import cells, geom, wkb


def admin_rings(n_polys: int = 24) -> list[tuple[int, str, np.ndarray]]:
    """-> [(poly_id, name, CCW ring (closed, (k,2) float64))].

    Centers follow a deterministic low-discrepancy walk; radii 3°-14°;
    polygons 5-9 vertices; every vertex coordinate is an irrational-ish
    float so fixture points never sit exactly on an edge.
    """
    out = []
    for i in range(n_polys):
        cx = ((i * 360.0 * 0.6180339887498949) % 344.0) - 172.0
        cy = ((i * 160.0 * 0.7548776662466927) % 130.0) - 65.0
        r = 3.0 + (i * 7.389056098930650) % 11.0
        nv = 5 + i % 5
        rot = i * 0.9102392266268373
        angles = [rot + 2.0 * math.pi * k / nv for k in range(nv)]
        ring = np.array(
            [[cx + r * math.cos(a), cy + 0.75 * r * math.sin(a)] for a in angles],
            dtype=np.float64,
        )
        # already CCW (angles increasing); close it
        ring = np.vstack([ring, ring[:1]])
        out.append((i, f"admin_{i:03d}", ring))
    return out


def admin_df(spark: SparkSession, n_polys: int = 24,
             res: int = cells.DEFAULT_RES) -> DataFrame:
    """Polygon DataFrame: (poly_id, name, geom WKB, bbox cols, covering
    cell count) — the dim side of the PIP join."""
    rows = []
    for pid, name, ring in admin_rings(n_polys):
        minx, miny, maxx, maxy = geom.bbox_of_ring(ring)
        rows.append((pid, name, bytearray(wkb.polygon([ring])),
                     float(minx), float(miny), float(maxx), float(maxy)))
    schema = T.StructType([
        T.StructField("poly_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("geom", T.BinaryType(), False),
        T.StructField("min_lon", T.DoubleType(), False),
        T.StructField("min_lat", T.DoubleType(), False),
        T.StructField("max_lon", T.DoubleType(), False),
        T.StructField("max_lat", T.DoubleType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def admin_cells_df(spark: SparkSession, n_polys: int = 24,
                   res: int = cells.DEFAULT_RES) -> DataFrame:
    """Polygons exploded to covering cells — the shuffle-join build side
    (the analog of registering each polygon in a cell-partitioned
    spatial index, SURVEY §2.3)."""
    rows = []
    for pid, name, ring in admin_rings(n_polys):
        minx, miny, maxx, maxy = geom.bbox_of_ring(ring)
        for c in cells.covering_cells(minx, miny, maxx, maxy, res):
            rows.append((pid, int(c)))
    schema = T.StructType([
        T.StructField("poly_id", T.IntegerType(), False),
        T.StructField("cell_id", T.LongType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def pip_oracle_predicate(ring: np.ndarray, x_expr: str, y_expr: str) -> str:
    return geom.convex_halfplane_sql(ring, x_expr, y_expr)
