"""Coverage-aware boundary simplification (`gdal vector
simplify-coverage`, apps/gdalalg_vector_simplify_coverage.h — GEOS
CoverageSimplifier semantics: simplify shared polygon boundaries so
the coverage stays crack-free).

Distributed shape (all key-equi shuffles, nothing on the driver):

 1. every polygon explodes to its boundary SEGMENTS, each keyed by the
    canonical (endpoint-sorted) segment bytes;
 2. one groupBy on the segment key classifies each segment's users —
    a valid coverage has 1 (outer boundary) or 2 (shared boundary);
 3. the (segment -> partner) relation joins back and regroups per
    feature, where a pandas kernel walks each ring, splits it into
    ARCS at partner changes (nodes), and Visvalingam-simplifies each
    arc's interior vertices.

Crack-freedom WITHOUT a cross-polygon arc join: both owners of a
shared arc see the identical vertex chain, and the Visvalingam
removal order is made direction- and start-invariant (ties broken by
vertex coordinates, not index), so the two independent simplifications
are bit-identical — the boundary stays shared.

tolerance is a distance (like GEOS CoverageSimplifier): a vertex is
removable while its effective (triangle) area < tolerance^2 / 2.
preserve_boundary=True leaves unshared (outer) arcs untouched — the
GEOS simplifyInner mode.

Documented residual: a polygon touching a shared boundary at a single
POINT (degree-4 vertex with no shared segment) does not pin that
vertex for the two polygons that own the boundary — GEOS treats such
vertices as nodes; here they are simplifiable (raise tolerance tests
around this if the workload has point-touches).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import wkb


def _seg_key(x1: float, y1: float, x2: float, y2: float) -> bytes:
    """Canonical (order-free) segment bytes."""
    if (x1, y1) <= (x2, y2):
        return struct.pack("<4d", x1, y1, x2, y2)
    return struct.pack("<4d", x2, y2, x1, y1)


def _rings_of(buf: bytes) -> list[np.ndarray]:
    """All rings of a (Multi)Polygon as closed (N,2) arrays."""
    return [r for poly in wkb.polygon_rings(buf) for r in poly]


def _tri_area(a, b, c) -> float:
    return abs((b[0] - a[0]) * (c[1] - a[1])
               - (c[0] - a[0]) * (b[1] - a[1])) / 2.0


def _vw_chain(pts: list, closed: bool, tol_area: float) -> list:
    """Visvalingam-Whyatt with DETERMINISTIC, direction/start-invariant
    removal order: repeatedly drop the vertex with the smallest
    effective area (< tol_area), ties broken by vertex coordinates.
    Open chains keep their endpoints; closed chains keep >= 3
    vertices. O(n^2) — arcs are short relative to the dataset."""
    pts = list(pts)
    if closed:
        # drop the duplicated closing vertex for the cyclic walk
        work = pts[:-1] if len(pts) > 1 and pts[0] == pts[-1] else pts
        alive = list(range(len(work)))
        while len(alive) > 3:
            best = None
            for idx_pos, i in enumerate(alive):
                a = work[alive[idx_pos - 1]]
                c = work[alive[(idx_pos + 1) % len(alive)]]
                ar = _tri_area(a, work[i], c)
                cand = (ar, work[i])
                if best is None or cand < best[0:2]:
                    best = (ar, work[i], idx_pos)
            if best[0] >= tol_area:
                break
            alive.pop(best[2])
        out = [work[i] for i in alive]
        return out + out[:1]
    alive = list(range(len(pts)))
    while len(alive) > 2:
        best = None
        for idx_pos in range(1, len(alive) - 1):
            i = alive[idx_pos]
            ar = _tri_area(pts[alive[idx_pos - 1]], pts[i],
                           pts[alive[idx_pos + 1]])
            cand = (ar, pts[i])
            if best is None or cand < best[0:2]:
                best = (ar, pts[i], idx_pos)
        if best is None or best[0] >= tol_area:
            break
        alive.pop(best[2])
    return [pts[i] for i in alive]


def _simplify_rings(rings: list[np.ndarray], partner_of: dict,
                    tol_area: float, preserve_boundary: bool) -> list[np.ndarray]:
    out_rings = []
    for ring in rings:
        n = len(ring) - 1  # closed: last == first
        if n < 3:
            out_rings.append(ring)
            continue
        parts = []
        for i in range(n):
            k = _seg_key(ring[i, 0], ring[i, 1], ring[i + 1, 0], ring[i + 1, 1])
            parts.append(partner_of.get(k, -1))
        # nodes: vertex i (between segment i-1 and i) where the
        # partner changes
        nodes = [i for i in range(n) if parts[i - 1] != parts[i]]
        verts = [tuple(p) for p in ring[:n]]
        if not nodes:
            # the whole ring is ONE closed arc (island / hole fully
            # against a single partner or fully outer)
            if preserve_boundary and parts[0] == -1:
                out_rings.append(ring)
                continue
            new = _vw_chain(verts + verts[:1], True, tol_area)
            out_rings.append(np.asarray(new, np.float64))
            continue
        new_verts: list = []
        for a_pos in range(len(nodes)):
            i0 = nodes[a_pos]
            i1 = nodes[(a_pos + 1) % len(nodes)]
            # arc vertex chain i0 .. i1 (cyclic, inclusive)
            if i1 > i0:
                chain = verts[i0:i1 + 1]
            else:
                chain = verts[i0:] + verts[:i1 + 1]
            if preserve_boundary and parts[i0] == -1:
                simp = chain
            else:
                simp = _vw_chain(chain, False, tol_area)
            new_verts.extend(simp[:-1])  # drop shared node, next adds it
        new_verts.append(new_verts[0])
        if len(new_verts) >= 4:
            out_rings.append(np.asarray(new_verts, np.float64))
        else:
            out_rings.append(ring)
    return out_rings


def simplify_coverage(df: DataFrame, col: str = "geom",
                      tolerance: float = 0.0,
                      preserve_boundary: bool = False,
                      id_col: str | None = None) -> DataFrame:
    """Simplify shared boundaries of a polygonal coverage; see module
    docstring for the distributed shape and guarantees."""
    tol_area = tolerance * tolerance / 2.0
    if id_col is None:
        df = df.withColumn("__sid", F.monotonically_increasing_id())
        df = df.localCheckpoint(eager=True)  # pin non-deterministic ids
        id_col, drop_id = "__sid", True
    else:
        drop_id = False

    @F.pandas_udf(T.ArrayType(T.BinaryType()))
    def seg_keys(g: pd.Series) -> pd.Series:
        def keys(b):
            out = []
            for ring in _rings_of(bytes(b)):
                for i in range(len(ring) - 1):
                    out.append(_seg_key(ring[i, 0], ring[i, 1],
                                        ring[i + 1, 0], ring[i + 1, 1]))
            return out
        return pd.Series([keys(b) if b is not None else [] for b in g])

    segs = (df.select(F.col(id_col).alias("sid"),
                      F.explode(seg_keys(F.col(col))).alias("sk"))
            .distinct())
    # one shuffle: users per canonical segment; coverage => <= 2
    users = segs.groupBy("sk").agg(F.collect_set("sid").alias("us"))
    seg_partner = (segs.join(users, "sk")
                   .select("sid", "sk",
                           F.coalesce(
                               F.array_min(F.filter(
                                   "us", lambda u: u != F.col("sid"))),
                               F.lit(-1)).alias("partner")))
    permap = (seg_partner.groupBy("sid")
              .agg(F.collect_list("sk").alias("sks"),
                   F.collect_list("partner").alias("partners")))

    @F.pandas_udf(T.BinaryType())
    def simplify(g: pd.Series, sks: pd.Series, partners: pd.Series) -> pd.Series:
        out = []
        for b, ks, ps in zip(g, sks, partners):
            if b is None:
                out.append(None)
                continue
            pmap = {bytes(k): int(p) for k, p in zip(ks, ps)}
            t, _ = wkb.decode(bytes(b))
            polys = wkb.polygon_rings(bytes(b))
            new_polys = [_simplify_rings(rings, pmap, tol_area,
                                         preserve_boundary)
                         for rings in polys]
            if t == wkb.MULTIPOLYGON:
                out.append(wkb.multipolygon(new_polys))
            else:
                out.append(wkb.polygon(new_polys[0]))
        return pd.Series(out)

    joined = df.join(permap, F.col(id_col) == F.col("sid"), "left")
    result = joined.withColumn(
        col,
        F.when(F.col("sid").isNull(), F.col(col))
        .otherwise(simplify(F.col(col), "sks", "partners"))
    ).drop("sid", "sks", "partners")
    return result.drop("__sid") if drop_id else result
