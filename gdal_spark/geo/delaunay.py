"""Delaunay triangulation + TIN linear interpolation kernels.

Reference: alg/delaunay.c (GDALTriangulationCreateDelaunay /
ComputeBarycentricCoefficients / ComputeBarycentricCoordinates) and
alg/gdalgrid.cpp:2565 `GDALGridLinear` — interpolate a node from the
barycentric coordinates of the Delaunay facet containing it; outside
the hull, fall back to nearest-neighbour (radius != 0) or nodata
(radius == 0).

The triangulation here is Bowyer-Watson with a super-triangle — the
classic incremental algorithm (public domain since Bowyer/Watson 1981;
the reference vendors qhull for the same job). Predicates are plain
IEEE doubles with exact-arithmetic fallback via Fraction on near-zero
determinants (same policy as geo/robust.py's orient2d), so degenerate
fixtures can't corrupt the topology. Insertion order is the caller's
point order; callers pass `sort_points`-normalized arrays so every
execution strategy builds the identical triangulation.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

#: relative slack under which float predicates defer to exact arithmetic
_EPS = 1e-12


def _incircle(ax, ay, bx, by, cx, cy, dx, dy) -> bool:
    """d strictly inside the circumcircle of ccw triangle (a, b, c)."""
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    ad2 = adx * adx + ady * ady
    bd2 = bdx * bdx + bdy * bdy
    cd2 = cdx * cdx + cdy * cdy
    det = (adx * (bdy * cd2 - cdy * bd2)
           - ady * (bdx * cd2 - cdx * bd2)
           + ad2 * (bdx * cdy - cdx * bdy))
    mag = (abs(adx) + abs(ady) + abs(bdx) + abs(bdy)
           + abs(cdx) + abs(cdy)) ** 4 + 1e-300
    if abs(det) > _EPS * mag:
        return det > 0.0
    fa = [Fraction(v) for v in (ax, ay, bx, by, cx, cy, dx, dy)]
    fadx, fady = fa[0] - fa[6], fa[1] - fa[7]
    fbdx, fbdy = fa[2] - fa[6], fa[3] - fa[7]
    fcdx, fcdy = fa[4] - fa[6], fa[5] - fa[7]
    fdet = (fadx * (fbdy * (fcdx * fcdx + fcdy * fcdy)
                    - fcdy * (fbdx * fbdx + fbdy * fbdy))
            - fady * (fbdx * (fcdx * fcdx + fcdy * fcdy)
                      - fcdx * (fbdx * fbdx + fbdy * fbdy))
            + (fadx * fadx + fady * fady) * (fbdx * fcdy - fcdx * fbdy))
    return fdet > 0


def _orient(ax, ay, bx, by, cx, cy) -> float:
    from . import robust

    return robust.orient2d(ax, ay, bx, by, cx, cy)


def _circumcircle(ax, ay, bx, by, cx, cy):
    """(center_x, center_y, r^2) of the triangle's circumcircle."""
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    r2 = (ax - ux) * (ax - ux) + (ay - uy) * (ay - uy)
    return ux, uy, r2


def delaunay_np(px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """-> (n_facets, 3) int64 vertex indices, each facet ccw.

    Bowyer-Watson with cached circumcircles: per insertion the
    in-circumcircle test is ONE vectorized center-distance compare
    over live triangles; only near-boundary hits (within _EPS of the
    radius) re-test with the exact determinant. Duplicate points are
    skipped (the reference's qhull merges them)."""
    n = len(px)
    if n < 3:
        return np.empty((0, 3), np.int64)
    cx0 = (px.min() + px.max()) / 2.0
    cy0 = (py.min() + py.max()) / 2.0
    span = max(px.max() - px.min(), py.max() - py.min(), 1.0) * 16.0
    ax = np.concatenate([px.astype(np.float64),
                         [cx0 - span, cx0 + span, cx0]])
    ay = np.concatenate([py.astype(np.float64),
                         [cy0 - span, cy0 - span, cy0 + span]])

    cap = 8 * (n + 4)
    tv = np.zeros((cap, 3), np.int64)       # vertex indices
    tc = np.zeros((cap, 3), np.float64)     # (ux, uy, r2)
    alive = np.zeros(cap, bool)

    def add(i, j, k, slot):
        tv[slot] = (i, j, k)
        tc[slot] = _circumcircle(ax[i], ay[i], ax[j], ay[j], ax[k], ay[k])
        alive[slot] = True

    add(n, n + 1, n + 2, 0)
    hi = 1                                   # slots [0, hi) ever used
    free: list[int] = []
    seen: set[tuple[float, float]] = set()
    for p in range(n):
        key = (float(ax[p]), float(ay[p]))
        if key in seen:
            continue
        seen.add(key)
        dx = ax[p] - tc[:hi, 0]
        dy = ay[p] - tc[:hi, 1]
        d2 = dx * dx + dy * dy
        r2 = tc[:hi, 2]
        margin = _EPS * (r2 + d2)
        inside = alive[:hi] & (d2 < r2 - margin)
        unsure = alive[:hi] & ~inside & (d2 < r2 + margin)
        bad = list(np.nonzero(inside)[0])
        for ti in np.nonzero(unsure)[0]:
            i, j, k = tv[ti]
            if _incircle(ax[i], ay[i], ax[j], ay[j], ax[k], ay[k],
                         ax[p], ay[p]):
                bad.append(int(ti))
        # cavity boundary = directed edges whose reverse is absent
        # (all facets ccw, so interior edges pair up reversed)
        edge_list = []
        for ti in bad:
            i, j, k = tv[ti]
            edge_list += [(int(i), int(j)), (int(j), int(k)),
                          (int(k), int(i))]
            alive[ti] = False
            free.append(int(ti))
        eset = set(edge_list)
        for (i, j) in edge_list:
            if (j, i) in eset:
                continue
            slot = free.pop() if free else hi
            if slot == hi:
                hi += 1
                if hi > cap:
                    raise RuntimeError("triangle capacity exceeded")
            add(i, j, p, slot)
    keep = alive[:hi] & (tv[:hi] < n).all(axis=1)
    fac = tv[:hi][keep].copy()
    for r in range(len(fac)):                # ccw normalization
        i, j, k = fac[r]
        if _orient(ax[i], ay[i], ax[j], ay[j], ax[k], ay[k]) < 0:
            fac[r, 1], fac[r, 2] = k, j
    return fac


def barycentric_coefficients(px: np.ndarray, py: np.ndarray,
                             tris: np.ndarray):
    """Per-facet coefficients, exactly delaunay.c's
    GDALTriangulationComputeBarycentricCoefficients:
      dfMul1BarycentricCoefXY, dfMul2BarycentricCoefXY over (x - x3,
      y - y3) with det = (y2-y3)(x1-x3) + (x3-x2)(y1-y3)."""
    x1, y1 = px[tris[:, 0]], py[tris[:, 0]]
    x2, y2 = px[tris[:, 1]], py[tris[:, 1]]
    x3, y3 = px[tris[:, 2]], py[tris[:, 2]]
    det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
    return ((y2 - y3) / det, (x3 - x2) / det,
            (y3 - y1) / det, (x1 - x3) / det, x3, y3)


def linear_np(nodes_x: np.ndarray, nodes_y: np.ndarray,
              px: np.ndarray, py: np.ndarray, pv: np.ndarray,
              tris: np.ndarray, radius: float = 0.0,
              nodata: float = 0.0, bary_eps: float = 0.0) -> np.ndarray:
    """GDALGridLinear at arbitrary nodes: value = l1*z1 + l2*z2 + l3*z3
    of the containing facet (ties on shared edges resolve to the
    lowest facet index — deterministic where the reference's directed
    walk is seed-dependent); outside the hull: nearest point within
    `radius` (!= 0) or nodata (== 0), per gdalgrid.cpp:2641-2663."""
    from ..raster.gridding import nearest_np

    out = np.full(nodes_x.shape, np.nan, dtype=np.float64)
    if len(tris):
        c1x, c1y, c2x, c2y, x3, y3 = barycentric_coefficients(px, py, tris)
        z1 = pv[tris[:, 0]]
        z2 = pv[tris[:, 1]]
        z3 = pv[tris[:, 2]]
        step = max(1, int(2_000_000 // max(len(tris), 1)))
        for i in range(0, len(nodes_x), step):
            dx = nodes_x[i:i + step, None] - x3[None, :]
            dy = nodes_y[i:i + step, None] - y3[None, :]
            l1 = dx * c1x[None, :] + dy * c1y[None, :]
            l2 = dx * c2x[None, :] + dy * c2y[None, :]
            l3 = 1.0 - l1 - l2
            inside = ((l1 >= -bary_eps) & (l2 >= -bary_eps)
                      & (l3 >= -bary_eps))
            has = inside.any(axis=1)
            first = inside.argmax(axis=1)
            val = (l1[np.arange(len(first)), first] * z1[first]
                   + l2[np.arange(len(first)), first] * z2[first]
                   + l3[np.arange(len(first)), first] * z3[first])
            chunk = out[i:i + step]
            chunk[has] = val[has]
            out[i:i + step] = chunk
    miss = np.isnan(out)
    if miss.any():
        if radius == 0.0:
            out[miss] = nodata
        else:
            r = np.inf if (radius < 0.0 or not np.isfinite(radius)) \
                else radius
            out[miss] = nearest_np(nodes_x[miss], nodes_y[miss],
                                   px, py, pv, r, nodata)
    return out
