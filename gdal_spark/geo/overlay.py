"""Polygon boolean overlay (Intersection / Union / Difference /
SymDifference) and the areal predicate matrix — pure numpy, no GEOS.

Reference contracts: OGRGeometry::Intersection/Union/Difference/
SymDifference (ogr/ogr_geometry.h:567-575; layer algebra
ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385 Intersection, :5803 Union,
:6340 SymDifference) and the predicate set Equals/Disjoint/Touches/
Within/Contains/Overlaps/Intersects (ogr_geometry.h:547-566).

Algorithm (edge subdivision + classification + stitching — the
Weiler–Atherton family):

 1. split every edge of A at its proper intersections with B's edges
    (and vice versa); each intersection point is computed ONCE per
    (edgeA, edgeB) pair and shared by both sides, so stitched endpoints
    match bit-for-bit;
 2. classify each sub-edge by whether its midpoint lies inside the
    other polygon (even-odd, holes respected);
 3. keep the sub-edges the op calls for (below), reversing B's pieces
    for Difference, and walk the kept directed edges into closed loops;
 4. orient: CCW loops are shells, CW loops are holes; nest holes into
    their smallest containing shell -> a MULTIPOLYGON result
    (PROMOTE_TO_MULTI semantics of the layer-algebra ops).

    keep rules        A-pieces            B-pieces
    Intersection      inside B            inside A
    Union             NOT inside B        NOT inside A
    Difference A-B    NOT inside B        inside A, REVERSED

Containment and disjoint fall out with no special cases: if A sits
inside B, every A-piece classifies "inside B" and stitching returns A
itself for the intersection.

Shared-boundary (collinear-overlap) handling — the common real-world
degeneracy (adjacent admin polygons, equal geometries): exactly
collinear overlapping edges are split at each other's endpoints, so
every shared sub-edge has a bit-identical partner on the other side;
an ON-classified piece is then kept or dropped by the partner's
DIRECTION (both rings keep interior to the LEFT, so a same-direction
partner means the interiors lie on the same side):

    op            ON piece from A kept when      ON piece from B
    Intersection  partner same-direction         never (A's copy wins)
    Union         partner same-direction         never
    Difference    partner OPPOSITE direction     never

Remaining unsupported degeneracy: edges on the same line whose
collinearity is not float-exact, and transverse vertex-on-edge
touches; generic-position inputs are exact. The predicate matrix
derives from overlay results, so all eight predicates stay mutually
consistent — including Equals/Touches on exactly shared boundaries.
"""

from __future__ import annotations

import numpy as np

from . import geom

Polygon = list  # list[np.ndarray] — rings[0] shell, rest holes


def _close(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, np.float64)
    if len(r) and (r[0] != r[-1]).any():
        r = np.vstack([r, r[:1]])
    return r


def normalize(poly: Polygon) -> Polygon:
    """Shell CCW, holes CW, all rings closed."""
    out = []
    for i, ring in enumerate(poly):
        r = _close(ring)
        a = geom.ring_area(r)
        want_ccw = i == 0
        if (a > 0) != want_ccw and a != 0:
            r = r[::-1].copy()
        out.append(r)
    return out


def _ring_edges(poly: Polygon):
    """-> list of (p0, p1) directed edges over all rings."""
    edges = []
    for ring in poly:
        r = _close(ring)
        for i in range(len(r) - 1):
            edges.append((r[i], r[i + 1]))
    return edges


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _edge_intersections(ea, eb):
    """Proper (non-parallel) intersection of two segments.
    -> (t, s, point) with t along ea, s along eb, or None."""
    (a1, a2), (b1, b2) = ea, eb
    d1x, d1y = a2[0] - a1[0], a2[1] - a1[1]
    d2x, d2y = b2[0] - b1[0], b2[1] - b1[1]
    denom = d1x * d2y - d1y * d2x
    if denom == 0.0:
        return None  # parallel / collinear: degenerate scope
    wx, wy = b1[0] - a1[0], b1[1] - a1[1]
    t = (wx * d2y - wy * d2x) / denom
    s = (wx * d1y - wy * d1x) / denom
    if not (0.0 <= t <= 1.0 and 0.0 <= s <= 1.0):
        return None
    # the ONE shared point both polygons will stitch through; endpoint
    # hits reproduce the original vertex exactly (t==0 -> a1, etc.)
    if t == 0.0:
        p = (float(a1[0]), float(a1[1]))
    elif t == 1.0:
        p = (float(a2[0]), float(a2[1]))
    else:
        p = (float(a1[0] + t * d1x), float(a1[1] + t * d1y))
    return t, s, p


def _collinear_overlap_cuts(ea, eb):
    """For exactly-collinear segments, each other's endpoints are cut
    points (with the ORIGINAL endpoint coordinates, so both sides
    stitch through bit-identical vertices). -> (cuts_on_a, cuts_on_b)
    as (param, point) lists, or None when not collinear."""
    (a1, a2), (b1, b2) = ea, eb
    d1x, d1y = a2[0] - a1[0], a2[1] - a1[1]
    if (d1x * (b1[1] - a1[1]) - d1y * (b1[0] - a1[0]) != 0.0
            or d1x * (b2[1] - a1[1]) - d1y * (b2[0] - a1[0]) != 0.0):
        return None
    out_a, out_b = [], []
    la = d1x * d1x + d1y * d1y
    d2x, d2y = b2[0] - b1[0], b2[1] - b1[1]
    lb = d2x * d2x + d2y * d2y
    if la == 0.0 or lb == 0.0:
        return out_a, out_b
    for p in (b1, b2):
        t = ((p[0] - a1[0]) * d1x + (p[1] - a1[1]) * d1y) / la
        if 0.0 < t < 1.0:
            out_a.append((t, (float(p[0]), float(p[1]))))
    for p in (a1, a2):
        s = ((p[0] - b1[0]) * d2x + (p[1] - b1[1]) * d2y) / lb
        if 0.0 < s < 1.0:
            out_b.append((s, (float(p[0]), float(p[1]))))
    return out_a, out_b


def _split(edges_a, edges_b):
    """Split both edge lists at shared intersection points (proper
    crossings AND collinear-overlap endpoints).
    -> (pieces_a, pieces_b): each a list of ((x0,y0),(x1,y1))."""
    cuts_a = [[] for _ in edges_a]
    cuts_b = [[] for _ in edges_b]
    for i, ea in enumerate(edges_a):
        for j, eb in enumerate(edges_b):
            hit = _edge_intersections(ea, eb)
            if hit is None:
                col = _collinear_overlap_cuts(ea, eb)
                if col is not None:
                    cuts_a[i].extend(col[0])
                    cuts_b[j].extend(col[1])
                continue
            t, s, p = hit
            if 0.0 < t < 1.0:
                cuts_a[i].append((t, p))
            if 0.0 < s < 1.0:
                cuts_b[j].append((s, p))

    def apply(edges, cuts):
        pieces = []
        for (p0, p1), cs in zip(edges, cuts):
            pts = [(float(p0[0]), float(p0[1]))]
            for _, p in sorted(set(cs)):
                if p != pts[-1]:
                    pts.append(p)
            end = (float(p1[0]), float(p1[1]))
            if end != pts[-1]:
                pts.append(end)
            for k in range(len(pts) - 1):
                pieces.append((pts[k], pts[k + 1]))
        return pieces

    return apply(edges_a, cuts_a), apply(edges_b, cuts_b)


_OUT, _IN, _ON = 0, 1, 2


def _classify(pieces, poly: Polygon, poly_edges) -> np.ndarray:
    """Per-piece class vs `poly`: _ON if the midpoint lies EXACTLY on a
    boundary edge (shared-boundary case), else _IN/_OUT by the even-odd
    midpoint test. Vectorized over (pieces x edges)."""
    if not pieces:
        return np.zeros(0, dtype=np.int8)
    mx = np.array([(p0[0] + p1[0]) / 2.0 for p0, p1 in pieces])
    my = np.array([(p0[1] + p1[1]) / 2.0 for p0, p1 in pieces])
    cls = np.where(geom.points_in_polygon(mx, my, poly), _IN, _OUT
                   ).astype(np.int8)
    if poly_edges:
        e = np.array([(p0[0], p0[1], p1[0], p1[1]) for p0, p1 in poly_edges])
        x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
        cr = ((x2 - x1)[None, :] * (my[:, None] - y1[None, :])
              - (y2 - y1)[None, :] * (mx[:, None] - x1[None, :]))
        within = ((mx[:, None] >= np.minimum(x1, x2)[None, :])
                  & (mx[:, None] <= np.maximum(x1, x2)[None, :])
                  & (my[:, None] >= np.minimum(y1, y2)[None, :])
                  & (my[:, None] <= np.maximum(y1, y2)[None, :]))
        on = ((cr == 0.0) & within).any(axis=1)
        cls[on] = _ON
    return cls


def _partner_dirs(pieces_other):
    """Endpoint-keyed lookup of the other side's piece directions."""
    d = {}
    for p0, p1 in pieces_other:
        d[(p0, p1)] = True
    return d


def _keep_on(piece, partners, same_dir_keeps: bool) -> bool:
    """ON-piece rule: keep by the coincident partner's direction (both
    rings keep interior LEFT, so same direction = interiors on the same
    side). Missing partner (transverse vertex touch) treats ON as IN."""
    p0, p1 = piece
    if (p0, p1) in partners:      # same direction
        return same_dir_keeps
    if (p1, p0) in partners:      # opposite direction
        return not same_dir_keeps
    return same_dir_keeps         # fallback: treat like IN/kept-side


def _stitch(pieces) -> list[np.ndarray]:
    """Walk directed pieces into closed loops (endpoints are bit-exact
    shared floats, so a dict on the coordinate tuple suffices).

    Precision-degeneracy repair: when a walk dead-ends (possible when a
    sliver thinner than double precision flips one midpoint
    classification — e.g. an edge passing through the other polygon's
    vertex within float eps), an unused piece ENDING at the stuck
    point is traversed in reverse. Exact generic inputs never take
    this branch; on eps-degenerate ones it recovers the principal loop
    instead of dropping the whole result."""
    by_start: dict = {}
    by_end: dict = {}
    for k, (p0, p1) in enumerate(pieces):
        by_start.setdefault(p0, []).append(k)
        by_end.setdefault(p1, []).append(k)
    used = [False] * len(pieces)
    loops = []
    for k0 in range(len(pieces)):
        if used[k0]:
            continue
        loop = [pieces[k0][0]]
        cur = k0
        cur_end = pieces[k0][1]
        n_fwd, n_rev = 1, 0
        while True:
            used[cur] = True
            loop.append(cur_end)
            if cur_end == loop[0]:
                break
            nxts = [k for k in by_start.get(cur_end, ()) if not used[k]]
            if nxts:
                cur = nxts[0]
                cur_end = pieces[cur][1]
                n_fwd += 1
                continue
            rev = [k for k in by_end.get(cur_end, ()) if not used[k]]
            if rev:
                cur = rev[0]
                cur_end = pieces[cur][0]  # traverse reversed
                n_rev += 1
                continue
            break  # open chain: drop
        if len(loop) >= 4 and loop[0] == loop[-1]:
            arr = np.array(loop, np.float64)
            if n_rev > n_fwd:
                # the walk entered through the flipped sliver piece and
                # rode the rest of the cycle backwards: restore the
                # majority (native) direction
                arr = arr[::-1].copy()
            if geom.ring_area(arr) != 0.0:
                loops.append(arr)
    return loops


def _assemble(loops: list[np.ndarray]) -> list[Polygon]:
    """CCW loops = shells, CW = holes nested into their smallest
    containing shell."""
    shells = [(abs(geom.ring_area(r)), r) for r in loops
              if geom.ring_area(r) > 0]
    holes = [r for r in loops if geom.ring_area(r) < 0]
    shells.sort(key=lambda t: t[0])
    polys = [[r] for _, r in shells]
    for h in holes:
        # classify by a point on the hole's first boundary edge
        mx = np.array([(h[0, 0] + h[1, 0]) / 2.0])
        my = np.array([(h[0, 1] + h[1, 1]) / 2.0])
        placed = False
        for poly in polys:  # smallest shell first
            if geom.points_in_ring(mx, my, poly[0])[0]:
                poly.append(h)
                placed = True
                break
        if not placed and polys:
            polys[0].append(h)
    return polys


def _overlay(pa: Polygon, pb: Polygon, keep_a_inside: bool,
             keep_b_inside: bool, reverse_b: bool,
             on_same_dir_keeps: bool) -> list[Polygon]:
    A = normalize(pa)
    B = normalize(pb)
    ea, eb = _ring_edges(A), _ring_edges(B)
    pcs_a, pcs_b = _split(ea, eb)
    cls_a = _classify(pcs_a, B, eb)
    cls_b = _classify(pcs_b, A, ea)
    partners = _partner_dirs(pcs_b)
    kept = []
    for p, c in zip(pcs_a, cls_a):
        if c == _ON:
            if _keep_on(p, partners, on_same_dir_keeps):
                kept.append(p)
        elif (c == _IN) == keep_a_inside:
            kept.append(p)
    # B's ON pieces never emit: the coincident A copy already decided
    for p, c in zip(pcs_b, cls_b):
        if c != _ON and (c == _IN) == keep_b_inside:
            kept.append((p[1], p[0]) if reverse_b else p)
    return _assemble(_stitch(kept))


def intersection(pa: Polygon, pb: Polygon) -> list[Polygon]:
    """A n B (multi-part result; [] when disjoint/touching only)."""
    if not geom.bbox_intersects(geom.bbox_of_ring(_close(pa[0])),
                                geom.bbox_of_ring(_close(pb[0]))):
        return []
    return _overlay(pa, pb, True, True, False, on_same_dir_keeps=True)


def union(pa: Polygon, pb: Polygon) -> list[Polygon]:
    return _overlay(pa, pb, False, False, False, on_same_dir_keeps=True)


def difference(pa: Polygon, pb: Polygon) -> list[Polygon]:
    """A - B."""
    if not geom.bbox_intersects(geom.bbox_of_ring(_close(pa[0])),
                                geom.bbox_of_ring(_close(pb[0]))):
        return [normalize(pa)]
    return _overlay(pa, pb, False, True, True, on_same_dir_keeps=False)


def sym_difference(pa: Polygon, pb: Polygon) -> list[Polygon]:
    """(A - B) u (B - A) — matches OGRLayer::SymDifference row
    semantics (ogrlayer.cpp:6340)."""
    return difference(pa, pb) + difference(pb, pa)


def multi_area(polys: list[Polygon]) -> float:
    return float(sum(geom.polygon_area(p) for p in polys))


def union_all(polys: list) -> list:
    """n-way dissolved union: overlapping/adjacent polygons merge into
    single blobs (internal boundaries removed), disjoint ones stay
    separate parts — the aggregate the reference's dissolve / cascaded
    ST_Union performs. Each incoming polygon absorbs every existing
    blob it merges with, iterated to fixpoint (a grown blob may reach
    blobs it previously missed)."""
    blobs: list = []
    for p in polys:
        parts = [normalize(p)]
        remaining = list(blobs)
        changed = True
        while changed:
            changed = False
            still = []
            for b in remaining:
                merged = False
                for i, q in enumerate(parts):
                    if not geom.bbox_intersects(
                            geom.bbox_of_ring(_close(q[0])),
                            geom.bbox_of_ring(_close(b[0]))):
                        continue
                    u = union(q, b)
                    if len(u) == 1:
                        parts[i] = u[0]
                        merged = True
                        changed = True
                        break
                if not merged:
                    still.append(b)
            remaining = still
        blobs = remaining + parts
    return blobs


# ------------------------------------------------------------ predicates

def _boundaries_intersect(pa: Polygon, pb: Polygon) -> bool:
    ea, eb = _ring_edges(normalize(pa)), _ring_edges(normalize(pb))
    for a1, a2 in ea:
        for b1, b2 in eb:
            if geom.segments_intersect(tuple(a1), tuple(a2),
                                       tuple(b1), tuple(b2)):
                return True
    return False


def relate(pa: Polygon, pb: Polygon) -> dict:
    """Areal x areal predicate matrix, derived from the overlay ops so
    all predicates are mutually consistent (DE-9IM names of
    ogr_geometry.h:547-566; Crosses is always False for area/area)."""
    inter = intersection(pa, pb)
    has_interior = multi_area(inter) > 0.0
    a_minus_b = difference(pa, pb) if has_interior else [normalize(pa)]
    b_minus_a = difference(pb, pa) if has_interior else [normalize(pb)]
    a_rem = multi_area(a_minus_b) > 0.0
    b_rem = multi_area(b_minus_a) > 0.0
    boundary = _boundaries_intersect(pa, pb)
    intersects = has_interior or boundary
    within = has_interior and not a_rem
    contains = has_interior and not b_rem
    return {
        "intersects": intersects,
        "disjoint": not intersects,
        "touches": boundary and not has_interior,
        "within": within,
        "contains": contains,
        "equals": within and contains,
        "overlaps": has_interior and a_rem and b_rem,
        "crosses": False,
    }


# ------------------------------------------------------------- makevalid

def make_valid(rings: Polygon) -> list[Polygon]:
    """OGRGeometry::MakeValid (ogr_geometry.h:430) for the classic
    self-intersecting-ring case (bowties): split the ring at its
    self-intersections and re-emit each simple loop as its own
    polygon; already-valid rings come back unchanged."""
    out = []
    shell = _close(rings[0])
    edges = [(shell[i], shell[i + 1]) for i in range(len(shell) - 1)]
    # self-intersection split: reuse _split against itself, skipping
    # adjacent/identical edge pairs
    cuts = [[] for _ in edges]
    for i in range(len(edges)):
        for j in range(i + 2, len(edges)):
            if i == 0 and j == len(edges) - 1:
                continue  # wrap-adjacent
            hit = _edge_intersections(edges[i], edges[j])
            if hit is None:
                continue
            t, s, p = hit
            if 0.0 < t < 1.0:
                cuts[i].append((t, p))
            if 0.0 < s < 1.0:
                cuts[j].append((s, p))
    pieces = []
    for (p0, p1), cs in zip(edges, cuts):
        pts = [(float(p0[0]), float(p0[1]))]
        for _, p in sorted(set(cs)):
            if p != pts[-1]:
                pts.append(p)
        end = (float(p1[0]), float(p1[1]))
        if end != pts[-1]:
            pts.append(end)
        for k in range(len(pts) - 1):
            pieces.append((pts[k], pts[k + 1]))
    loops = _stitch_split_at_vertices(pieces)
    for lp in loops:
        if geom.ring_area(lp) < 0:
            lp = lp[::-1].copy()
        out.append([lp] + [_close(h) for h in rings[1:]]
                   if len(rings) > 1 else [lp])
    return out if out else [normalize(rings)]


def _stitch_split_at_vertices(pieces) -> list[np.ndarray]:
    """Loop walk that CLOSES at repeated vertices (bowtie pinch
    points), emitting minimal simple loops."""
    by_start: dict = {}
    for k, (p0, p1) in enumerate(pieces):
        by_start.setdefault(p0, []).append(k)
    used = [False] * len(pieces)
    loops = []
    for k0 in range(len(pieces)):
        if used[k0]:
            continue
        path = [pieces[k0][0]]
        cur = k0
        while True:
            used[cur] = True
            end = pieces[cur][1]
            if end in path:
                idx = path.index(end)
                loop = path[idx:] + [end]
                if len(loop) >= 4:
                    arr = np.array(loop, np.float64)
                    if geom.ring_area(arr) != 0.0:
                        loops.append(arr)
                path = path[:idx + 1]
                if not path or len(path) == 0:
                    break
                if all(used[k] for k in by_start.get(path[-1], ())):
                    # restart from any unused piece
                    rest = [k for k in range(len(pieces)) if not used[k]]
                    if not rest:
                        break
                    cur = rest[0]
                    path = [pieces[cur][0]]
                    continue
                cur = [k for k in by_start[path[-1]] if not used[k]][0]
                continue
            path.append(end)
            nxts = [k for k in by_start.get(end, ()) if not used[k]]
            if not nxts:
                break
            cur = nxts[0]
    return loops
