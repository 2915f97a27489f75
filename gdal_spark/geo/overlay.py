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

Robustness (r3): every TOPOLOGICAL decision — collinearity, proper
crossing, vertex-on-edge touch, piece-on-boundary classification —
runs through adaptive-precision predicates (geo/robust.py: Shewchuk
float filter + exact rational fallback), so it is exact with respect
to the float inputs. Constructed intersection points round to nearest
double (the GEOS contract); if a sub-eps sliver makes the rounded
points inconsistent, the stitch detects it and the whole pair re-runs
in exact rational arithmetic (_overlay_exact), rounding only the
output vertices. Inputs must be VALID (simple rings) — repair
self-intersections with make_valid first, as with GEOS. The predicate
matrix derives from overlay results, so all eight predicates stay
mutually consistent — including Equals/Touches on exactly shared
boundaries.
"""

from __future__ import annotations

import numpy as np

from . import geom, robust

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


def _proper_crossing_point(ea, eb):
    """Intersection point of two segments KNOWN (by exact orientation
    signs) to cross properly. -> (t, s, point); the one shared point
    both polygons stitch through."""
    (a1, a2), (b1, b2) = ea, eb
    d1x, d1y = a2[0] - a1[0], a2[1] - a1[1]
    d2x, d2y = b2[0] - b1[0], b2[1] - b1[1]
    denom = d1x * d2y - d1y * d2x
    wx, wy = b1[0] - a1[0], b1[1] - a1[1]
    t = (wx * d2y - wy * d2x) / denom
    s = (wx * d1y - wy * d1x) / denom
    p = (float(a1[0] + t * d1x), float(a1[1] + t * d1y))
    return t, s, p


def _collinear_overlap_cuts(ea, eb):
    """For EXACTLY-collinear segments (caller established collinearity
    via exact predicates), each other's endpoints are cut points (with
    the ORIGINAL endpoint coordinates, so both sides stitch through
    bit-identical vertices). -> (cuts_on_a, cuts_on_b)."""
    (a1, a2), (b1, b2) = ea, eb
    d1x, d1y = a2[0] - a1[0], a2[1] - a1[1]
    out_a, out_b = [], []
    la = d1x * d1x + d1y * d1y
    d2x, d2y = b2[0] - b1[0], b2[1] - b1[1]
    lb = d2x * d2x + d2y * d2y
    if la == 0.0 or lb == 0.0:
        return out_a, out_b
    for p in (b1, b2):
        # exact interior test; float t only orders the cuts
        if (robust.on_segment_collinear(p, a1, a2)
                and tuple(map(float, p)) not in
                (tuple(map(float, a1)), tuple(map(float, a2)))):
            t = ((p[0] - a1[0]) * d1x + (p[1] - a1[1]) * d1y) / la
            out_a.append((t, (float(p[0]), float(p[1]))))
    for p in (a1, a2):
        if (robust.on_segment_collinear(p, b1, b2)
                and tuple(map(float, p)) not in
                (tuple(map(float, b1)), tuple(map(float, b2)))):
            s = ((p[0] - b1[0]) * d2x + (p[1] - b1[1]) * d2y) / lb
            out_b.append((s, (float(p[0]), float(p[1]))))
    return out_a, out_b


def _pair_cuts(ea, eb):
    """Exact topological decision for one (edgeA, edgeB) pair, by
    Shewchuk-filtered orientation signs (geo/robust.py):
      - both b-endpoints on line(a)  -> collinear-overlap cuts;
      - strict sign straddles both   -> proper crossing (the one
        constructed — rounded — point, shared by both sides);
      - a single zero orientation    -> transverse vertex-on-edge
        touch: the edge is cut at the OTHER polygon's original vertex
        (exact coordinates), which round 2 misclassified when the
        touch was not float-exact.
    -> (cuts_on_a, cuts_on_b) as (param, point) lists."""
    (a1, a2), (b1, b2) = ea, eb
    if (max(a1[0], a2[0]) < min(b1[0], b2[0])
            or max(b1[0], b2[0]) < min(a1[0], a2[0])
            or max(a1[1], a2[1]) < min(b1[1], b2[1])
            or max(b1[1], b2[1]) < min(a1[1], a2[1])):
        return [], []  # disjoint bboxes: no interaction of any kind
    o_b1 = robust.orient2d(a1[0], a1[1], a2[0], a2[1], b1[0], b1[1])
    o_b2 = robust.orient2d(a1[0], a1[1], a2[0], a2[1], b2[0], b2[1])
    if o_b1 == 0 and o_b2 == 0:
        return _collinear_overlap_cuts(ea, eb)
    o_a1 = robust.orient2d(b1[0], b1[1], b2[0], b2[1], a1[0], a1[1])
    o_a2 = robust.orient2d(b1[0], b1[1], b2[0], b2[1], a2[0], a2[1])
    if o_b1 * o_b2 < 0 and o_a1 * o_a2 < 0:
        t, s, p = _proper_crossing_point(ea, eb)
        cuts_a = [(t, p)] if 0.0 < t < 1.0 else []
        cuts_b = [(s, p)] if 0.0 < s < 1.0 else []
        return cuts_a, cuts_b
    cuts_a, cuts_b = [], []

    def vertex_cut(v, s0, s1, cuts, d2):
        """v lies exactly on line(s0, s1): cut the segment at v when v
        is strictly interior to it."""
        vv = (float(v[0]), float(v[1]))
        e0 = (float(s0[0]), float(s0[1]))
        e1 = (float(s1[0]), float(s1[1]))
        if vv != e0 and vv != e1 and robust.on_segment_collinear(v, s0, s1):
            t = (((v[0] - s0[0]) * (s1[0] - s0[0])
                  + (v[1] - s0[1]) * (s1[1] - s0[1])) / d2)
            cuts.append((t, vv))

    la = (a2[0] - a1[0]) ** 2 + (a2[1] - a1[1]) ** 2
    lb = (b2[0] - b1[0]) ** 2 + (b2[1] - b1[1]) ** 2
    if o_b1 == 0 and la > 0.0:
        vertex_cut(b1, a1, a2, cuts_a, la)
    if o_b2 == 0 and la > 0.0:
        vertex_cut(b2, a1, a2, cuts_a, la)
    if o_a1 == 0 and lb > 0.0:
        vertex_cut(a1, b1, b2, cuts_b, lb)
    if o_a2 == 0 and lb > 0.0:
        vertex_cut(a2, b1, b2, cuts_b, lb)
    return cuts_a, cuts_b


def _split(edges_a, edges_b):
    """Split both edge lists at shared intersection points (proper
    crossings, collinear-overlap endpoints, AND exact vertex-on-edge
    touches). -> (pieces_a, pieces_b): each a list of ((x0,y0),(x1,y1))."""
    cuts_a = [[] for _ in edges_a]
    cuts_b = [[] for _ in edges_b]
    for i, ea in enumerate(edges_a):
        for j, eb in enumerate(edges_b):
            ca, cb = _pair_cuts(ea, eb)
            cuts_a[i].extend(ca)
            cuts_b[j].extend(cb)

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
    """Per-piece class vs `poly`: _ON if the piece is EXACTLY a
    sub-segment of a boundary edge — both endpoints exactly on the
    edge's line (Shewchuk-filtered float screen, rational confirm) and
    inside its bbox — else _IN/_OUT by the even-odd midpoint test.
    Vectorized over (pieces x edges); only near-degenerate candidates
    pay for exact arithmetic."""
    if not pieces:
        return np.zeros(0, dtype=np.int8)
    mx = np.array([(p0[0] + p1[0]) / 2.0 for p0, p1 in pieces])
    my = np.array([(p0[1] + p1[1]) / 2.0 for p0, p1 in pieces])
    cls = np.where(geom.points_in_polygon(mx, my, poly), _IN, _OUT
                   ).astype(np.int8)
    if poly_edges:
        e = np.array([(p0[0], p0[1], p1[0], p1[1]) for p0, p1 in poly_edges])
        x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
        p = np.array([(p0[0], p0[1], p1[0], p1[1]) for p0, p1 in pieces])
        xlo, xhi = np.minimum(x1, x2)[None, :], np.maximum(x1, x2)[None, :]
        ylo, yhi = np.minimum(y1, y2)[None, :], np.maximum(y1, y2)[None, :]

        def near(px, py):
            """(pieces x edges) mask: orient2d(e0, e1, p) COULD be 0 —
            the float det is 0 or below Shewchuk's filter bound — and
            p sits inside the edge's bbox."""
            dl = (x1[None, :] - px[:, None]) * (y2[None, :] - py[:, None])
            dr = (y1[None, :] - py[:, None]) * (x2[None, :] - px[:, None])
            det = dl - dr
            bound = robust._CCW_BOUND * (np.abs(dl) + np.abs(dr))
            inb = ((px[:, None] >= xlo) & (px[:, None] <= xhi)
                   & (py[:, None] >= ylo) & (py[:, None] <= yhi))
            return (np.abs(det) <= bound) & inb

        cand = near(p[:, 0], p[:, 1]) & near(p[:, 2], p[:, 3])
        for i, j in zip(*np.nonzero(cand)):
            if (robust.orient2d(x1[j], y1[j], x2[j], y2[j],
                                p[i, 0], p[i, 1]) == 0
                    and robust.orient2d(x1[j], y1[j], x2[j], y2[j],
                                        p[i, 2], p[i, 3]) == 0):
                cls[i] = _ON
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


def _stitch(pieces) -> tuple[list[np.ndarray], bool]:
    """Walk directed pieces into closed loops (endpoints are bit-exact
    shared floats, so a dict on the coordinate tuple suffices).
    -> (loops, clean). clean=False signals PRECISION TROUBLE: a walk
    dead-ended (repaired by reverse traversal) or an open chain was
    dropped — possible only when a sliver thinner than double precision
    flipped one midpoint classification (constructed intersection
    points round to doubles). The caller then re-runs the whole pair
    in exact rational arithmetic (_overlay_exact); generic inputs never
    take that path."""
    by_start: dict = {}
    by_end: dict = {}
    for k, (p0, p1) in enumerate(pieces):
        by_start.setdefault(p0, []).append(k)
        by_end.setdefault(p1, []).append(k)
    used = [False] * len(pieces)
    loops = []
    clean = True
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
                clean = False
                continue
            clean = False
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
    return loops, clean


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


def _overlay_exact(pa: Polygon, pb: Polygon, keep_a_inside: bool,
                   keep_b_inside: bool, reverse_b: bool,
                   on_same_dir_keeps: bool) -> list[Polygon]:
    """The same split/classify/stitch pipeline in EXACT rational
    arithmetic (every IEEE double is an exact rational; constructed
    intersection points stay rational), rounding only the OUTPUT
    vertices to doubles. Taken only when the float path signals
    precision trouble — the adaptive-precision discipline of
    geo/robust.py applied to whole constructions."""
    from fractions import Fraction as Fr

    def rings_fr(poly):
        out = []
        for r in normalize(poly):
            out.append([(Fr(float(x)), Fr(float(y))) for x, y in r])
        return out

    A, B = rings_fr(pa), rings_fr(pb)

    def edges_of(poly):
        return [(ring[i], ring[i + 1])
                for ring in poly for i in range(len(ring) - 1)]

    ea, eb = edges_of(A), edges_of(B)
    cuts_a = [[] for _ in ea]
    cuts_b = [[] for _ in eb]
    for i, (a1, a2) in enumerate(ea):
        d1x, d1y = a2[0] - a1[0], a2[1] - a1[1]
        la = d1x * d1x + d1y * d1y
        for j, (b1, b2) in enumerate(eb):
            d2x, d2y = b2[0] - b1[0], b2[1] - b1[1]
            denom = d1x * d2y - d1y * d2x
            if denom == 0:
                if (d1x * (b1[1] - a1[1]) - d1y * (b1[0] - a1[0])) != 0:
                    continue  # parallel, not collinear
                lb = d2x * d2x + d2y * d2y
                if la == 0 or lb == 0:
                    continue
                for p in (b1, b2):
                    t = ((p[0] - a1[0]) * d1x + (p[1] - a1[1]) * d1y) / la
                    if 0 < t < 1:
                        cuts_a[i].append((t, p))
                for p in (a1, a2):
                    s = ((p[0] - b1[0]) * d2x + (p[1] - b1[1]) * d2y) / lb
                    if 0 < s < 1:
                        cuts_b[j].append((s, p))
                continue
            wx, wy = b1[0] - a1[0], b1[1] - a1[1]
            t = (wx * d2y - wy * d2x) / denom
            s = (wx * d1y - wy * d1x) / denom
            if 0 <= t <= 1 and 0 <= s <= 1:
                p = (a1[0] + t * d1x, a1[1] + t * d1y)  # exact rational
                if 0 < t < 1:
                    cuts_a[i].append((t, p))
                if 0 < s < 1:
                    cuts_b[j].append((s, p))

    def apply(edges, cuts):
        pieces = []
        for (p0, p1), cs in zip(edges, cuts):
            pts = [p0]
            for _, p in sorted(set(cs)):
                if p != pts[-1]:
                    pts.append(p)
            if p1 != pts[-1]:
                pts.append(p1)
            pieces.extend((pts[k], pts[k + 1]) for k in range(len(pts) - 1))
        return pieces

    pcs_a, pcs_b = apply(ea, cuts_a), apply(eb, cuts_b)

    def classify(pieces, edges_other):
        cls = []
        for p0, p1 in pieces:
            mx, my = (p0[0] + p1[0]) / 2, (p0[1] + p1[1]) / 2
            on = False
            for q0, q1 in edges_other:
                cr = ((q1[0] - q0[0]) * (my - q0[1])
                      - (q1[1] - q0[1]) * (mx - q0[0]))
                if (cr == 0
                        and min(q0[0], q1[0]) <= mx <= max(q0[0], q1[0])
                        and min(q0[1], q1[1]) <= my <= max(q0[1], q1[1])):
                    on = True
                    break
            if on:
                cls.append(_ON)
                continue
            inside = False  # exact even-odd ray cast, +x direction
            for q0, q1 in edges_other:
                if (q0[1] > my) == (q1[1] > my):
                    continue
                xint = q0[0] + (my - q0[1]) * (q1[0] - q0[0]) / (q1[1] - q0[1])
                if xint > mx:
                    inside = not inside
            cls.append(_IN if inside else _OUT)
        return cls

    cls_a = classify(pcs_a, eb)
    cls_b = classify(pcs_b, ea)
    partners = {(p0, p1): True for p0, p1 in pcs_b}
    kept = []
    for p, c in zip(pcs_a, cls_a):
        if c == _ON:
            if _keep_on(p, partners, on_same_dir_keeps):
                kept.append(p)
        elif (c == _IN) == keep_a_inside:
            kept.append(p)
    for p, c in zip(pcs_b, cls_b):
        if c != _ON and (c == _IN) == keep_b_inside:
            kept.append((p[1], p[0]) if reverse_b else p)

    # stitch on exact tuples: topology is exact, no repair needed
    by_start: dict = {}
    for k, (p0, p1) in enumerate(kept):
        by_start.setdefault(p0, []).append(k)
    used = [False] * len(kept)
    loops = []
    for k0 in range(len(kept)):
        if used[k0]:
            continue
        loop = [kept[k0][0]]
        cur = k0
        while True:
            used[cur] = True
            nxt = kept[cur][1]
            loop.append(nxt)
            if nxt == loop[0]:
                break
            cand = [k for k in by_start.get(nxt, ()) if not used[k]]
            if not cand:
                break
            cur = cand[0]
        if len(loop) >= 4 and loop[0] == loop[-1]:
            area2 = sum(loop[k][0] * loop[k + 1][1]
                        - loop[k + 1][0] * loop[k][1]
                        for k in range(len(loop) - 1))
            if area2 != 0:
                loops.append((area2, loop))

    # assemble with exact shell/hole signs, round vertices at the end
    shells = sorted(((abs(a2), lp) for a2, lp in loops if a2 > 0),
                    key=lambda t: t[0])
    holes = [lp for a2, lp in loops if a2 < 0]

    def inside_exact(mx, my, ring):
        inside = False
        for k in range(len(ring) - 1):
            q0, q1 = ring[k], ring[k + 1]
            if (q0[1] > my) == (q1[1] > my):
                continue
            xint = q0[0] + (my - q0[1]) * (q1[0] - q0[0]) / (q1[1] - q0[1])
            if xint > mx:
                inside = not inside
        return inside

    polys = [[lp] for _a, lp in shells]
    for h in holes:
        mx, my = (h[0][0] + h[1][0]) / 2, (h[0][1] + h[1][1]) / 2
        for poly in polys:
            if inside_exact(mx, my, poly[0]):
                poly.append(h)
                break
        else:
            if polys:
                polys[0].append(h)
    out = []
    for poly in polys:
        rings = [np.array([(float(x), float(y)) for x, y in lp], np.float64)
                 for lp in poly]
        # float rounding can collapse a sub-eps loop to zero area
        if geom.ring_area(rings[0]) != 0.0:
            out.append(rings)
    return out


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
    loops, clean = _stitch(kept)
    if not clean:
        # precision trouble (sub-eps sliver flipped a classification):
        # redo the whole pair exactly
        return _overlay_exact(pa, pb, keep_a_inside, keep_b_inside,
                              reverse_b, on_same_dir_keeps)
    return _assemble(loops)


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
            ca, cb = _pair_cuts(edges[i], edges[j])
            cuts[i].extend(ca)
            cuts[j].extend(cb)
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
