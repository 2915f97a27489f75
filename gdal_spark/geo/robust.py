"""Adaptive-precision geometric predicates.

Shewchuk's scheme ("Adaptive Precision Floating-Point Arithmetic and
Fast Robust Geometric Predicates", Discrete & Computational Geometry
18, 1997 — the same algorithm GEOS/Triangle use, which is what the
reference's geometry engine relies on): evaluate the determinant in
plain floating point, accept its sign when the magnitude clears a
forward-error bound, and fall back to EXACT arithmetic otherwise. Our
exact stage uses Python rationals (every IEEE double is an exact
rational), which is simpler than Shewchuk's expansion arithmetic and
exactly as precise; only the (measure-zero) near-degenerate cases pay
for it.

These predicates make every TOPOLOGICAL decision in geo/overlay.py
exact with respect to the float input coordinates. Constructed
intersection points still round to nearest double — the same contract
as GEOS.
"""

from __future__ import annotations

import math
from fractions import Fraction

_EPS = math.ldexp(1.0, -53)           # 2^-53, Shewchuk's epsilon
_CCW_BOUND = (3.0 + 16.0 * _EPS) * _EPS   # ccwerrboundA


def _sign(x: float) -> int:
    return int(x > 0.0) - int(x < 0.0)


def orient2d(ax: float, ay: float, bx: float, by: float,
             cx: float, cy: float) -> int:
    """Exact sign of det[[ax-cx, ay-cy], [bx-cx, by-cy]]:
    +1 if (a, b, c) wind counter-clockwise, -1 clockwise, 0 collinear."""
    detleft = (ax - cx) * (by - cy)
    detright = (ay - cy) * (bx - cx)
    det = detleft - detright
    if detleft > 0.0:
        if detright <= 0.0:
            return _sign(det)
        detsum = detleft + detright
    elif detleft < 0.0:
        if detright >= 0.0:
            return _sign(det)
        detsum = -detleft - detright
    else:
        return _sign(det)
    if det >= _CCW_BOUND * detsum or -det >= _CCW_BOUND * detsum:
        return _sign(det)
    d = ((Fraction(ax) - Fraction(cx)) * (Fraction(by) - Fraction(cy))
         - (Fraction(ay) - Fraction(cy)) * (Fraction(bx) - Fraction(cx)))
    return (d > 0) - (d < 0)


def cross_sign(a1, a2, b1, b2) -> int:
    """Exact sign of cross(a2 - a1, b2 - b1) — the segment-direction
    parallelism test. Float filter (subtractions are exactly rounded,
    so four multiplicative (1+eps) factors bound the product error)
    with a rational fallback."""
    d1x = a2[0] - a1[0]
    d1y = a2[1] - a1[1]
    d2x = b2[0] - b1[0]
    d2y = b2[1] - b1[1]
    p1 = d1x * d2y
    p2 = d1y * d2x
    det = p1 - p2
    bound = 8.0 * _EPS * (abs(p1) + abs(p2))
    if det > bound or -det > bound:
        return _sign(det)
    d = ((Fraction(a2[0]) - Fraction(a1[0]))
         * (Fraction(b2[1]) - Fraction(b1[1]))
         - (Fraction(a2[1]) - Fraction(a1[1]))
         * (Fraction(b2[0]) - Fraction(b1[0])))
    return (d > 0) - (d < 0)


def on_segment_collinear(p, s0, s1) -> bool:
    """Given p EXACTLY collinear with segment (s0, s1): is p within the
    segment (inclusive)? Pure coordinate comparisons — exact."""
    return (min(s0[0], s1[0]) <= p[0] <= max(s0[0], s1[0])
            and min(s0[1], s1[1]) <= p[1] <= max(s0[1], s1[1]))


def segments_intersect(a1, a2, b1, b2) -> bool:
    """EXACT: do closed segments (a1,a2) and (b1,b2) share any point?
    Proper crossings, endpoint touches, and collinear overlaps all
    count (the self-intersection test of a validity check)."""
    o1 = orient2d(a1[0], a1[1], a2[0], a2[1], b1[0], b1[1])
    o2 = orient2d(a1[0], a1[1], a2[0], a2[1], b2[0], b2[1])
    o3 = orient2d(b1[0], b1[1], b2[0], b2[1], a1[0], a1[1])
    o4 = orient2d(b1[0], b1[1], b2[0], b2[1], a2[0], a2[1])
    if o1 * o2 < 0 and o3 * o4 < 0:
        return True
    if o1 == 0 and on_segment_collinear(b1, a1, a2):
        return True
    if o2 == 0 and on_segment_collinear(b2, a1, a2):
        return True
    if o3 == 0 and on_segment_collinear(a1, b1, b2):
        return True
    if o4 == 0 and on_segment_collinear(a2, b1, b2):
        return True
    return False
