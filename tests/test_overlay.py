"""Polygon boolean overlay + predicate matrix.

Primary oracle: RASTERIZE ROUNDTRIP — burn A, B, and the constructed
op(A, B) onto a fine pixel grid (pixel-center even-odd rule,
independent code path: raster/rasterize.py); the burned masks must
satisfy the set identity pixel-for-pixel. Plus exact area identities
(inclusion-exclusion) and union-find-free invariants.
"""

import numpy as np
import pytest

from gdal_spark.geo import geom, overlay
from gdal_spark.raster import grid as G
from gdal_spark.raster import rasterize as R

SPEC = G.GridSpec(200, 200, (0.0, 0.05, 0.0, 10.0, 0.0, -0.05), tile=200)


def _burn(polys):
    """polys: list of Polygon (list of rings) -> bool mask."""
    canvas = np.zeros((200, 200), dtype=bool)
    for rings in polys:
        for i, ring in enumerate(rings):
            m = R.rasterize_np(SPEC, [(1.0, [ring])]) > 0
            if i == 0:
                cur = m
            else:
                cur &= ~m
        canvas |= cur
    return canvas


def _rand_poly(rng, cx, cy, r_base, n=9):
    """Random star-shaped (possibly concave) simple polygon."""
    th = np.sort(rng.uniform(0, 2 * np.pi, n))
    rr = rng.uniform(0.4, 1.0, n) * r_base
    ring = np.column_stack([cx + rr * np.cos(th), cy + rr * np.sin(th)])
    return [np.vstack([ring, ring[:1]])]


OPS = [("intersection", lambda a, b: a & b),
       ("union", lambda a, b: a | b),
       ("difference", lambda a, b: a & ~b),
       ("sym_difference", lambda a, b: a ^ b)]


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_overlay_rasterize_roundtrip(seed):
    rng = np.random.default_rng(seed)
    A = _rand_poly(rng, rng.uniform(3.5, 6.5), rng.uniform(3.5, 6.5), 3.0)
    B = _rand_poly(rng, rng.uniform(3.5, 6.5), rng.uniform(3.5, 6.5), 3.0)
    ma, mb = _burn([A]), _burn([B])
    for name, setop in OPS:
        got = _burn(getattr(overlay, name)(A, B))
        want = setop(ma, mb)
        # pixel-center sampling: tolerate nothing — generic-position
        # random polygons don't put pixel centers on result boundaries
        assert (got == want).all(), f"{name} mask mismatch (seed={seed})"


def test_overlay_area_identities():
    rng = np.random.default_rng(7)
    A = _rand_poly(rng, 4.5, 5.0, 3.0)
    B = _rand_poly(rng, 5.5, 5.0, 3.0)
    ai = overlay.multi_area(overlay.intersection(A, B))
    au = overlay.multi_area(overlay.union(A, B))
    ad = overlay.multi_area(overlay.difference(A, B))
    aa, ab = geom.polygon_area(A), geom.polygon_area(B)
    assert ai > 0
    np.testing.assert_allclose(au, aa + ab - ai, rtol=1e-9)
    np.testing.assert_allclose(ad, aa - ai, rtol=1e-9)
    sd = overlay.multi_area(overlay.sym_difference(A, B))
    np.testing.assert_allclose(sd, aa + ab - 2 * ai, rtol=1e-9)


def test_overlay_disjoint_and_containment():
    sq = lambda x0, y0, s: [np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]])]
    big = sq(1, 1, 8)
    small = sq(3, 3, 2)
    far = sq(100, 100, 1)
    # disjoint
    assert overlay.intersection(big, far) == []
    assert len(overlay.union(big, far)) == 2
    # containment: A n B = B ; A - B has a hole
    inter = overlay.intersection(big, small)
    np.testing.assert_allclose(overlay.multi_area(inter), 4.0)
    diff = overlay.difference(big, small)
    assert len(diff) == 1 and len(diff[0]) == 2  # shell + hole
    np.testing.assert_allclose(overlay.multi_area(diff), 64.0 - 4.0)
    # union with contained: just A
    uni = overlay.union(big, small)
    np.testing.assert_allclose(overlay.multi_area(uni), 64.0)


def test_overlay_multipiece_result():
    # U-shape n bar -> two separate pieces
    u = [np.array([[0, 0], [10, 0], [10, 10], [7, 10], [7, 3],
                   [3, 3], [3, 10], [0, 10], [0, 0]], float)]
    bar = [np.array([[-1, 8], [11, 8], [11, 9.5], [-1, 9.5], [-1, 8]], float)]
    inter = overlay.intersection(u, bar)
    assert len(inter) == 2
    np.testing.assert_allclose(overlay.multi_area(inter), 2 * (3 * 1.5),
                               rtol=1e-12)


def test_overlay_hole_interaction():
    outer = [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float),
             np.array([[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]], float)]
    probe = [np.array([[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]], float)]
    inter = overlay.intersection(outer, probe)
    # 4x4 probe minus the 2x2 hole
    np.testing.assert_allclose(overlay.multi_area(inter), 16.0 - 4.0)
    m = _burn(inter)
    want = _burn([outer]) & _burn([probe])
    assert (m == want).all()


def test_union_all_dissolve():
    sq = lambda x0, y0, s: [np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
        float)]
    # a 2x2 block of overlapping squares + one far island
    polys = [sq(0, 0, 3), sq(2, 0, 3), sq(0, 2, 3), sq(2, 2, 3),
             sq(100, 100, 2)]
    blobs = overlay.union_all(polys)
    assert len(blobs) == 2
    areas = sorted(overlay.multi_area([b]) for b in blobs)
    np.testing.assert_allclose(areas, [4.0, 25.0])
    # adjacent (touching, not overlapping) squares dissolve too
    chain = [sq(0, 0, 2), sq(2, 0, 2), sq(4, 0, 2)]
    merged = overlay.union_all(chain)
    assert len(merged) == 1
    np.testing.assert_allclose(overlay.multi_area(merged), 12.0)
    # rasterize roundtrip on random stars: the dissolved blobs cover
    # exactly the union of the inputs
    rng = np.random.default_rng(31)
    stars = [_rand_poly(rng, rng.uniform(3, 7), rng.uniform(3, 7), 2.0)
             for _ in range(4)]
    got = _burn(overlay.union_all(stars))
    want = _burn(stars)
    assert (got == want).all()


def test_relate_matrix():
    sq = lambda x0, y0, s: [np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]])]
    a, b = sq(0, 0, 4), sq(2, 2, 4)
    r = overlay.relate(a, b)
    assert r["intersects"] and r["overlaps"]
    assert not (r["within"] or r["contains"] or r["equals"]
                or r["disjoint"] or r["touches"])
    r2 = overlay.relate(sq(0, 0, 8), sq(2, 2, 2))
    assert r2["contains"] and not r2["within"] and not r2["overlaps"]
    r3 = overlay.relate(sq(2, 2, 2), sq(0, 0, 8))
    assert r3["within"] and not r3["contains"]
    r4 = overlay.relate(sq(0, 0, 2), sq(10, 10, 2))
    assert r4["disjoint"] and not r4["intersects"]
    r5 = overlay.relate(sq(0, 0, 2), sq(0, 0, 2))
    assert r5["equals"] and r5["within"] and r5["contains"]
    # shared-edge touch
    r6 = overlay.relate(sq(0, 0, 2), sq(2, 0, 2))
    assert r6["touches"] and r6["intersects"] and not r6["overlaps"]


def test_make_valid_bowtie():
    bow = [np.array([[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], float)]
    fixed = overlay.make_valid(bow)
    assert len(fixed) == 2
    areas = sorted(overlay.multi_area([p]) for p in fixed)
    np.testing.assert_allclose(areas, [4.0, 4.0])
    # a valid ring passes through unchanged
    sq = [np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)]
    same = overlay.make_valid(sq)
    assert len(same) == 1
    np.testing.assert_allclose(overlay.multi_area(same), 4.0)
