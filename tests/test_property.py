"""Hypothesis property tests over the foundational pure-numpy kernels
(no Spark session — these run per-example)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.geo import geom, overlay
from gdal_spark.raster import checksum as CK
from gdal_spark.raster import png as PNG


@settings(max_examples=25, deadline=None, derandomize=True)
@given(st.integers(1, 40), st.integers(1, 40),
       st.sampled_from(["u8", "u16", "rgb", "rgba"]),
       st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(h, w, mode, seed):
    rng = np.random.default_rng(seed)
    if mode == "u8":
        a = rng.integers(0, 256, (h, w)).astype(np.uint8)
    elif mode == "u16":
        a = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    elif mode == "rgb":
        a = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    else:
        a = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    back = PNG.decode(PNG.encode(a))
    assert back.dtype == a.dtype and back.shape == a.shape
    assert (back == a).all()


def _star(rng, cx, cy, r, n):
    """Random SIMPLE star polygon: jittered evenly-spaced angles keep
    every angular gap < 180 degrees, so no chord can pass on the far
    side of the center and cross another edge (purely-sorted random
    angles could leave a >180-degree gap whose closing chord makes the
    ring SELF-INTERSECT — seed 4021146419's r2 'eps-sliver' was really
    that invalid input)."""
    base = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    th = base + rng.uniform(0.05, 0.95, n) * (2.0 * np.pi / n)
    rr = rng.uniform(0.35, 1.0, n) * r
    ring = np.column_stack([cx + rr * np.cos(th), cy + rr * np.sin(th)])
    return [np.vstack([ring, ring[:1]])]


@settings(max_examples=20, deadline=None, derandomize=True)
@given(st.integers(0, 2**32 - 1))
def test_overlay_inclusion_exclusion_property(seed):
    """area(AuB) + area(AnB) == area(A) + area(B) and the difference
    identities, for random star polygons."""
    rng = np.random.default_rng(seed)
    A = _star(rng, rng.uniform(-1, 1), rng.uniform(-1, 1),
              rng.uniform(1, 3), rng.integers(5, 12))
    B = _star(rng, rng.uniform(-1, 1), rng.uniform(-1, 1),
              rng.uniform(1, 3), rng.integers(5, 12))
    aa, ab = geom.polygon_area(A), geom.polygon_area(B)
    ai = overlay.multi_area(overlay.intersection(A, B))
    au = overlay.multi_area(overlay.union(A, B))
    ad = overlay.multi_area(overlay.difference(A, B))
    scale = max(aa, ab, 1e-9)
    assert abs((au + ai) - (aa + ab)) < 1e-9 * scale
    assert abs(ad - (aa - ai)) < 1e-9 * scale
    # predicates stay consistent with the measured areas
    rel = overlay.relate(A, B)
    assert rel["intersects"] == (ai > 0 or rel["touches"])
    if ai > 0 and ad > 1e-12 and (ab - ai) > 1e-12:
        assert rel["overlaps"]


@settings(max_examples=25, deadline=None, derandomize=True)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1),
       st.booleans())
def test_checksum_distributive_property(th, tw, seed, is_float):
    """Splitting a band into arbitrary tiles and summing the partial
    checksums must equal the whole-band checksum (the reformulation
    the distributed engine rests on)."""
    rng = np.random.default_rng(seed)
    h, w = th * 3, tw * 4
    if is_float:
        band = rng.uniform(-50, 50, (h, w))
    else:
        band = rng.integers(-1000, 1000, (h, w)).astype(np.int64)
    whole = CK.checksum_np(band, 0, 0, w)
    parts = []
    for y0 in range(0, h, th):
        for x0 in range(0, w, tw):
            parts.append(CK.checksum_np(band[y0:y0 + th, x0:x0 + tw],
                                        x0, y0, w))
    assert CK.checksum_combine(parts) == whole


@settings(max_examples=30, deadline=None, derandomize=True)
@given(st.integers(3, 20), st.integers(0, 2**32 - 1))
def test_convex_hull_contains_points_property(n, seed):
    rng = np.random.default_rng(seed)
    px = rng.uniform(-10, 10, n)
    py = rng.uniform(-10, 10, n)
    hull = geom.convex_hull(px, py)
    if len(hull) < 4:
        return  # degenerate (collinear) inputs
    inside = geom.points_in_convex(px, py, hull)
    # hull vertices themselves sit on the boundary (>= passes)
    assert inside.all()


def test_overlay_seed_4021146419_exact():
    """Regression for the r2 'eps-degenerate sliver' seed. Root cause
    (diagnosed in r3): the old sorted-random-angle star generator
    produced a SELF-INTERSECTING ring for this seed, so overlay on the
    raw input was garbage-in. With the ring repaired via make_valid
    (the documented contract for invalid inputs — GEOS requires valid
    geometry too), every boolean identity holds to float tolerance."""
    rng = np.random.default_rng(4021146419)
    def star(cx, cy, r, n):
        th = np.sort(rng.uniform(0, 2 * np.pi, n))
        rr = rng.uniform(0.35, 1.0, n) * r
        ring = np.column_stack([cx + rr * np.cos(th), cy + rr * np.sin(th)])
        return [np.vstack([ring, ring[:1]])]
    A = star(rng.uniform(-1, 1), rng.uniform(-1, 1),
             rng.uniform(1, 3), rng.integers(5, 12))
    B = star(rng.uniform(-1, 1), rng.uniform(-1, 1),
             rng.uniform(1, 3), rng.integers(5, 12))
    # the self-intersecting B splits into its simple loops; overlay the
    # LARGEST loop (make_valid's principal component) against A
    B_valid = max(overlay.make_valid(B), key=geom.polygon_area)
    aa, ab = geom.polygon_area(A), geom.polygon_area(B_valid)
    ai = overlay.multi_area(overlay.intersection(A, B_valid))
    au = overlay.multi_area(overlay.union(A, B_valid))
    ad = overlay.multi_area(overlay.difference(A, B_valid))
    scale = max(aa, ab)
    assert ai > 0 and au > max(aa, ab)
    assert abs((au + ai) - (aa + ab)) < 1e-9 * scale
    assert abs(ad - (aa - ai)) < 1e-9 * scale


def test_overlay_sub_eps_sliver_exact_fallback():
    """A TRUE precision degeneracy: B's apex pokes 1e-16 above A's
    bottom edge, so the two constructed crossing points collapse to
    (nearly) one double. The float path signals stitch trouble and the
    exact rational rerun (_overlay_exact) must keep every identity at
    float tolerance instead of collapsing or crashing."""
    A = [np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
                   (0.0, 0.0)])]
    for bump in (1e-16, 1e-13, 1e-9):
        B = [np.array([(0.3, -0.5), (0.7, -0.5), (0.5, bump),
                       (0.3, -0.5)])]
        aa, ab = geom.polygon_area(A), geom.polygon_area(B)
        ai = overlay.multi_area(overlay.intersection(A, B))
        au = overlay.multi_area(overlay.union(A, B))
        ad = overlay.multi_area(overlay.difference(A, B))
        assert 0.0 <= ai < 1e-8                      # the sliver only
        assert abs((au + ai) - (aa + ab)) < 1e-9
        assert abs(ad - (aa - ai)) < 1e-9


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.integers(0, 2**32 - 1))
def test_viewshed_wall_monotonicity_property(seed):
    """Raising terrain anywhere can only HIDE pixels, never reveal
    them (LOS monotonicity) — a structural property of the kernel."""
    from gdal_spark.raster import viewshed as V

    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 3, size=(24, 24))
    ox, oy = int(rng.integers(0, 24)), int(rng.integers(0, 24))
    v0 = V.viewshed_np(base, ox, oy, obs_height=2.0)
    taller = base.copy()
    y, x = int(rng.integers(0, 24)), int(rng.integers(0, 24))
    if (y, x) == (oy, ox):
        return
    taller[y, x] += rng.uniform(5, 40)
    v1 = V.viewshed_np(taller, ox, oy, obs_height=2.0)
    # pixels visible after raising must have been visible before,
    # except the raised pixel itself (its own target height changed)
    mask = np.ones_like(v0, dtype=bool)
    mask[y, x] = False
    assert not ((v1 == 1.0) & (v0 == 0.0) & mask).any()


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.integers(0, 2**32 - 1))
def test_cubic_weights_partition_of_unity_property(seed):
    from gdal_spark.raster import warp as W

    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 1, 100)
    w0, w1, w2, w3 = W._cubic_weights(t)
    np.testing.assert_allclose(w0 + w1 + w2 + w3, 1.0, atol=1e-12)
    # linear precision: sum of w_i * x_i == x for offsets -1,0,1,2 at t
    x = -1 * w0 + 0 * w1 + 1 * w2 + 2 * w3
    np.testing.assert_allclose(x, t, atol=1e-12)
