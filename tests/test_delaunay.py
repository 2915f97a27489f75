"""Delaunay TIN + GDALGridLinear analog (geo/delaunay.py,
gridding.grid_linear) vs alg/gdalgrid.cpp:2565 semantics."""

import numpy as np
import pytest

from gdal_spark.geo import delaunay as DL
from gdal_spark.raster import grid as G
from gdal_spark.raster import gridding as GR
from tests.test_raster_spark import tiles_to_canvas


def test_delaunay_empty_circumcircle_property():
    rng = np.random.default_rng(3)
    px = rng.uniform(0, 50, 400)
    py = rng.uniform(0, 50, 400)
    tris = DL.delaunay_np(px, py)
    # Euler bound for a triangulation of the convex hull
    assert len(tris) >= 2 * 400 - 2 - 400
    for (i, j, k) in tris:
        ux, uy, r2 = DL._circumcircle(px[i], py[i], px[j], py[j],
                                      px[k], py[k])
        d2 = (px - ux) ** 2 + (py - uy) ** 2
        inside = d2 < r2 * (1.0 - 1e-9)
        inside[[i, j, k]] = False
        assert not inside.any()


def test_delaunay_duplicates_and_degenerate():
    px = np.array([0.0, 1.0, 0.0, 1.0, 0.0])
    py = np.array([0.0, 0.0, 1.0, 0.0, 0.0])  # two duplicates
    tris = DL.delaunay_np(px, py)
    assert len(tris) == 1 and set(map(int, tris[0])) == {0, 1, 2}
    assert len(DL.delaunay_np(px[:2], py[:2])) == 0


def test_linear_np_affine_reproduction_and_fallback():
    rng = np.random.default_rng(9)
    px = rng.uniform(10, 20, 60)
    py = rng.uniform(10, 20, 60)
    pv = 2.0 + 0.5 * px - 0.25 * py
    tris = DL.delaunay_np(px, py)
    nx = rng.uniform(11, 19, 200)
    ny = rng.uniform(11, 19, 200)
    got = DL.linear_np(nx, ny, px, py, pv, tris, radius=0.0, nodata=-1.0)
    inside = got != -1.0
    assert inside.sum() > 150
    np.testing.assert_allclose(got[inside],
                               (2.0 + 0.5 * nx - 0.25 * ny)[inside],
                               rtol=1e-12)
    # far outside the hull: radius=0 -> nodata; radius<0 -> unbounded
    # nearest (gdalgrid.cpp:2641-2663); finite radius bounds it
    far_x, far_y = np.array([100.0]), np.array([100.0])
    assert DL.linear_np(far_x, far_y, px, py, pv, tris, 0.0, -1.0)[0] == -1.0
    nn = DL.linear_np(far_x, far_y, px, py, pv, tris, -1.0, -1.0)[0]
    d2 = (px - 100.0) ** 2 + (py - 100.0) ** 2
    assert nn == pv[np.argmin(d2)]
    assert DL.linear_np(far_x, far_y, px, py, pv, tris, 5.0, -1.0)[0] == -1.0


def test_grid_linear_distributed_matches_single_node(spark):
    rng = np.random.default_rng(17)
    spec = G.GridSpec(32, 16, (0.0, 1.0, 0.0, 16.0, 0.0, -1.0), tile=8)
    n = 150
    px = rng.uniform(-2, 34, n)
    py = rng.uniform(-2, 18, n)
    pv = rng.uniform(0, 100, n).round(2)
    pdf = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(px, py, pv)],
        "x double, y double, v double")
    got = tiles_to_canvas(GR.grid_linear(pdf, spec, radius=-1.0,
                                         nodata=-1.0), spec)
    sx, sy, sv = GR.sort_points(px.copy(), py.copy(), pv.copy())
    tris = DL.delaunay_np(sx, sy)
    gx, gy = np.meshgrid(np.arange(spec.width, dtype=float),
                         np.arange(spec.height, dtype=float))
    wx, wy = spec.pixel_center_world(gx.ravel(), gy.ravel())
    want = DL.linear_np(wx, wy, sx, sy, sv, tris, -1.0, -1.0) \
        .reshape(spec.height, spec.width)
    np.testing.assert_array_equal(got, want)
    assert (got != -1.0).all()  # unbounded nearest fills the outside


def test_grid_linear_budget_guard(spark, monkeypatch):
    monkeypatch.setattr(GR, "MAX_TRIANGULATION_POINTS", 3)
    spec = G.GridSpec(8, 8, (0.0, 1.0, 0.0, 8.0, 0.0, -1.0), tile=8)
    pdf = spark.createDataFrame(
        [(float(i), float(i % 3), 1.0) for i in range(10)],
        "x double, y double, v double")
    with pytest.raises(ValueError, match="triangulation budget"):
        GR.grid_linear(pdf, spec).count()
