"""Buffer (dilate/erode) — closed-form area oracles + style surface.

Reference: OGRGeometry::Buffer (ogr/ogr_geometry.h:573) and
`gdal vector buffer` (apps/gdalalg_vector_buffer.cpp:28-56). The
quadrant-mirrored disc makes axis points float-exact, so quarter-discs
at square corners tile to exactly one k-gon and the oracles below are
equalities, not tolerances.
"""

import numpy as np
import pytest

from gdal_spark.geo import buffer, geom, overlay, wkb

K = 32  # 4 * quad_segs(8)
KGON = 0.5 * K * np.sin(2 * np.pi / K)  # inscribed k-gon area, r=1
SQ = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)]


def test_disc_axis_points_exact():
    d = buffer.disc_ring(0.0, 0.0, 2.0, 8)
    assert len(d) == K + 1
    assert (d[0] == [2, 0]).all() and (d[8] == [0, 2]).all()
    assert (d[16] == [-2, 0]).all() and (d[24] == [0, -2]).all()
    assert geom.ring_area(d) == pytest.approx(KGON * 4.0, rel=1e-12)


def test_square_dilate_round_exact_area():
    out = buffer.buffer_polygon(SQ, 1.0)
    assert len(out) == 1  # one blob
    # s^2 + P*r + one full k-gon disc (four exact quarter discs)
    assert overlay.multi_area(out) == pytest.approx(16 + 16 + KGON, rel=1e-12)


def test_square_dilate_mitre_is_bigger_square():
    out = buffer.buffer_polygon(SQ, 1.0, join="mitre")
    assert overlay.multi_area(out) == pytest.approx(36.0, abs=1e-9)


def test_square_dilate_bevel_chamfers_corners():
    out = buffer.buffer_polygon(SQ, 1.0, join="bevel")
    # mitre square minus four corner triangles of area 1/2
    assert overlay.multi_area(out) == pytest.approx(34.0, abs=1e-9)


def test_mitre_limit_falls_back_to_bevel():
    # 30-degree spike: mitre distance r/cos(75deg) ~ 3.9r > limit 1.0
    spike = [np.array([[0, 0], [10, 0], [0, 2.679491924311227], [0, 0]],
                      float)]
    lim = buffer.buffer_polygon(spike, 0.5, join="mitre", mitre_limit=1.0)
    bev = buffer.buffer_polygon(spike, 0.5, join="bevel")
    unl = buffer.buffer_polygon(spike, 0.5, join="mitre", mitre_limit=10.0)
    a_lim, a_bev = overlay.multi_area(lim), overlay.multi_area(bev)
    a_unl = overlay.multi_area(unl)
    assert a_lim == pytest.approx(a_bev, rel=1e-9)  # all corners clipped
    assert a_unl > a_lim  # un-limited mitre keeps the sharp spike


def test_square_erode_exact():
    out = buffer.buffer_polygon(SQ, -1.0)
    assert len(out) == 1
    assert overlay.multi_area(out) == pytest.approx(4.0, abs=1e-12)
    # erosion past the inradius annihilates the polygon
    assert buffer.buffer_polygon(SQ, -2.5) == []


def test_erode_respects_holes():
    donut = [SQ[0], np.array([[1.5, 1.5], [1.5, 2.5], [2.5, 2.5],
                              [2.5, 1.5], [1.5, 1.5]], float)]
    out = buffer.buffer_polygon(donut, -0.25)
    # outer shrinks to 3.5^2 (corners stay sharp); the hole grows by r
    # with ROUNDED corners: 1 + 4r + one k-gon disc of quarter corners
    r = 0.25
    expect = 3.5 ** 2 - (1 + 4 * r + KGON * r * r)
    assert overlay.multi_area(out) == pytest.approx(expect, rel=1e-9)


def test_dilate_fills_holes_when_wide():
    donut = [SQ[0], np.array([[1.5, 1.5], [1.5, 2.5], [2.5, 2.5],
                              [2.5, 1.5], [1.5, 1.5]], float)]
    out = buffer.buffer_polygon(donut, 1.0)  # r > hole half-width
    assert overlay.multi_area(out) == pytest.approx(16 + 16 + KGON,
                                                    rel=1e-12)


def test_line_caps():
    ln = np.array([[0, 0], [3, 0]], float)
    area = lambda polys: overlay.multi_area(polys)
    assert area(buffer.buffer_line(ln, 1.0)) == pytest.approx(
        6 + KGON, rel=1e-12)  # two half-discs = one exact k-gon
    assert area(buffer.buffer_line(ln, 1.0, end_cap="flat")) == \
        pytest.approx(6.0, abs=1e-12)
    assert area(buffer.buffer_line(ln, 1.0, end_cap="square")) == \
        pytest.approx(10.0, abs=1e-12)


def test_bent_line_round_join_closed_form():
    # L-shape, r=0.5: rects 4*2r*? -> 2*(2*0.5*2) = 4? lengths 2+2=4, width 1
    ln = np.array([[0, 0], [2, 0], [2, 2]], float)
    r = 0.5
    a = overlay.multi_area(buffer.buffer_line(ln, r))
    # 4*2r(=4) + caps(one kgon r^2) + convex quarter disc - rect overlap r^2
    expect = 4.0 + KGON * r * r + 0.25 * KGON * r * r - r * r
    assert a == pytest.approx(expect, rel=1e-9)


def test_dilation_contains_original_vertices():
    tri = [np.array([[0.1, 0.2], [5.3, 0.7], [2.9, 4.1], [0.1, 0.2]])]
    out = buffer.buffer_polygon(tri, 0.7)
    assert len(out) == 1
    shell = out[0][0]
    for x, y in tri[0][:-1]:
        assert geom.points_in_ring(np.array([x]), np.array([y]), shell)[0]


def test_erosion_inside_original():
    tri = [np.array([[0.1, 0.2], [5.3, 0.7], [2.9, 4.1], [0.1, 0.2]])]
    out = buffer.buffer_polygon(tri, -0.3)
    assert out
    for p in out:
        for x, y in p[0][:-1]:
            assert geom.points_in_ring(np.array([x]), np.array([y]), overlay.normalize(tri)[0])[0]


def test_quad_segs_convergence():
    areas = [geom.ring_area(buffer.disc_ring(0, 0, 1.0, q))
             for q in (2, 4, 8, 16, 32)]
    assert all(a < b for a, b in zip(areas, areas[1:]))
    assert areas[-1] == pytest.approx(np.pi, rel=1e-3)


def test_buffer_wkb_types_and_fences():
    b = buffer.buffer_wkb(wkb.point(1.0, 2.0), 1.0)
    ty, parts = wkb.decode(b)
    assert ty == wkb.MULTIPOLYGON and len(parts) == 1
    assert geom.polygon_area(parts[0]) == pytest.approx(KGON, rel=1e-12)
    # negative distance on a point -> empty multipolygon
    assert wkb.decode(buffer.buffer_wkb(wkb.point(0, 0), -1.0))[1] == []
    mp = buffer.buffer_wkb(wkb.multipolygon([SQ]), -1.0)
    assert overlay.multi_area(wkb.decode(mp)[1]) == pytest.approx(4.0)
    with pytest.raises(NotImplementedError):
        buffer.buffer_wkb(wkb.point(0, 0), 1.0, side="left")
    with pytest.raises(NotImplementedError):
        buffer.buffer_polygon(SQ, -1.0, join="mitre")


def test_thin_polygon_mitre_reflex_no_poke_through():
    # 0.2-wide L arms; an unlimited mitre at the reflex corner would
    # poke through the far side if emitted — polygon_mode skips it.
    thin = [np.array([[0, 0], [3, 0], [3, 0.2], [0.2, 0.2], [0.2, 3],
                      [0, 3], [0, 0]], float)]
    r = 0.05
    a = overlay.multi_area(
        buffer.buffer_polygon(thin, r, join="mitre", mitre_limit=20.0))
    # A + P*r - r^2 (reflex band self-overlap) + 5 r^2 (convex mitres)
    assert a == pytest.approx(1.16 + 12 * r - r * r + 5 * r * r, rel=1e-12)


def test_concave_round_close_to_true_circle_buffer():
    L = [np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3],
                   [0, 0]], float)]
    a = overlay.multi_area(buffer.buffer_polygon(L, 0.25))
    # A + P*r - r^2 + 5 quarter k-gons at the convex corners
    expect = 5.0 + 12 * 0.25 - 0.25 ** 2 + 5 * (KGON * 0.25 ** 2) / 4
    assert a == pytest.approx(expect, rel=1e-12)


def test_multipolygon_dilate_merges_parts():
    a = [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)]
    b = [np.array([[1.5, 0], [2.5, 0], [2.5, 1], [1.5, 1], [1.5, 0]], float)]
    out = wkb.decode(buffer.buffer_wkb(wkb.multipolygon([a, b]), 0.3))[1]
    assert len(out) == 1  # gap 0.5 < 2r: merged into one blob


def test_pipeline_step_and_udf(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark.functions.st_funcs import st_area, st_buffer
    from gdal_spark.plans.pipeline import Pipeline

    rows = [(1, wkb.polygon(SQ)), (2, wkb.point(0.0, 0.0)),
            (3, wkb.linestring(np.array([[0, 0], [3, 0]], float)))]
    df = spark.createDataFrame(rows, "id int, geom binary")
    got = (df.withColumn("buf", st_buffer(F.col("geom"), F.lit(1.0)))
             .withColumn("area", st_area(F.col("buf")))
             .orderBy("id").select("id", "area").collect())
    assert got[0].area == pytest.approx(16 + 16 + KGON, rel=1e-9)
    assert got[1].area == pytest.approx(KGON, rel=1e-9)
    assert got[2].area == pytest.approx(6 + KGON, rel=1e-9)

    # pipeline step, WKB column mode with mitre style
    out = (Pipeline(spark, df.filter(F.col("id") == 1))
           .step("buffer", dist=1.0, col="geom", out="buf", join="mitre")
           .df())
    [r] = out.select(st_area(F.col("buf")).alias("a")).collect()
    assert r.a == pytest.approx(36.0, rel=1e-9)
