"""SimplifyPreserveTopology (ogr_geometry.h:595, GEOS
TopologyPreservingSimplifier semantics: output never self-intersects,
rings never collapse)."""

import numpy as np
import pytest

from gdal_spark.geo import geom, wkb


def _u_shape():
    # simple (non-self-intersecting) star-ish ring on which plain DP at
    # tol 0.7 emits a self-crossing outline (found by randomized search,
    # pinned here as a regression fixture)
    return np.array([
        [1.339, 0.28], [3.433, 1.149], [2.852, 1.456], [2.063, 1.423],
        [1.922, 1.463], [2.811, 2.64], [0.26, 2.699], [0.328, 3.724],
        [-0.13, 0.536], [0.307, -0.901], [1.018, -0.865],
        [2.903, -1.263], [3.061, -0.595], [1.339, 0.28]], float)


def test_plain_dp_breaks_topology_here():
    ring = _u_shape()
    assert not geom.polyline_self_intersects(ring, closed=True)
    s = geom.simplify_dp(ring, 0.7)
    assert geom.polyline_self_intersects(s, closed=True)


def test_preserve_topology_never_self_intersects():
    ring = _u_shape()
    s = geom.simplify_preserve_topology(ring, 0.7, closed=True)
    assert not geom.polyline_self_intersects(s, closed=True)
    assert len(s) >= 4
    assert (s[0] == s[-1]).all()


def test_noop_below_tolerance():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    s = geom.simplify_preserve_topology(ring, 0.5, closed=True)
    assert np.array_equal(s, ring)


def test_linestring_zigzag():
    # zigzag that DP at huge tolerance reduces to a straight segment
    line = np.array([[0, 0], [1, 1], [2, -1], [3, 1], [4, 0]], float)
    s = geom.simplify_preserve_topology(line, 10.0)
    assert not geom.polyline_self_intersects(s, closed=False)
    assert (s[0] == line[0]).all() and (s[-1] == line[-1]).all()


def test_udf_polygon_with_hole(spark):
    from pyspark.sql import functions as F

    from gdal_spark.functions.st_funcs import (
        st_npoints, st_simplify, st_simplifypreservetopology)

    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    th = np.linspace(0, 2 * np.pi, 33)
    hole = np.column_stack([5 + 2 * np.cos(th), 5 + 2 * np.sin(th)])[::-1]
    df = spark.createDataFrame([(1, wkb.polygon([shell, hole]))],
                               "id int, geom binary")
    out = (df.withColumn("s", st_simplifypreservetopology(
                F.col("geom"), F.lit(1.0)))
             .select(st_npoints(F.col("s")).alias("n"),
                     st_npoints(F.col("geom")).alias("n0")).collect())
    assert out[0].n < out[0].n0  # actually simplified
    # and the result decodes to a valid 2-ring polygon
    row = (df.withColumn("s", st_simplifypreservetopology(
               F.col("geom"), F.lit(1.0))).collect())[0]
    ty, rings = wkb.decode(bytes(row.s))
    assert ty == wkb.POLYGON and len(rings) == 2
    for r in rings:
        assert not geom.polyline_self_intersects(r, closed=True)
