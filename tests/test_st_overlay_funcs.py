"""ST_* poly-poly surface (construction, predicates, makevalid,
distance) through the SQL registry, plus the geometry-emitting layer
algebra operators."""

import numpy as np
import pytest

from gdal_spark.functions import st_funcs
from gdal_spark.geo import wkb
from gdal_spark.operators.overlay_join import (overlay_erase,
                                               overlay_intersection_join)


def _sq(x0, y0, s):
    return wkb.polygon([np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
        float)])


@pytest.fixture(scope="module")
def st(spark):
    st_funcs.register_all(spark)
    return spark


def _pairs_df(spark):
    rows = [
        (1, bytearray(_sq(0, 0, 4)), bytearray(_sq(2, 2, 4))),   # overlap
        (2, bytearray(_sq(0, 0, 8)), bytearray(_sq(2, 2, 2))),   # contains
        (3, bytearray(_sq(0, 0, 2)), bytearray(_sq(10, 0, 2))),  # disjoint
        (4, bytearray(_sq(0, 0, 2)), bytearray(_sq(2, 0, 2))),   # touches
        (5, bytearray(_sq(0, 0, 2)), bytearray(_sq(0, 0, 2))),   # equals
    ]
    return spark.createDataFrame(rows, "id int, a binary, b binary")


def test_st_construction_areas(st):
    df = _pairs_df(st)
    df.createOrReplaceTempView("pairs")
    got = {r["id"]: (r["ai"], r["au"], r["ad"], r["asym"]) for r in st.sql("""
        SELECT id, st_area(st_intersection(a, b)) AS ai,
               st_area(st_union(a, b)) AS au,
               st_area(st_difference(a, b)) AS ad,
               st_area(st_symdifference(a, b)) AS asym
        FROM pairs""").collect()}
    assert got[1] == (4.0, 28.0, 12.0, 24.0)
    assert got[2] == (4.0, 64.0, 60.0, 60.0)
    assert got[3] == (0.0, 8.0, 4.0, 8.0)
    assert got[4] == (0.0, 8.0, 4.0, 8.0)
    assert got[5] == (4.0, 4.0, 0.0, 0.0)


def test_st_predicates(st):
    df = _pairs_df(st)
    df.createOrReplaceTempView("pairs2")
    rows = {r["id"]: r for r in st.sql("""
        SELECT id, st_intersects(a, b) AS i, st_disjoint(a, b) AS d,
               st_touches(a, b) AS t, st_within(b, a) AS w_ba,
               st_contains(a, b) AS c_ab, st_overlaps(a, b) AS o,
               st_equals(a, b) AS e
        FROM pairs2""").collect()}
    assert rows[1]["i"] and rows[1]["o"] and not rows[1]["t"]
    assert rows[2]["c_ab"] and rows[2]["w_ba"] and not rows[2]["o"]
    assert rows[3]["d"] and not rows[3]["i"]
    assert rows[4]["t"] and rows[4]["i"] and not rows[4]["o"]
    assert rows[5]["e"] and rows[5]["i"]


def test_st_makevalid_and_distance(st):
    bow = wkb.polygon([np.array(
        [[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], float)])
    df = st.createDataFrame(
        [(bytearray(bow), bytearray(_sq(0, 0, 2)), bytearray(_sq(5, 0, 2)))],
        "g binary, a binary, b binary")
    df.createOrReplaceTempView("mv")
    r = st.sql("""
        SELECT st_area(st_makevalid(g)) AS a_fixed,
               st_distance(a, b) AS dist,
               st_area(st_convexhull(g)) AS hull
        FROM mv""").collect()[0]
    assert r["a_fixed"] == pytest.approx(8.0)   # two 4.0 triangles
    assert r["dist"] == pytest.approx(3.0)       # gap between x=2 and x=5
    assert r["hull"] == pytest.approx(16.0)


def test_overlay_intersection_join_operator(spark):
    rows = [(1, bytearray(_sq(0, 0, 4))), (2, bytearray(_sq(2, 2, 4))),
            (3, bytearray(_sq(100, 0, 2)))]
    df = spark.createDataFrame(rows, "poly_id int, geom binary")
    out = overlay_intersection_join(df, df, same_layer=True).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a_id"], r["b_id"], r["n_parts"]) == (1, 2, 1)
    assert r["area"] == pytest.approx(4.0)


def test_st_geomfromtext_roundtrip(st):
    df = st.createDataFrame(
        [("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))",),
         ("POINT (3.5 -2.25)",),
         ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",),
         ("LINESTRING (0 0, 3 4)",)],
        "w string")
    df.createOrReplaceTempView("wkt")
    rows = st.sql("""
        SELECT st_geometrytype(st_geomfromtext(w)) AS t,
               st_area(st_geomfromtext(w)) AS a,
               st_astext(st_geomfromtext(w)) AS back
        FROM wkt""").collect()
    by_t = {r["t"]: r for r in rows}
    assert by_t["POLYGON"]["a"] == pytest.approx(16.0 - 1.0)
    assert by_t["MULTIPOLYGON"]["a"] == pytest.approx(1.0)
    assert by_t["POINT"]["back"] == "POINT (3.5 -2.25)"
    # textual roundtrip: parse(print(parse(w))) is stable
    assert "LINESTRING" in by_t["LINESTRING"]["back"]


def test_dissolve_geoms_operator(spark):
    from gdal_spark.operators.overlay_join import dissolve_geoms

    rows = [("a", bytearray(_sq(0, 0, 3))), ("a", bytearray(_sq(2, 0, 3))),
            ("a", bytearray(_sq(50, 0, 1))),
            ("b", bytearray(_sq(0, 0, 2)))]
    df = spark.createDataFrame(rows, "grp string, geom binary")
    out = {r["grp"]: r for r in dissolve_geoms(df, "grp").collect()}
    assert out["a"]["n_members"] == 3 and out["a"]["n_parts"] == 2
    assert out["a"]["area"] == pytest.approx(15.0 + 1.0)  # 3x5 blob + island
    assert out["b"]["n_parts"] == 1 and out["b"]["area"] == pytest.approx(4.0)
    parts = wkb.polygon_rings(bytes(out["a"]["geom"]))
    assert len(parts) == 2


def test_overlay_erase_operator(spark):
    a = spark.createDataFrame(
        [(1, bytearray(_sq(0, 0, 4))), (2, bytearray(_sq(100, 0, 2)))],
        "poly_id int, geom binary")
    b = spark.createDataFrame(
        [(7, bytearray(_sq(2, 2, 4))), (8, bytearray(_sq(-1, -1, 2)))],
        "poly_id int, geom binary")
    out = {r["a_id"]: r for r in overlay_erase(a, b).collect()}
    # 16 - 4 (overlap with 7) - 1 (corner overlap with 8) = 11
    assert out[1]["area"] == pytest.approx(11.0)
    assert out[2]["area"] == pytest.approx(4.0)  # untouched passthrough


def test_overlay_intersection_join_cross_layer_id_collision(spark):
    """Two distinct layers with colliding ids: the pair (1,1) is a real
    cross-layer pair and must NOT be dropped (reference
    OGRLayer::Intersection has no FID-equality exclusion)."""
    a = spark.createDataFrame([(1, bytearray(_sq(0, 0, 4)))],
                              "poly_id int, geom binary")
    b = spark.createDataFrame([(1, bytearray(_sq(2, 2, 4)))],
                              "poly_id int, geom binary")
    out = overlay_intersection_join(a, b, same_layer=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a_id"], r["b_id"]) == (1, 1)
    assert r["area"] == pytest.approx(4.0)
