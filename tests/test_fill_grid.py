"""fillnodata + IDW gridding vs single-node oracles."""

import numpy as np

from gdal_spark.raster import focal as FO
from gdal_spark.raster import grid as G
from gdal_spark.raster import gridding as GR
from tests.test_raster_spark import tiles_to_canvas
from tests.test_sieve import _tiles


def test_fillnodata_distributed_matches_oracle(spark):
    rng = np.random.default_rng(4)
    spec = G.GridSpec(32, 32, (0, 1, 0, 32, 0, -1), tile=16)
    canvas = rng.uniform(1, 9, size=(32, 32))
    # punch holes, including one crossing a tile boundary
    canvas[5:8, 14:19] = -1.0
    canvas[20, 20] = -1.0
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(FO.fillnodata(tiles, spec, -1.0, iterations=3), spec)
    want = FO.fillnodata_np(canvas, -1.0, iterations=3)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert (got != -1.0).all()


def test_grid_idw_matches_oracle_and_hits(spark):
    spec = G.GridSpec(16, 16, (0.0, 1.0, 0.0, 16.0, 0.0, -1.0), tile=8)
    pts = [(2.5, 13.5, 10.0),   # exactly on a pixel center node
           (9.1, 6.3, 20.0),
           (14.0, 2.0, 30.0)]
    pdf = spark.createDataFrame(pts, "x double, y double, v double")
    got = tiles_to_canvas(GR.grid_idw(pdf, spec, power=2.0), spec)
    gx, gy = np.meshgrid(np.arange(16, dtype=float), np.arange(16, dtype=float))
    wx, wy = spec.pixel_center_world(gx.ravel(), gy.ravel())
    want = GR.idw_np(wx, wy,
                     np.array([p[0] for p in pts]),
                     np.array([p[1] for p in pts]),
                     np.array([p[2] for p in pts]), power=2.0).reshape(16, 16)
    np.testing.assert_array_equal(got, want)
    # the on-node point short-circuits to its exact value
    assert got[2, 2] == 10.0
    # all interpolated values within data range
    assert got.min() >= 10.0 and got.max() <= 30.0


def test_grid_idw_radius_nodata(spark):
    spec = G.GridSpec(8, 8, (0.0, 1.0, 0.0, 8.0, 0.0, -1.0), tile=8)
    pdf = spark.createDataFrame([(0.5, 7.5, 5.0)], "x double, y double, v double")
    got = tiles_to_canvas(GR.grid_idw(pdf, spec, radius=2.0, nodata=-99.0), spec)
    assert got[0, 0] == 5.0
    assert got[7, 7] == -99.0  # far corner outside radius


def test_grid_idw_scatter_matches_broadcast_bitexact(spark):
    """The scale path (per-point tile fan-out, no driver collect) must
    be bit-identical to the broadcast path: both normalize point order
    and out-of-radius candidates get exactly zero weight."""
    rng = np.random.default_rng(11)
    spec = G.GridSpec(40, 24, (0.0, 0.5, 0.0, 12.0, 0.0, -0.5), tile=8)
    n = 300
    pts = list(zip(rng.uniform(-2, 22, n).tolist(),
                   rng.uniform(-2, 14, n).tolist(),
                   rng.uniform(1, 9, n).tolist()))
    pdf = spark.createDataFrame(pts, "x double, y double, v double")
    scatter = tiles_to_canvas(
        GR.grid_idw(pdf, spec, radius=1.7, nodata=-5.0), spec)
    bcast = tiles_to_canvas(
        GR.grid_idw(pdf, spec, radius=1.7, nodata=-5.0,
                    force_broadcast=True), spec)
    np.testing.assert_array_equal(scatter, bcast)
    # and both match the single-node oracle on sorted points (allclose,
    # not equal: the oracle sums zero-weight out-of-radius terms too,
    # which shifts numpy's pairwise-summation tree by an ulp)
    gx, gy = np.meshgrid(np.arange(40, dtype=float), np.arange(24, dtype=float))
    wx, wy = spec.pixel_center_world(gx.ravel(), gy.ravel())
    sx, sy, sv = GR.sort_points(np.array([p[0] for p in pts]),
                                np.array([p[1] for p in pts]),
                                np.array([p[2] for p in pts]))
    want = GR.idw_np(wx, wy, sx, sy, sv, power=2.0, radius=1.7,
                     nodata=-5.0).reshape(24, 40)
    np.testing.assert_allclose(scatter, want, rtol=1e-12)


def test_grid_nearest_matches_oracle_and_ties(spark):
    spec = G.GridSpec(16, 16, (0.0, 1.0, 0.0, 16.0, 0.0, -1.0), tile=8)
    # two points equidistant from node center (8.5, 7.5): tie -> min v
    pts = [(6.5, 7.5, 9.0), (10.5, 7.5, 4.0), (2.0, 14.0, 7.0)]
    pdf = spark.createDataFrame(pts, "x double, y double, v double")
    got = tiles_to_canvas(
        GR.grid_nearest(pdf, spec, radius=5.0, nodata=-1.0), spec)
    gx, gy = np.meshgrid(np.arange(16, dtype=float), np.arange(16, dtype=float))
    wx, wy = spec.pixel_center_world(gx.ravel(), gy.ravel())
    sx, sy, sv = GR.sort_points(np.array([p[0] for p in pts]),
                                np.array([p[1] for p in pts]),
                                np.array([p[2] for p in pts]))
    want = GR.nearest_np(wx, wy, sx, sy, sv, radius=5.0,
                         nodata=-1.0).reshape(16, 16)
    np.testing.assert_array_equal(got, want)
    assert got[8, 8] == 4.0  # the tie at (8.5, 7.5) breaks to min v
    bcast = tiles_to_canvas(
        GR.grid_nearest(pdf, spec, radius=5.0, nodata=-1.0,
                        force_broadcast=True), spec)
    np.testing.assert_array_equal(got, bcast)


def test_grid_idw_scatter_all_nodata_region(spark):
    """Tiles no point can reach still emit (full-surface contract)."""
    spec = G.GridSpec(32, 32, (0.0, 1.0, 0.0, 32.0, 0.0, -1.0), tile=8)
    pdf = spark.createDataFrame([(1.0, 31.0, 7.0)], "x double, y double, v double")
    out = GR.grid_idw(pdf, spec, radius=3.0, nodata=-1.0)
    assert out.count() == 16  # every tile present
    canvas = tiles_to_canvas(out, spec)
    assert canvas[0, 0] != -1.0
    assert (canvas[16:, 16:] == -1.0).all()


# ------------------------- data metrics / average / invdistnn -------

def _node_coords(spec):
    gx, gy = np.meshgrid(np.arange(spec.width, dtype=float),
                         np.arange(spec.height, dtype=float))
    return spec.pixel_center_world(gx.ravel(), gy.ravel())


def test_data_metric_semantics_hand_fixture():
    nodes_x = np.array([0.0])
    nodes_y = np.array([0.0])
    px = np.array([1.0, -2.0, 0.0, 50.0])
    py = np.array([0.0, 0.0, 3.0, 50.0])
    pv = np.array([5.0, 9.0, 2.0, 100.0])
    args = (nodes_x, nodes_y, px, py, pv)
    r = dict(radius1=4.0, nodata=-1.0)
    assert GR.data_metric_np(*args, "minimum", **r)[0] == 2.0
    assert GR.data_metric_np(*args, "maximum", **r)[0] == 9.0
    assert GR.data_metric_np(*args, "range", **r)[0] == 7.0
    assert GR.data_metric_np(*args, "count", **r)[0] == 3.0
    # avg distance node->points: (1 + 2 + 3)/3
    assert GR.data_metric_np(*args, "average_distance", **r)[0] == 2.0
    # pairs i<j among the 3 inside (no self-pairs): d(1,2)=3,
    # d(1,3)=sqrt(1+9), d(2,3)=sqrt(4+9)
    want = (3.0 + np.sqrt(10.0) + np.sqrt(13.0)) / 3.0
    assert GR.data_metric_np(*args, "average_distance_pts", **r)[0] == want
    # min_points gates to nodata (gdalgrid.cpp n < nMinPoints rule)
    assert GR.data_metric_np(*args, "count", radius1=4.0, min_points=4,
                             nodata=-1.0)[0] == -1.0


def test_data_metric_ellipse_and_rotation():
    nodes = (np.array([0.0]), np.array([0.0]))
    px = np.array([3.0, 0.0])
    py = np.array([0.0, 3.0])
    pv = np.array([1.0, 2.0])
    # ellipse r1(x)=4, r2(y)=1: only the x-axis point is inside
    got = GR.data_metric_np(*nodes, px, py, pv, "count",
                            radius1=4.0, radius2=1.0, nodata=-1.0)
    assert got[0] == 1.0
    # rotate 90deg: now only the y-axis point is inside
    got = GR.data_metric_np(*nodes, px, py, pv, "count",
                            radius1=4.0, radius2=1.0, angle=90.0,
                            nodata=-1.0)
    assert got[0] == 1.0 and GR.data_metric_np(
        *nodes, px, py, pv, "minimum", radius1=4.0, radius2=1.0,
        angle=90.0, nodata=-1.0)[0] == 2.0


def test_moving_average_np():
    nodes = (np.array([0.0]), np.array([0.0]))
    px = np.array([1.0, 2.0, 10.0])
    py = np.array([0.0, 0.0, 0.0])
    pv = np.array([4.0, 8.0, 100.0])
    got = GR.moving_average_np(*nodes, px, py, pv, radius1=5.0, nodata=-1)
    assert got[0] == 6.0
    assert GR.moving_average_np(*nodes, px, py, pv, radius1=0.5,
                                nodata=-1.0)[0] == -1.0


def test_invdistnn_np_selection_and_quadrants():
    nodes = (np.array([0.0]), np.array([0.0]))
    # one point per quadrant + an extra near point in quadrant 1 (+x,-y)
    px = np.array([1.0, -2.0, -3.0, 4.0, 0.5])
    py = np.array([-1.0, -2.0, 3.0, 4.0, -0.5])
    pv = np.array([10.0, 20.0, 30.0, 40.0, 50.0])
    # max_points=2: the two nearest are (0.5,-0.5)v50 d2=0.5 and
    # (1,-1)v10 d2=2
    got = GR.invdistnn_np(*nodes, px, py, pv, radius=10.0, power=2.0,
                          max_points=2, nodata=-1.0)
    w1, w2 = 1.0 / 0.5, 1.0 / 2.0
    assert got[0] == (w1 * 50.0 + w2 * 10.0) / (w1 + w2)
    # quadrant mode, max 1 per quadrant: nearest per quadrant =
    # v50 (q0? +x,-y -> rx>=0 -> 1 | ry<0 -> 0 => quad 1), v20, v30, v40
    got = GR.invdistnn_np(*nodes, px, py, pv, radius=10.0, power=2.0,
                          max_points=0, min_points_per_quadrant=1,
                          max_points_per_quadrant=1, nodata=-1.0)
    terms = [(1.0 / 8.0, 20.0),    # quad 0 (rx<0, ry<0): (-2,-2)
             (1.0 / 0.5, 50.0),    # quad 1 (rx>=0, ry<0): (0.5,-0.5)
             (1.0 / 18.0, 30.0),   # quad 2 (rx<0, ry>=0): (-3,3)
             (1.0 / 32.0, 40.0)]   # quad 3: (4,4)
    num = 0.0
    den = 0.0
    for w, z in terms:  # round-robin consumption order (quad 0,1,2,3)
        num += w * z
        den += w
    assert got[0] == num / den
    # min_points_per_quadrant unmet -> nodata
    got = GR.invdistnn_np(*nodes, px[:3], py[:3], pv[:3], radius=10.0,
                          min_points_per_quadrant=1, nodata=-1.0)
    assert got[0] == -1.0
    # exact hit short-circuits to the point value
    got = GR.invdistnn_np(np.array([1.0]), np.array([-1.0]), px, py, pv,
                          radius=10.0, max_points=2, nodata=-1.0)
    assert got[0] == 10.0


def test_grid_metric_distributed_matches_kernel_bitexact(spark):
    """scatter path == broadcast path == single-node kernel, for every
    metric family (the IDW determinism contract extended)."""
    rng = np.random.default_rng(23)
    spec = G.GridSpec(32, 16, (0.0, 1.0, 0.0, 16.0, 0.0, -1.0), tile=8)
    n = 200
    px = rng.uniform(-2, 34, n)
    py = rng.uniform(-2, 18, n)
    pv = rng.uniform(0, 100, n).round(2)
    pdf = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(px, py, pv)],
        "x double, y double, v double")
    wx, wy = _node_coords(spec)
    sx, sy, sv = GR.sort_points(px.copy(), py.copy(), pv.copy())

    for name, dist_fn, kern_fn in [
        ("count", lambda: GR.grid_data_metric(pdf, spec, "count", 3.0,
                                              nodata=-1.0),
         lambda: GR.data_metric_np(wx, wy, sx, sy, sv, "count", 3.0,
                                   nodata=-1.0)),
        ("avg_dist", lambda: GR.grid_data_metric(
            pdf, spec, "average_distance", 3.0, nodata=-1.0),
         lambda: GR.data_metric_np(wx, wy, sx, sy, sv,
                                   "average_distance", 3.0, nodata=-1.0)),
        ("avg_dist_pts", lambda: GR.grid_data_metric(
            pdf, spec, "average_distance_pts", 3.0, nodata=-1.0),
         lambda: GR.data_metric_np(wx, wy, sx, sy, sv,
                                   "average_distance_pts", 3.0,
                                   nodata=-1.0)),
        ("average", lambda: GR.grid_average(pdf, spec, 3.0, nodata=-1.0),
         lambda: GR.moving_average_np(wx, wy, sx, sy, sv, 3.0,
                                      nodata=-1.0)),
        ("invdistnn", lambda: GR.grid_invdistnn(
            pdf, spec, radius=4.0, smoothing=1.0, max_points=6,
            nodata=-1.0),
         lambda: GR.invdistnn_np(wx, wy, sx, sy, sv, 4.0, 2.0, 1.0,
                                 max_points=6, nodata=-1.0)),
        ("invdistnn_quad", lambda: GR.grid_invdistnn(
            pdf, spec, radius=4.0, smoothing=1.0, max_points=0,
            min_points_per_quadrant=1, max_points_per_quadrant=2,
            nodata=-1.0),
         lambda: GR.invdistnn_np(wx, wy, sx, sy, sv, 4.0, 2.0, 1.0,
                                 max_points=0, min_points_per_quadrant=1,
                                 max_points_per_quadrant=2, nodata=-1.0)),
    ]:
        want = kern_fn().reshape(spec.height, spec.width)
        got_scatter = tiles_to_canvas(dist_fn(), spec)
        np.testing.assert_array_equal(got_scatter, want, err_msg=name)
