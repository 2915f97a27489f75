"""Ring-traced polygonize: geometry output round-trips through
rasterize exactly (polygonize ∘ rasterize = identity — the oracle the
reference's own autotests build on)."""

import numpy as np

from gdal_spark.geo import geom, wkb
from gdal_spark.raster import grid as G
from gdal_spark.raster import polygonize as PZ
from gdal_spark.raster import rasterize as R
from tests.test_sieve import _tiles


def test_trace_rings_roundtrip_property():
    rng = np.random.default_rng(2)
    for trial in range(15):
        mask = rng.integers(0, 2, size=(10, 12)).astype(bool)
        labels = PZ.label_tile_np(mask.astype(float))
        spec = G.GridSpec(12, 10, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), tile=16)
        for lab in range(1, labels.max() + 1):
            comp = labels == lab
            rings = PZ.trace_rings(comp)
            area = abs(geom.ring_area(rings[0])) \
                - sum(abs(geom.ring_area(r)) for r in rings[1:])
            assert area == comp.sum()
            canvas = R.rasterize_np(spec, [(1.0, rings)])
            np.testing.assert_array_equal(canvas > 0, comp)


def test_trace_rings_hole():
    mask = np.ones((7, 7), dtype=bool)
    mask[2:5, 2:5] = False
    rings = PZ.trace_rings(mask)
    assert len(rings) == 2  # exterior + one hole
    assert abs(geom.ring_area(rings[0])) == 49
    assert abs(geom.ring_area(rings[1])) == 9


def test_distributed_polygonize_geoms_roundtrip(spark):
    rng = np.random.default_rng(6)
    spec = G.GridSpec(64, 32, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), tile=16)
    full = (rng.integers(0, 2, size=(32, 64))
            * rng.integers(1, 3, size=(32, 64))).astype(np.float64)
    tiles = _tiles(spark, full, spec)
    rows = PZ.polygonize_geoms(tiles, spec).collect()

    # stats agree with the stats-only operator
    stats = {tuple(r) for r in PZ.polygonize(tiles, spec).collect()}
    got_stats = {(r["value"], r["n_px"], r["min_x"], r["min_y"],
                  r["max_x"], r["max_y"]) for r in rows}
    assert got_stats == stats

    # geometry: rasterizing every component's rings reproduces the
    # full raster EXACTLY (burn the component's value; components are
    # disjoint so REPLACE order is irrelevant)
    canvas = np.zeros((32, 64))
    for r in rows:
        assert r["geom"] is not None
        rings = wkb.polygon_rings(bytes(r["geom"]))[0]
        burned = R.rasterize_np(spec, [(r["value"], rings)])
        canvas[burned > 0] = burned[burned > 0]
    np.testing.assert_array_equal(canvas, full)


def test_polygonize_distributed_merge_spanning_component(spark):
    """VERDICT worst case: ONE component spanning every tile (a frame
    around the whole canvas) plus noise — the driver union-find path
    and the forced large-star/small-star path must agree exactly."""
    rng = np.random.default_rng(21)
    spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), tile=8)
    full = np.zeros((64, 64))
    full[0, :] = full[-1, :] = full[:, 0] = full[:, -1] = 4.0  # frame
    # interior noise components
    noise = (rng.integers(0, 2, size=(62, 62))
             * rng.integers(1, 3, size=(62, 62))).astype(np.float64)
    full[1:-1, 1:-1] = noise
    tiles = _tiles(spark, full, spec)
    drv = {tuple(r) for r in
           PZ.polygonize(tiles, spec, distributed_merge=False).collect()}
    dst = {tuple(r) for r in
           PZ.polygonize(tiles, spec, distributed_merge=True).collect()}
    assert drv == dst
    # the frame is one component of 4*64 - 4 pixels
    assert (4.0, 252, 0, 0, 63, 63) in dst

    # geoms path too
    g1 = PZ.polygonize_geoms(tiles, spec, distributed_merge=True).collect()
    got_stats = {(r["value"], r["n_px"], r["min_x"], r["min_y"],
                  r["max_x"], r["max_y"]) for r in g1}
    assert got_stats == dst


def test_polygonize_geoms_max_px_cap(spark):
    spec = G.GridSpec(16, 16, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), tile=8)
    full = np.ones((16, 16))
    tiles = _tiles(spark, full, spec)
    rows = PZ.polygonize_geoms(tiles, spec, max_px=10).collect()
    assert len(rows) == 1 and rows[0]["geom"] is None
    assert rows[0]["n_px"] == 256
