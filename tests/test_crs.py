"""CRS registry: UTM (Karney transverse-Mercator series) + hub."""

import numpy as np
import pytest

from gdal_spark.geo import crs


def test_utm_roundtrip_accuracy():
    rng = np.random.default_rng(4)
    zone = 33  # lon0 = 15 E
    lon = rng.uniform(12.0, 18.0, 500)   # within the zone
    lat = rng.uniform(-80.0, 84.0, 500)
    E, N = crs.lonlat_to_utm_np(lon, lat, zone)
    lon2, lat2 = crs.utm_to_lonlat_np(E, N, zone)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_utm_central_meridian_and_scale():
    zone = 31  # lon0 = 3 E
    E, N = crs.lonlat_to_utm_np(np.array([3.0]), np.array([45.0]), zone)
    assert E[0] == pytest.approx(500000.0, abs=1e-6)
    # scale on the CM is k0: 1 degree of latitude ~ 111132 m * k0
    E1, N1 = crs.lonlat_to_utm_np(np.array([3.0]), np.array([45.5]), zone)
    dn = (N1[0] - N[0]) / 0.5
    # meridian arc degree length at 45N ~ 111131.7 m
    assert dn / 111131.7 == pytest.approx(0.9996, abs=2e-4)


def test_utm_known_point():
    # well-known sanity point: lon 9E zone 32, equator -> E=500000, N=0
    E, N = crs.lonlat_to_utm_np(np.array([9.0]), np.array([0.0]), 32)
    assert E[0] == pytest.approx(500000.0, abs=1e-6)
    assert N[0] == pytest.approx(0.0, abs=1e-6)
    # southern hemisphere false northing
    Es, Ns = crs.lonlat_to_utm_np(np.array([9.0]), np.array([-1.0]), 32,
                                  south=True)
    assert Ns[0] == pytest.approx(10000000.0 - 110574.4, rel=1e-4)


def test_hub_transform_and_errors():
    lon = np.array([10.0])
    lat = np.array([50.0])
    x, y = crs.transform_np("EPSG:4326", "EPSG:32632", lon, lat)
    lon2, lat2 = crs.transform_np("EPSG:32632", "EPSG:4326", x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # 3857 via hub matches the direct mercator functions exactly
    from gdal_spark.geo import mercator
    mx, my = crs.transform_np("EPSG:4326", "EPSG:3857", lon, lat)
    wx, wy = mercator.lonlat_to_meters_np(lon, lat)
    assert mx[0] == wx[0] and my[0] == wy[0]
    with pytest.raises(NotImplementedError):
        crs.transform_np("EPSG:4326", "EPSG:2154", lon, lat)


def test_warp_4326_to_utm(spark):
    """End-to-end: warp a 4326 raster into a UTM grid; a constant band
    stays constant and the dep relation covers the needed tiles."""
    from gdal_spark.raster import grid as G
    from gdal_spark.raster import warp as W
    from tests.test_raster_spark import tiles_to_canvas
    from tests.test_sieve import _tiles

    src = G.GridSpec(64, 64, (6.0, 0.1, 0.0, 53.0, 0.0, -0.1),
                     crs="EPSG:4326", tile=16)  # 6.4 x 6.4 deg around 50N
    tiles = _tiles(spark, np.full((64, 64), 5.0), src)
    # UTM zone 32 grid covering the same area
    E0, N0 = crs.lonlat_to_utm_np(np.array([6.2]), np.array([52.8]), 32)
    dst = G.GridSpec(48, 48, (float(E0[0]), 8000.0, 0.0,
                              float(N0[0]), 0.0, -8000.0),
                     crs="EPSG:32632", tile=16)
    out = tiles_to_canvas(W.warp(tiles, src, dst, kernel="near"), dst)
    # interior of the dst grid maps inside the src extent -> constant
    assert (out[4:40, 4:40] == 5.0).all()
