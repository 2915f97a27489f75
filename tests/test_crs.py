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
        crs.transform_np("EPSG:4326", "EPSG:9999", lon, lat)


def test_lcc_roundtrip_accuracy():
    rng = np.random.default_rng(5)
    for code, lon_c, lat_rng in (("EPSG:3978", -95.0, (42.0, 83.0)),
                                 ("EPSG:2154", 3.0, (41.0, 51.0))):
        lon = lon_c + rng.uniform(-20, 20, 500)
        lat = rng.uniform(*lat_rng, 500)
        x, y = crs.transform_np("EPSG:4326", code, lon, lat)
        lon2, lat2 = crs.transform_np(code, "EPSG:4326", x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_lcc_projection_invariants():
    """Snyder LCC invariants: the grid origin maps to (E0, N0); the
    central meridian maps to E = E0 at every latitude; the cone
    constant n equals sin(lat) of the single-parallel limit; scale
    factor is 1 on both standard parallels (k = n*rho / (a*m))."""
    p = crs.LCC_REGISTRY["2154"]
    E, N = p.forward(np.array([3.0]), np.array([46.5]))
    np.testing.assert_allclose(E, 700000.0, atol=1e-6)
    np.testing.assert_allclose(N, 6600000.0, atol=1e-6)
    E, _ = p.forward(np.array([3.0, 3.0]), np.array([42.0, 50.0]))
    np.testing.assert_allclose(E, 700000.0, atol=1e-6)
    a, e, n = p.a, p.e, p.n
    for lat in (44.0, 49.0):
        phi = np.radians(lat)
        m = np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)
        rho = a * p.F * p.t_of(np.array([phi])) ** n
        k = n * rho / (a * m)
        np.testing.assert_allclose(k, 1.0, rtol=1e-12)
    # 44 < lat < 49 -> k < 1 (between the parallels the cone is inside
    # the ellipsoid); outside -> k > 1
    for lat, expect_lt in ((46.0, True), (42.0, False), (51.0, False)):
        phi = np.radians(lat)
        m = np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)
        rho = a * p.F * p.t_of(np.array([phi])) ** n
        k = float(n * rho / (a * m))
        assert (k < 1.0) == expect_lt


def test_warp_3857_to_lcc(spark):
    """End-to-end: warp a 3857 raster into an EPSG:3978 grid; constant
    band stays constant in the covered interior."""
    from gdal_spark.raster import grid as G
    from gdal_spark.raster import warp as W
    from tests.test_raster_spark import tiles_to_canvas
    from tests.test_sieve import _tiles

    src = G.world_3857(2, 32)  # 128x128 world
    tiles = _tiles(spark, np.full((128, 128), 4.0), src)
    dst = G.GridSpec(64, 64, (-2.4e6, 75000.0, 0.0, 3.2e6, 0.0, -75000.0),
                     crs="EPSG:3978", tile=32)
    out = tiles_to_canvas(W.warp(tiles, src, dst, kernel="near"), dst)
    assert (out[8:56, 8:56] == 4.0).all()


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


def test_lcc_gate_routing_margin():
    """The LCC warp gate's NEAR oracle is sound iff no dst pixel center
    routes within libm-noise of a source pixel boundary: audit the
    whole gate grid's distance-to-integer margin."""
    from gdal_spark.queries_raster import LCC_GT, LCC_H, LCC_W, ZOOM, TILE
    from gdal_spark.raster import grid as G
    from gdal_spark.raster import warp as W

    src = G.world_3857(ZOOM, TILE)
    dst = G.GridSpec(LCC_W, LCC_H, LCC_GT, crs="EPSG:3978", tile=128)
    gy, gx = np.mgrid[0:LCC_H, 0:LCC_W]
    wx, wy = dst.pixel_center_world(gx.ravel().astype(float),
                                    gy.ravel().astype(float))
    lon, lat = crs.to_lonlat_np("EPSG:3978", wx, wy)
    spx, spy = W._dst_pos_in_src_px(dst, src, gx.ravel().astype(float),
                                    gy.ravel().astype(float))
    # Regime 1 (|lat| > 85): the mercator forward CLIPS, pinning spy to
    # the grid edge — exactly on a pixel boundary, but those routings
    # land in rows the density raster provably never occupies (docs
    # have |lat| < 80 -> occupied rows ~[230, 1818] at z5), so both
    # engines emit 0 whichever side of the boundary floor() picks.
    clipped = np.abs(lat) > 85.0
    assert not clipped.any() or (spy[clipped] < 200.0).all()
    # Regime 2 (smooth transform): cross-libm noise through the
    # pow/atan2/sin chain is ~1e-10 px; a 1e-6 floor-distance margin
    # (the order statistics of ~200k uniform fractions) is plenty.
    for sp in (spx[~clipped], spy[~clipped]):
        inside = (sp > -0.5) & (sp < src.width + 0.5)
        frac = np.abs(sp[inside] - np.round(sp[inside]))
        assert frac.min() > 1e-6, f"routing margin too small: {frac.min()}"


def test_polar_stereo_worked_example():
    """EPSG Guidance Note 7-2 §3.2.4 worked example for Polar
    Stereographic variant B (south, lat_ts 71S, lon0 70E, FE=FN=6M —
    the EPSG:3032 definition): lat 75S lon 120E must map to
    E 7255380.79, N 7053389.56 (published to cm)."""
    p = crs._PolarStereo(lat_ts=-71.0, lon0=70.0,
                         e0=6000000.0, n0=6000000.0, south=True)
    E, N = p.forward(np.array([120.0]), np.array([-75.0]))
    np.testing.assert_allclose(E, 7255380.79, atol=0.01)
    np.testing.assert_allclose(N, 7053389.56, atol=0.01)
    lon, lat = p.inverse(E, N)
    np.testing.assert_allclose(lon, 120.0, atol=1e-9)
    np.testing.assert_allclose(lat, -75.0, atol=1e-9)


def test_polar_stereo_roundtrip_and_invariants():
    rng = np.random.default_rng(6)
    for code, south, lat_rng in (("EPSG:3413", False, (55.0, 89.5)),
                                 ("EPSG:3031", True, (-89.5, -55.0))):
        lon = rng.uniform(-180.0, 180.0, 500)
        lat = rng.uniform(*lat_rng, 500)
        x, y = crs.transform_np("EPSG:4326", code, lon, lat)
        lon2, lat2 = crs.transform_np(code, "EPSG:4326", x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-8)
    # pole maps to the origin; scale is true on the standard parallel
    # (k = rho / (a*m) == 1 at lat_ts)
    p = crs.PSTEREO_REGISTRY["3413"]
    E, N = p.forward(np.array([13.0]), np.array([90.0]))
    np.testing.assert_allclose(E, 0.0, atol=1e-6)
    np.testing.assert_allclose(N, 0.0, atol=1e-6)
    phi = np.radians(70.0)
    m = np.cos(phi) / np.sqrt(1.0 - (p.e * np.sin(phi)) ** 2)
    rho = p.rho_c * p.t_of(np.array([phi]))
    np.testing.assert_allclose(rho / (p.a * m), 1.0, rtol=1e-12)


def test_pstereo_gate_routing_margin():
    """Same soundness audit as the LCC gate, for the EPSG:3413 branch
    of raster_warp_crs_checksum: no dst pixel center may route within
    libm-noise of a source pixel boundary."""
    from gdal_spark.queries_raster import PS_GT, PS_H, PS_W, ZOOM, TILE
    from gdal_spark.raster import grid as G
    from gdal_spark.raster import warp as W

    src = G.world_3857(ZOOM, TILE)
    dst = G.GridSpec(PS_W, PS_H, PS_GT, crs="EPSG:3413", tile=128)
    gy, gx = np.mgrid[0:PS_H, 0:PS_W]
    lon, lat = crs.to_lonlat_np(
        "EPSG:3413", *dst.pixel_center_world(gx.ravel().astype(float),
                                             gy.ravel().astype(float)))
    spx, spy = W._dst_pos_in_src_px(dst, src, gx.ravel().astype(float),
                                    gy.ravel().astype(float))
    # Mercator-clipped polar cap (|lat| > 85) pins spy to the grid
    # edge; docs span |lat| < 80 so those rows are provably empty in
    # the density raster — both engines emit 0 either side of floor().
    clipped = np.abs(lat) > 85.0
    assert clipped.any() and (spy[clipped] < 200.0).all()
    for sp in (spx[~clipped], spy[~clipped]):
        inside = (sp > -0.5) & (sp < src.width + 0.5)
        frac = np.abs(sp[inside] - np.round(sp[inside]))
        assert frac.min() > 1e-6, f"routing margin too small: {frac.min()}"


def test_pstereo_rect_bounds_vs_bruteforce():
    """crs.pstereo_rect_lonlat_bounds must bracket a dense sample of
    the rectangle's inverse images — including pole-containing and
    antimeridian-crossing rectangles, where corner sampling fails."""
    p = crs.PSTEREO_REGISTRY["3413"]
    rng = np.random.default_rng(9)
    rects = [(-1e5, 1e5, -1e5, 1e5),          # contains the pole
             (-2e5, -1e4, 1e4, 3e6),          # crosses the lon0+180 ray?
             (1e4, 3e6, 1e4, 3e6),            # plain quadrant
             (-3e6, -1e6, -3e6, -1e6)]
    for _ in range(40):
        x0, y0 = rng.uniform(-4e6, 3.8e6, 2)
        rects.append((x0, x0 + rng.uniform(1e4, 2e6),
                      y0, y0 + rng.uniform(1e4, 2e6)))
    for x0, x1, y0, y1 in rects:
        lon_lo, lon_hi, lat_lo, lat_hi, wrap = crs.pstereo_rect_lonlat_bounds(
            p, np.array([x0]), np.array([x1]), np.array([y0]), np.array([y1]))
        gx, gy = np.meshgrid(np.linspace(x0, x1, 160),
                             np.linspace(y0, y1, 160))
        lon, lat = p.inverse(gx.ravel(), gy.ravel())
        assert lat.min() >= lat_lo[0] - 1e-9
        assert lat.max() <= lat_hi[0] + 1e-9
        if not wrap[0]:
            assert lon.min() >= lon_lo[0] - 1e-9
            assert lon.max() <= lon_hi[0] + 1e-9


def test_warp_3857_into_polar_grid(spark):
    """End-to-end regression for the azimuthal dep path: a CONSTANT
    z3 mercator band warped into an EPSG:3413 grid that CONTAINS the
    pole and the antimeridian must stay constant at every dst pixel
    whose latitude is inside the mercator domain — a missing source
    tile in the dep relation would leave nodata holes (the bug the
    generic 9-point sampling had near the branch cut)."""
    from gdal_spark.raster import grid as G
    from gdal_spark.raster import warp as W
    from tests.test_raster_spark import tiles_to_canvas
    from tests.test_sieve import _tiles

    src = G.world_3857(3, 64)  # 512x512 world
    tiles = _tiles(spark, np.full((512, 512), 7.0), src)
    # 64x64 polar grid, pole near the center, reaching past +-180
    dst = G.GridSpec(64, 64, (-3.31e6, 103000.0, 0.0,
                              3.29e6, 0.0, -103000.0),
                     crs="EPSG:3413", tile=16)
    out = tiles_to_canvas(W.warp(tiles, src, dst, kernel="near"), dst)
    gy, gx = np.mgrid[0:64, 0:64]
    _, lat = crs.to_lonlat_np(
        "EPSG:3413", *dst.pixel_center_world(gx.ravel().astype(float),
                                             gy.ravel().astype(float)))
    covered = (np.abs(lat) < 84.0).reshape(64, 64)
    assert covered.sum() > 2000
    assert (out[covered] == 7.0).all()


def test_albers_worked_example():
    """Snyder PP 1395 pp. 291-292 ellipsoidal Albers numerical example
    (Clarke 1866, standard parallels 29.5N/45.5N, origin 23N 96W):
    lat 35N lon 75W must map to x 1,885,472.7  y 1,535,925.0
    (published to 0.1 m)."""
    e2 = 0.0067686580  # Snyder's Clarke 1866 e^2
    p = crs._Albers(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0,
                    e0=0.0, n0=0.0, a=6378206.4,
                    f=float(1.0 - np.sqrt(1.0 - e2)))
    E, N = p.forward(np.array([-75.0]), np.array([35.0]))
    np.testing.assert_allclose(E, 1885472.7, atol=0.1)
    np.testing.assert_allclose(N, 1535925.0, atol=0.1)
    lon, lat = p.inverse(E, N)
    np.testing.assert_allclose(lon, -75.0, atol=1e-9)
    np.testing.assert_allclose(lat, 35.0, atol=1e-9)


def test_albers_roundtrip_and_invariants():
    """EPSG:5070 (NAD83 Conus Albers, GRS80) roundtrip over CONUS, plus
    the equal-area invariant: the projection's area scale factor
    h*k = 1 everywhere (checked via the analytic rho(q) relation:
    d(area) preservation reduces to rho * drho/dphi = -a^2 m / n *
    dq/dphi / 2 ... verified numerically as |J| == 1 to 1e-6)."""
    rng = np.random.default_rng(7)
    lon = rng.uniform(-125.0, -66.0, 500)
    lat = rng.uniform(24.0, 50.0, 500)
    x, y = crs.transform_np("EPSG:4326", "EPSG:5070", lon, lat)
    lon2, lat2 = crs.transform_np("EPSG:5070", "EPSG:4326", x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # equal-area: the Jacobian of (lon,lat)->(E,N) divided by the
    # ellipsoidal area element cos(phi)*M*N_r must be 1
    p = crs.ALBERS_REGISTRY["5070"]
    d = 1e-6
    for lo, la in ((-100.0, 35.0), (-80.0, 45.0), (-120.0, 30.0)):
        E0, N0 = p.forward(np.array([lo]), np.array([la]))
        Ex, Nx = p.forward(np.array([lo + d]), np.array([la]))
        Ey, Ny = p.forward(np.array([lo]), np.array([la + d]))
        J = abs(((Ex - E0) * (Ny - N0) - (Ey - E0) * (Nx - N0))[0]) / d / d
        phi = np.radians(la)
        s2 = np.sin(phi) ** 2
        Mr = p.a * (1 - p.e2) / (1 - p.e2 * s2) ** 1.5
        Nr = p.a / np.sqrt(1 - p.e2 * s2)
        area_el = np.cos(phi) * Mr * Nr * np.radians(1.0) ** 2
        np.testing.assert_allclose(J / area_el, 1.0, rtol=1e-5)


def test_albers_gate_routing_margin():
    """Same soundness audit as the LCC/stereo gates, for the EPSG:5070
    branch of raster_warp_crs_checksum: no dst pixel center may route
    within libm-noise of a source pixel boundary."""
    from gdal_spark.queries_raster import ALB_GT, ALB_H, ALB_W, ZOOM, TILE
    from gdal_spark.raster import grid as G
    from gdal_spark.raster import warp as W

    src = G.world_3857(ZOOM, TILE)
    dst = G.GridSpec(ALB_W, ALB_H, ALB_GT, crs="EPSG:5070", tile=128)
    gy, gx = np.mgrid[0:ALB_H, 0:ALB_W]
    lon, lat = crs.to_lonlat_np(
        "EPSG:5070", *dst.pixel_center_world(gx.ravel().astype(float),
                                             gy.ravel().astype(float)))
    # CONUS grid: lat spans ~[17, 53] — no mercator clipping regime
    assert (np.abs(lat) < 85.0).all()
    spx, spy = W._dst_pos_in_src_px(dst, src, gx.ravel().astype(float),
                                    gy.ravel().astype(float))
    for sp in (spx, spy):
        inside = (sp > -0.5) & (sp < src.width + 0.5)
        frac = np.abs(sp[inside] - np.round(sp[inside]))
        assert frac.min() > 1e-6, f"routing margin too small: {frac.min()}"


def test_tm_osgb_true_origin_and_roundtrip():
    """EPSG:27700 projection-level invariants, on the raw _TM object
    (the public from/to_lonlat_np surface now applies the OSGB36
    Helmert datum step first, so its inputs are WGS84, not native
    Airy): the true origin (2W, 49N) maps to the false origin
    (400000, -100000) exactly (EPSG registry definition), and
    forward/inverse round-trips to sub-nanometer over the National
    Grid domain."""
    p = crs.TM_REGISTRY["27700"]
    E, N = p.forward(np.array([-2.0]), np.array([49.0]))
    assert abs(E[0] - 400000.0) < 1e-6 and abs(N[0] + 100000.0) < 1e-6
    rng = np.random.default_rng(41)
    lon = rng.uniform(-8.0, 2.0, 2000)
    lat = rng.uniform(49.5, 61.0, 2000)
    E, N = p.forward(lon, lat)
    lon2, lat2 = p.inverse(E, N)
    assert np.abs(lon2 - lon).max() < 1e-11
    assert np.abs(lat2 - lat).max() < 1e-11
    # scale at the central meridian is k0 (tmerc invariant)
    dlat = 1e-6
    E1, N1 = p.forward(np.array([-2.0, -2.0]),
                       np.array([52.0, 52.0 + dlat]))
    # meridian arc per radian on Airy 1830 at 52N
    a, f = 6377563.396, 1.0 / 299.3249646
    e2 = f * (2 - f)
    phi = np.radians(52.0)
    M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    got = (N1[1] - N1[0]) / np.radians(dlat)
    assert abs(got / M - 0.9996012717) < 1e-6


def test_tm_registry_members_roundtrip():
    rng = np.random.default_rng(43)
    for code, lon_rng, lat_rng, tol in [
            ("2193", (166.0, 179.0), (-47.5, -34.0), 1e-11),  # NZTM
            ("2180", (14.0, 24.5), (49.0, 55.0), 1e-11),  # Poland CS92
            # BNG: WGS84 hub -> Helmert -> Airy TM and back; the
            # residual is the dropped-height second-order term (<1e-8
            # deg ~= 1 mm << the cm bar)
            ("27700", (-7.5, 2.0), (49.8, 60.8), 2e-8)]:
        lon = rng.uniform(*lon_rng, 500)
        lat = rng.uniform(*lat_rng, 500)
        E, N = crs.from_lonlat_np(code, lon, lat)
        lon2, lat2 = crs.to_lonlat_np(code, E, N)
        assert np.abs(lon2 - lon).max() < tol
        assert np.abs(lat2 - lat).max() < tol


def test_osgb36_helmert_datum_step():
    """The EPSG:1314 Helmert vs the OS guide's OSTN-truth worked
    point (Caister water tower): must land inside the published
    ~3.5 m Helmert envelope — and far off the ~0 m a no-datum hub
    would claim (the shift itself is >100 m here)."""
    d = crs.DATUM_REGISTRY["27700"]
    o_lon = 1 + 43 / 60 + 4.5177 / 3600     # OSGB36
    o_lat = 52 + 39 / 60 + 27.2531 / 3600
    t_lon = 1 + 42 / 60 + 57.8663 / 3600    # ETRS89 (OSTN truth)
    t_lat = 52 + 39 / 60 + 28.8282 / 3600
    lon, lat = d.to_wgs84(np.array([o_lon]), np.array([o_lat]))
    dm = np.hypot((lon[0] - t_lon) * np.cos(np.radians(t_lat)) * 111320,
                  (lat[0] - t_lat) * 111320)
    assert dm < 4.0
    shift = np.hypot((lon[0] - o_lon) * np.cos(np.radians(o_lat)) * 111320,
                     (lat[0] - o_lat) * 111320)
    assert shift > 100.0
    # exact-matrix inverse closes to the dropped-height second-order
    # residual (~1.5 mm here) — well inside the cm bar
    lon2, lat2 = d.from_wgs84(lon, lat)
    assert abs(lon2[0] - o_lon) < 1e-7 and abs(lat2[0] - o_lat) < 1e-7


def test_utm_delegation_bit_identical_to_series_constants():
    """UTM now routes through the generic _TM class; the results must
    be bit-identical to the historical direct-series formulation (the
    warp gates pin these values)."""
    rng = np.random.default_rng(47)
    lon = rng.uniform(-3, 3, 1000) + crs.utm_zone_lon0(31)
    lat = rng.uniform(-80, 84, 1000)
    E1, N1 = crs.lonlat_to_utm_np(lon, lat, 31)
    lam = np.radians(lon - crs.utm_zone_lon0(31))
    phi = np.radians(lat)
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - crs._E * np.arctanh(crs._E * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi, eta = xi_p.copy(), eta_p.copy()
    for j, a in enumerate(crs._ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    np.testing.assert_array_equal(E1, crs._E0 + crs._K0 * crs._ABAR * eta)
    np.testing.assert_array_equal(N1, crs._K0 * crs._ABAR * xi + 0.0)


def test_tm_gate_routing_margin():
    """Same audit as the LCC/stereo/albers gates, for the EPSG:27700
    warp branch."""
    from gdal_spark.queries_raster import TM_GT, TM_H, TM_W, TILE, ZOOM
    from gdal_spark.raster import grid as G
    from gdal_spark.raster import warp as W

    src = G.world_3857(ZOOM, TILE)
    dst = G.GridSpec(TM_W, TM_H, TM_GT, crs="EPSG:27700", tile=128)
    gy, gx = np.mgrid[0:TM_H, 0:TM_W]
    spx, spy = W._dst_pos_in_src_px(dst, src, gx.ravel().astype(float),
                                    gy.ravel().astype(float))
    for sp in (spx, spy):
        inside = (sp > -0.5) & (sp < src.width + 0.5)
        frac = np.abs(sp[inside] - np.round(sp[inside]))
        assert frac.min() > 1e-6, f"routing margin too small: {frac.min()}"
