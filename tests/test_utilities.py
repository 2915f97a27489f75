"""Classic GDAL/OGR utilities as file-to-file compositions
(gdal_spark/utilities.py) + st_transform."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import utilities as U
from gdal_spark.geo import crs as CRS
from gdal_spark.geo import geom, wkb
from gdal_spark.raster import geotiff as GT
from gdal_spark.raster import grid as G
from gdal_spark.sources import registry as REG

TS = 16


def test_st_transform_any_geometry(spark):
    from gdal_spark.functions.st_funcs import st_transform_fn

    sq = [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)]
    df = spark.createDataFrame(
        [(1, wkb.point(10.0, 50.0)), (2, wkb.polygon(sq))],
        "id int, geom binary")
    tr = st_transform_fn("EPSG:4326", "EPSG:3857")
    rows = {r.id: bytes(r.g) for r in
            df.select("id", tr(F.col("geom")).alias("g")).collect()}
    x, y = CRS.transform_np("EPSG:4326", "EPSG:3857",
                            np.array([10.0]), np.array([50.0]))
    t, (px, py) = wkb.decode(rows[1])
    assert (px, py) == (x[0], y[0])
    t2, rings = wkb.decode(rows[2])
    assert t2 == wkb.POLYGON
    # corners transform exactly like the scalar path
    cx, cy = CRS.transform_np("EPSG:4326", "EPSG:3857",
                              sq[0][:, 0], sq[0][:, 1])
    np.testing.assert_array_equal(rings[0][:, 0], cx)
    np.testing.assert_array_equal(rings[0][:, 1], cy)


def _vec_fixture(spark, tmp_path):
    sq = [np.array([[0.5, 0.5], [4.5, 0.5], [4.5, 4.5], [0.5, 4.5],
                    [0.5, 0.5]], float)]
    tri = [np.array([[6.0, 6.0], [9.0, 6.0], [7.5, 9.0], [6.0, 6.0]],
                    float)]
    df = spark.createDataFrame(
        [(1, "a", 3.0, wkb.polygon(sq)), (2, "b", 7.0, wkb.polygon(tri))],
        "fid long, name string, val double, geom binary")
    p = str(tmp_path / "src.geojsonl")
    REG.write_vector(df, p)
    return p


def test_ogr2ogr_filter_select_transform(spark, tmp_path):
    src = _vec_fixture(spark, tmp_path)
    dst = str(tmp_path / "out.geojsonl")
    out = U.ogr2ogr(spark, src, dst, where="val > 5", select=["name"],
                    t_srs="EPSG:3857")
    assert set(out.columns) == {"name", "geom"}
    back = REG.open_vector(spark, dst)
    rows = back.collect()
    assert [r.name for r in rows] == ["b"]
    t, rings = wkb.decode(bytes(rows[0].geom))
    # now in metres: web-mercator x of lon 6 deg
    assert abs(rings[0][:, 0].max()) > 600_000


def test_ogr2ogr_clipsrc(spark, tmp_path):
    src = _vec_fixture(spark, tmp_path)
    dst = str(tmp_path / "clip.geojsonl")
    # window covers only the square feature (a)
    out = U.ogr2ogr(spark, src, dst, clipsrc=(0.0, 0.0, 5.0, 5.0))
    rows = REG.open_vector(spark, dst).collect()
    assert [r.name for r in rows] == ["a"]
    t, rings = wkb.decode(bytes(rows[0].geom))
    assert geom.polygon_area(rings) == pytest.approx(16.0)  # unclipped
    # a tighter window clips the square itself
    out2 = U.ogr2ogr(spark, src, str(tmp_path / "c2.geojsonl"),
                     clipsrc=(0.0, 0.0, 2.5, 2.5))
    [r2] = REG.open_vector(spark, str(tmp_path / "c2.geojsonl")).collect()
    t2, rings2 = wkb.decode(bytes(r2.geom))
    assert geom.polygon_area(rings2) == pytest.approx(4.0)  # 2x2 corner


def test_ogr2ogr_sql_mode(spark, tmp_path):
    src = _vec_fixture(spark, tmp_path)
    dst = str(tmp_path / "sql.geojsonl")
    out = U.ogr2ogr(
        spark, src, dst,
        sql="SELECT name, val * 2 AS dv, geom FROM src_layer "
            "WHERE fid = 1")
    [r] = REG.open_vector(spark, dst).collect()
    assert (r.name, r.dv) == ("a", 6.0)


def test_rasterize_then_polygonize_roundtrip(spark, tmp_path):
    src = _vec_fixture(spark, tmp_path)
    tif = str(tmp_path / "burn.tif")
    spec = G.GridSpec(width=TS * 2, height=TS * 2,
                      gt=(0.0, 0.3125, 0.0, 10.0, 0.0, -0.3125),
                      crs="EPSG:4326", tile=TS)
    U.gdal_rasterize(spark, src, tif, spec, attribute="val")
    spec2, tiles = GT.read_geotiff(spark, tif)
    vals = np.concatenate([np.asarray(r.px) for r in tiles.collect()])
    assert set(np.unique(vals)) == {0.0, 3.0, 7.0}

    vec = str(tmp_path / "polys.geojsonl")
    out = U.gdal_polygonize(spark, tif, vec)
    back = REG.open_vector(spark, vec)
    dn = sorted(r.DN for r in back.collect())
    # zero is the background/mask value (the utility's default nodata
    # skip), so only the burned components emit features
    assert dn == [3.0, 7.0]
    # burned areas: polygon pixel counts match the raster
    npx = {r.DN: r.n_px for r in back.collect()}
    assert npx[3.0] == (vals == 3.0).sum()
    assert npx[7.0] == (vals == 7.0).sum()


def test_contour_interval_mode(spark, tmp_path):
    spec = G.GridSpec(width=TS * 2, height=TS,
                      gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                      crs="EPSG:4326", tile=TS)
    # smooth ramp 0..31 across x
    rows = []
    for tx in range(2):
        h, w = spec.tile_shape(0, tx)
        a = np.tile(np.arange(tx * TS, tx * TS + w, dtype=float), (h, 1))
        rows.append((0, tx, a.ravel().tolist()))
    tiles = spark.createDataFrame(rows, G.TILE_SCHEMA)
    tif = str(tmp_path / "ramp.tif")
    GT.write_geotiff(tiles, spec, tif)
    vec = str(tmp_path / "contours.geojsonl")
    out = U.gdal_contour(spark, tif, vec, interval=8.0)
    levels = sorted({r.ELEV for r in REG.open_vector(spark, vec)
                     .collect()})
    assert levels == [8.0, 16.0, 24.0]


def test_ogrinfo_summary(spark, tmp_path):
    src = _vec_fixture(spark, tmp_path)
    info = U.ogrinfo(spark, src)
    assert info["feature_count"] == 2
    assert info["geometry_types"] == {"POLYGON": 2}
    assert info["fields"]["name"] == "string"
    x0, y0, x1, y1 = info["extent"]
    assert (x0, y0) == (0.5, 0.5) and (x1, y1) == (9.0, 9.0)


def test_gdalinfo_merge_locationinfo(spark, tmp_path):
    spec = G.GridSpec(width=TS * 2, height=TS,
                      gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                      crs="EPSG:4326", tile=TS)
    a = str(tmp_path / "a.tif")
    b = str(tmp_path / "b.tif")
    t1 = spark.createDataFrame([(0, 0, [5.0] * (TS * TS))], G.TILE_SCHEMA)
    t2 = spark.createDataFrame([(0, 0, [9.0] * (TS * TS)),
                                (0, 1, [2.0] * (TS * TS))], G.TILE_SCHEMA)
    GT.write_geotiff(t1, spec, a)
    GT.write_geotiff(t2, spec, b)

    info = U.gdalinfo(spark, a, stats=True)
    assert info["size"] == (32, 16) and info["crs"] == "EPSG:4326"
    assert info["bands"] == 1 and info["overviews"] == 0
    assert info["corner_lr"] == (32.0, -16.0)
    assert info["stats"]["max"] == 5.0  # right tile is implicit fill 0

    m = str(tmp_path / "m.tif")
    U.gdal_merge(spark, [a, b], m, method="max")
    _, tiles = GT.read_geotiff(spark, m)
    got = {(r.tile_y, r.tile_x): np.asarray(r.px).max()
           for r in tiles.collect()}
    assert got[(0, 0)] == 9.0 and got[(0, 1)] == 2.0

    # sample pixel centers: (0.5,-0.5) in tile (0,0), (20.5,-0.5) in (0,1)
    vals = U.gdallocationinfo(spark, m, [(0.5, -0.5), (20.5, -0.5)])
    assert vals == [9.0, 2.0]

    with pytest.raises(ValueError, match="share one grid"):
        other = G.GridSpec(width=TS, height=TS,
                           gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                           crs="EPSG:4326", tile=TS)
        c = str(tmp_path / "c.tif")
        GT.write_geotiff(t1, other, c)
        U.gdal_merge(spark, [a, c], str(tmp_path / "x.tif"))


def test_gdaldem_slope(spark, tmp_path):
    spec = G.GridSpec(width=TS, height=TS,
                      gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                      crs="EPSG:4326", tile=TS)
    a = np.tile(np.arange(TS, dtype=float), (TS, 1))  # constant dz/dx=1
    tiles = spark.createDataFrame([(0, 0, a.ravel().tolist())],
                                  G.TILE_SCHEMA)
    tif = str(tmp_path / "dem.tif")
    GT.write_geotiff(tiles, spec, tif)
    out_tif = str(tmp_path / "slope.tif")
    U.gdaldem(spark, "slope", tif, out_tif)
    _, back = GT.read_geotiff(spark, out_tif)
    arr = np.vstack([np.asarray(r.px).reshape(TS, TS)
                     for r in back.collect()])
    # interior slope of a unit ramp = 45 degrees
    assert np.allclose(arr[4:-4, 4:-4], 45.0)
    with pytest.raises(ValueError, match="mode"):
        U.gdaldem(spark, "bogus", tif, out_tif)


def test_gdal_grid_utility(spark, tmp_path):
    """gdal_grid analog end to end: GeoJSONSeq points -> nearest and
    average surfaces -> GeoTIFF."""
    import numpy as np

    from gdal_spark.raster import geotiff as GT
    from gdal_spark.raster import grid as G
    from gdal_spark.sources import registry as REG
    from gdal_spark.functions.st_funcs import st_makepoint
    from gdal_spark.utilities import gdal_grid

    pts = spark.createDataFrame(
        [(1.5, 14.5, 10.0), (6.5, 9.5, 20.0), (12.5, 3.5, 30.0)],
        "x double, y double, z double")
    src = str(tmp_path / "pts.geojsonl")
    REG.write_vector(pts.select(
        st_makepoint("x", "y").alias("geom"), "z"), src)
    spec = G.GridSpec(16, 16, (0.0, 1.0, 0.0, 16.0, 0.0, -1.0), tile=16)
    dst = str(tmp_path / "near.tif")
    gdal_grid(spark, src, dst, spec, algorithm="nearest", zfield="z",
              radius=100.0)
    _, tiles = GT.read_geotiff(spark, dst)
    canvas = np.asarray(tiles.collect()[0]["px"]).reshape(16, 16)
    assert canvas[1, 1] == 10.0 and canvas[12, 12] == 30.0
    assert set(np.unique(canvas)) == {10.0, 20.0, 30.0}
    dst2 = str(tmp_path / "cnt.tif")
    gdal_grid(spark, src, dst2, spec, algorithm="count", zfield="z",
              radius1=100.0, nodata=-1.0)
    _, t2 = GT.read_geotiff(spark, dst2)
    c2 = np.asarray(t2.collect()[0]["px"]).reshape(16, 16)
    assert (c2 == 3.0).all()


def test_rgb2pct_pct2rgb_roundtrip(spark, tmp_path):
    import numpy as np

    from gdal_spark.raster import geotiff as GT
    from gdal_spark.raster import grid as G
    from gdal_spark.utilities import pct2rgb, rgb2pct

    spec = G.GridSpec(16, 16, (0.0, 1.0, 0.0, 16.0, 0.0, -1.0), tile=16)
    # 4 exact colors -> palette recovers them -> lossless roundtrip
    colors = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0],
                       [0, 0, 255]], float)
    pick = np.random.default_rng(9).integers(0, 4, (16, 16))
    bands = []
    for c in range(3):
        px = colors[pick, c]
        bands.append(spark.createDataFrame(
            [(0, 0, px.ravel().tolist())], G.TILE_SCHEMA))
    src = str(tmp_path / "rgb.tif")
    GT.write_geotiff_bands(bands, spec, src, dtype="uint8")
    dst = str(tmp_path / "idx.tif")
    pal = rgb2pct(spark, src, dst, n_colors=8)
    back = str(tmp_path / "back.tif")
    pct2rgb(spark, dst, back, pal)
    # median-cut palettes are 5-bit histogram BIN CENTERS
    # (gdalmediancut.cpp), so the roundtrip reproduces each pixel's
    # nearest palette entry, not the raw color
    d = ((colors[:, None, :] - pal[None, :, :]) ** 2).sum(-1)
    expect_idx = d.argmin(axis=1)[pick]
    _, rb = GT.read_geotiff_bands(spark, back)
    for c in range(3):
        got = np.asarray(rb[c].collect()[0]["px"]).reshape(16, 16)
        np.testing.assert_array_equal(got, pal[expect_idx, c])
    # and every palette entry stays within the 5-bit bin radius of a
    # true color
    assert np.abs(colors[pick] - pal[expect_idx]).max() <= 4


def test_sieve_proximity_fillnodata_viewshed_utilities(spark, tmp_path):
    """The four remaining classic wrappers run file-to-file."""
    import numpy as np

    from gdal_spark.raster import geotiff as GT
    from gdal_spark.raster import grid as G
    from gdal_spark.utilities import (gdal_fillnodata, gdal_proximity,
                                      gdal_sieve, gdal_viewshed)

    spec = G.GridSpec(16, 16, (0.0, 1.0, 0.0, 16.0, 0.0, -1.0), tile=16)
    canvas = np.zeros((16, 16))
    canvas[4:8, 4:8] = 7.0      # 16-px blob survives sieve
    canvas[8, 4] = 3.0          # 1-px appendage merges into the blob
    src = str(tmp_path / "s.tif")
    GT.write_geotiff(spark.createDataFrame(
        [(0, 0, canvas.ravel().tolist())], G.TILE_SCHEMA), spec, src)

    out = str(tmp_path / "sieved.tif")
    gdal_sieve(spark, src, out, threshold=2)
    _, t = GT.read_geotiff(spark, out)
    got = np.asarray(t.collect()[0]["px"]).reshape(16, 16)
    assert got[8, 4] == 7.0 and got[5, 5] == 7.0

    out = str(tmp_path / "prox.tif")
    gdal_proximity(spark, src, out)
    _, t = GT.read_geotiff(spark, out)
    got = np.asarray(t.collect()[0]["px"]).reshape(16, 16)
    assert got[4, 4] == 0.0 and got[4, 3] == 1.0

    holes = canvas.copy()
    holes[0, 0] = -9.0
    srch = str(tmp_path / "h.tif")
    GT.write_geotiff(spark.createDataFrame(
        [(0, 0, holes.ravel().tolist())], G.TILE_SCHEMA), spec, srch)
    out = str(tmp_path / "filled.tif")
    gdal_fillnodata(spark, srch, out, nodata=-9.0)
    _, t = GT.read_geotiff(spark, out)
    got = np.asarray(t.collect()[0]["px"]).reshape(16, 16)
    assert got[0, 0] != -9.0

    out = str(tmp_path / "vs.tif")
    gdal_viewshed(spark, src, out, ox=0, oy=0, obs_height=50.0)
    _, t = GT.read_geotiff(spark, out)
    got = np.asarray(t.collect()[0]["px"]).reshape(16, 16)
    assert got[0, 0] == 1.0 and set(np.unique(got)) <= {0.0, 1.0}


def test_contour_polygonize_mode(spark, tmp_path):
    """gdal_contour -p: iso-POLYGON features partition the frame; the
    cone's middle band is an annulus (one hole)."""
    spec = G.GridSpec(width=TS, height=TS,
                      gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                      crs="EPSG:4326", tile=TS)
    gy, gx = np.mgrid[0:TS, 0:TS]
    c = (TS / 2.0 - np.hypot(gx - TS / 2 + 0.5, gy - TS / 2 + 0.5)).clip(0)
    tiles = spark.createDataFrame(
        [(0, 0, c.ravel().tolist())], G.TILE_SCHEMA)
    tif = str(tmp_path / "cone.tif")
    GT.write_geotiff(tiles, spec, tif)
    vec = str(tmp_path / "isopoly.geojsonl")
    out = U.gdal_contour(spark, tif, vec, levels=[TS / 4.0],
                         polygonize=True).collect()
    assert len(out) == 2
    by_min = {r.ELEV_MIN: r for r in out}
    lo, hi = by_min[float("-inf")], by_min[TS / 4.0]
    assert hi.ELEV_MAX == float("inf") and hi.n_holes == 0
    assert lo.ELEV_MAX == TS / 4.0 and lo.n_holes == 1
    assert abs(lo.area + hi.area - (TS - 1) ** 2) < 1e-9
