"""`gdal raster pipeline` fluent chain (raster/rpipeline.py;
apps/gdalalg_raster_pipeline.cpp:174-241 step registry analog)."""

import numpy as np
import pytest

from gdal_spark.raster import geotiff as GT
from gdal_spark.raster import grid as G
from gdal_spark.raster.rpipeline import RSTEPS, RasterPipeline

TS = 16


def _src(spark, tmp_path):
    spec = G.GridSpec(width=TS * 2, height=TS * 2,
                      gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                      crs="EPSG:4326", tile=TS)
    rows = []
    for ty in range(2):
        for tx in range(2):
            base = float(10 * (2 * ty + tx) + 1)
            rows.append((ty, tx, [base] * (TS * TS)))
    tiles = spark.createDataFrame(rows, G.TILE_SCHEMA)
    p = str(tmp_path / "src.tif")
    GT.write_geotiff(tiles, spec, p)
    return p, spec


def test_chain_read_clip_resize_scale_write(spark, tmp_path):
    p, spec = _src(spark, tmp_path)
    out = str(tmp_path / "out.tif")
    pipe = (RasterPipeline.read(spark, p)
            .step("clip", x0=0, y0=0, w=TS * 2, h=TS)
            .step("resize", w=TS, h=TS // 2, kernel="near")
            .step("scale", src_min=0.0, src_max=100.0)
            .write(out))
    spec2, tiles2 = GT.read_geotiff(spark, out)
    assert (spec2.width, spec2.height) == (TS, TS // 2)
    vals = np.unique(np.concatenate(
        [np.asarray(r.px) for r in tiles2.collect()]))
    # top row values 1 and 11 scaled /100
    np.testing.assert_allclose(sorted(vals), [0.01, 0.11])


def test_chain_reproject_and_overview(spark, tmp_path):
    p, spec = _src(spark, tmp_path)
    pipe = (RasterPipeline.read(spark, p)
            .step("reproject", dst_crs="EPSG:3857", tile=TS))
    assert pipe.spec.crs == "EPSG:3857"
    ov = pipe.step("overview", kernel="near")
    assert ov.spec.width == -(-pipe.spec.width // 2)

    with pytest.raises(ValueError, match="unknown raster step"):
        pipe.step("bogus")


def test_as_features_and_compare(spark, tmp_path):
    from gdal_spark.geo import wkb
    from gdal_spark.raster.rpipeline import as_features, compare

    spec = G.GridSpec(width=TS, height=TS,
                      gt=(100.0, 2.0, 0.0, 50.0, 0.0, -2.0),
                      crs="EPSG:4326", tile=TS)
    a = np.zeros((TS, TS))
    a[3, 5] = 7.0
    a[10, 2] = 9.0
    ta = spark.createDataFrame([(0, 0, a.ravel().tolist())],
                               G.TILE_SCHEMA)
    feats = as_features(ta, spec).collect()
    assert len(feats) == 2  # background skipped
    by_val = {r.value: r for r in feats}
    assert (by_val[7.0].px_x, by_val[7.0].px_y) == (5, 3)
    t, rings = wkb.decode(bytes(by_val[7.0].geom))
    assert t == wkb.POLYGON
    # pixel footprint corners in world coords
    assert rings[0][0].tolist() == [100.0 + 5 * 2.0, 50.0 - 3 * 2.0]
    pts = as_features(ta, spec, geometry="point").collect()
    tp, (cx, cy) = wkb.decode(bytes(
        {r.value: r for r in pts}[9.0].geom))
    assert tp == wkb.POINT and (cx, cy) == (100 + 2.5 * 2, 50 - 10.5 * 2)

    b = a.copy()
    b[0, 0] = 1.0
    tb = spark.createDataFrame([(0, 0, b.ravel().tolist())],
                               G.TILE_SCHEMA)
    same = compare(ta, ta)
    assert same["identical"] and same["n_px"] == TS * TS
    d = compare(ta, tb)
    assert not d["identical"] and d["n_diff"] == 1 and d["max_abs"] == 1.0


def test_blend_modes(spark):
    from gdal_spark.raster.rpipeline import blend

    base = spark.createDataFrame([(0, 0, [100.0] * 4),
                                  (0, 1, [50.0] * 4)], G.TILE_SCHEMA)
    over = spark.createDataFrame([(0, 0, [200.0] * 4),
                                  (1, 0, [30.0] * 4)], G.TILE_SCHEMA)

    def val(df, ty, tx):
        return {(r.tile_y, r.tile_x): r.px[0] for r in df.collect()}[
            (ty, tx)]

    assert val(blend(base, over), 0, 0) == 200.0  # src-over full opacity
    assert val(blend(base, over, opacity=50.0), 0, 0) == 150.0
    assert val(blend(base, over, mode="multiply"), 0, 0) == \
        pytest.approx(100 * 200 / 255)
    assert val(blend(base, over, mode="darken"), 0, 0) == 100.0
    assert val(blend(base, over, mode="lighten"), 0, 0) == 200.0
    assert val(blend(base, over, mode="screen"), 0, 0) == \
        pytest.approx(255 - (255 - 100) * (255 - 200) / 255)
    # pass-through where a side is missing
    out = blend(base, over, mode="multiply")
    assert val(out, 0, 1) == 50.0 and val(out, 1, 0) == 30.0
    with pytest.raises(ValueError, match="mode"):
        blend(base, over, mode="bogus")


def test_create_unscale_nodata_stack(spark, tmp_path):
    from gdal_spark.raster.rpipeline import create, stack

    spec = G.GridSpec(width=40, height=35,
                      gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                      crs="EPSG:4326", tile=TS)
    p = create(spark, spec, value=3.0)
    assert p.tiles.count() == spec.tiles_x * spec.tiles_y
    # edge tiles carry their true (smaller) pixel counts
    sizes = {(r.tile_y, r.tile_x): len(r.px) for r in p.tiles.collect()}
    assert sizes[(0, 0)] == TS * TS
    assert sizes[(2, 2)] == 3 * 8  # 35-32=3 rows, 40-32=8 cols

    q = (p.step("unscale", scale=2.0, offset=1.0)
          .step("nodata-edit", src=7.0, dst=-1.0))
    vals = set()
    for r in q.tiles.collect():
        vals.update(r.px)
    assert vals == {-1.0}  # 3*2+1=7 -> all replaced

    out = str(tmp_path / "stacked.tif")
    stack([p, q], out)
    spec2, dfs = GT.read_geotiff_bands(spark, out)
    assert len(dfs) == 2
    assert np.asarray(dfs[0].collect()[0].px).max() == 3.0
    assert np.asarray(dfs[1].collect()[0].px).min() == -1.0


def test_step_registry_contents():
    assert {"clip", "resize", "reproject", "calc", "scale",
            "reclassify", "color-map", "slope", "aspect", "hillshade",
            "sieve", "fill-nodata", "overview"} <= set(RSTEPS)
