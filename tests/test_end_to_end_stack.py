"""Capstone integration: one pipeline through the whole round-3 stack.

pages -> PIP join -> density raster -> GeoTIFF (COG + overviews) ->
gdaldem-style focal -> polygonize -> ogr2ogr into GeoPackage -> read
back and cross-check counts. Every hop is a public API; nothing here
is mocked.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import utilities as U
from gdal_spark.operators import pip_join
from gdal_spark.raster import density as D
from gdal_spark.raster import geotiff as GT
from gdal_spark.raster import grid as G
from gdal_spark.sources import admin, geopackage as GPKG, pages
from gdal_spark.sources import registry as REG


def test_full_stack_roundtrip(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.001"
    pts = pages.page_points(spark, sf_dir).select(
        "doc_id", "lon", "lat")
    polys = admin.admin_df(spark)

    joined = pip_join.pip_join_broadcast(pts, polys, how="inner")
    n_joined = joined.count()
    assert n_joined > 0

    # density raster at z5 on the web-mercator grid
    spec = G.world_3857(5, tile=256)
    tiles = D.density_tiles(
        joined.select("lon", "lat"), 5, 256)
    total_pts = tiles.select(
        F.sum(F.aggregate("px", F.lit(0.0),
                          lambda a, v: a + v))).collect()[0][0]
    assert int(total_pts) == n_joined  # every joined point binned once

    # GeoTIFF round trip with overviews in COG layout
    tif = str(tmp_path / "density.tif")
    GT.write_geotiff(tiles, spec, tif)
    GT.add_overviews(spark, tif, levels=(2,), cog=True)
    spec2, back = GT.read_geotiff(spark, tif)
    assert spec2 == spec
    total2 = back.select(
        F.sum(F.aggregate("px", F.lit(0.0),
                          lambda a, v: a + v))).collect()[0][0]
    assert int(total2) == n_joined  # lossless through the codec
    # the overview preserves mass under the sum kernel contract?
    # (average kernel halves linear size; just check it reads)
    s_ov, ov = GT.read_geotiff(spark, tif, overview=1)
    assert s_ov.width == -(-spec.width // 2) and ov.count() > 0

    # polygonize the occupied region and push it through ogr2ogr
    vec = str(tmp_path / "components.geojsonl")
    U.gdal_polygonize(spark, tif, vec)
    gpkg = str(tmp_path / "components.gpkg")
    U.ogr2ogr(spark, vec, gpkg, where="n_px >= 1", layer="components")
    back_v = GPKG.read_geopackage(spark, gpkg)
    n_px_total = back_v.agg(F.sum("n_px")).collect()[0][0]
    nonzero = back.select(F.sum(F.aggregate(
        "px", F.lit(0), lambda a, v: a + (v > 0).cast("int")
    ))).collect()[0][0]
    assert int(n_px_total) == int(nonzero)  # components tile the raster

    # the registry opens the gpkg transparently too
    assert REG.open_vector(spark, gpkg).count() == back_v.count()
