"""VRT virtual-raster driver (raster/vrt.py) vs frmts/vrt semantics."""

import numpy as np
import pytest

from gdal_spark.raster import geotiff as GT
from gdal_spark.raster import grid as G
from gdal_spark.raster import vrt as V


def _make_tif(spark, path, full, x0, y0, res=0.5):
    h, w = full.shape
    spec = G.GridSpec(w, h, (x0, res, 0.0, y0, 0.0, -res), tile=16)
    rows = []
    for ty in range(spec.tiles_y):
        for tx in range(spec.tiles_x):
            th, tw = spec.tile_shape(ty, tx)
            rows.append((ty, tx, full[ty * 16:ty * 16 + th,
                                      tx * 16:tx * 16 + tw]
                         .astype(float).ravel().tolist()))
    df = spark.createDataFrame(rows, G.TILE_SCHEMA)
    GT.write_geotiff(df, spec, path, dtype="float64")
    return spec


def _canvas(spec, tiles):
    out = np.zeros((spec.height, spec.width))
    for r in tiles.collect():
        h, w = spec.tile_shape(r.tile_y, r.tile_x)
        out[r.tile_y * spec.tile:r.tile_y * spec.tile + h,
            r.tile_x * spec.tile:r.tile_x * spec.tile + w] = \
            np.asarray(r.px).reshape(h, w)
    return out


def test_build_and_read_vrt_mosaic(spark, tmp_path):
    """gdalbuildvrt + VRT read: two overlapping tiles mosaic with
    later-source-wins painting (vrtsources draw order)."""
    rng = np.random.default_rng(3)
    a = rng.integers(1, 100, (32, 48)).astype(float)
    b = rng.integers(100, 200, (32, 48)).astype(float)
    pa = str(tmp_path / "a.tif")
    pb = str(tmp_path / "b.tif")
    _make_tif(spark, pa, a, x0=10.0, y0=55.0)
    # b starts 24 px right and 16 px down of a (overlaps a's right half)
    _make_tif(spark, pb, b, x0=10.0 + 24 * 0.5, y0=55.0 - 16 * 0.5)
    vp = V.build_vrt(str(tmp_path / "m.vrt"), [pa, pb])
    spec, tiles = V.read_vrt(spark, vp)
    assert (spec.width, spec.height) == (72, 48)
    assert spec.gt[0] == 10.0 and spec.gt[3] == 55.0
    got = _canvas(spec, tiles)
    want = np.zeros((48, 72))
    want[0:32, 0:48] = a
    want[16:48, 24:72] = b          # later source paints over
    np.testing.assert_array_equal(got, want)


def test_vrt_src_dst_rect_windows(spark, tmp_path):
    """Hand-written VRT with an explicit SrcRect window and
    ComplexSource ScaleRatio/ScaleOffset."""
    full = np.arange(32 * 32, dtype=float).reshape(32, 32)
    p = str(tmp_path / "src.tif")
    _make_tif(spark, p, full, x0=0.0, y0=16.0)
    vrt = f"""<VRTDataset rasterXSize="20" rasterYSize="12">
  <GeoTransform>0.0, 0.5, 0.0, 16.0, 0.0, -0.5</GeoTransform>
  <VRTRasterBand dataType="Float64" band="1">
    <NoDataValue>-1</NoDataValue>
    <ComplexSource>
      <SourceFilename relativeToVRT="0">{p}</SourceFilename>
      <SourceBand>1</SourceBand>
      <SrcRect xOff="4" yOff="6" xSize="10" ySize="8"/>
      <DstRect xOff="2" yOff="1" xSize="10" ySize="8"/>
      <ScaleRatio>2</ScaleRatio>
      <ScaleOffset>5</ScaleOffset>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>
"""
    vp = str(tmp_path / "win.vrt")
    open(vp, "w").write(vrt)
    spec, tiles = V.read_vrt(spark, vp)
    got = _canvas(spec, tiles)
    want = np.full((12, 20), -1.0)
    want[1:9, 2:12] = full[6:14, 4:14] * 2 + 5
    np.testing.assert_array_equal(got, want)


def test_vrt_resampling_source_fenced(spark, tmp_path):
    full = np.ones((16, 16))
    p = str(tmp_path / "s.tif")
    _make_tif(spark, p, full, x0=0.0, y0=8.0)
    vrt = f"""<VRTDataset rasterXSize="32" rasterYSize="32">
  <GeoTransform>0.0, 0.25, 0.0, 8.0, 0.0, -0.25</GeoTransform>
  <VRTRasterBand dataType="Float64" band="1">
    <SimpleSource>
      <SourceFilename relativeToVRT="0">{p}</SourceFilename>
      <SrcRect xOff="0" yOff="0" xSize="16" ySize="16"/>
      <DstRect xOff="0" yOff="0" xSize="32" ySize="32"/>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>
"""
    vp = str(tmp_path / "r.vrt")
    open(vp, "w").write(vrt)
    with pytest.raises(NotImplementedError, match="resampling"):
        V.read_vrt(spark, vp)


def test_build_vrt_mixed_resolution_fenced(spark, tmp_path):
    a = np.ones((16, 16))
    pa = str(tmp_path / "a.tif")
    pb = str(tmp_path / "b.tif")
    _make_tif(spark, pa, a, 0.0, 8.0, res=0.5)
    _make_tif(spark, pb, a, 0.0, 8.0, res=0.25)
    with pytest.raises(NotImplementedError, match="resolution"):
        V.build_vrt(str(tmp_path / "x.vrt"), [pa, pb])


def test_gdal_translate_reads_vrt(spark, tmp_path):
    """The CLI analogs open VRTs through the raster dispatch."""
    from gdal_spark.raster.translate import gdal_translate
    from gdal_spark.utilities import gdalinfo

    a = np.arange(256, dtype=float).reshape(16, 16)
    pa = str(tmp_path / "a.tif")
    _make_tif(spark, pa, a, 0.0, 8.0)
    vp = V.build_vrt(str(tmp_path / "m.vrt"), [pa])
    out = str(tmp_path / "out.tif")
    gdal_translate(spark, vp, out)
    spec, tiles = GT.read_geotiff(spark, out)
    np.testing.assert_array_equal(_canvas(spec, tiles), a)
    info = gdalinfo(spark, vp)
    assert info["size"] == [16, 16] or info["size"] == (16, 16)
