"""PNG codec roundtrip + per-tile PNG artifact writes."""

import numpy as np

from gdal_spark.raster import grid as G
from gdal_spark.raster import png as PNG
from gdal_spark.raster import tilewriter as TW
from tests.test_sieve import _tiles


def test_png_roundtrip_gray8():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, size=(17, 31)).astype(np.uint8)
    assert (PNG.decode(PNG.encode(a)) == a).all()


def test_png_roundtrip_gray16():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 65536, size=(32, 32)).astype(np.uint16)
    back = PNG.decode(PNG.encode(a))
    assert back.dtype == np.uint16 and (back == a).all()


def test_png_roundtrip_rgb_rgba():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(9, 13, 3)).astype(np.uint8)
    rgba = rng.integers(0, 256, size=(8, 8, 4)).astype(np.uint8)
    assert (PNG.decode(PNG.encode(rgb)) == rgb).all()
    assert (PNG.decode(PNG.encode(rgba)) == rgba).all()


def test_png_decoder_unfilters_sub_and_up():
    # hand-build a PNG using Sub (1) and Up (2) filters; the decoder
    # must reverse them (exercises externally-produced-PNG paths)
    import struct
    import zlib

    w, h = 4, 2
    row0 = bytes([10, 5, 5, 5])          # Sub-filtered: 10,15,20,25
    row1 = bytes([1, 1, 1, 1])           # Up-filtered:  11,16,21,26
    lines = b"\x01" + row0 + b"\x02" + row1
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + PNG._chunk(b"IHDR", ihdr)
           + PNG._chunk(b"IDAT", zlib.compress(lines))
           + PNG._chunk(b"IEND", b""))
    a = PNG.decode(png)
    assert a.tolist() == [[10, 15, 20, 25], [11, 16, 21, 26]]


def test_color_relief_and_rgb_png(spark, tmp_path):
    """gdaldem color-relief ramp (linear + nearest) -> RGB PNG tiles."""
    from gdal_spark.raster import calc as C

    spec = G.GridSpec(16, 16, (0, 1, 0, 16, 0, -1), tile=16)
    gy, gx = np.mgrid[0:16, 0:16]
    canvas = (gx + gy).astype(np.float64)  # values 0..30
    tiles = _tiles(spark, canvas, spec)
    ramp = [(0.0, (0, 0, 255)), (15.0, (0, 255, 0)), (30.0, (255, 0, 0))]
    rgb = C.color_relief(tiles, ramp)
    out = str(tmp_path / "rgb")
    TW.write_tiles_png_rgb(rgb, out, zoom=0, tile=16).collect()
    img = TW.read_tile_png(out, 0, 0, 0)
    assert img.shape == (16, 16, 3)
    # v=0 -> blue, v=15 -> green, v=30 -> red, midpoints interpolate
    assert tuple(img[0, 0]) == (0, 0, 255)
    assert tuple(img[7, 8]) == (0, 255, 0)     # gx+gy = 15
    assert tuple(img[15, 15]) == (255, 0, 0)
    mid = img[0, 7]  # v = 7 -> between blue and green
    assert mid[2] > 100 and mid[1] > 100 and mid[0] == 0
    # nearest mode snaps to ramp entries
    near = C.color_relief(tiles, ramp, nearest=True)
    row = near.filter("tile_y = 0 AND tile_x = 0").collect()[0]
    px0 = (row["r"][3], row["g"][3], row["b"][3])  # v=3 -> nearest stop 0
    assert px0 == (0.0, 0.0, 255.0)


def test_write_tiles_png_roundtrip(spark, tmp_path):
    spec = G.GridSpec(32, 32, (0, 1, 0, 32, 0, -1), tile=16)
    rng = np.random.default_rng(5)
    canvas = rng.integers(0, 1000, size=(32, 32)).astype(np.float64)
    tiles = _tiles(spark, canvas, spec)
    out = str(tmp_path / "tiles")
    manifest = TW.write_tiles_png(tiles, out, zoom=5, tile=16).collect()
    assert len(manifest) == 4
    for r in manifest:
        back = TW.read_tile_png(out, 5, r["tile_x"], r["tile_y"])
        sub = canvas[r["tile_y"] * 16:(r["tile_y"] + 1) * 16,
                     r["tile_x"] * 16:(r["tile_x"] + 1) * 16]
        np.testing.assert_array_equal(back.astype(np.float64), sub)
