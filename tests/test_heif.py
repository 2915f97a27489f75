"""AVIF/HEIC decode (raster/heif.py, system libheif) + routing."""

import os

import numpy as np
import pytest

from gdal_spark.raster import heif as HF


def _has_libheif() -> bool:
    try:
        HF._heif()
        return True
    except NotImplementedError:
        return False


pytestmark = pytest.mark.skipif(not _has_libheif(),
                                reason="libheif not present")

_REF_AVIF = "/root/reference/autotest/gdrivers/data/avif/byte.avif"
_REF_ANIM = ("/root/reference/autotest/gdrivers/data/avif/"
             "colors-animated-8bpc-alpha-exif-xmp.avif")
_REF_BYTE = "/root/reference/autotest/gcore/data/byte.tif"


@pytest.mark.skipif(not (os.path.exists(_REF_AVIF)
                         and os.path.exists(_REF_BYTE)),
                    reason="reference fixtures not present")
def test_avif_fixture_pixel_exact_vs_byte_tif(spark):
    """byte.avif is the losslessly-encoded AVIF of the reference's
    classic byte.tif — decode must be PIXEL-EXACT against the TIFF
    read through our own GeoTIFF driver (cross-format interop pin,
    checksum family 4672)."""
    from gdal_spark.raster import geotiff as GT

    arr = HF.decode(open(_REF_AVIF, "rb").read())
    assert arr.shape == (20, 20, 3)
    _, tiles = GT.read_geotiff(spark, _REF_BYTE)
    truth = np.asarray(tiles.collect()[0]["px"]).reshape(20, 20)
    np.testing.assert_array_equal(arr[:, :, 0].astype(np.float64), truth)
    # grayscale content: all three channels identical
    np.testing.assert_array_equal(arr[:, :, 0], arr[:, :, 1])


@pytest.mark.skipif(not os.path.exists(_REF_ANIM),
                    reason="reference fixtures not present")
def test_avif_primary_image_with_alpha():
    arr = HF.decode(open(_REF_ANIM, "rb").read())
    assert arr.ndim == 3 and arr.shape[2] == 4


def test_decode_image_routes_avif(spark):
    from gdal_spark.operators import multimodal as MM

    if not os.path.exists(_REF_AVIF):
        pytest.skip("reference fixtures not present")
    df = spark.createDataFrame(
        [(1, bytearray(open(_REF_AVIF, "rb").read()))],
        "doc_id long, payload binary")
    row = MM.decode_image(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (20, 20, 3)
