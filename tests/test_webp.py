"""WebP codec (raster/webp.py, system libwebp) + multimodal routing."""

import os

import numpy as np
import pytest

from gdal_spark.raster import webp as WP


def _has_libwebp() -> bool:
    try:
        WP._webp()
        return True
    except NotImplementedError:
        return False


pytestmark = pytest.mark.skipif(not _has_libwebp(),
                                reason="libwebp not present")

_REF_WEBP = "/root/reference/autotest/gdrivers/data/webp/rgbsmall.webp"
_REF_VP8X = ("/root/reference/autotest/gdrivers/data/webp/"
             "rgbsmall_with_xmp.webp")


@pytest.mark.skipif(not os.path.exists(_REF_WEBP),
                    reason="reference fixtures not present")
def test_decodes_reference_lossy_fixture_pinned_checksum():
    """The reference's own rgbsmall.webp (lossy VP8 from a foreign
    encoder): band 1 must reproduce one of the checksums its autotest
    pins (autotest/gdrivers/webp.py:30-34 accepts {21464, 21450,
    21459} across libwebp builds)."""
    from gdal_spark.raster import checksum as CK

    arr = WP.decode(open(_REF_WEBP, "rb").read())
    assert arr.shape == (50, 50, 3)
    cs = CK.checksum_np(arr[:, :, 0].astype(np.float64))
    assert cs in (21464, 21450, 21459), cs


@pytest.mark.skipif(not os.path.exists(_REF_VP8X),
                    reason="reference fixtures not present")
def test_decodes_vp8x_container():
    arr = WP.decode(open(_REF_VP8X, "rb").read())
    assert arr.shape == (50, 50, 3)


def test_lossless_roundtrip_exact_and_alpha():
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (23, 31, 3)).astype(np.uint8)
    np.testing.assert_array_equal(WP.decode(WP.encode(rgb)), rgb)
    gray = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    out = WP.decode(WP.encode(gray))      # replicated to RGB, opaque
    assert out.shape == (16, 16, 3)
    np.testing.assert_array_equal(out[:, :, 0], gray)
    rgba = rng.integers(0, 256, (9, 7, 4)).astype(np.uint8)
    back = WP.decode(WP.encode(rgba))     # non-opaque alpha kept
    assert back.shape[2] == 4
    np.testing.assert_array_equal(back, rgba)


def test_lossy_quality_path():
    gy, gx = np.mgrid[0:48, 0:48]
    img = np.stack([(gy * 5) % 256, (gx * 5) % 256,
                    ((gx + gy) * 3) % 256], axis=2).astype(np.uint8)
    dec = WP.decode(WP.encode(img, quality=90))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(float) - img).mean() < 12.0


def test_decode_image_routes_webp(spark):
    from gdal_spark.operators import multimodal as MM

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 20, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(WP.encode(img)))], "doc_id long, payload binary")
    row = MM.decode_image(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (20, 24, 3)
    assert abs(row["mean"][0] - img[:, :, 0].mean()) < 1e-9
