"""Baseline JPEG codec (raster/jpeg.py) vs ITU-T T.81 semantics, plus
the multimodal ingest hook."""

import os

import numpy as np
import pytest

from gdal_spark.raster import jpeg as J


def _brute_idct(B):
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.5) if u == 0 else 1.0
                    cv = np.sqrt(0.5) if v == 0 else 1.0
                    s += (cu * cv * B[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            out[x, y] = s / 4.0
    return out


def test_idct_matches_definition():
    rng = np.random.default_rng(2)
    blocks = rng.uniform(-500, 500, (8, 8, 8))
    got = J.idct2(blocks)
    want = np.stack([_brute_idct(b) for b in blocks])
    assert np.abs(got - want).max() < 1e-9
    # dct2 inverts idct2 (orthonormal pair)
    assert np.abs(J.dct2(J.idct2(blocks)) - blocks).max() < 1e-9


def _smooth(shape, seed):
    rng = np.random.default_rng(seed)
    base = np.cumsum(np.cumsum(rng.normal(0, 1, shape), 0), 1)
    return np.clip(base * 3 + 128, 0, 255).astype(np.uint8)


def test_gray_roundtrip_quality_monotone():
    img = _smooth((48, 40), 7)
    errs = []
    for q in (95, 75, 40):
        dec = J.decode_jpeg(J.encode_jpeg(img, quality=q))
        assert dec.shape == (48, 40, 1)
        errs.append(np.abs(dec[:, :, 0].astype(float) - img).mean())
    assert errs[0] < 1.5 and errs[0] <= errs[1] <= errs[2]


def test_rgb_444_and_420_roundtrip():
    img = np.stack([_smooth((40, 56), 1), _smooth((40, 56), 2),
                    _smooth((40, 56), 3)], axis=2)
    for sub, tol in ((False, 6.0), (True, 12.0)):
        dec = J.decode_jpeg(J.encode_jpeg(img, quality=90, subsample=sub))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(float) - img).mean() < tol


def test_non_multiple_of_8_and_odd_sizes():
    for shape in ((17, 23), (8, 9), (31, 64)):
        img = _smooth(shape, 11)
        dec = J.decode_jpeg(J.encode_jpeg(img, quality=90))
        assert dec.shape == (*shape, 1)
        # 4:2:0 pads to 16-multiples internally; dims must still crop
        rgb = np.stack([img] * 3, axis=2)
        dec = J.decode_jpeg(J.encode_jpeg(rgb, quality=90, subsample=True))
        assert dec.shape == rgb.shape


def test_block_constant_exact_reconstruction_q75():
    """Luma DC quantizer is exactly 8 at quality 75, so 8x8-block-
    constant grayscale reconstructs EXACTLY (the multimodal gate's
    oracle premise)."""
    rng = np.random.default_rng(13)
    blocks = rng.integers(0, 256, (3, 4))
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=75))
    np.testing.assert_array_equal(dec[:, :, 0], img)


def test_arithmetic_and_12bit_fenced():
    img = _smooth((16, 16), 5)
    enc = bytearray(J.encode_jpeg(img))
    sof = enc.find(b"\xFF\xC0")
    enc[sof + 1] = 0xC9          # pretend SOF9 arithmetic
    with pytest.raises(NotImplementedError, match="arithmetic"):
        J.decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"not a jpeg")


def test_progressive_roundtrip_bit_identical_to_baseline():
    """progressive=True re-codes the SAME quantized coefficients
    through the IJG 10-scan script (DC/AC spectral selection +
    successive approximation, per-scan optimal Huffman), so decoding
    the progressive stream must reproduce the baseline decode
    BIT-FOR-BIT — any defect in EOB runs, correction bits, point
    transforms, or scan geometry breaks equality."""
    rng = np.random.default_rng(31)
    for shape, rgb, sub, q in (((48, 40), False, False, 85),
                               ((17, 23), False, False, 90),
                               ((40, 56), True, False, 90),
                               ((41, 57), True, True, 75),
                               ((64, 64), True, True, 40)):
        img = _smooth(shape, int(rng.integers(1, 99)))
        if rgb:
            img = np.stack([img, np.roll(img, 3, 0), 255 - img], axis=2)
        base = J.decode_jpeg(J.encode_jpeg(img, quality=q, subsample=sub))
        prog = J.decode_jpeg(J.encode_jpeg(img, quality=q, subsample=sub,
                                           progressive=True))
        np.testing.assert_array_equal(base, prog)


_REF_PROG = ("/root/reference/autotest/gdrivers/data/jpeg/"
             "arcgis_geodataxform_gcp.jpg")


@pytest.mark.skipif(not os.path.exists(_REF_PROG),
                    reason="reference fixtures not present")
def test_decodes_reference_progressive_fixture():
    """A real foreign-encoder SOF2 file (six scans: DC first/refine,
    AC first at two Al levels, AC refine twice) must decode. The
    fixture is a solid-black 30x30 grayscale image (its 6 KB are
    ArcGIS XML metadata), so the pixel truth is exact."""
    arr = J.decode_jpeg(open(_REF_PROG, "rb").read())
    assert arr.shape == (30, 30, 1)
    np.testing.assert_array_equal(arr, np.zeros((30, 30, 1), np.uint8))


_REF_JPEG = "/root/reference/autotest/gdrivers/data/jpeg/albania.jpg"


@pytest.mark.skipif(not os.path.exists(_REF_JPEG),
                    reason="reference fixtures not present")
def test_decodes_reference_fixture_interop():
    """A real libjpeg-produced file (the reference's own albania.jpg
    fixture) must decode: its Huffman tables, subsampling and marker
    layout come from a foreign encoder. Pixel-exact checksums are
    deliberately not asserted — the reference's autotest itself
    accepts different checksums per libjpeg build
    (autotest/gdrivers/jpeg.py:43-47)."""
    data = open(_REF_JPEG, "rb").read()
    arr = J.decode_jpeg(data)
    h, w, c = arr.shape
    assert c == 3 and h > 100 and w > 100
    # plausible photographic statistics
    assert 20 < arr.mean() < 235 and arr.std() > 10


def test_decode_image_routes_jpeg(spark):
    from gdal_spark.operators import multimodal as MM

    img = _smooth((24, 24), 21)
    payloads = [(1, bytearray(J.encode_jpeg(img, quality=90))),
                (2, bytearray(b"\x1a\x45\xdf\xa3matroska....")),  # unknown
                (3, bytearray(b"RIFFxxxxWEBP")),       # truncated WebP
                (4, bytearray(b"\x00\x00\x00 ftypavif...."))]  # trunc AVIF
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    ok = MM.decode_image(df.filter("doc_id = 1")).collect()
    assert ok[0]["width"] == 24 and ok[0]["channels"] == 1
    with pytest.raises(Exception, match="none of PNG/JPEG/WebP"):
        MM.decode_image(df.filter("doc_id = 2")).collect()
    with pytest.raises(Exception, match="WebP"):
        MM.decode_image(df.filter("doc_id = 3")).collect()
    with pytest.raises(Exception, match="HEIF"):
        MM.decode_image(df.filter("doc_id = 4")).collect()
