"""Warp cubic + average kernels (gdalwarper.h GRA_Cubic/GRA_Average)
pinned by independent mathematical invariants, plus the driver-free
dependency relation."""

import numpy as np

from gdal_spark.raster import grid as G
from gdal_spark.raster import warp as W
from tests.test_raster_spark import tiles_to_canvas
from tests.test_sieve import _tiles


def _ramp_canvas(h, w):
    gy, gx = np.mgrid[0:h, 0:w]
    return 3.0 * gx + 2.0 * gy + 5.0


def test_cubic_constant_preserved(spark):
    """Partition of unity: a constant raster warps to the constant
    wherever the 4x4 support is interior."""
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    dst_spec = G.GridSpec(48, 48, (2.0, 1.25, 0.0, 62.0, 0.0, -1.25),
                          crs=src_spec.crs, tile=16)
    tiles = _tiles(spark, np.full((64, 64), 7.5), src_spec)
    got = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel="cubic"),
                          dst_spec)
    np.testing.assert_allclose(got[2:-2, 2:-2], 7.5, rtol=1e-12)


def test_cubic_reproduces_linear_ramp(spark):
    """Catmull-Rom (a=-0.5) reproduces linear functions exactly."""
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    dst_spec = G.GridSpec(40, 40, (3.0, 1.3, 0.0, 61.0, 0.0, -1.3),
                          crs=src_spec.crs, tile=16)
    canvas = _ramp_canvas(64, 64)
    tiles = _tiles(spark, canvas, src_spec)
    got = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel="cubic"),
                          dst_spec)
    # expected: the ramp evaluated at each dst pixel-center's src coords
    gy, gx = np.mgrid[0:40, 0:40]
    spx, spy = W._dst_pos_in_src_px(dst_spec, src_spec,
                                    gx.ravel().astype(float),
                                    gy.ravel().astype(float))
    want = (3.0 * (spx - 0.5) + 2.0 * (spy - 0.5) + 5.0).reshape(40, 40)
    interior = (spx.reshape(40, 40) > 2) & (spx.reshape(40, 40) < 61) & \
               (spy.reshape(40, 40) > 2) & (spy.reshape(40, 40) < 61)
    np.testing.assert_allclose(got[interior], want[interior], rtol=1e-10)


def test_average_equals_block_mean_on_aligned_2x(spark):
    """An exactly-aligned 2x downsample's footprints are the 2x2 blocks,
    so GRA_Average must equal the block mean (independent oracle)."""
    rng = np.random.default_rng(8)
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    dst_spec = G.GridSpec(32, 32, (0.0, 2.0, 0.0, 64.0, 0.0, -2.0),
                          crs=src_spec.crs, tile=16)
    canvas = rng.integers(0, 100, size=(64, 64)).astype(np.float64)
    tiles = _tiles(spark, canvas, src_spec)
    got = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel="average"),
                          dst_spec)
    want = canvas.reshape(32, 2, 32, 2).mean(axis=(1, 3))
    np.testing.assert_array_equal(got, want)


def test_average_4326_to_3857_mass_plausible(spark):
    """Cross-CRS average: values stay within the source value range and
    constants are preserved."""
    src_spec = G.world_3857(1, 16)  # 32x32 world
    tiles = _tiles(spark, np.full((32, 32), 3.0), src_spec)
    dst_spec = G.world_4326(64, 32, tile=16)
    got = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel="average"),
                          dst_spec)
    # rows within the mercator lat range are fully covered (narrow
    # footprints degrade to the center pixel, GDAL-style)
    mid = got[8:24, :]
    assert (mid == 3.0).all()


def test_dep_ranges_cover_legacy_enumeration(spark):
    """The column-math dependency relation must be a superset of the
    per-tile corner enumeration (the round-1 driver loop)."""
    src_spec = G.world_3857(3, 32)   # 256px world, 8x8 tiles
    dst_spec = G.world_4326(192, 96, tile=32)
    dep = (W._dep_ranges(spark, src_spec, dst_spec).collect())
    got = {}
    for r in dep:
        got[(r["d_ty"], r["d_tx"])] = (r["sy0"], r["sy1"], r["sx0"], r["sx1"])
    # legacy enumeration (corner centers, +-1 margin)
    for ty in range(dst_spec.tiles_y):
        for tx in range(dst_spec.tiles_x):
            h, w = dst_spec.tile_shape(ty, tx)
            gx = np.array([tx * 32, tx * 32 + w - 1], float)
            gy = np.array([ty * 32, ty * 32 + h - 1], float)
            cx, cy = np.meshgrid(gx, gy)
            spx, spy = W._dst_pos_in_src_px(dst_spec, src_spec,
                                            cx.ravel(), cy.ravel())
            sx0 = int(np.floor(spx.min() - 1)) // 32
            sx1 = int(np.floor(spx.max() + 1)) // 32
            sy0 = int(np.floor(spy.min() - 1)) // 32
            sy1 = int(np.floor(spy.max() + 1)) // 32
            g = got[(ty, tx)]
            assert g[0] <= max(0, sy0) and g[1] >= min(7, sy1)
            assert g[2] <= max(0, sx0) and g[3] >= min(7, sx1)


def test_resize_is_same_crs_warp(spark):
    """resize == same-CRS warp: aligned 2x average downsample equals
    the block mean; a rotated-geotransform grid inverts correctly."""
    from gdal_spark.raster import calc as C

    rng = np.random.default_rng(14)
    spec = G.GridSpec(32, 32, (0.0, 1.0, 0.0, 32.0, 0.0, -1.0), tile=16)
    canvas = rng.integers(0, 50, (32, 32)).astype(np.float64)
    tiles = _tiles(spark, canvas, spec)
    out, dst = C.resize(tiles, spec, 16, 16, kernel="average", tile=16)
    got = tiles_to_canvas(out, dst)
    want = canvas.reshape(16, 2, 16, 2).mean(axis=(1, 3))
    np.testing.assert_array_equal(got, want)


def test_rotated_geotransform_roundtrip():
    """Full-affine inverse (GDALInvGeoTransform analog)."""
    spec = G.GridSpec(10, 10, (100.0, 2.0, 0.5, 50.0, -0.3, -1.5))
    px = np.array([0.0, 3.7, 9.2])
    py = np.array([1.0, 4.2, 8.8])
    wx, wy = spec.pixel_center_world(px, py)
    bx, by = spec.world_to_pixel(wx, wy)
    np.testing.assert_allclose(bx, px + 0.5, rtol=1e-12)
    np.testing.assert_allclose(by, py + 0.5, rtol=1e-12)


def test_crop_pixel_window(spark):
    """gdal raster clip on a non-tile-aligned pixel window: the cropped
    canvas equals the numpy slice, re-addressed from (0, 0)."""
    from gdal_spark.raster import calc as C

    rng = np.random.default_rng(15)
    spec = G.GridSpec(48, 48, (10.0, 0.5, 0.0, 20.0, 0.0, -0.5), tile=16)
    canvas = rng.integers(0, 99, (48, 48)).astype(np.float64)
    tiles = _tiles(spark, canvas, spec)
    out, nspec = C.crop(tiles, spec, x0=5, y0=9, w=30, h=21)
    assert (nspec.width, nspec.height) == (30, 21)
    # geotransform shifted to the window origin
    assert nspec.gt[0] == 10.0 + 5 * 0.5
    assert nspec.gt[3] == 20.0 - 9 * 0.5
    got = tiles_to_canvas(out, nspec)
    np.testing.assert_array_equal(got, canvas[9:30, 5:35])


def test_lanczos_constant_preserved(spark):
    """Normalized lanczos reproduces constants exactly (num/div with
    identical weight products) wherever the band is constant."""
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    dst_spec = G.GridSpec(48, 48, (2.0, 1.25, 0.0, 62.0, 0.0, -1.25),
                          crs=src_spec.crs, tile=16)
    tiles = _tiles(spark, np.full((64, 64), 7.5), src_spec)
    got = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel="lanczos"),
                          dst_spec)
    np.testing.assert_allclose(got, 7.5, rtol=1e-12)


def test_lanczos_interpolates_at_integer_alignment(spark):
    """At t = 0 every sinc hits an integer: only the center tap has
    weight 1, so an aligned identity warp reproduces the band exactly
    (interpolating-kernel property)."""
    rng = np.random.default_rng(21)
    spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    canvas = rng.integers(0, 50, size=(64, 64)).astype(np.float64)
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(W.warp(tiles, spec, spec, kernel="lanczos"), spec)
    np.testing.assert_allclose(got, canvas, atol=1e-9)


def test_lanczos_sin_poly_matches_libm():
    """The deterministic poly-sin tracks libm to ~1e-14 on the reduced
    range (so lanczos weights match true sinc to float noise)."""
    r = np.linspace(-0.5, 0.5, 10001)
    assert np.abs(W._sin_pi_np(r) - np.sin(np.pi * r)).max() < 5e-14


def test_mode_equals_block_mode_on_aligned_2x(spark):
    """Aligned 2x downsample: footprints are the 2x2 blocks, so
    GRA_Mode == block mode with ties to the smallest value."""
    rng = np.random.default_rng(9)
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    dst_spec = G.GridSpec(32, 32, (0.0, 2.0, 0.0, 64.0, 0.0, -2.0),
                          crs=src_spec.crs, tile=16)
    canvas = rng.integers(0, 4, size=(64, 64)).astype(np.float64)
    tiles = _tiles(spark, canvas, src_spec)
    got = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel="mode"),
                          dst_spec)
    blocks = canvas.reshape(32, 2, 32, 2).transpose(0, 2, 1, 3).reshape(32, 32, 4)
    want = np.zeros((32, 32))
    for i in range(32):
        for j in range(32):
            vals, cnts = np.unique(blocks[i, j], return_counts=True)
            want[i, j] = vals[int(np.argmax(cnts))]
    np.testing.assert_array_equal(got, want)


def test_cubicspline_constant_preserved(spark):
    """Normalized B-spline reproduces constants exactly (num/div with
    identical weight products), everywhere thanks to renormalization."""
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    dst_spec = G.GridSpec(48, 48, (2.0, 1.25, 0.0, 62.0, 0.0, -1.25),
                          crs=src_spec.crs, tile=16)
    tiles = _tiles(spark, np.full((64, 64), 7.5), src_spec)
    got = tiles_to_canvas(
        W.warp(tiles, src_spec, dst_spec, kernel="cubicspline"), dst_spec)
    np.testing.assert_allclose(got, 7.5, rtol=1e-12)


def test_cubicspline_smooths_not_interpolates(spark):
    """B-spline is an APPROXIMATING kernel: on an aligned identity
    warp a delta spike must spread (center weight 4/6), unlike cubic
    which interpolates it exactly."""
    spec = G.GridSpec(32, 32, (0.0, 1.0, 0.0, 32.0, 0.0, -1.0), tile=16)
    canvas = np.zeros((32, 32))
    canvas[16, 16] = 6.0
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(W.warp(tiles, spec, spec, kernel="cubicspline"),
                          spec)
    # per-axis normalized weights at t=0: center 4/6, neighbors 1/6
    np.testing.assert_allclose(got[16, 16], 6.0 * (4.0 / 6.0) ** 2,
                               rtol=1e-12)
    np.testing.assert_allclose(got[15, 16], 6.0 * (1.0 / 6.0) * (4.0 / 6.0),
                               rtol=1e-12)


def test_quantile_order_and_minmax(spark):
    """min <= q1 <= med <= q3 <= max pointwise, and on an aligned 2x
    downsample each equals the block statistic computed directly
    (index rule: sorted[ceil(q*n - 1)])."""
    rng = np.random.default_rng(12)
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    dst_spec = G.GridSpec(32, 32, (0.0, 2.0, 0.0, 64.0, 0.0, -2.0),
                          crs=src_spec.crs, tile=16)
    canvas = rng.integers(0, 100, size=(64, 64)).astype(np.float64)
    tiles = _tiles(spark, canvas, src_spec)
    got = {k: tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel=k),
                              dst_spec)
           for k in ("min", "q1", "med", "q3", "max")}
    assert (got["min"] <= got["q1"]).all()
    assert (got["q1"] <= got["med"]).all()
    assert (got["med"] <= got["q3"]).all()
    assert (got["q3"] <= got["max"]).all()
    blocks = canvas.reshape(32, 2, 32, 2).transpose(0, 2, 1, 3).reshape(32, 32, 4)
    s = np.sort(blocks, axis=2)
    np.testing.assert_array_equal(got["min"], s[:, :, 0])
    np.testing.assert_array_equal(got["max"], s[:, :, 3])
    for k, q in (("q1", 0.25), ("med", 0.5), ("q3", 0.75)):
        idx = max(int(np.ceil(q * 4 - 1)), 0)
        np.testing.assert_array_equal(got[k], s[:, :, idx])


def test_rms_vs_average_inequality_and_block_value(spark):
    """rms >= average pointwise (Cauchy-Schwarz, nonneg band); on the
    aligned 2x downsample rms equals sqrt(mean of squares) directly."""
    rng = np.random.default_rng(13)
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    dst_spec = G.GridSpec(32, 32, (0.0, 2.0, 0.0, 64.0, 0.0, -2.0),
                          crs=src_spec.crs, tile=16)
    canvas = rng.integers(0, 100, size=(64, 64)).astype(np.float64)
    tiles = _tiles(spark, canvas, src_spec)
    rms = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel="rms"),
                          dst_spec)
    avg = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel="average"),
                          dst_spec)
    assert (rms >= avg - 1e-12).all()
    blocks = canvas.reshape(32, 2, 32, 2).transpose(0, 2, 1, 3).reshape(32, 32, 4)
    want = np.sqrt((blocks ** 2).mean(axis=2))
    np.testing.assert_allclose(rms, want, rtol=1e-12)


def test_sum_preserves_total_mass(spark):
    """GWKSumPreserving's defining property: the global sum is
    preserved when the dst grid's source-space footprints tile the
    source raster (here: same CRS, non-aligned fractional-overlap
    resample)."""
    rng = np.random.default_rng(14)
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    # dst covers the full src extent with an irrational-ish pixel size
    dst_spec = G.GridSpec(40, 40, (0.0, 1.6, 0.0, 64.0, 0.0, -1.6),
                          crs=src_spec.crs, tile=20)
    canvas = rng.integers(0, 100, size=(64, 64)).astype(np.float64)
    tiles = _tiles(spark, canvas, src_spec)
    got = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel="sum"),
                          dst_spec)
    np.testing.assert_allclose(got.sum(), canvas.sum(), rtol=1e-9)


def test_sum_aligned_2x_equals_block_sum(spark):
    """Aligned 2x downsample: each dst footprint is exactly a 2x2
    block, so sum == block sum exactly."""
    rng = np.random.default_rng(15)
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    dst_spec = G.GridSpec(32, 32, (0.0, 2.0, 0.0, 64.0, 0.0, -2.0),
                          crs=src_spec.crs, tile=16)
    canvas = rng.integers(0, 100, size=(64, 64)).astype(np.float64)
    tiles = _tiles(spark, canvas, src_spec)
    got = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel="sum"),
                          dst_spec)
    blocks = canvas.reshape(32, 2, 32, 2).transpose(0, 2, 1, 3).reshape(32, 32, 4)
    np.testing.assert_allclose(got, blocks.sum(axis=2), rtol=1e-12)


def test_box_kernels_mixed_shapes_vs_bruteforce(spark):
    """Non-integral downsample (64 -> 24, scale 8/3) makes footprint
    boxes 2x2 / 2x3 / 3x2 / 3x3 within one warp — every _box_groups
    shape bucket — and each box kernel must equal the per-pixel
    brute-force of GDAL's center rule (gdalwarpkernel.cpp
    GWKAverageOrMode): pixels with center in [lo, hi), mode ties to
    smallest, quantile index ceil(q*n - 1)."""
    rng = np.random.default_rng(77)
    src_spec = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)
    sc = 64.0 / 24.0
    dst_spec = G.GridSpec(24, 24, (0.0, sc, 0.0, 64.0, 0.0, -sc),
                          crs=src_spec.crs, tile=8)
    # few distinct values => real mode ties exercised
    canvas = rng.integers(0, 5, size=(64, 64)).astype(np.float64)
    tiles = _tiles(spark, canvas, src_spec)

    def brute(kernel):
        out = np.zeros((24, 24))
        for dy in range(24):
            for dx in range(24):
                xlo_f, xhi_f = dx * sc, (dx + 1) * sc
                ylo_f, yhi_f = dy * sc, (dy + 1) * sc
                xlo = int(np.ceil(xlo_f - 0.5))
                xhi = int(np.ceil(xhi_f - 0.5)) - 1
                ylo = int(np.ceil(ylo_f - 0.5))
                yhi = int(np.ceil(yhi_f - 0.5)) - 1
                box = canvas[ylo:yhi + 1, xlo:xhi + 1]
                if kernel == "mode":
                    vals, cnts = np.unique(box, return_counts=True)
                    out[dy, dx] = vals[int(np.argmax(cnts))]
                elif kernel == "min":
                    out[dy, dx] = box.min()
                elif kernel == "max":
                    out[dy, dx] = box.max()
                else:
                    q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[kernel]
                    flat = np.sort(box, axis=None)
                    out[dy, dx] = flat[max(int(np.ceil(q * flat.size - 1)), 0)]
        return out

    for k in ("mode", "min", "max", "med", "q1", "q3"):
        got = tiles_to_canvas(W.warp(tiles, src_spec, dst_spec, kernel=k),
                              dst_spec)
        np.testing.assert_array_equal(got, brute(k), err_msg=k)
