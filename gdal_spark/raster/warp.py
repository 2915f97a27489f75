"""Warp / reproject (EPSG:3857 <-> EPSG:4326) by inverse mapping.

Reference semantics (alg/gdalwarpoperation.cpp design doc :90-151 and
alg/gdalwarpkernel.cpp): for each DESTINATION pixel, transform its
center into source coordinates and sample with the chosen kernel —
near (index), bilinear (2x2 weighted), cubic (4x4 cubic convolution,
a = -0.5 — GRA_Cubic of gdalwarper.h:35-67), cubicspline (4x4
B-spline, GWKBSpline), lanczos (6x6 windowed sinc), and the
footprint-box family over the destination pixel's source-space
footprint: average, mode, min, max, med, q1, q3, rms
(GWKAverageOrModeThread) plus the flux-preserving sum
(GWKSumPreserving) — all 14 GRA_* kernels of gdalwarper.h:35-67.
The output grid comes from `GDALSuggestedWarpOutput2`
(alg/gdaltransformer.cpp:132-173), which walks ~21 sample points per
edge of the source extent through the transform and sizes the output
so overall pixel count is preserved along the diagonal — reproduced in
`suggested_warp_output`.

Spark-first restatement: each OUTPUT tile is one task ("the chunk of
the reference = our tile", SURVEY §2.9). Which source tiles a given
output tile needs is CLOSED-FORM (the 4326<->3857 transform is
monotone and separable per axis), so the gather is a deterministic
equi-join: the (dst_tile -> src tile range) relation is computed by a
vectorized mapInPandas over a spark.range-generated dst key grid (NO
O(#tiles) driver loop — a z15 pyramid has 10^9 tiles), exploded to
(dst_tile, src_tile) pairs with sequence() column math, joined to the
source tile rows, then one `applyInPandas` per dst tile computes the
coordinate arrays with numpy and applies the kernel. The source tile
fan-out is bounded by the zoom ratio.

Determinism: kernel arithmetic uses fixed-association expressions
(explicit Horner weights, left-associated 16-term cubic sum) so the
DuckDB SQL oracles can mirror the float math bit-for-bit; `average`
box sums ride an integral image, exact for integer-valued bands.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import mercator
from . import grid as G

#: extra source pixels gathered around the sampled range, per kernel
#: support (cubic needs 2; 3 is a safe superset for all)
_WINDOW_MARGIN = 3


def edge_walk_points(spec: G.GridSpec, samples_per_edge: int = 21):
    """The SuggestedWarpOutput sampling ring: 21 points per edge of the
    source extent (gdaltransformer.cpp:139-141) + corners."""
    x0, y0 = spec.gt[0], spec.gt[3]
    x1 = x0 + spec.width * spec.gt[1]
    y1 = y0 + spec.height * spec.gt[5]
    t = np.linspace(0.0, 1.0, samples_per_edge)
    xs = np.concatenate([x0 + (x1 - x0) * t, np.full_like(t, x1),
                         x1 + (x0 - x1) * t, np.full_like(t, x0)])
    ys = np.concatenate([np.full_like(t, y0), y0 + (y1 - y0) * t,
                         np.full_like(t, y1), y1 + (y0 - y1) * t])
    return xs, ys


def suggested_warp_output(src: G.GridSpec, dst_crs: str,
                          samples_per_edge: int = 21, tile: int = 256) -> G.GridSpec:
    """Choose the destination grid the way GDALSuggestedWarpOutput2
    does: transform the edge-walk ring, take the bbox, keep the source
    diagonal pixel count."""
    from ..geo import crs as _crs

    xs, ys = edge_walk_points(src, samples_per_edge)
    tx, ty = _crs.transform_np(src.crs, dst_crs, xs, ys)
    minx, maxx = float(tx.min()), float(tx.max())
    miny, maxy = float(ty.min()), float(ty.max())
    diag_px = float(np.hypot(src.width, src.height))
    res = float(np.hypot(maxx - minx, maxy - miny)) / diag_px
    width = max(1, int(round((maxx - minx) / res)))
    height = max(1, int(round((maxy - miny) / res)))
    return G.GridSpec(width, height, (minx, (maxx - minx) / width, 0.0,
                                      maxy, 0.0, -(maxy - miny) / height),
                      crs=dst_crs, tile=tile)


def _dst_pos_in_src_px(dst: G.GridSpec, src: G.GridSpec,
                       gx: np.ndarray, gy: np.ndarray):
    """Global dest pixel POSITIONS (fractional allowed; position p has
    center-world at p + 0.5) -> fractional source pixel coords. Any
    CRS pair the geo/crs.py registry knows (4326, 3857, UTM zones) —
    the 4326<->3857 fast pair routes through the identical mercator
    functions as round 1, so oracle float math is unchanged."""
    from ..geo import crs as _crs

    wx, wy = dst.pixel_center_world(gx, gy)
    sx, sy = _crs.transform_np(dst.crs, src.crs, wx, wy)
    return src.world_to_pixel(sx, sy)


# Catmull-Rom / GDAL GRA_Cubic weights (a = -0.5), Horner forms kept
# IDENTICAL between this numpy kernel and the SQL oracle text
# (cubic_weight_sql) so both engines round the same way.
def _cubic_weights(t: np.ndarray):
    w0 = ((-0.5 * t + 1.0) * t - 0.5) * t
    w1 = ((1.5 * t - 2.5) * t) * t + 1.0
    w2 = ((-1.5 * t + 2.0) * t + 0.5) * t
    w3 = ((0.5 * t - 0.5) * t) * t
    return w0, w1, w2, w3


def cubic_weight_sql(t: str) -> tuple[str, str, str, str]:
    """SQL mirrors of _cubic_weights (same operand order)."""
    return (f"(((-0.5 * {t} + 1.0) * {t} - 0.5) * {t})",
            f"(((1.5 * {t} - 2.5) * {t}) * {t} + 1.0)",
            f"(((-1.5 * {t} + 2.0) * {t} + 0.5) * {t})",
            f"(((0.5 * {t} - 0.5) * {t}) * {t})")


# ------------------------------------------------------------ cubicspline
#
# GRA_CubicSpline: the cubic B-spline basis, GWKBSpline in
# alg/gdalwarpkernel.cpp:3809-3839 (Mitchell (B,C) = (1,0), scaled by
# 6). Same 4-tap support as cubic, but weights do not sum to 1 —
# GWKResample divides by the accumulated weight, so we normalize by
# sum(wx) * sum(wy). Operand order below is mirrored verbatim by
# bspline_weight_sql so numpy and DuckDB round identically.

def _bspline_np(x: np.ndarray) -> np.ndarray:
    """6 * B-spline basis at signed offset x (GWKBSpline structure:
    nested one-sided cubics, innermost term first)."""
    xp2 = x + 2.0
    xp1 = x + 1.0
    xm1 = x - 1.0
    xp2c = xp2 * xp2 * xp2
    inner3 = np.where(xm1 > 0.0, -4.0 * xm1 * xm1 * xm1, 0.0) + 6.0 * x * x * x
    inner2 = np.where(x > 0.0, inner3, 0.0) + -4.0 * xp1 * xp1 * xp1
    inner1 = np.where(xp1 > 0.0, inner2, 0.0) + xp2c
    return np.where(xp2 > 0.0, inner1, 0.0)


def _bspline_weights_np(t: np.ndarray) -> list[np.ndarray]:
    """Taps x0-1 .. x0+2; offsets t+1, t, t-1, t-2."""
    return [_bspline_np(t + 1.0), _bspline_np(t),
            _bspline_np(t - 1.0), _bspline_np(t - 2.0)]


def _bspline_sql_one(x: str) -> str:
    return (
        f"(CASE WHEN ({x}) + 2.0 > 0.0 THEN "
        f"(CASE WHEN ({x}) + 1.0 > 0.0 THEN "
        f"(CASE WHEN ({x}) > 0.0 THEN "
        f"(CASE WHEN ({x}) - 1.0 > 0.0 THEN "
        f"-4.0 * (({x}) - 1.0) * (({x}) - 1.0) * (({x}) - 1.0) "
        f"ELSE 0.0 END) + 6.0 * ({x}) * ({x}) * ({x}) ELSE 0.0 END) + "
        f"-4.0 * (({x}) + 1.0) * (({x}) + 1.0) * (({x}) + 1.0) "
        f"ELSE 0.0 END) + "
        f"(({x}) + 2.0) * (({x}) + 2.0) * (({x}) + 2.0) ELSE 0.0 END)")


def bspline_weight_sql(t: str) -> list[str]:
    """SQL mirrors of _bspline_weights_np (same operand order)."""
    return [_bspline_sql_one(f"{t} + 1.0"), _bspline_sql_one(f"{t}"),
            _bspline_sql_one(f"{t} - 1.0"), _bspline_sql_one(f"{t} - 2.0")]


# ---------------------------------------------------------------- lanczos
#
# GRA_Lanczos (gdalwarper.h:35-67; kernel GWKLanczosSinc in
# alg/gdalwarpkernel.cpp): w(d) = sinc(d) * sinc(d/3), radius 3 (6x6
# support), accumulated value divided by the accumulated weight sum.
# For cross-engine bit-exactness the sin() inside sinc is NOT libm's
# (numpy and DuckDB link different libms that may differ by 1 ulp):
# both paths evaluate the SAME fixed odd polynomial after range
# reduction — sin(pi*d) = (-1)^n * P(r), n = floor(d + 0.5), r = d - n,
# P a 10-term Horner Taylor series exact to ~1e-14 on |r| <= 0.5.
# The reference's own optimized path also replaces libm sin with
# incremental trig identities (GWKResampleOptimizedLanczos), so a
# deterministic polynomial restatement is in-kind.

_PI = 3.141592653589793

#: Taylor coefficients of sin(pi*r) in r: pi^(2k+1)/(2k+1)! with
#: alternating sign, k = 0..9 (r^19 term ~ 1.4e-14 at |r| = 0.5).
_SIN_PI_COEFFS = tuple(
    (-1.0) ** k * _PI ** (2 * k + 1)
    / float(__import__("math").factorial(2 * k + 1))
    for k in range(10))


def _sin_pi_np(r: np.ndarray) -> np.ndarray:
    """sin(pi*r) for |r| <= 0.5 — fixed Horner, mirrored by
    sin_pi_sql()."""
    q = r * r
    acc = np.full_like(r, _SIN_PI_COEFFS[9])
    for c in reversed(_SIN_PI_COEFFS[:9]):
        acc = acc * q + c
    return r * acc


def sin_pi_sql(r: str, q: str) -> str:
    """SQL mirror of _sin_pi_np given column names r and q = r*r."""
    acc = f"{_SIN_PI_COEFFS[9]!r}"
    for c in reversed(_SIN_PI_COEFFS[:9]):
        acc = f"({acc} * {q} + {c!r})"
    return f"({r} * {acc})"


def _sinc_pi_np(d: np.ndarray) -> np.ndarray:
    """sinc(d) = sin(pi*d)/(pi*d), 1 at d = 0 — poly-sin inside."""
    n = np.floor(d + 0.5)
    r = d - n
    p = _sin_pi_np(r)
    s = np.where(n.astype(np.int64) % 2 == 0, p, -p)
    den = _PI * np.where(d == 0.0, 1.0, d)
    return np.where(d == 0.0, 1.0, s / den)


def sinc_pi_sql(d: str) -> str:
    """SQL mirror of _sinc_pi_np (same range reduction + poly)."""
    n = f"floor({d} + 0.5)"
    r = f"({d} - {n})"
    q = f"({r} * {r})"
    p = sin_pi_sql(r, q)
    s = f"(CASE WHEN CAST({n} AS BIGINT) % 2 = 0 THEN {p} ELSE -{p} END)"
    return (f"(CASE WHEN {d} = 0.0 THEN 1.0 "
            f"ELSE {s} / ({_PI!r} * {d}) END)")


def _lanczos_weights_np(t: np.ndarray) -> list[np.ndarray]:
    """Six tap weights for taps x0-2 .. x0+3 at fraction t in [0, 1):
    d_i = t + (2 - i) — ONE addition with a constant, exactly the SQL
    oracle's operand order (t + 2.0 - i would round differently)."""
    return [_sinc_pi_np(d) * _sinc_pi_np(d / 3.0)
            for d in (t + float(2 - i) for i in range(6))]


def lanczos_weight_sql(t: str) -> list[str]:
    """SQL mirrors of _lanczos_weights_np (same operand order)."""
    out = []
    for i in range(6):
        d = f"({t} + {float(2 - i)!r})"
        d3 = f"({d} / 3.0)"
        out.append(f"({sinc_pi_sql(d)} * {sinc_pi_sql(d3)})")
    return out


def _box_groups(win, ok, xlo, xhi, ylo, yhi, wx0, wy0):
    """Yield (sel, boxes) per distinct footprint-box shape: sel is the
    dst-pixel index vector, boxes the (len(sel), h, w) gathered source
    windows. Grouping by shape lets the box kernels (mode/min/max/
    med/q1/q3) run whole-array numpy instead of a per-pixel Python
    loop; selection-only kernels are order-independent so the grouping
    cannot change any result."""
    idxs = np.nonzero(ok)[0]
    bw = xhi - xlo + 1
    bh = yhi - ylo + 1
    for h_, w_ in sorted({(int(a), int(b))
                          for a, b in zip(bh[idxs], bw[idxs])}):
        sel = idxs[(bh[idxs] == h_) & (bw[idxs] == w_)]
        yy = (ylo[sel, None] + np.arange(h_))[:, :, None] - wy0
        xx = (xlo[sel, None] + np.arange(w_))[:, None, :] - wx0
        yield sel, win[yy, xx]


def _dep_ranges(spark, src: G.GridSpec, dst: G.GridSpec,
                margin: int = _WINDOW_MARGIN + 1) -> DataFrame:
    """(d_ty, d_tx, sy0, sy1, sx0, sx1): the source tile range each dst
    tile needs — computed by VECTORIZED numpy over a spark.range key
    grid (the transform is monotone + separable per axis, so the tile
    EDGE positions bracket every sampled coordinate, including average
    footprints), never a driver loop."""
    schema = T.StructType([
        T.StructField("d_ty", T.IntegerType(), False),
        T.StructField("d_tx", T.IntegerType(), False),
        T.StructField("sy0", T.IntegerType(), False),
        T.StructField("sy1", T.IntegerType(), False),
        T.StructField("sx0", T.IntegerType(), False),
        T.StructField("sx1", T.IntegerType(), False),
    ])
    t = dst.tile

    def polar_ranges(tx, ty, w, h):
        """Exact per-tile source ranges when dst is azimuthal: the
        generic edge-sampling path under-brackets near the pole and
        the antimeridian (the dst->src map is polar, not separable —
        see crs.pstereo_rect_lonlat_bounds). lat/lon bounds are exact
        sector geometry; lon is monotone into src x and lat into src y
        for the geographic/mercator source grids warps read from."""
        from ..geo import crs as _crs

        p = _crs.polar_of(dst.crs)
        g = dst.gt
        xa = g[0] + (tx * t) * g[1]
        xb = g[0] + (tx * t + w) * g[1]
        ya = g[3] + (ty * t) * g[5]
        yb = g[3] + (ty * t + h) * g[5]
        lon_lo, lon_hi, lat_lo, lat_hi, wrap = _crs.pstereo_rect_lonlat_bounds(
            p, np.minimum(xa, xb), np.maximum(xa, xb),
            np.minimum(ya, yb), np.maximum(ya, yb))
        lat_lo = np.clip(lat_lo, -90.0, 90.0)
        lat_hi = np.clip(lat_hi, -90.0, 90.0)
        sxs, sys_ = [], []
        for lon in (lon_lo, lon_hi):
            for lat in (lat_lo, lat_hi):
                wx, wy = _crs.from_lonlat_np(src.crs, lon, lat)
                sx, sy = src.world_to_pixel(wx, wy)
                sxs.append(sx)
                sys_.append(sy)
        sxmin = np.where(wrap, 0.0, np.minimum.reduce(sxs))
        sxmax = np.where(wrap, float(src.width), np.maximum.reduce(sxs))
        return sxmin, sxmax, np.minimum.reduce(sys_), np.maximum.reduce(sys_)

    def run(batches):
        from ..geo import crs as _crs

        for pdf in batches:
            ty = pdf["d_ty"].to_numpy(np.int64)
            tx = pdf["d_tx"].to_numpy(np.int64)
            w = np.minimum(t, dst.width - tx * t)
            h = np.minimum(t, dst.height - ty * t)
            if (_crs.polar_of(dst.crs) is not None
                    and dst.gt[2] == 0.0 and dst.gt[4] == 0.0):
                sxmin, sxmax, symin, symax = polar_ranges(tx, ty, w, h)
                sx0 = np.clip(np.floor((np.floor(sxmin) - margin) / src.tile),
                              0, src.tiles_x - 1).astype(np.int32)
                sx1 = np.clip(np.floor((np.floor(sxmax) + margin) / src.tile),
                              0, src.tiles_x - 1).astype(np.int32)
                sy0 = np.clip(np.floor((np.floor(symin) - margin) / src.tile),
                              0, src.tiles_y - 1).astype(np.int32)
                sy1 = np.clip(np.floor((np.floor(symax) + margin) / src.tile),
                              0, src.tiles_y - 1).astype(np.int32)
                yield pd.DataFrame({"d_ty": ty.astype(np.int32),
                                    "d_tx": tx.astype(np.int32),
                                    "sy0": sy0, "sy1": sy1,
                                    "sx0": sx0, "sx1": sx1})
                continue
            # tile edge positions in center-space: edge at pixel index
            # k sits at position k - 0.5. Sample a 3x3 position grid
            # (corners + edge midpoints + center): for non-separable
            # projections (UTM) the per-axis extremes sit on the tile
            # BOUNDARY, not necessarily at corners — 9-point sampling
            # plus the margin is a safe superset for every registered
            # CRS; for the separable 4326/3857 pairs it reduces to the
            # corner extremes exactly
            gx3 = [tx * t - 0.5, tx * t + w / 2.0 - 0.5, tx * t + w - 0.5]
            gy3 = [ty * t - 0.5, ty * t + h / 2.0 - 0.5, ty * t + h - 0.5]
            sxs, sys_ = [], []
            for gxp in gx3:
                for gyp in gy3:
                    sx, sy = _dst_pos_in_src_px(dst, src, gxp, gyp)
                    sxs.append(sx)
                    sys_.append(sy)
            sxmin = np.minimum.reduce(sxs)
            sxmax = np.maximum.reduce(sxs)
            symin = np.minimum.reduce(sys_)
            symax = np.maximum.reduce(sys_)
            sx0 = np.clip(np.floor((np.floor(sxmin) - margin) / src.tile),
                          0, src.tiles_x - 1).astype(np.int32)
            sx1 = np.clip(np.floor((np.floor(sxmax) + margin) / src.tile),
                          0, src.tiles_x - 1).astype(np.int32)
            sy0 = np.clip(np.floor((np.floor(symin) - margin) / src.tile),
                          0, src.tiles_y - 1).astype(np.int32)
            sy1 = np.clip(np.floor((np.floor(symax) + margin) / src.tile),
                          0, src.tiles_y - 1).astype(np.int32)
            yield pd.DataFrame({"d_ty": ty.astype(np.int32),
                                "d_tx": tx.astype(np.int32),
                                "sy0": sy0, "sy1": sy1,
                                "sx0": sx0, "sx1": sx1})

    keys = (spark.range(dst.tiles_y * dst.tiles_x)
            .select(F.expr(f"CAST(id DIV {dst.tiles_x} AS INT)").alias("d_ty"),
                    F.pmod(F.col("id"), F.lit(dst.tiles_x))
                    .cast("int").alias("d_tx")))
    return keys.mapInPandas(run, schema)


def warp(src_tiles: DataFrame, src: G.GridSpec, dst: G.GridSpec,
         kernel: str = "near", nodata: float = 0.0) -> DataFrame:
    """Distributed warp: src tile rows -> dst tile rows.

    kernel: the full GRA_* set of gdalwarper.h:35-67 —
    'near' | 'bilinear' | 'cubic' | 'cubicspline' | 'lanczos' |
    'average' | 'mode' | 'min' | 'max' | 'med' | 'q1' | 'q3' |
    'rms' | 'sum'. Absent source tiles read as `nodata` (the
    sparse-raster zero convention when nodata = 0); near/bilinear/
    cubic emit `nodata` where their support leaves the source
    raster; lanczos/cubicspline skip out-of-raster taps and
    renormalize (GWKResample's divisor accumulation); the
    footprint-box family (average/mode/min/max/med/q1/q3/rms/sum)
    clips the box to the raster.
    mode ties break to the SMALLEST value (the reference's
    MODE_TIES=MIN strategy, gdalwarpkernel.cpp GWKTS_Min — the
    default GWKTS_First depends on sequential scan order, which a
    distributed engine must not).
    med/q1/q3 are value selection at index ceil(q*n - 1) of the
    sorted footprint values (gdalwarpkernel.cpp:8340 quantIdx).
    rms = sqrt(mean(v^2)) over the footprint (GRA_RMS,
    gdalwarpkernel.cpp:8032).
    sum scatters each source pixel's value over the dst pixels whose
    source-space footprints overlap it, weighted by overlap area
    (GWKSumPreserving, gdalwarpkernel.cpp:8675): under a separable
    monotone transform the dst footprints partition source space, so
    the global sum is preserved exactly up to float addition.
    """
    _BOX_KERNELS = ("average", "mode", "min", "max", "med", "q1", "q3",
                    "rms", "sum")
    if kernel not in ("near", "bilinear", "cubic", "cubicspline",
                      "lanczos") + _BOX_KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}")
    spark = src_tiles.sparkSession
    dep = (_dep_ranges(spark, src, dst)
           .withColumn("tile_y", F.explode(F.sequence("sy0", "sy1")))
           .withColumn("tile_x", F.explode(F.sequence("sx0", "sx1")))
           .select("d_ty", "d_tx", "tile_y", "tile_x"))
    gathered = dep.join(src_tiles, ["tile_y", "tile_x"], "inner")

    def warp_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        h, w = dst.tile_shape(ty, tx)
        gx, gy = np.meshgrid(np.arange(tx * dst.tile, tx * dst.tile + w, dtype=np.float64),
                             np.arange(ty * dst.tile, ty * dst.tile + h, dtype=np.float64))
        gx, gy = gx.ravel(), gy.ravel()
        spx, spy = _dst_pos_in_src_px(dst, src, gx, gy)
        if kernel in _BOX_KERNELS:
            # footprint edges: dst pixel k spans positions [k-0.5, k+0.5]
            ex0, ey0 = _dst_pos_in_src_px(dst, src, gx - 0.5, gy - 0.5)
            ex1, ey1 = _dst_pos_in_src_px(dst, src, gx + 0.5, gy + 0.5)
            exlo, exhi = np.minimum(ex0, ex1), np.maximum(ex0, ex1)
            eylo, eyhi = np.minimum(ey0, ey1), np.maximum(ey0, ey1)
            rx = np.concatenate([exlo, exhi])
            ry = np.concatenate([eylo, eyhi])
        else:
            rx, ry = spx, spy

        # window: sampled range + kernel support, clipped to the raster
        m = _WINDOW_MARGIN
        wx0 = int(max(0, np.floor(rx.min()) - m))
        wx1 = int(min(src.width, np.floor(rx.max()) + m + 1))
        wy0 = int(max(0, np.floor(ry.min()) - m))
        wy1 = int(min(src.height, np.floor(ry.max()) + m + 1))
        win = np.full((max(wy1 - wy0, 1), max(wx1 - wx0, 1)), nodata,
                      dtype=np.float64)
        for _, row in pdf.iterrows():
            sh, sw = src.tile_shape(int(row["tile_y"]), int(row["tile_x"]))
            gy0 = int(row["tile_y"]) * src.tile
            gx0 = int(row["tile_x"]) * src.tile
            arr = np.asarray(row["px"], np.float64).reshape(sh, sw)
            iy0, iy1 = max(gy0, wy0), min(gy0 + sh, wy1)
            ix0, ix1 = max(gx0, wx0), min(gx0 + sw, wx1)
            if iy0 < iy1 and ix0 < ix1:
                win[iy0 - wy0:iy1 - wy0, ix0 - wx0:ix1 - wx0] = \
                    arr[iy0 - gy0:iy1 - gy0, ix0 - gx0:ix1 - gx0]

        out = np.full(h * w, nodata, dtype=np.float64)
        if kernel == "near":
            ix = np.floor(spx).astype(np.int64)
            iy = np.floor(spy).astype(np.int64)
            ok = (ix >= 0) & (ix < src.width) & (iy >= 0) & (iy < src.height)
            out[ok] = win[iy[ok] - wy0, ix[ok] - wx0]
        elif kernel == "bilinear":
            fx, fy = spx - 0.5, spy - 0.5  # sample space: pixel centers
            x0 = np.floor(fx).astype(np.int64)
            y0 = np.floor(fy).astype(np.int64)
            wxf, wyf = fx - x0, fy - y0
            ok = (x0 >= 0) & (x0 + 1 < src.width) & (y0 >= 0) & (y0 + 1 < src.height)
            x0c, y0c = x0[ok] - wx0, y0[ok] - wy0
            v00 = win[y0c, x0c]; v01 = win[y0c, x0c + 1]
            v10 = win[y0c + 1, x0c]; v11 = win[y0c + 1, x0c + 1]
            out[ok] = (v00 * (1 - wxf[ok]) * (1 - wyf[ok]) + v01 * wxf[ok] * (1 - wyf[ok])
                       + v10 * (1 - wxf[ok]) * wyf[ok] + v11 * wxf[ok] * wyf[ok])
        elif kernel == "cubic":
            fx, fy = spx - 0.5, spy - 0.5
            x0 = np.floor(fx).astype(np.int64)
            y0 = np.floor(fy).astype(np.int64)
            txf, tyf = fx - x0, fy - y0
            # full 4x4 support must sit inside the raster (else nodata)
            ok = ((x0 - 1 >= 0) & (x0 + 2 < src.width)
                  & (y0 - 1 >= 0) & (y0 + 2 < src.height))
            xc, yc = x0[ok] - wx0, y0[ok] - wy0
            wx_ = _cubic_weights(txf[ok])
            wy_ = _cubic_weights(tyf[ok])
            # fixed association: rows left-assoc, then columns —
            # mirrored exactly by the SQL oracle expression
            rows = []
            for j in range(4):
                r = ((win[yc + j - 1, xc - 1] * wx_[0]
                      + win[yc + j - 1, xc] * wx_[1])
                     + win[yc + j - 1, xc + 1] * wx_[2]) \
                    + win[yc + j - 1, xc + 2] * wx_[3]
                rows.append(r)
            acc = ((rows[0] * wy_[0] + rows[1] * wy_[1])
                   + rows[2] * wy_[2]) + rows[3] * wy_[3]
            out[ok] = acc
        elif kernel == "lanczos":
            fx, fy = spx - 0.5, spy - 0.5
            x0 = np.floor(fx).astype(np.int64)
            y0 = np.floor(fy).astype(np.int64)
            txf, tyf = fx - x0, fy - y0
            wx_ = _lanczos_weights_np(txf)
            wy_ = _lanczos_weights_np(tyf)
            # zero out-of-raster taps (GWKResample clamps the loop to
            # the raster and renormalizes by the surviving weight sum)
            for i in range(6):
                wx_[i] = np.where((x0 - 2 + i >= 0)
                                  & (x0 - 2 + i < src.width), wx_[i], 0.0)
                wy_[i] = np.where((y0 - 2 + i >= 0)
                                  & (y0 - 2 + i < src.height), wy_[i], 0.0)
            sx_ = ((((wx_[0] + wx_[1]) + wx_[2]) + wx_[3]) + wx_[4]) + wx_[5]
            sy_ = ((((wy_[0] + wy_[1]) + wy_[2]) + wy_[3]) + wy_[4]) + wy_[5]
            div = sx_ * sy_
            ok = div != 0.0
            # gather with clamped indices; zero weights kill the
            # out-of-raster reads so the clamp value never leaks
            rows6 = []
            for j in range(6):
                yj = np.clip(y0 - 2 + j, wy0, wy1 - 1) - wy0
                r = None
                for i in range(6):
                    xi = np.clip(x0 - 2 + i, wx0, wx1 - 1) - wx0
                    term = win[yj, xi] * wx_[i]
                    r = term if r is None else r + term
                rows6.append(r)
            num = ((((rows6[0] * wy_[0] + rows6[1] * wy_[1])
                     + rows6[2] * wy_[2]) + rows6[3] * wy_[3])
                   + rows6[4] * wy_[4]) + rows6[5] * wy_[5]
            out[ok] = num[ok] / div[ok]
        elif kernel == "cubicspline":
            fx, fy = spx - 0.5, spy - 0.5
            x0 = np.floor(fx).astype(np.int64)
            y0 = np.floor(fy).astype(np.int64)
            txf, tyf = fx - x0, fy - y0
            wx_ = _bspline_weights_np(txf)
            wy_ = _bspline_weights_np(tyf)
            # zero out-of-raster taps + renormalize, like lanczos
            # (GWKResample's accumulated-weight divisor)
            for i in range(4):
                wx_[i] = np.where((x0 - 1 + i >= 0)
                                  & (x0 - 1 + i < src.width), wx_[i], 0.0)
                wy_[i] = np.where((y0 - 1 + i >= 0)
                                  & (y0 - 1 + i < src.height), wy_[i], 0.0)
            sx_ = ((wx_[0] + wx_[1]) + wx_[2]) + wx_[3]
            sy_ = ((wy_[0] + wy_[1]) + wy_[2]) + wy_[3]
            div = sx_ * sy_
            ok = div != 0.0
            rows4 = []
            for j in range(4):
                yj = np.clip(y0 - 1 + j, wy0, wy1 - 1) - wy0
                r = None
                for i in range(4):
                    xi = np.clip(x0 - 1 + i, wx0, wx1 - 1) - wx0
                    term = win[yj, xi] * wx_[i]
                    r = term if r is None else r + term
                rows4.append(r)
            num = ((rows4[0] * wy_[0] + rows4[1] * wy_[1])
                   + rows4[2] * wy_[2]) + rows4[3] * wy_[3]
            out[ok] = num[ok] / div[ok]
        elif kernel == "sum":
            # GWKSumPreserving: each dst pixel accumulates
            # v * overlap_area(dst footprint, src pixel) in source
            # space; fractional edges, NO center-rule snapping.
            # Terms accumulate in row-major (y, x) order with
            # left-associated adds — mirrored by the SQL oracle's
            # ordered list_reduce fold.
            sxlo = np.maximum(np.floor(exlo).astype(np.int64), 0)
            sxhi = np.minimum((np.ceil(exhi) - 1).astype(np.int64),
                              src.width - 1)
            sylo = np.maximum(np.floor(eylo).astype(np.int64), 0)
            syhi = np.minimum((np.ceil(eyhi) - 1).astype(np.int64),
                              src.height - 1)
            ok = (sxlo <= sxhi) & (sylo <= syhi)
            idxs = np.nonzero(ok)[0]
            bw = sxhi - sxlo + 1
            bh = syhi - sylo + 1
            # vectorize per distinct box shape; per-pixel offsets walk
            # in (oy, ox) ascending order with left-associated adds —
            # identical accumulation order to the oracle's fold
            for h_, w_ in {(int(a), int(b))
                           for a, b in zip(bh[idxs], bw[idxs])}:
                sel = idxs[(bh[idxs] == h_) & (bw[idxs] == w_)]
                acc = np.zeros(len(sel))
                for oy in range(h_):
                    jj = sylo[sel] + oy
                    wyf = (np.minimum(eyhi[sel], jj + 1.0)
                           - np.maximum(eylo[sel], jj.astype(np.float64)))
                    for ox in range(w_):
                        ii = sxlo[sel] + ox
                        wxf = (np.minimum(exhi[sel], ii + 1.0)
                               - np.maximum(exlo[sel], ii.astype(np.float64)))
                        acc = acc + win[jj - wy0, ii - wx0] * wxf * wyf
                out[sel] = acc
        elif kernel == "mode":
            xlo = np.ceil(exlo - 0.5).astype(np.int64)
            xhi = (np.ceil(exhi - 0.5) - 1).astype(np.int64)
            ylo = np.ceil(eylo - 0.5).astype(np.int64)
            yhi = (np.ceil(eyhi - 0.5) - 1).astype(np.int64)
            cx_ = np.floor(spx).astype(np.int64)
            cy_ = np.floor(spy).astype(np.int64)
            ex = xhi < xlo
            xlo[ex] = cx_[ex]; xhi[ex] = cx_[ex]
            ey = yhi < ylo
            ylo[ey] = cy_[ey]; yhi[ey] = cy_[ey]
            xlo = np.maximum(xlo, 0)
            xhi = np.minimum(xhi, src.width - 1)
            ylo = np.maximum(ylo, 0)
            yhi = np.minimum(yhi, src.height - 1)
            ok = (xlo <= xhi) & (ylo <= yhi)
            for sel, boxes in _box_groups(win, ok, xlo, xhi, ylo, yhi,
                                          wx0, wy0):
                # sorted rows -> ascending runs; first argmax over run
                # counts picks the smallest most-frequent value, same
                # tie-break as np.unique+argmax (GWKTS_Min)
                flat = np.sort(boxes.reshape(len(sel), -1), axis=1)
                n, m = flat.shape
                change = np.ones((n, m), dtype=bool)
                change[:, 1:] = flat[:, 1:] != flat[:, :-1]
                runid = np.cumsum(change, axis=1) - 1
                counts = np.zeros((n, m), dtype=np.int64)
                np.add.at(counts, (np.arange(n)[:, None], runid), 1)
                starts = np.zeros((n, m))
                ri, ci = np.nonzero(change)
                starts[ri, runid[ri, ci]] = flat[ri, ci]
                best = np.argmax(counts, axis=1)
                out[sel] = starts[np.arange(n), best]
        else:  # center-rule footprint box: average/min/max/med/q1/q3/rms
            # pixels whose CENTER (i + 0.5) falls in [lo, hi):
            # i in [ceil(lo - 0.5), ceil(hi - 0.5) - 1]. An empty range
            # (footprint narrower than a pixel — upsampling) degrades
            # to the pixel under the footprint center, like GDAL's
            # GWKAverageOrMode which always visits >= 1 source pixel.
            xlo = np.ceil(exlo - 0.5).astype(np.int64)
            xhi = (np.ceil(exhi - 0.5) - 1).astype(np.int64)
            ylo = np.ceil(eylo - 0.5).astype(np.int64)
            yhi = (np.ceil(eyhi - 0.5) - 1).astype(np.int64)
            cx_ = np.floor(spx).astype(np.int64)
            cy_ = np.floor(spy).astype(np.int64)
            ex = xhi < xlo
            xlo[ex] = cx_[ex]; xhi[ex] = cx_[ex]
            ey = yhi < ylo
            ylo[ey] = cy_[ey]; yhi[ey] = cy_[ey]
            xlo = np.maximum(xlo, 0)
            xhi = np.minimum(xhi, src.width - 1)
            ylo = np.maximum(ylo, 0)
            yhi = np.minimum(yhi, src.height - 1)
            ok = (xlo <= xhi) & (ylo <= yhi)
            if kernel in ("average", "rms"):
                # integral images: box sums exact for integer bands
                base = win * win if kernel == "rms" else win
                S = np.zeros((win.shape[0] + 1, win.shape[1] + 1))
                S[1:, 1:] = base.cumsum(0).cumsum(1)
                xl, xh = xlo[ok] - wx0, xhi[ok] - wx0
                yl, yh = ylo[ok] - wy0, yhi[ok] - wy0
                ssum = (S[yh + 1, xh + 1] - S[yl, xh + 1]
                        - S[yh + 1, xl] + S[yl, xl])
                cnt = (xh - xl + 1) * (yh - yl + 1)
                if kernel == "rms":
                    out[ok] = np.sqrt(ssum / cnt)
                else:
                    out[ok] = ssum / cnt
            else:  # min / max / med / q1 / q3: per-box selection
                quant = {"med": 0.5, "q1": 0.25, "q3": 0.75}.get(kernel)
                for sel, boxes in _box_groups(win, ok, xlo, xhi, ylo, yhi,
                                              wx0, wy0):
                    flat = boxes.reshape(len(sel), -1)
                    if kernel == "min":
                        out[sel] = flat.min(axis=1)
                    elif kernel == "max":
                        out[sel] = flat.max(axis=1)
                    else:
                        # gdalwarpkernel.cpp:8340: sort, then take
                        # index ceil(quant * n - 1)
                        srt = np.sort(flat, axis=1)
                        idx = int(np.ceil(quant * srt.shape[1] - 1))
                        out[sel] = srt[:, max(idx, 0)]
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [out.tolist()]})

    return gathered.groupBy("d_ty", "d_tx").applyInPandas(warp_tile, G.TILE_SCHEMA)


def apply_cutline(src_tiles: DataFrame, cutline: DataFrame,
                  spec: G.GridSpec, nodata: float = 0.0,
                  all_touched: bool = False) -> DataFrame:
    """Cutline masking (GDALWarpCutlineMasker, alg/gdalcutline.cpp:218;
    options apps/gdalwarp_lib.cpp:188-206): burn the cutline polygons
    into a validity mask on the SOURCE grid and blank source pixels
    outside it to `nodata` — downstream warp then treats them exactly
    like absent source (the engine's sparse-raster convention), which
    is the reference's masked-source semantics under UNIFIED_SRC_NODATA.

    cutline: (fid long, geom WKB-polygon) rows. The mask join is an
    equi-join on tile keys against the rasterized mask relation —
    bounded by the tiles the cutline's bbox touches, so tiles fully
    outside the cutline are PRUNED from the plan (they would be all
    nodata), and the blank itself is a JVM zip_with (no Python in the
    per-pixel path). all_touched mirrors CUTLINE_ALL_TOUCHED."""
    from . import rasterize as _rz

    polys = cutline.select(F.col("fid"), F.lit(1.0).alias("burn"),
                           F.col("geom"))
    mask = _rz.rasterize(polys, spec, merge="replace",
                         all_touched=all_touched)
    return (src_tiles
            .join(mask.select("tile_y", "tile_x",
                              F.col("px").alias("mk")),
                  ["tile_y", "tile_x"], "inner")
            .select("tile_y", "tile_x",
                    F.zip_with("px", "mk",
                               lambda v, m: F.when(m == 1.0, v)
                               .otherwise(F.lit(float(nodata))))
                    .alias("px")))
