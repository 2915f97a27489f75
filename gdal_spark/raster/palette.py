"""Median-cut palette computation + dithered palettization.

Reference: GDALComputeMedianCutPCT (alg/gdalmediancut.cpp:91-133 —
median cut over a 5-bit/channel RGB histogram to a <=256-color table)
and GDALDitherRGB2PCT (alg/gdaldither.cpp — nearest-palette-entry
assignment; we implement the non-error-diffusion nearest mapping,
which is the deterministic distributed-safe variant: Floyd-Steinberg
error diffusion is inherently sequential across the whole image, so
it is scope-fenced).

Spark-first shape: the 5-bit histogram (<=32768 bins) aggregates
DISTRIBUTED (explode + groupBy); only the bounded bin table reaches
the driver, where the median-cut recursion runs on <=256 boxes. The
final color assignment is a broadcast palette + per-tile numpy argmin
in an Arrow UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import grid as G


def compute_median_cut_pct(rgb: DataFrame, n_colors: int = 256
                           ) -> np.ndarray:
    """(tile_y, tile_x, r, g, b array cols) -> (n, 3) uint8 palette.
    Histogram quantized to 5 bits/channel like the reference, counts
    aggregated distributed."""
    bins = (rgb.select(F.explode(F.arrays_zip("r", "g", "b")).alias("p"))
            .select(((F.col("p.r").cast("int") / 8).cast("int") * 1024
                     + (F.col("p.g").cast("int") / 8).cast("int") * 32
                     + (F.col("p.b").cast("int") / 8).cast("int"))
                    .alias("bin"))
            .groupBy("bin").count().collect())
    hist = {int(r.bin): int(r["count"]) for r in bins}
    # box = (list of bins, count); recursively split the widest axis at
    # the count median (the median-cut step)
    boxes = [(list(hist), sum(hist.values()))]
    while len(boxes) < n_colors:
        # split the most populous splittable box
        boxes.sort(key=lambda b: -b[1])
        target = None
        for i, (bs, _cnt) in enumerate(boxes):
            if len(bs) > 1:
                target = i
                break
        if target is None:
            break
        bs, _cnt = boxes.pop(target)
        coords = np.array([((b >> 10) & 31, (b >> 5) & 31, b & 31)
                           for b in bs])
        axis = int(np.argmax(coords.max(0) - coords.min(0)))
        order = np.argsort(coords[:, axis], kind="stable")
        counts = np.array([hist[bs[i]] for i in order])
        cum = np.cumsum(counts)
        half = cum[-1] / 2.0
        k = int(np.searchsorted(cum, half))
        k = min(max(k, 0), len(bs) - 2)
        left = [bs[i] for i in order[:k + 1]]
        right = [bs[i] for i in order[k + 1:]]
        boxes.append((left, sum(hist[b] for b in left)))
        boxes.append((right, sum(hist[b] for b in right)))
    pal = []
    for bs, _cnt in boxes:
        w = np.array([hist[b] for b in bs], np.float64)
        c = np.array([((b >> 10) & 31, (b >> 5) & 31, b & 31)
                      for b in bs], np.float64)
        avg = (c * w[:, None]).sum(0) / w.sum()
        pal.append(np.round(avg * 8.0 + 4.0))  # bin center, 0..255
    return np.clip(np.array(pal), 0, 255).astype(np.uint8)


def rgb_to_pct(rgb: DataFrame, palette: np.ndarray) -> DataFrame:
    """Assign every pixel its nearest palette index (euclidean RGB,
    GDALDitherRGB2PCT's non-diffusion mapping) -> tile relation with
    px = palette indices. Palette broadcasts; per-tile numpy argmin."""
    pal = np.asarray(palette, np.float64)

    @F.pandas_udf("array<double>")
    def assign(r: pd.Series, g: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for rr, gg, bb in zip(r, g, b):
            px = np.column_stack([np.asarray(rr, np.float64),
                                  np.asarray(gg, np.float64),
                                  np.asarray(bb, np.float64)])
            d = ((px[:, None, :] - pal[None, :, :]) ** 2).sum(-1)
            out.append(np.argmin(d, axis=1).astype(np.float64).tolist())
        return pd.Series(out)

    return rgb.select("tile_y", "tile_x",
                      assign("r", "g", "b").alias("px"))


def tile_index(tiles: DataFrame, spec: G.GridSpec) -> DataFrame:
    """gdaltindex analog (apps/gdaltindex_lib.cpp): one footprint
    polygon per tile — (tile_y, tile_x, geom WKB) in world coords."""
    from ..geo import wkb as _wkb

    @F.pandas_udf("binary")
    def foot(ty: pd.Series, tx: pd.Series) -> pd.Series:
        out = []
        for y, x in zip(ty, tx):
            h, w = spec.tile_shape(int(y), int(x))
            x0 = spec.gt[0] + int(x) * spec.tile * spec.gt[1]
            y0 = spec.gt[3] + int(y) * spec.tile * spec.gt[5]
            x1 = x0 + w * spec.gt[1]
            y1 = y0 + h * spec.gt[5]
            out.append(_wkb.polygon([[(x0, y0), (x1, y0), (x1, y1),
                                      (x0, y1), (x0, y0)]]))
        return pd.Series(out)

    return tiles.select("tile_y", "tile_x",
                        foot("tile_y", "tile_x").alias("geom"))


def find_nearest_color_np(pal: np.ndarray, r: int, g: int, b: int) -> int:
    """FindNearestColor (alg/gdaldither.cpp): squared-distance argmin,
    first minimum wins."""
    d = ((pal[:, 0] - r) ** 2 + (pal[:, 1] - g) ** 2
         + (pal[:, 2] - b) ** 2)
    return int(np.argmin(d))


def dither_rgb_np(r: np.ndarray, g: np.ndarray, b: np.ndarray,
                  palette: np.ndarray) -> np.ndarray:
    """GDALDitherRGB2PCT's Floyd-Steinberg variant, bit-exactly
    (alg/gdaldither.cpp:424-640): per row, the previous line's error
    adds in (clamped) up front; the scan carries 2/6 of each pixel's
    error right, 1/6 below-left, 1/6 below-right, and the remainder
    (error - 5*(error/6), C truncating division) straight down. The
    'error goes to four neighbors' note at :24 is the reference's own.
    """
    h, w = r.shape
    pal = np.asarray(palette, np.int64)
    rr = r.astype(np.int64).copy()
    gg = g.astype(np.int64).copy()
    bb = b.astype(np.int64).copy()
    out = np.zeros((h, w), np.uint8)
    err = np.zeros((w + 2, 3), np.int64)   # +1 padding each side

    def trunc6(e: int) -> int:
        return int(e / 6) if e >= 0 else -int(-e / 6)

    for y in range(h):
        vals = np.stack([rr[y], gg[y], bb[y]], axis=1)
        vals = np.clip(vals + err[1:w + 1], 0, 255)
        err[:] = 0
        last = [0, 0, 0]
        for x in range(w):
            v = [int(min(255, max(0, vals[x, c] + last[c])))
                 for c in range(3)]
            idx = find_nearest_color_np(pal, *v)
            out[y, x] = idx
            for c in range(3):
                e = v[c] - int(pal[idx, c])
                sixth = trunc6(e)
                err[x, c] += sixth          # below-left
                err[x + 2, c] = sixth       # below-right (SET, :592)
                err[x + 1, c] += e - 5 * sixth  # below
                last[c] = 2 * sixth         # right
    return out


MAX_DITHER_PIXELS = 64_000_000


def rgb_to_pct_dithered(rgb: DataFrame, spec: G.GridSpec,
                        palette: np.ndarray,
                        max_pixels: int = MAX_DITHER_PIXELS) -> DataFrame:
    """Error-diffusion palettization: Floyd-Steinberg is inherently
    sequential across the whole image (every pixel depends on every
    earlier pixel in scan order — the reference runs it single-threaded
    too), so the canvas assembles on the driver under `max_pixels` and
    the exact gdaldither.cpp kernel runs once; tiles re-emit
    distributed. For larger rasters use rgb_to_pct (nearest mapping,
    fully distributed) — the same trade the reference documents."""
    if spec.width * spec.height > max_pixels:
        raise ValueError(
            f"{spec.width * spec.height} px > max_pixels={max_pixels}: "
            "error diffusion is sequential by definition — use "
            "rgb_to_pct (nearest, distributed) at scale")
    t = spec.tile
    chans = {}
    for name in ("r", "g", "b"):
        canvas = np.zeros((spec.height, spec.width), np.uint8)
        for row in rgb.select("tile_y", "tile_x", name).collect():
            h, w = spec.tile_shape(row.tile_y, row.tile_x)
            canvas[row.tile_y * t:row.tile_y * t + h,
                   row.tile_x * t:row.tile_x * t + w] = \
                np.asarray(row[name], np.float64).reshape(h, w)
        chans[name] = canvas
    idx = dither_rgb_np(chans["r"], chans["g"], chans["b"], palette)
    rows = []
    for ty in range(spec.tiles_y):
        for tx in range(spec.tiles_x):
            h, w = spec.tile_shape(ty, tx)
            rows.append((ty, tx, idx[ty * t:ty * t + h,
                                     tx * t:tx * t + w]
                         .astype(np.float64).ravel().tolist()))
    return rgb.sparkSession.createDataFrame(rows, G.TILE_SCHEMA)
