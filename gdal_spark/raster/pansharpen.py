"""Pansharpen: Brovey weighted fusion of a high-res pan band with RGB.

Reference: alg/gdalpansharpen.cpp:138 `GDALPansharpenOperation` —
weighted Brovey: for each pixel,
    pseudo_pan = sum(w_i * band_i)
    out_i      = band_i * (pan / pseudo_pan)
(zero pseudo-pan -> 0). The reference upsamples the multispectral
bands to the pan resolution first; here bands share one grid (the
upsample is `warp`/`pyramid` composed upstream).

Distributed shape: bands are tile DataFrames on the same grid; one
equi-join on the tile key co-locates all bands of a tile in one task
(no data movement beyond the join shuffle), then the fusion is pure
numpy per tile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import grid as G

_OUT = T.StructType([
    T.StructField("tile_y", T.IntegerType(), False),
    T.StructField("tile_x", T.IntegerType(), False),
    T.StructField("band", T.IntegerType(), False),
    T.StructField("px", T.ArrayType(T.DoubleType()), False),
])


def pansharpen_np(pan: np.ndarray, bands: list[np.ndarray],
                  weights: list[float] | None = None) -> list[np.ndarray]:
    w = weights or [1.0 / len(bands)] * len(bands)
    pseudo = sum(wi * b for wi, b in zip(w, bands))
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(pseudo != 0, pan / np.where(pseudo != 0, pseudo, 1.0), 0.0)
    return [b * ratio for b in bands]


def pansharpen(pan: DataFrame, bands: list[DataFrame],
               weights: list[float] | None = None) -> DataFrame:
    """-> (tile_y, tile_x, band, px) fused tiles; band i follows the
    order of `bands`. Tiles missing from any input are treated as
    zeros (sparse convention)."""
    w = weights or [1.0 / len(bands)] * len(bands)
    tagged = pan.select("tile_y", "tile_x", F.lit(-1).alias("band"), "px")
    for i, b in enumerate(bands):
        tagged = tagged.unionByName(
            b.select("tile_y", "tile_x", F.lit(i).alias("band"), "px"))

    n_bands = len(bands)

    def fuse(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        arrs = {int(r["band"]): np.asarray(r["px"], np.float64)
                for _, r in pdf.iterrows()}
        size = len(next(iter(arrs.values())))
        pan_a = arrs.get(-1, np.zeros(size))
        bs = [arrs.get(i, np.zeros(size)) for i in range(n_bands)]
        fused = pansharpen_np(pan_a, bs, w)
        return pd.DataFrame({
            "tile_y": [ty] * n_bands, "tile_x": [tx] * n_bands,
            "band": list(range(n_bands)),
            "px": [f.tolist() for f in fused]})

    return tagged.groupBy("tile_y", "tile_x").applyInPandas(fuse, _OUT)
