"""Proximity raster: per-pixel distance to the nearest target pixel.

Reference: alg/gdalproximity.cpp:94 `GDALComputeProximity` — for each
pixel, the euclidean PIXEL distance to the nearest pixel whose value
is in the target set, capped at maxdist (beyond -> nodata/maxdist).
The reference runs a two-pass chamfer over scanlines (approximate at
the margins); both of our strategies are EXACT.

Two physical strategies, bit-identical outputs:

  broadcast — target pixels of a density-style raster are its sparse
      nonzero relation, usually MUCH smaller than the raster: ship the
      target coordinate array to every task and compute each tile's
      distance field vectorized. Guarded by MAX_BROADCAST_TARGETS.

  ring (scale path, no driver collect) — the distributed restatement
      of the reference's outward search: (1) a tile-level ring search
      (the kNN ring-join pattern one level coarser: offsets cross-join
      + equi-join on target TILE keys, ring doubling) finds each output
      tile's Chebyshev distance r0 to its nearest target tile; (2) each
      tile gathers all targets within the provably-sufficient radius
      R = ceil(sqrt(2) * (r0 + 1)) + 1 tiles — any target outside R is
      farther from every pixel of the tile than the nearest one, so the
      per-tile vectorized min over the gathered candidates is the exact
      answer; (3) with a finite max_dist, gathering caps at
      ceil(max_dist/tile) + 1 rings and never-reached tiles emit pure
      nodata. Work per tile scales with local target density, and the
      target relation is only ever hash-joined on tile keys — at 100 TB
      nothing funnels through the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.knn import _ring_offsets
from . import grid as G

MAX_BROADCAST_TARGETS = 2_000_000


def _targets_of(tiles: DataFrame, spec: G.GridSpec) -> DataFrame:
    """Sparse target relation: (gx, gy) of nonzero pixels."""
    t = spec.tile
    return (tiles.select(
        "tile_y", "tile_x",
        F.posexplode("px").alias("pxi", "v"))
        .filter(F.col("v") != 0)
        .select((F.col("tile_x") * t + F.col("pxi") % t).alias("gx"),
                (F.col("tile_y") * t + (F.col("pxi") / t).cast("int")).alias("gy")))


def _dist_field(key, cand_x: np.ndarray, cand_y: np.ndarray,
                spec: G.GridSpec, max_dist: float, nodata: float):
    """Exact per-tile distance field over gathered candidates (chunked
    to bound the (pixels x candidates) matrix). Shared by both
    strategies so they are bit-identical."""
    t = spec.tile
    ty_, tx_ = int(key[0]), int(key[1])
    h, w = spec.tile_shape(ty_, tx_)
    gx, gy = np.meshgrid(np.arange(tx_ * t, tx_ * t + w, dtype=np.float64),
                         np.arange(ty_ * t, ty_ * t + h, dtype=np.float64))
    px = gx.ravel()
    py = gy.ravel()
    if len(cand_x) == 0:
        out = np.full(px.shape, float(nodata))
    else:
        out = np.empty(px.shape)
        step = max(1, int(4_000_000 // max(len(cand_x), 1)))
        for i in range(0, len(px), step):
            dx = px[i:i + step, None] - cand_x[None, :]
            dy = py[i:i + step, None] - cand_y[None, :]
            out[i:i + step] = np.sqrt((dx * dx + dy * dy).min(axis=1))
        out = np.where(out <= max_dist, out, nodata)
    return pd.DataFrame({"tile_y": [ty_], "tile_x": [tx_],
                         "px": [out.tolist()]})


def proximity(tiles: DataFrame, spec: G.GridSpec,
              max_dist: float = float("inf"),
              nodata: float = -1.0,
              strategy: str = "auto") -> DataFrame:
    """-> distance tiles over the SAME tile set. Pixels farther than
    max_dist from every target get `nodata` (gdalproximity maxdist
    semantics). Distance unit: pixels.

    strategy: 'broadcast' | 'ring' | 'auto' (broadcast while the
    target count fits the budget, else ring)."""
    if strategy == "ring":
        return proximity_ring(tiles, spec, max_dist, nodata)
    targets = _targets_of(tiles, spec)
    if strategy == "auto" and targets.limit(
            MAX_BROADCAST_TARGETS + 1).count() > MAX_BROADCAST_TARGETS:
        return proximity_ring(tiles, spec, max_dist, nodata)
    rows = targets.collect()
    if len(rows) > MAX_BROADCAST_TARGETS:
        raise ValueError(
            f"{len(rows)} target pixels exceed the broadcast budget; "
            "use strategy='ring'")
    tx = np.array([r["gx"] for r in rows], dtype=np.float64)
    ty = np.array([r["gy"] for r in rows], dtype=np.float64)
    b = tiles.sparkSession.sparkContext.broadcast((tx, ty))

    def dist_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ctx, cty = b.value
        return _dist_field(key, ctx, cty, spec, max_dist, nodata)

    return tiles.groupBy("tile_y", "tile_x").applyInPandas(dist_tile, G.TILE_SCHEMA)


def proximity_ring(tiles: DataFrame, spec: G.GridSpec,
                   max_dist: float = float("inf"),
                   nodata: float = -1.0) -> DataFrame:
    """Scale path: tile-level ring search + bounded candidate gather.
    Exact (bit-identical to the broadcast path); no driver collect of
    pixel data — only log-many isEmpty round checks."""
    spark = tiles.sparkSession
    t = spec.tile
    targets = (_targets_of(tiles, spec)
               .withColumn("t_ty", (F.col("gy") / t).cast("int"))
               .withColumn("t_tx", (F.col("gx") / t).cast("int"))
               .persist())
    target_tiles = targets.select("t_ty", "t_tx").distinct().persist()
    out_keys = tiles.select("tile_y", "tile_x").distinct()

    # ring cap: beyond it every target is > max_dist from every pixel
    # of the tile ((r-1)*t > max_dist), so the tile is pure nodata
    grid_reach = max(spec.tiles_y, spec.tiles_x)
    if np.isfinite(max_dist):
        r_cap = min(int(np.ceil(max_dist / t)) + 1, grid_reach)
    else:
        r_cap = grid_reach

    # phase 1: Chebyshev tile distance r0 to the nearest target tile,
    # by doubling window probes (exact: a window of radius r contains
    # every tile with cheb <= r, so the min over hits is the true r0)
    cheb = F.greatest(F.abs(F.col("dy")), F.abs(F.col("dx")))
    found = None
    pending = out_keys
    ring = 1
    while True:
        ring = min(ring, r_cap)
        offs = _ring_offsets(spark, ring)
        expand = (pending.crossJoin(F.broadcast(offs))
                  .select("tile_y", "tile_x",
                          (F.col("tile_y") + F.col("dy")).alias("t_ty"),
                          (F.col("tile_x") + F.col("dx")).alias("t_tx"),
                          cheb.alias("cheb")))
        hits = (expand.join(target_tiles, ["t_ty", "t_tx"])
                .groupBy("tile_y", "tile_x")
                .agg(F.min("cheb").alias("r0")).persist())
        found = hits if found is None else found.unionByName(hits)
        pending = pending.join(hits.select("tile_y", "tile_x"),
                               ["tile_y", "tile_x"], "left_anti").persist()
        if ring >= r_cap or pending.isEmpty():
            break
        ring *= 2

    # tiles with no target within r_cap: pure-nodata output
    def nodata_tile(key, pdf):
        return _dist_field(key, np.empty(0), np.empty(0), spec,
                           max_dist, nodata)

    nodata_tiles = (pending.groupBy("tile_y", "tile_x")
                    .applyInPandas(nodata_tile, G.TILE_SCHEMA))

    # phase 2: gather every target within R(r0) rings and take the
    # exact per-pixel min. R bound: nearest target is within
    # (r0+1)*t*sqrt(2) of any pixel; a tile at cheb r' holds no pixel
    # closer than (r'-1)*t, so r' <= 1 + sqrt(2)*(r0+1) suffices.
    r_gather = F.least(
        (F.ceil(F.lit(float(np.sqrt(2.0))) * (F.col("r0") + 1)) + 1),
        F.lit(r_cap)).cast("int")
    g = found.withColumn("rg", r_gather)
    max_rg_row = g.agg(F.max("rg")).collect()[0][0]
    if max_rg_row is None:  # no targets at all
        return (out_keys.groupBy("tile_y", "tile_x")
                .applyInPandas(nodata_tile, G.TILE_SCHEMA))
    offs = _ring_offsets(spark, int(max_rg_row))
    cand_tiles = (g.crossJoin(F.broadcast(offs))
                  .filter(cheb <= F.col("rg"))
                  .select("tile_y", "tile_x",
                          (F.col("tile_y") + F.col("dy")).alias("t_ty"),
                          (F.col("tile_x") + F.col("dx")).alias("t_tx")))
    cand = (cand_tiles.join(targets, ["t_ty", "t_tx"])
            .select("tile_y", "tile_x", "gx", "gy"))

    def dist_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return _dist_field(key, pdf["gx"].to_numpy(np.float64),
                           pdf["gy"].to_numpy(np.float64),
                           spec, max_dist, nodata)

    solved = cand.groupBy("tile_y", "tile_x").applyInPandas(
        dist_tile, G.TILE_SCHEMA)
    return solved.unionByName(nodata_tiles)


def proximity_np(canvas: np.ndarray, max_dist: float = float("inf"),
                 nodata: float = -1.0) -> np.ndarray:
    """Single-node oracle (brute force)."""
    ys, xs = np.nonzero(canvas)
    out = np.full(canvas.shape, nodata, dtype=np.float64)
    if len(xs) == 0:
        return out
    gy, gx = np.mgrid[0:canvas.shape[0], 0:canvas.shape[1]]
    d = np.sqrt(
        (gx[..., None] - xs[None, None, :]) ** 2.0
        + (gy[..., None] - ys[None, None, :]) ** 2.0).min(axis=2)
    return np.where(d <= max_dist, d, nodata)
