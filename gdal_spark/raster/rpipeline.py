"""`gdal raster pipeline` analog: fluent chain over (GridSpec, tiles).

Reference: apps/gdalalg_raster_pipeline.cpp:174-241 registers the step
algorithms (read ! clip ! resize ! reproject ! calc ! color-map !
slope/aspect/... ! sieve ! fill-nodata ! contour ! polygonize !
write); each step here maps 1:1 onto an existing distributed operator,
so chaining adds no new execution machinery — the pipeline object just
threads (spec, tiles) through them, mirroring plans/pipeline.py on the
vector side.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import calc as C
from . import focal as RF
from . import geotiff as GT
from . import grid as G
from . import warp as W

RSTEPS: dict[str, Callable] = {}


def rstep(name: str):
    def deco(fn):
        RSTEPS[name] = fn
        return fn
    return deco


class RasterPipeline:
    """Threaded (spec, tiles) state; every step returns a new pipeline."""

    def __init__(self, spark: SparkSession, spec: G.GridSpec,
                 tiles: DataFrame):
        self.spark = spark
        self.spec = spec
        self.tiles = tiles

    @classmethod
    def read(cls, spark: SparkSession, path: str,
             **kw) -> "RasterPipeline":
        spec, tiles = GT.read_geotiff(spark, path, **kw)
        return cls(spark, spec, tiles)

    @classmethod
    def of(cls, spark: SparkSession, spec: G.GridSpec,
           tiles: DataFrame) -> "RasterPipeline":
        return cls(spark, spec, tiles)

    def step(self, name: str, **kw) -> "RasterPipeline":
        if name not in RSTEPS:
            raise ValueError(f"unknown raster step {name!r}; "
                             f"have {sorted(RSTEPS)}")
        tiles, spec = RSTEPS[name](self.tiles, self.spec, **kw)
        return RasterPipeline(self.spark, spec, tiles)

    def write(self, path: str, **kw) -> "RasterPipeline":
        GT.write_geotiff(self.tiles, self.spec, path, **kw)
        return self

    def df(self) -> DataFrame:
        return self.tiles


@rstep("clip")
def _clip(tiles, spec, x0: int, y0: int, w: int, h: int):
    return C.crop(tiles, spec, x0, y0, w, h)


@rstep("resize")
def _resize(tiles, spec, w: int, h: int, kernel: str = "bilinear"):
    return C.resize(tiles, spec, w, h, kernel=kernel)


@rstep("reproject")
def _reproject(tiles, spec, dst_crs: str, kernel: str = "near",
               tile: int = 256, dst_spec: G.GridSpec | None = None):
    dst = dst_spec or W.suggested_warp_output(spec, dst_crs, tile=tile)
    return W.warp(tiles, spec, dst, kernel=kernel), dst


@rstep("calc")
def _calc(tiles, spec, fn):
    return C.calc(tiles, fn), spec


@rstep("scale")
def _scale(tiles, spec, src_min: float, src_max: float,
           dst_min: float = 0.0, dst_max: float = 1.0):
    a = (dst_max - dst_min) / (src_max - src_min)
    return C.calc(tiles, lambda v: (v - F.lit(float(src_min))) * F.lit(a)
                  + F.lit(float(dst_min))), spec


@rstep("reclassify")
def _reclassify(tiles, spec, bounds, values):
    return C.reclassify(tiles, bounds, values), spec


@rstep("color-map")
def _color_map(tiles, spec, ramp, channel: str = "r",
               nearest: bool = False):
    rgb = C.color_relief(tiles, ramp, nearest=nearest)
    return (rgb.select("tile_y", "tile_x",
                       F.col(channel).alias("px")), spec)


@rstep("slope")
def _slope(tiles, spec, z_factor: float = 1.0):
    return RF.focal(tiles, spec, "slope", z_factor=z_factor), spec


@rstep("aspect")
def _aspect(tiles, spec):
    return RF.focal(tiles, spec, "aspect"), spec


@rstep("hillshade")
def _hillshade(tiles, spec, z_factor: float = 1.0):
    return RF.focal(tiles, spec, "hillshade", z_factor=z_factor), spec


@rstep("sieve")
def _sieve(tiles, spec, threshold: int, connect8: bool = False):
    from . import sieve as SV
    return SV.sieve(tiles, spec, threshold, connect8=connect8), spec


@rstep("fill-nodata")
def _fillnodata(tiles, spec, nodata: float = 0.0, iterations: int = 3):
    return RF.fillnodata(tiles, spec, nodata=nodata,
                         iterations=iterations), spec


@rstep("overview")
def _overview(tiles, spec, kernel: str = "average",
              nodata: float | None = None):
    return GT.overview_once(tiles, spec, kernel=kernel, nodata=nodata)


@rstep("unscale")
def _unscale(tiles, spec, scale: float = 1.0, offset: float = 0.0):
    """`gdal raster unscale`: apply the band scale/offset
    (v * scale + offset), the inverse of a -scale write."""
    return C.calc(tiles, lambda v: v * F.lit(float(scale))
                  + F.lit(float(offset))), spec


@rstep("nodata-edit")
def _nodata_edit(tiles, spec, src: float, dst: float):
    """`gdal raster nodata-edit`-style value replacement."""
    return C.calc(tiles, lambda v: F.when(v == F.lit(float(src)),
                                          F.lit(float(dst)))
                  .otherwise(v)), spec


def create(spark: SparkSession, spec: G.GridSpec,
           value: float = 0.0) -> "RasterPipeline":
    """`gdal raster create`: constant raster — tiles generated
    DISTRIBUTED from a range over tile ids (no driver materialization;
    apps/gdalalg_raster_create.cpp)."""
    ntx = spec.tiles_x
    ids = spark.range(ntx * spec.tiles_y)
    full = spec.tile * spec.tile

    @F.pandas_udf("array<double>")
    def fill(ty, tx):
        import pandas as pd
        out = []
        for y, x in zip(ty, tx):
            h, w = spec.tile_shape(int(y), int(x))
            out.append([float(value)] * (h * w))
        return pd.Series(out)

    tiles = (ids.select(
        (F.col("id") / ntx).cast("int").alias("tile_y"),
        (F.col("id") % ntx).cast("int").alias("tile_x"))
        .withColumn("px", fill("tile_y", "tile_x")))
    return RasterPipeline(spark, spec, tiles)


def stack(pipelines: list["RasterPipeline"], path: str,
          **kw) -> None:
    """`gdal raster stack`: same-grid single-band inputs -> one
    multi-band GeoTIFF (separate planes)."""
    spec0 = pipelines[0].spec
    for p in pipelines[1:]:
        if p.spec != spec0:
            raise ValueError("stack inputs must share one grid")
    GT.write_geotiff_bands([p.tiles for p in pipelines], spec0, path,
                           **kw)


def blend(base: DataFrame, overlay: DataFrame, mode: str = "src-over",
          opacity: float = 100.0, vmax: float = 255.0) -> DataFrame:
    """`gdal raster blend` (apps/gdalalg_raster_blend.cpp:46-53
    composition modes over byte-range values, Porter-Duff / W3C
    compositing formulas): src-over, multiply, screen, overlay,
    darken, lighten with an overlay opacity percentage. Pure JVM —
    one full join on the tile key + zip_with; a tile missing on one
    side passes the other side through."""
    a = opacity / 100.0

    def combine(b, o):
        if mode == "src-over":
            out = o
        elif mode == "multiply":
            out = b * o / F.lit(vmax)
        elif mode == "screen":
            out = F.lit(vmax) - (F.lit(vmax) - b) * (F.lit(vmax) - o) \
                / F.lit(vmax)
        elif mode == "overlay":
            out = F.when(
                b < F.lit(vmax / 2.0), F.lit(2.0) * b * o / F.lit(vmax)
            ).otherwise(F.lit(vmax) - F.lit(2.0) * (F.lit(vmax) - b)
                        * (F.lit(vmax) - o) / F.lit(vmax))
        elif mode == "darken":
            out = F.least(b, o)
        elif mode == "lighten":
            out = F.greatest(b, o)
        else:
            raise ValueError(
                f"mode {mode!r}: want src-over|multiply|screen|overlay"
                "|darken|lighten")
        return b * F.lit(1.0 - a) + out * F.lit(a)

    j = (base.select("tile_y", "tile_x", F.col("px").alias("pb"))
         .join(overlay.select("tile_y", "tile_x",
                              F.col("px").alias("po")),
               ["tile_y", "tile_x"], "full"))
    return j.select(
        "tile_y", "tile_x",
        F.when(F.col("pb").isNull(), F.col("po"))
        .when(F.col("po").isNull(), F.col("pb"))
        .otherwise(F.zip_with("pb", "po", combine)).alias("px"))


# ----------------------------------------------------- terminal helpers


def as_features(tiles: DataFrame, spec: G.GridSpec,
                geometry: str = "polygon",
                skip_value: float | None = 0.0) -> DataFrame:
    """`gdal raster as-features` (apps/gdalalg_raster_as_features.cpp):
    one vector feature per pixel — (px_x, px_y, value, geom), geometry
    the pixel footprint polygon or its center point. Row explosion is
    the operator's nature; skip_value drops background pixels first
    (the tool's default nodata skip), and the explosion runs
    distributed per tile."""
    import pandas as pd

    from ..geo import wkb as _wkb

    if geometry not in ("polygon", "point"):
        raise ValueError("geometry: want 'polygon' or 'point'")

    def gen(batches):
        import numpy as np
        for pdf in batches:
            out = {"px_x": [], "px_y": [], "value": [], "geom": []}
            for _, r in pdf.iterrows():
                ty, tx = int(r.tile_y), int(r.tile_x)
                h, w = spec.tile_shape(ty, tx)
                a = np.asarray(r.px, np.float64).reshape(h, w)
                ys, xs = np.nonzero(a != skip_value) \
                    if skip_value is not None else \
                    np.indices((h, w)).reshape(2, -1)
                gx = xs + tx * spec.tile
                gy = ys + ty * spec.tile
                for x, y, v in zip(gx, gy, a[ys, xs]):
                    x0 = spec.gt[0] + x * spec.gt[1]
                    y0 = spec.gt[3] + y * spec.gt[5]
                    x1, y1 = x0 + spec.gt[1], y0 + spec.gt[5]
                    if geometry == "point":
                        g = _wkb.point((x0 + x1) / 2, (y0 + y1) / 2)
                    else:
                        g = _wkb.polygon([[(x0, y0), (x1, y0), (x1, y1),
                                           (x0, y1), (x0, y0)]])
                    out["px_x"].append(int(x))
                    out["px_y"].append(int(y))
                    out["value"].append(float(v))
                    out["geom"].append(g)
            yield pd.DataFrame(out)

    return tiles.mapInPandas(
        gen, schema="px_x long, px_y long, value double, geom binary")


def compare(a: DataFrame, b: DataFrame) -> dict:
    """`gdal raster compare` (apps/gdalalg_raster_compare.cpp): pixel
    diff statistics of two same-grid tile relations — entirely
    JVM-side (zip_with + aggregate, no Python stage)."""
    j = (a.select("tile_y", "tile_x", F.col("px").alias("pa"))
         .join(b.select("tile_y", "tile_x", F.col("px").alias("pb")),
               ["tile_y", "tile_x"], "full"))
    diff = F.zip_with("pa", "pb",
                      lambda x, y: F.abs(F.coalesce(x, F.lit(0.0))
                                         - F.coalesce(y, F.lit(0.0))))
    absd = lambda c: F.transform(c, lambda v: F.abs(v))
    r = (j.select(F.explode(
            F.when(F.col("pa").isNull(), absd(F.col("pb")))
            .when(F.col("pb").isNull(), absd(F.col("pa")))
            .otherwise(diff)).alias("d"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum((F.col("d") != 0).cast("long")).alias("n_diff"),
              F.max("d").alias("max_abs"),
              F.avg("d").alias("mean_abs")).collect()[0])
    return {"n_px": r.n, "n_diff": r.n_diff,
            "max_abs": float(r.max_abs or 0.0),
            "mean_abs": float(r.mean_abs or 0.0),
            "identical": r.n_diff == 0}
