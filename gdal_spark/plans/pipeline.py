"""The `gdal vector ...` pipeline as a DataFrame transform chain.

Reference: the step registry of apps/gdalalg_vector_pipeline.cpp:144-224
(read, filter, select, sql, reproject, make-point, explode, limit,
sort, dissolve, buffer, simplify, swap-xy, clip, edit, rename-layer,
tee, write, ...). Each reference step wraps the previous layer in a
lazily-translating layer (OGRLayerWithTranslateFeature) — exactly a
lazy DataFrame transform, so the mapping is 1:1 and the whole pipeline
stays a single Catalyst plan until an action runs.

Usage:
    Pipeline(spark).read_parquet(path)\
        .step("filter", where="lang = 'en'")\
        .step("make_point", x="lon", y="lat")\
        .step("sort", spatial=True)\
        .df()

Steps not meaningful for our engine's columnar geometry model
(export-schema, set-field-type, ...) are plain Spark schema ops and
are intentionally not duplicated here.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import cells, mercator

STEPS: dict[str, Callable] = {}


def step_impl(name: str):
    def deco(fn):
        STEPS[name] = fn
        return fn
    return deco


@step_impl("filter")
def _filter(df: DataFrame, where: str | None = None,
            bbox: tuple | None = None, lon: str = "lon",
            lat: str = "lat") -> DataFrame:
    """gdalalg_vector_filter.cpp: --where and/or --bbox."""
    if where:
        df = df.filter(where)
    if bbox:
        minx, miny, maxx, maxy = bbox
        df = df.filter(F.col(lon).between(minx, maxx)
                       & F.col(lat).between(miny, maxy))
    return df


@step_impl("select")
def _select(df: DataFrame, cols: list[str] | None = None,
            exclude: list[str] | None = None) -> DataFrame:
    """select list incl. EXCLUDE (swq_parser.y:866)."""
    if exclude:
        return df.drop(*exclude)
    return df.select(*cols)


@step_impl("make_point")
def _make_point(df: DataFrame, x: str, y: str,
                out: str = "geom") -> DataFrame:
    from ..functions.st_funcs import st_makepoint
    return df.withColumn(out, st_makepoint(F.col(x).cast("double"),
                                           F.col(y).cast("double")))


@step_impl("reproject")
def _reproject(df: DataFrame, dst_crs: str = "EPSG:3857",
               lon: str = "lon", lat: str = "lat") -> DataFrame:
    """4326 <-> 3857 column reprojection (closed-form, JVM)."""
    if dst_crs == "EPSG:3857":
        return (df.withColumn("x_3857", mercator.merc_x_col(F.col(lon)))
                .withColumn("y_3857", mercator.merc_y_col(F.col(lat))))
    raise NotImplementedError(dst_crs)


@step_impl("explode")
def _explode(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    return df.withColumn(out or col, F.explode(F.col(col)))


@step_impl("limit")
def _limit(df: DataFrame, n: int, offset: int = 0) -> DataFrame:
    return (df.offset(offset) if offset else df).limit(n)


@step_impl("sort")
def _sort(df: DataFrame, by: list[str] | None = None,
          spatial: bool = False, lon: str = "lon", lat: str = "lat",
          res: int = cells.DEFAULT_RES) -> DataFrame:
    """gdalalg_vector_sort.cpp: attribute sort, or spatial clustering
    by the space-filling cell id (the hilbert-method analog)."""
    if spatial:
        key = cells.cell_encode_col(F.col(lon), F.col(lat), res)
        # range-partition + in-partition sort by the Z-order key: rows
        # land spatially clustered WITHOUT a total-order merge — the
        # distributed form of the reference's hilbert sort
        return (df.withColumn("__sk", key).repartitionByRange("__sk")
                .sortWithinPartitions("__sk").drop("__sk"))
    return df.orderBy(*by)


@step_impl("dissolve")
def _dissolve(df: DataFrame, by: str, lon: str = "lon", lat: str = "lat",
              res: int = cells.DEFAULT_RES) -> DataFrame:
    """Coverage dissolve: per group, occupied-cell footprint."""
    key = cells.cell_encode_col(F.col(lon), F.col(lat), res)
    return (df.withColumn("__cell", key).groupBy(by)
            .agg(F.countDistinct("__cell").alias("n_cells"),
                 F.count(F.lit(1)).alias("n_rows")))


@step_impl("buffer")
def _buffer(df: DataFrame, dist: float, x: str = "lon", y: str = "lat",
            out: str = "geom") -> DataFrame:
    from ..functions.st_funcs import st_buffer_point
    return df.withColumn(out, st_buffer_point(
        F.col(x).cast("double"), F.col(y).cast("double"), F.lit(float(dist))))


@step_impl("simplify")
def _simplify(df: DataFrame, tol: float, col: str = "geom") -> DataFrame:
    from ..functions.st_funcs import st_simplify
    return df.withColumn(col, st_simplify(F.col(col), F.lit(float(tol))))


@step_impl("segmentize")
def _segmentize(df: DataFrame, max_len: float, col: str = "geom") -> DataFrame:
    from ..functions.st_funcs import st_segmentize
    return df.withColumn(col, st_segmentize(F.col(col), F.lit(float(max_len))))


@step_impl("clip_geom")
def _clip_geom(df: DataFrame, bbox: tuple, col: str = "geom") -> DataFrame:
    from ..functions.st_funcs import st_clip_bbox
    minx, miny, maxx, maxy = (float(v) for v in bbox)
    return df.withColumn(col, st_clip_bbox(
        F.col(col), F.lit(minx), F.lit(miny), F.lit(maxx), F.lit(maxy)))


@step_impl("swap_xy")
def _swap_xy(df: DataFrame, x: str = "lon", y: str = "lat") -> DataFrame:
    return (df.withColumn("__t", F.col(x)).withColumn(x, F.col(y))
            .withColumn(y, F.col("__t")).drop("__t"))


@step_impl("clip")
def _clip(df: DataFrame, bbox: tuple, lon: str = "lon",
          lat: str = "lat") -> DataFrame:
    return _filter(df, bbox=bbox, lon=lon, lat=lat)


@step_impl("edit")
def _edit(df: DataFrame, **cols) -> DataFrame:
    for name, expr in cols.items():
        df = df.withColumn(name, F.expr(expr))
    return df


@step_impl("tee")
def _tee(df: DataFrame) -> DataFrame:
    """Cache the branch point (the reference's tee writes a side copy;
    ours persists so both branches reuse one computation)."""
    return df.persist()


class Pipeline:
    """Chainable pipeline front-end over the step registry."""

    def __init__(self, spark: SparkSession, df: DataFrame | None = None):
        self.spark = spark
        self._df = df

    def read_parquet(self, path: str) -> "Pipeline":
        return Pipeline(self.spark, self.spark.read.parquet(path))

    def from_df(self, df: DataFrame) -> "Pipeline":
        return Pipeline(self.spark, df)

    def step(self, name: str, **kw) -> "Pipeline":
        if name not in STEPS:
            raise KeyError(f"unknown pipeline step {name!r}; "
                           f"have {sorted(STEPS)}")
        return Pipeline(self.spark, STEPS[name](self._df, **kw))

    def write_parquet(self, path: str, partition_by: list[str] | None = None):
        w = self._df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        return self

    def df(self) -> DataFrame:
        return self._df
