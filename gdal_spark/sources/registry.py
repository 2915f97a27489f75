"""Vector driver registry: one open/write entry point dispatched by
extension, the analog of OGROpen / GDALDriverManager identification
(ogr/ogrsf_frmts/generic/ogrsfdriverregistrar.cpp; each driver's
Identify() probes the path — here the extension is the probe, like the
reference's *Identify fast paths).

CSV carries geometry as a WKT column (the reference CSV driver's
GEOMETRY=AS_WKT convention, ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp) —
`read_csv_wkt` converts the WKT column to WKB after Spark's native
distributed CSV scan, `write_csv_wkt` the reverse, so CSV stays fully
splittable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..geo import wkb


@pandas_udf(T.BinaryType())
def _wkt_to_wkb(s: pd.Series) -> pd.Series:
    return pd.Series([wkb.from_text(v) if v else None for v in s])


@pandas_udf(T.StringType())
def _wkb_to_wkt(s: pd.Series) -> pd.Series:
    return pd.Series([wkb.as_text(bytes(b)) if b is not None else None
                      for b in s])


def read_csv_wkt(spark: SparkSession, path: str, wkt_col: str = "WKT",
                 geom_col: str = "geom", **csv_opts) -> DataFrame:
    """CSV with a WKT geometry column -> DataFrame with WKB geometry.
    Spark's CSV scan stays splittable; only WKT parsing runs in Arrow
    batches."""
    opts = {"header": True, "inferSchema": True, **csv_opts}
    df = spark.read.options(**opts).csv(path)
    return (df.withColumn(geom_col, _wkt_to_wkb(F.col(wkt_col)))
            .drop(wkt_col))


def write_csv_wkt(df: DataFrame, path: str, geom_col: str = "geom",
                  wkt_col: str = "WKT", mode: str = "overwrite") -> None:
    (df.withColumn(wkt_col, _wkb_to_wkt(F.col(geom_col))).drop(geom_col)
       .write.mode(mode).option("header", True).csv(path))


def open_vector(spark: SparkSession, path: str, **kw) -> DataFrame:
    """OGROpen analog: dispatch on extension to the right source.
    Returns a DataFrame whose geometry column (if any) is WKB."""
    low = path.lower().rstrip("/")
    if low.endswith((".geojsonl", ".ndjson", ".geojsons")):
        from . import geojson
        return geojson.read_geojson_seq(spark, path, **kw)
    if low.endswith((".geojson", ".json")):
        from . import geojson
        return geojson.read_geojson(spark, path, **kw)
    if low.endswith(".shp"):
        from . import shapefile
        return shapefile.read_shapefile(spark, path, **kw)
    if low.endswith(".gpkg"):
        from . import geopackage
        return geopackage.read_geopackage(spark, path, **kw)
    if low.endswith(".kml"):
        from . import kml
        return kml.read_kml(spark, path, **kw)
    if low.endswith(".csv"):
        return read_csv_wkt(spark, path, **kw)
    if low.endswith((".parquet", ".pq")) or low.endswith(".orc"):
        fmt = "orc" if low.endswith(".orc") else "parquet"
        return spark.read.format(fmt).load(path)
    raise ValueError(
        f"no registered driver identifies {path!r} "
        "(have: geojsonl/geojson/shp/gpkg/kml/csv/parquet/orc)")


def write_vector(df: DataFrame, path: str, **kw) -> None:
    """ogr2ogr-style sink dispatch by output extension."""
    low = path.lower().rstrip("/")
    if low.endswith((".geojsonl", ".ndjson")):
        from . import geojson
        return geojson.write_geojson_seq(df, path, **kw)
    if low.endswith(".geojson"):
        from . import geojson
        return geojson.write_geojson(df, path, **kw)
    if low.endswith(".shp"):
        from . import shapefile
        return shapefile.write_shapefile(df, path[:-4], **kw)
    if low.endswith(".gpkg"):
        from . import geopackage
        return geopackage.write_geopackage(df, path, **kw)
    if low.endswith(".kml"):
        from . import kml
        return kml.write_kml(df, path, **kw)
    if low.endswith(".csv"):
        return write_csv_wkt(df, path, **kw)
    if low.endswith((".parquet", ".pq")):
        return df.write.mode(kw.pop("mode", "overwrite")).parquet(path)
    raise ValueError(f"no registered driver for output {path!r}")
