"""KML source + sink via the stdlib XML parser.

Reference: the KML driver (ogr/ogrsf_frmts/kml/: kml.cpp expat-based
document walk, kmlnode.cpp Placemark extraction, ogrkmllayer.cpp
feature mapping, ogr2kmlgeometry.cpp geometry serialization). KML is
one XML DOCUMENT per file, so — exactly like the reference and like
the FeatureCollection GeoJSON path — the unit of read parallelism is
the FILE: binaryFile + one ElementTree parse per file in mapInPandas.
Use GeoJSONSeq/parquet when one enormous layer must split.

Mapping (ogrkmllayer.cpp semantics): one feature per <Placemark>;
<name> and <description> become the name/description fields;
<ExtendedData><Data name=..><value> pairs become string attributes;
geometry from <Point>/<LineString>/<Polygon>/<MultiGeometry>
<coordinates> (lon,lat[,alt] triplets — altitude dropped, the 2-D
promotion OGR applies by default). Writer emits the same shape,
driver-side under a max_features guard (one XML document is a
single-writer artifact).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import wkb

_NS = "{http://www.opengis.net/kml/2.2}"


def _strip(tag: str) -> str:
    return tag.split("}")[-1]


def _coords(text: str) -> np.ndarray:
    pts = []
    for tok in (text or "").split():
        parts = tok.split(",")
        if len(parts) >= 2:
            pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, np.float64)


def _geom_from_node(node) -> bytes | None:
    t = _strip(node.tag)
    if t == "Point":
        c = _coords(node.findtext(f"{_NS}coordinates")
                    or node.findtext("coordinates"))
        return wkb.point(float(c[0, 0]), float(c[0, 1])) if len(c) else None
    if t == "LineString":
        c = _coords(node.findtext(f"{_NS}coordinates")
                    or node.findtext("coordinates"))
        return wkb.linestring(c) if len(c) else None
    if t == "Polygon":
        rings = []
        for bound in list(node):
            b = _strip(bound.tag)
            if b in ("outerBoundaryIs", "innerBoundaryIs"):
                for ring in bound.iter():
                    if _strip(ring.tag) == "coordinates":
                        c = _coords(ring.text)
                        if len(c):
                            rings.append(c)
        return wkb.polygon(rings) if rings else None
    if t == "MultiGeometry":
        kids = [g for g in (_geom_from_node(k) for k in list(node))
                if g is not None]
        if not kids:
            return None
        types = {wkb.decode(k)[0] for k in kids}
        if types == {wkb.POINT}:
            return wkb.multipoint(np.array(
                [wkb.decode(k)[1] for k in kids]))
        if types == {wkb.LINESTRING}:
            return wkb.multilinestring([wkb.decode(k)[1] for k in kids])
        if types == {wkb.POLYGON}:
            return wkb.multipolygon([wkb.decode(k)[1] for k in kids])
        return wkb.collection(kids)
    return None


_GEOM_TAGS = ("Point", "LineString", "Polygon", "MultiGeometry")


def parse_kml(data: bytes):
    """-> list of (name, description, extended:dict, geom_wkb)."""
    root = ET.fromstring(data)
    out = []
    for pm in root.iter():
        if _strip(pm.tag) != "Placemark":
            continue
        name = desc = None
        ext: dict[str, str] = {}
        g = None
        for child in list(pm):
            t = _strip(child.tag)
            if t == "name":
                name = child.text
            elif t == "description":
                desc = child.text
            elif t == "ExtendedData":
                for d in child.iter():
                    if _strip(d.tag) == "Data":
                        k = d.get("name")
                        v = None
                        for vv in d.iter():
                            if _strip(vv.tag) == "value":
                                v = vv.text
                        if k is not None:
                            ext[k] = v
            elif t in _GEOM_TAGS:
                g = _geom_from_node(child)
        out.append((name, desc, ext, g))
    return out


def read_kml(spark: SparkSession, path: str,
             geom_col: str = "geom") -> DataFrame:
    """One task per .kml file; schema = name, description, the union
    of ExtendedData keys (probed from the first file, as OGR probes
    the layer schema), and WKB geometry."""
    files = (spark.read.format("binaryFile").load(path)
             .select("content"))
    first = files.limit(1).collect()
    if not first:
        raise FileNotFoundError(path)
    keys = sorted({k for _n, _d, ext, _g in parse_kml(bytes(
        first[0].content)) for k in ext})
    schema = ("name string, description string, "
              + "".join(f"`{k}` string, " for k in keys)
              + f"{geom_col} binary")

    def gen(batches):
        for pdf in batches:
            for content in pdf["content"]:
                rows = parse_kml(bytes(content))
                data = {
                    "name": [r[0] for r in rows],
                    "description": [r[1] for r in rows],
                }
                for k in keys:
                    data[k] = [r[2].get(k) for r in rows]
                data[geom_col] = [r[3] for r in rows]
                yield pd.DataFrame(
                    data, columns=["name", "description", *keys,
                                   geom_col])

    return files.mapInPandas(gen, schema=schema)


def _geom_to_kml(buf: bytes) -> str:
    t, payload = wkb.decode(bytes(buf))

    def coords(arr):
        return " ".join(f"{x!r},{y!r}" for x, y in np.asarray(arr))

    if t == wkb.POINT:
        return (f"<Point><coordinates>{payload[0]!r},{payload[1]!r}"
                "</coordinates></Point>")
    if t == wkb.LINESTRING:
        return (f"<LineString><coordinates>{coords(payload)}"
                "</coordinates></LineString>")
    if t == wkb.POLYGON:
        parts = [f"<outerBoundaryIs><LinearRing><coordinates>"
                 f"{coords(payload[0])}</coordinates></LinearRing>"
                 "</outerBoundaryIs>"]
        for hole in payload[1:]:
            parts.append(
                f"<innerBoundaryIs><LinearRing><coordinates>"
                f"{coords(hole)}</coordinates></LinearRing>"
                "</innerBoundaryIs>")
        return "<Polygon>" + "".join(parts) + "</Polygon>"
    if t == wkb.MULTIPOINT:
        kids = "".join(_geom_to_kml(wkb.point(x, y)) for x, y in payload)
        return f"<MultiGeometry>{kids}</MultiGeometry>"
    if t == wkb.MULTILINESTRING:
        kids = "".join(_geom_to_kml(wkb.linestring(l)) for l in payload)
        return f"<MultiGeometry>{kids}</MultiGeometry>"
    if t == wkb.MULTIPOLYGON:
        kids = "".join(_geom_to_kml(wkb.polygon(p)) for p in payload)
        return f"<MultiGeometry>{kids}</MultiGeometry>"
    raise ValueError(f"cannot serialize WKB type {t} to KML")


def _esc(s) -> str:
    # &quot; is required in the <Data name="..."> attribute position
    # (harmless in text content)
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def write_kml(df: DataFrame, path: str, geom_col: str = "geom",
              name_col: str | None = None,
              max_features: int = 1_000_000) -> None:
    """One KML document (Document of Placemarks; single-writer by
    format, guarded). Non-geometry columns become ExtendedData
    strings; name_col (if given) feeds <name>."""
    n = df.count()
    if n > max_features:
        raise ValueError(
            f"{n} features > max_features={max_features}: a KML file "
            "is one XML document; use GeoJSONSeq/parquet at scale")
    attrs = [c for c in df.columns if c not in (geom_col, name_col)]
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n'
                '<kml xmlns="http://www.opengis.net/kml/2.2">'
                "<Document>\n")
        for row in df.toLocalIterator():
            f.write("<Placemark>")
            if name_col is not None and row[name_col] is not None:
                f.write(f"<name>{_esc(row[name_col])}</name>")
            if attrs:
                f.write("<ExtendedData>")
                for a in attrs:
                    v = row[a]
                    f.write(f'<Data name="{_esc(a)}"><value>'
                            f"{_esc(v) if v is not None else ''}"
                            "</value></Data>")
                f.write("</ExtendedData>")
            g = row[geom_col]
            if g is not None:
                f.write(_geom_to_kml(bytes(g)))
            f.write("</Placemark>\n")
        f.write("</Document></kml>\n")
