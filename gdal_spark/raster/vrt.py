"""VRT (virtual raster) driver — the reference's XML mosaic format.

Reference: frmts/vrt/ (vrtdataset.cpp VRTDataset/VRTRasterBand XML
model; vrtsources.cpp SimpleSource/ComplexSource SrcRect->DstRect
composition; apps/gdalbuildvrt_lib.cpp assembles one from a file
list). Format knowledge is the public VRT tutorial/schema
(gdal.org/drivers/raster/vrt.html).

Spark-first shape: a VRT is METADATA — the driver parses the XML and
each underlying GeoTIFF's IFD (kilobytes); pixel work is one
distributed pass: every source's tiles slice into fragments addressed
in the VRT grid (pure offset arithmetic) and one groupBy paints the
fragments in source order (vrtsources draw back-to-front, later
sources over earlier). Scope fences (loud): sources must be
unrotated, axis-aligned, and 1:1 scale (SrcRect size == DstRect size
— what gdalbuildvrt emits for non-resampling mosaics); resampling
sources raise, pointing at warp.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from . import grid as G

_FRAG = T.StructType([
    T.StructField("tile_y", T.IntegerType(), False),
    T.StructField("tile_x", T.IntegerType(), False),
    T.StructField("src", T.IntegerType(), False),
    T.StructField("y0", T.IntegerType(), False),
    T.StructField("x0", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("px", T.ArrayType(T.DoubleType()), False),
])


def read_vrt(spark: SparkSession, path: str, band: int = 0,
             tile: int = 256) -> tuple[G.GridSpec, DataFrame]:
    """.vrt -> (GridSpec, tile relation): parse VRTDataset XML, read
    each SimpleSource/ComplexSource's GeoTIFF window distributed, and
    paint fragments into the VRT grid in source order."""
    from . import geotiff as GT

    path = os.path.abspath(path)
    root = ET.parse(path).getroot()
    if root.tag != "VRTDataset":
        raise ValueError("not a VRTDataset XML")
    width = int(root.get("rasterXSize"))
    height = int(root.get("rasterYSize"))
    gt_el = root.find("GeoTransform")
    gt = tuple(float(v) for v in gt_el.text.split(",")) if gt_el is not None \
        else (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    crs = "EPSG:4326"
    srs_el = root.find("SRS")
    if srs_el is not None and "EPSG" in (srs_el.text or ""):
        digits = "".join(c for c in srs_el.text if c.isdigit())
        crs = f"EPSG:{digits}" if digits else crs
    bands = root.findall("VRTRasterBand")
    if band >= len(bands):
        raise ValueError(f"band {band}: VRT has {len(bands)} band(s)")
    spec = G.GridSpec(width=width, height=height, gt=gt, crs=crs,
                      tile=tile)
    nodata_el = bands[band].find("NoDataValue")
    fill = float(nodata_el.text) if nodata_el is not None else 0.0

    sources = []
    for s in bands[band]:
        if s.tag not in ("SimpleSource", "ComplexSource"):
            continue
        fn = s.find("SourceFilename")
        rel = fn.get("relativeToVRT", "0") == "1"
        src_path = fn.text if not rel else \
            os.path.join(os.path.dirname(path), fn.text)
        sr = s.find("SrcRect")
        dr = s.find("DstRect")

        def rect(e, w, h):
            if e is None:
                return (0, 0, w, h)
            return (int(float(e.get("xOff"))), int(float(e.get("yOff"))),
                    int(float(e.get("xSize"))), int(float(e.get("ySize"))))

        src_band = int(s.findtext("SourceBand", "1")) - 1
        scale_off = float(s.findtext("ScaleOffset", "0"))
        scale_ratio = float(s.findtext("ScaleRatio", "1"))
        sources.append((src_path, src_band, rect(sr, -1, -1),
                        rect(dr, -1, -1), scale_off, scale_ratio))

    frag_dfs = []
    for si, (sp, sb, srect, drect, soff, srat) in enumerate(sources):
        sspec, stiles = GT.read_geotiff(spark, sp, band=sb)
        sx, sy, sw, sh = srect if srect != (0, 0, -1, -1) \
            else (0, 0, sspec.width, sspec.height)
        dx, dy, dw, dh = drect if drect != (0, 0, -1, -1) \
            else (0, 0, sw, sh)
        if (dw, dh) != (sw, sh):
            raise NotImplementedError(
                f"VRT source {sp}: SrcRect {sw}x{sh} != DstRect "
                f"{dw}x{dh} — resampling sources are out of scope; "
                "warp the source first (raster/warp.py)")
        st = sspec.tile
        offx, offy = dx - sx, dy - sy   # src-global px -> vrt px

        def frags(batches, st=st, sspec=sspec, sx=sx, sy=sy, sw=sw,
                  sh=sh, offx=offx, offy=offy, si=si, soff=soff,
                  srat=srat):
            for pdf in batches:
                out = []
                for _, r in pdf.iterrows():
                    h, w = sspec.tile_shape(int(r.tile_y), int(r.tile_x))
                    a = np.asarray(r.px, np.float64).reshape(h, w)
                    gx0 = int(r.tile_x) * st     # src-global coords
                    gy0 = int(r.tile_y) * st
                    # clip this tile to the source window
                    cx0 = max(gx0, sx)
                    cy0 = max(gy0, sy)
                    cx1 = min(gx0 + w, sx + sw)
                    cy1 = min(gy0 + h, sy + sh)
                    if cx0 >= cx1 or cy0 >= cy1:
                        continue
                    win = a[cy0 - gy0:cy1 - gy0, cx0 - gx0:cx1 - gx0]
                    if srat != 1.0 or soff != 0.0:
                        win = win * srat + soff
                    # paint into vrt tiles
                    vx0, vy0 = cx0 + offx, cy0 + offy
                    vx1, vy1 = cx1 + offx, cy1 + offy
                    vx0c, vy0c = max(vx0, 0), max(vy0, 0)
                    vx1c = min(vx1, spec.width)
                    vy1c = min(vy1, spec.height)
                    if vx0c >= vx1c or vy0c >= vy1c:
                        continue
                    win = win[vy0c - vy0:vy1c - vy0, vx0c - vx0:vx1c - vx0]
                    for ty in range(vy0c // tile, (vy1c - 1) // tile + 1):
                        for tx in range(vx0c // tile,
                                        (vx1c - 1) // tile + 1):
                            fy0 = max(vy0c, ty * tile)
                            fy1 = min(vy1c, (ty + 1) * tile)
                            fx0 = max(vx0c, tx * tile)
                            fx1 = min(vx1c, (tx + 1) * tile)
                            frag = win[fy0 - vy0c:fy1 - vy0c,
                                       fx0 - vx0c:fx1 - vx0c]
                            out.append((ty, tx, si,
                                        fy0 - ty * tile, fx0 - tx * tile,
                                        fy1 - fy0, fx1 - fx0,
                                        frag.ravel().tolist()))
                yield pd.DataFrame(out, columns=[f.name for f in _FRAG])

        frag_dfs.append(stiles.mapInPandas(frags, _FRAG))

    allfr = frag_dfs[0]
    for fdf in frag_dfs[1:]:
        allfr = allfr.unionByName(fdf)

    def paint(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        th, tw = spec.tile_shape(ty, tx)
        canvas = np.full((th, tw), fill, np.float64)
        for _, r in pdf.sort_values("src").iterrows():
            canvas[int(r.y0):int(r.y0) + int(r.h),
                   int(r.x0):int(r.x0) + int(r.w)] = \
                np.asarray(r.px, np.float64).reshape(int(r.h), int(r.w))
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [canvas.ravel().tolist()]})

    return spec, (allfr.groupBy("tile_y", "tile_x")
                  .applyInPandas(paint, G.TILE_SCHEMA))


def build_vrt(vrt_path: str, tif_paths: list[str]) -> str:
    """gdalbuildvrt analog (apps/gdalbuildvrt_lib.cpp): probe each
    GeoTIFF's IFD (driver-side metadata only — kilobytes per file),
    take the union extent at the first file's resolution, and emit
    SimpleSources with 1:1 Src/DstRects."""
    from . import geotiff as GT

    infos = []
    for p in tif_paths:
        bo, all_tags = GT._parse_ifds(os.path.abspath(p))
        t = all_tags[0]
        w, h = t[GT._TAG_W][0], t[GT._TAG_H][0]
        sx, sy = t[GT._TAG_SCALE][0], t[GT._TAG_SCALE][1]
        tp = t[GT._TAG_TIEPOINT]
        x0 = tp[3] - tp[0] * sx
        y0 = tp[4] + tp[1] * sy
        crs = GT._geokeys_crs([int(v) for v in t[GT._TAG_GEOKEYS]]) \
            if GT._TAG_GEOKEYS in t else "EPSG:4326"
        infos.append((os.path.abspath(p), w, h, x0, y0, sx, sy, crs))
    rx, ry = infos[0][5], infos[0][6]
    crs = infos[0][7]
    if any(abs(i[5] - rx) > 1e-9 or abs(i[6] - ry) > 1e-9 or i[7] != crs
           for i in infos):
        raise NotImplementedError(
            "gdalbuildvrt analog: sources must share resolution and "
            "CRS (mixed-resolution mosaics need -resolution handling)")
    minx = min(i[3] for i in infos)
    maxy = max(i[4] for i in infos)
    maxx = max(i[3] + i[1] * rx for i in infos)
    miny = min(i[4] - i[2] * ry for i in infos)
    W = int(round((maxx - minx) / rx))
    H = int(round((maxy - miny) / ry))
    code = crs.split(":")[1]
    lines = [f'<VRTDataset rasterXSize="{W}" rasterYSize="{H}">',
             f"  <SRS>EPSG:{code}</SRS>",
             f"  <GeoTransform>{minx!r}, {rx!r}, 0.0, {maxy!r}, 0.0, "
             f"{-ry!r}</GeoTransform>",
             '  <VRTRasterBand dataType="Float64" band="1">']
    for p, w, h, x0, y0, _sx, _sy, _crs in infos:
        dx = int(round((x0 - minx) / rx))
        dy = int(round((maxy - y0) / ry))
        lines += [
            "    <SimpleSource>",
            f'      <SourceFilename relativeToVRT="0">{p}'
            f"</SourceFilename>",
            "      <SourceBand>1</SourceBand>",
            f'      <SrcRect xOff="0" yOff="0" xSize="{w}" ySize="{h}"/>',
            f'      <DstRect xOff="{dx}" yOff="{dy}" xSize="{w}" '
            f'ySize="{h}"/>',
            "    </SimpleSource>",
        ]
    lines += ["  </VRTRasterBand>", "</VRTDataset>"]
    with open(vrt_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return vrt_path


def open_raster(spark: SparkSession, path: str, band: int = 0
                ) -> tuple[G.GridSpec, DataFrame]:
    """GDALOpen-style raster dispatch: .vrt -> the VRT composer,
    anything else -> the GeoTIFF reader (which itself handles tiled /
    strip / BigTIFF layouts)."""
    from . import geotiff as GT

    if path.lower().endswith(".vrt"):
        return read_vrt(spark, path, band=band)
    return GT.read_geotiff(spark, path, band=band)
