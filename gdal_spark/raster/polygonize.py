"""Polygonize (raster -> vector): connected components of equal-valued
pixels, distributed as tile-local labeling + cross-tile merge.

Reference semantics (alg/polygonize.cpp `GDALPolygonizeT` :73):
4- or 8-connectedness (:86-87), two passes — pass 1 labels lines and
records label equivalences in a merge map (:165-223), pass 2 emits
merged components (:226+). Our restatement is the 2-D distributed
generalization of that same merge-map idea (SURVEY §2.9/§4):

 1. per-tile two-pass CCL in numpy (`label_tile_np`) — tile-local
    labels made globally unique by a (tile_id << 32) offset;
 2. each tile emits its boundary rows/cols; a self-join on the shared
    edge produces label-equivalence pairs exactly where the reference's
    `ProcessLine` pairs adjacent scan lines;
 3. merge of the equivalence pairs — driver union-find (the
    reference's `CompleteMerges` :175) while the pair set is
    metadata-sized (bounded by boundary runs, not pixels), switching
    automatically to the distributed large-star/small-star CC loop
    (operators/components.py) above MAX_DRIVER_PAIRS so a
    continental-scale component set never funnels through the driver;
 4. relabel join -> per-component aggregates.

Output per component: representative label, pixel value, pixel count,
bbox — the attribute side of the reference's emitted polygon features
(ring tracing of outlines is a documented v2 item; component identity,
value and geometry extent are what the tests gate on).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import grid as G


def label_tile_np(arr: np.ndarray, connect8: bool = False) -> np.ndarray:
    """Two-pass CCL of nonzero equal-valued pixels; 0 = background.
    Returns int64 labels (0 background, 1..k components)."""
    h, w = arr.shape
    labels = np.zeros((h, w), dtype=np.int64)
    parent: list[int] = [0]

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nxt = 1
    for y in range(h):
        for x in range(w):
            v = arr[y, x]
            if v == 0:
                continue
            cands = []
            if x > 0 and arr[y, x - 1] == v:
                cands.append(labels[y, x - 1])
            if y > 0 and arr[y - 1, x] == v:
                cands.append(labels[y - 1, x])
            if connect8 and y > 0:
                if x > 0 and arr[y - 1, x - 1] == v:
                    cands.append(labels[y - 1, x - 1])
                if x + 1 < w and arr[y - 1, x + 1] == v:
                    cands.append(labels[y - 1, x + 1])
            if not cands:
                labels[y, x] = nxt
                parent.append(nxt)
                nxt += 1
            else:
                m = min(cands)
                labels[y, x] = m
                for c in cands:
                    union(m, c)
    # resolve
    lut = np.arange(nxt, dtype=np.int64)
    for i in range(1, nxt):
        lut[i] = find(i)
    # compact to 1..k
    uniq = np.unique(lut[1:]) if nxt > 1 else np.empty(0, np.int64)
    remap = np.zeros(nxt, dtype=np.int64)
    remap[uniq] = np.arange(1, len(uniq) + 1)
    return remap[lut[labels]]


def polygonize_np(arr: np.ndarray, connect8: bool = False) -> pd.DataFrame:
    """Single-node oracle: component stats of a full array."""
    labels = label_tile_np(arr, connect8)
    rows = []
    for lab in range(1, labels.max() + 1):
        ys, xs = np.nonzero(labels == lab)
        rows.append((float(arr[ys[0], xs[0]]), len(ys),
                     int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())))
    return pd.DataFrame(rows, columns=["value", "n_px", "min_x", "min_y",
                                       "max_x", "max_y"])


def trace_rings(mask: np.ndarray, ox: int = 0, oy: int = 0) -> list[np.ndarray]:
    """Boundary rings of a 4-connected pixel mask (the ring-assembly
    stage of the reference polygonizer, alg/polygonize_polygonizer.cpp).

    Method: every exposed pixel edge becomes a DIRECTED unit segment
    walking clockwise around its pixel (raster y-down); shared interior
    edges cancel, so chaining end->start yields closed cycles — the
    exterior ring clockwise, holes counterclockwise (sign of the
    shoelace area identifies which). At corner-touch junctions the
    walk takes the sharpest right turn, which keeps rings simple.
    Returns rings in GLOBAL pixel coords (ox, oy offsets applied),
    exterior first; collinear vertices merged.
    """
    h, w = mask.shape
    padded = np.zeros((h + 2, w + 2), dtype=bool)
    padded[1:-1, 1:-1] = mask
    ys, xs = np.nonzero(mask)
    # directed edges keyed by start point
    out_edges: dict[tuple, list] = {}

    def add(a, b):
        out_edges.setdefault(a, []).append(b)

    for y, x in zip(ys, xs):
        if not padded[y, x + 1]:          # no neighbor above
            add((x, y), (x + 1, y))
        if not padded[y + 1, x + 2]:      # right
            add((x + 1, y), (x + 1, y + 1))
        if not padded[y + 2, x + 1]:      # below
            add((x + 1, y + 1), (x, y + 1))
        if not padded[y + 1, x]:          # left
            add((x, y + 1), (x, y))

    # turn preference: sharpest right turn relative to incoming dir
    def pick(prev_dir, cands, cur):
        if len(cands) == 1:
            return cands[0]
        def turn(nxt):
            d = (nxt[0] - cur[0], nxt[1] - cur[1])
            # cross product prev x d (y-down: right turn = positive)
            return prev_dir[0] * d[1] - prev_dir[1] * d[0]
        return max(cands, key=turn)

    rings = []
    while out_edges:
        start = next(iter(out_edges))
        ring = [start]
        cur = start
        prev_dir = (0, 0)
        while True:
            cands = out_edges[cur]
            nxt = pick(prev_dir, cands, cur)
            cands.remove(nxt)
            if not cands:
                del out_edges[cur]
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            cur = nxt
            if cur == start:
                break
            ring.append(cur)
        r = np.array(ring + [start], dtype=np.float64)
        # merge collinear runs
        keep = [0]
        for i in range(1, len(r) - 1):
            d0 = r[i] - r[keep[-1]]
            d1 = r[i + 1] - r[i]
            if d0[0] * d1[1] - d0[1] * d1[0] != 0:
                keep.append(i)
        r = np.vstack([r[keep], r[:1]])
        r[:, 0] += ox
        r[:, 1] += oy
        rings.append(r)
    # exterior first: in y-down coords the clockwise exterior has
    # POSITIVE shoelace area under the standard (y-up) formula? — just
    # order by |area| descending (exterior strictly contains holes)
    from ..geo import geom as _geom
    rings.sort(key=lambda r: -abs(_geom.ring_area(r)))
    return rings


_LABELED = T.StructType([
    T.StructField("label", T.LongType(), False),
    T.StructField("value", T.DoubleType(), False),
    T.StructField("n_px", T.LongType(), False),
    T.StructField("min_x", T.LongType(), False),
    T.StructField("min_y", T.LongType(), False),
    T.StructField("max_x", T.LongType(), False),
    T.StructField("max_y", T.LongType(), False),
])

_EDGES = T.StructType([
    T.StructField("edge_key", T.LongType(), False),   # which shared edge
    T.StructField("pos", T.LongType(), False),        # position along edge
    T.StructField("side", T.IntegerType(), False),    # 0: low tile, 1: high
    T.StructField("label", T.LongType(), False),
    T.StructField("value", T.DoubleType(), False),
])


_GEOM_OUT = T.StructType([
    T.StructField("value", T.DoubleType(), False),
    T.StructField("n_px", T.LongType(), False),
    T.StructField("min_x", T.LongType(), False),
    T.StructField("min_y", T.LongType(), False),
    T.StructField("max_x", T.LongType(), False),
    T.StructField("max_y", T.LongType(), False),
    T.StructField("geom", T.BinaryType(), True),
])

_PXRUNS = T.StructType([
    T.StructField("label", T.LongType(), False),
    T.StructField("value", T.DoubleType(), False),
    T.StructField("xs", T.ArrayType(T.LongType()), False),
    T.StructField("ys", T.ArrayType(T.LongType()), False),
])


#: equivalence-pair count above which the cross-tile merge switches
#: from driver union-find to the distributed large-star/small-star loop
MAX_DRIVER_PAIRS = 200_000


def _label_remap(spark, eq_pairs: DataFrame,
                 distributed: bool | None = None) -> DataFrame:
    """(label_a, label_b) equivalence pairs -> (label, root) remap with
    root = the component's minimum label (exactly union-find's answer).

    Below MAX_DRIVER_PAIRS the pair set is metadata-sized and a driver
    union-find (the reference's CompleteMerges, alg/polygonize.cpp:175)
    is fastest. Above it — a continental-scale component set at 100 TB —
    the merge runs as the alternating large-star/small-star CC loop
    (operators/components.py): identical labeling, nothing through the
    driver."""
    pairs_df = eq_pairs.persist()
    if distributed is None:
        distributed = (pairs_df.limit(MAX_DRIVER_PAIRS + 1).count()
                       > MAX_DRIVER_PAIRS)
    if distributed:
        from ..operators.components import connected_components
        return (connected_components(pairs_df, src="label_a", dst="label_b")
                .select(F.col("node").alias("label"),
                        F.col("comp").alias("root")))
    pairs = pairs_df.collect()
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        r = a
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(a, a) != a:
            parent[a], a = r, parent[a]
        return r

    for p in pairs:
        ra, rb = find(int(p["label_a"])), find(int(p["label_b"]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    remap = [(a, find(a)) for a in list(parent)]
    return spark.createDataFrame(remap, "label long, root long") if remap \
        else spark.createDataFrame([], "label long, root long")


def _apply_remap(stats: DataFrame, rm: DataFrame) -> DataFrame:
    return (stats.join(rm, "label", "left")
            .withColumn("root", F.coalesce("root", "label")))


def polygonize_geoms(tiles: DataFrame, spec: G.GridSpec,
                     max_px: int = 4_000_000,
                     distributed_merge: bool | None = None) -> DataFrame:
    """Full polygonize: connected components WITH traced ring geometry
    (WKB polygon, exterior + holes, vertices in global pixel coords) —
    the reference's emitted features (GDALPolygonizeT output), not just
    component stats. Components above `max_px` get NULL geometry
    (bbox/stats only) so one monster component cannot blow a task.

    Pipeline: per-tile CCL -> cross-tile union-find (as `polygonize`)
    -> shuffle each component's pixels to ONE task keyed by its root
    -> `trace_rings`. The gather is bounded by true component sizes;
    the ring set round-trips through rasterize exactly (tested)."""
    from ..geo import wkb as _wkb

    spark = tiles.sparkSession
    tile = spec.tile
    tiles_x = spec.tiles_x

    def label_emit(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            runs, edges = [], []
            for _, row in pdf.iterrows():
                ty, tx = int(row["tile_y"]), int(row["tile_x"])
                h, w = spec.tile_shape(ty, tx)
                arr = np.asarray(row["px"], np.float64).reshape(h, w)
                labels = label_tile_np(arr, False)
                tid = np.int64(ty * tiles_x + tx)
                ox, oy = tx * tile, ty * tile
                for lab in range(1, labels.max() + 1):
                    pys, pxs = np.nonzero(labels == lab)
                    runs.append((int((tid << 32) | lab),
                                 float(arr[pys[0], pxs[0]]),
                                 (pxs + ox).astype(np.int64).tolist(),
                                 (pys + oy).astype(np.int64).tolist()))
                # cross-tile equivalence edges (same emission scheme as
                # polygonize())
                if tx + 1 < spec.tiles_x:
                    key = (ox + w) * (1 << 32) + ty
                    col = labels[:, w - 1]
                    for y in np.nonzero(col > 0)[0]:
                        edges.append((key, int(y), 0,
                                      int((tid << 32) | col[y]),
                                      float(arr[y, w - 1])))
                if tx > 0:
                    key = ox * (1 << 32) + ty
                    col = labels[:, 0]
                    for y in np.nonzero(col > 0)[0]:
                        edges.append((key, int(y), 1,
                                      int((tid << 32) | col[y]),
                                      float(arr[y, 0])))
                if ty + 1 < spec.tiles_y:
                    key = (1 << 62) + (oy + h) * (1 << 32) + tx
                    rowp = labels[h - 1, :]
                    for x in np.nonzero(rowp > 0)[0]:
                        edges.append((key, int(x), 0,
                                      int((tid << 32) | rowp[x]),
                                      float(arr[h - 1, x])))
                if ty > 0:
                    key = (1 << 62) + oy * (1 << 32) + tx
                    rowp = labels[0, :]
                    for x in np.nonzero(rowp > 0)[0]:
                        edges.append((key, int(x), 1,
                                      int((tid << 32) | rowp[x]),
                                      float(arr[0, x])))
            yield (pd.DataFrame(runs, columns=[f.name for f in _PXRUNS]),
                   pd.DataFrame(edges, columns=[f.name for f in _EDGES]))

    def runs_only(batches):
        for r, _ in label_emit(batches):
            yield r

    def edges_only(batches):
        for _, e in label_emit(batches):
            yield e

    cached = tiles.persist()
    runs = cached.mapInPandas(runs_only, _PXRUNS)
    ed = cached.mapInPandas(edges_only, _EDGES)

    lo = ed.filter(F.col("side") == 0).select(
        "edge_key", "pos", F.col("label").alias("label_a"),
        F.col("value").alias("va"))
    hi = ed.filter(F.col("side") == 1).select(
        "edge_key", "pos", F.col("label").alias("label_b"),
        F.col("value").alias("vb"))
    eq_pairs = (lo.join(hi, ["edge_key", "pos"])
                .filter(F.col("va") == F.col("vb"))
                .select("label_a", "label_b").distinct())
    runs = _apply_remap(runs, _label_remap(spark, eq_pairs,
                                           distributed_merge))

    def trace(key, pdf: pd.DataFrame) -> pd.DataFrame:
        xs = np.concatenate([np.asarray(v, np.int64) for v in pdf["xs"]])
        ys = np.concatenate([np.asarray(v, np.int64) for v in pdf["ys"]])
        value = float(pdf["value"].iloc[0])
        n = len(xs)
        x0, y0 = int(xs.min()), int(ys.min())
        x1, y1 = int(xs.max()), int(ys.max())
        blob = None
        if n <= max_px:
            msk = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
            msk[ys - y0, xs - x0] = True
            rings = trace_rings(msk, ox=x0, oy=y0)
            blob = bytearray(_wkb.polygon(rings))
        return pd.DataFrame({
            "value": [value], "n_px": [n],
            "min_x": [x0], "min_y": [y0], "max_x": [x1], "max_y": [y1],
            "geom": [blob]})

    out = runs.groupBy("root").applyInPandas(trace, _GEOM_OUT)
    return out


def polygonize(tiles: DataFrame, spec: G.GridSpec,
               connect8: bool = False,
               distributed_merge: bool | None = None) -> DataFrame:
    """Distributed polygonize -> (value, n_px, min_x, min_y, max_x,
    max_y) per connected component (global pixel coords)."""
    spark = tiles.sparkSession
    tile = spec.tile
    tiles_x = spec.tiles_x

    def per_tile(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            stats_rows, edge_rows = [], []
            for _, row in pdf.iterrows():
                ty, tx = int(row["tile_y"]), int(row["tile_x"])
                h, w = spec.tile_shape(ty, tx)
                arr = np.asarray(row["px"], np.float64).reshape(h, w)
                labels = label_tile_np(arr, connect8)
                tid = np.int64(ty * tiles_x + tx)
                ox, oy = tx * tile, ty * tile
                for lab in range(1, labels.max() + 1):
                    ys, xs = np.nonzero(labels == lab)
                    stats_rows.append((int((tid << 32) | lab),
                                       float(arr[ys[0], xs[0]]), len(ys),
                                       int(xs.min() + ox), int(ys.min() + oy),
                                       int(xs.max() + ox), int(ys.max() + oy)))
                # boundary emissions: a vertical line at x=ox+w pairs
                # this tile's right edge (side 0) with (ty, tx+1)'s left
                # edge (side 1); keys encode (line coord, lateral tile).
                # right edge (we are low side of vertical line at ox+w)
                if tx + 1 < spec.tiles_x:
                    keyv = (ox + w) * (1 << 32) + ty
                    col = labels[:, w - 1]
                    nz = np.nonzero(col > 0)[0]
                    for y in nz:
                        edge_rows.append((keyv, int(y), 0,
                                          int((tid << 32) | col[y]),
                                          float(arr[y, w - 1])))
                # left edge (high side of vertical line at ox)
                if tx > 0:
                    keyv = ox * (1 << 32) + ty
                    col = labels[:, 0]
                    nz = np.nonzero(col > 0)[0]
                    for y in nz:
                        edge_rows.append((keyv, int(y), 1,
                                          int((tid << 32) | col[y]),
                                          float(arr[y, 0])))
                # bottom edge (low side of horizontal line at oy+h)
                if ty + 1 < spec.tiles_y:
                    keyh = (1 << 62) + (oy + h) * (1 << 32) + tx
                    rowp = labels[h - 1, :]
                    nz = np.nonzero(rowp > 0)[0]
                    for x in nz:
                        edge_rows.append((keyh, int(x), 0,
                                          int((tid << 32) | rowp[x]),
                                          float(arr[h - 1, x])))
                # top edge (high side)
                if ty > 0:
                    keyh = (1 << 62) + oy * (1 << 32) + tx
                    rowp = labels[0, :]
                    nz = np.nonzero(rowp > 0)[0]
                    for x in nz:
                        edge_rows.append((keyh, int(x), 1,
                                          int((tid << 32) | rowp[x]),
                                          float(arr[0, x])))
            yield (pd.DataFrame(stats_rows, columns=[f.name for f in _LABELED]),
                   pd.DataFrame(edge_rows, columns=[f.name for f in _EDGES]))

    # run per-tile labeling ONCE, emitting both outputs (stats + edges)
    # via two mapInPandas passes would label twice; instead cache tiles
    # and run two passes over the cached input (labeling is cheap
    # relative to a recompute of upstream, and tiles are usually
    # persisted by the caller).
    def stats_only(batches):
        for stats, _ in per_tile(batches):
            yield stats

    def edges_only(batches):
        for _, edges in per_tile(batches):
            yield edges

    stats = tiles.mapInPandas(stats_only, _LABELED)
    edges = tiles.mapInPandas(edges_only, _EDGES)

    lo = edges.filter(F.col("side") == 0).select(
        "edge_key", "pos", F.col("label").alias("label_a"), F.col("value").alias("va"))
    hi = edges.filter(F.col("side") == 1).select(
        "edge_key", "pos", F.col("label").alias("label_b"), F.col("value").alias("vb"))
    eq_pairs = (lo.join(hi, ["edge_key", "pos"])
                .filter(F.col("va") == F.col("vb"))
                .select("label_a", "label_b").distinct())
    stats = _apply_remap(stats, _label_remap(spark, eq_pairs,
                                             distributed_merge))

    return (stats.groupBy("root")
            .agg(F.min("value").alias("value"),
                 F.sum("n_px").alias("n_px"),
                 F.min("min_x").alias("min_x"), F.min("min_y").alias("min_y"),
                 F.max("max_x").alias("max_x"), F.max("max_y").alias("max_y"))
            .drop("root")
            .select("value", "n_px", "min_x", "min_y", "max_x", "max_y"))
