"""Sieve filter: remove raster polygons smaller than a threshold by
merging them into their largest neighbour polygon.

Reference: alg/gdalsievefilter.cpp:178 `GDALSieveFilter` — connected
components (4- or 8-connected) of equal-valued pixels; components with
fewer than `threshold` pixels take the value of their LARGEST
neighbouring component; merging cascades smallest-first until no
undersized component remains (a merged component's pixels then count
toward its absorber). Background (value 0) is excluded, mirroring the
mask-band convention.

Distributed design (the 2-D merge-map pattern polygonize uses, plus an
adjacency relation):
 1. per-tile CCL -> (a) labeled tiles kept for the final recolor,
    (b) component stats, (c) same-value cross-tile equivalences,
    (d) adjacency pairs between DIFFERENT components — in-tile from
    pixel neighbours, cross-tile from shared edges;
 2. merge the equivalences -> global roots via polygonize._label_remap
    (driver union-find below MAX_DRIVER_PAIRS, the distributed
    large-star/small-star CC loop above it); sizes and adjacency
    aggregate onto roots DataFrame-side, so the driver only ever sees
    COMPONENT-granularity metadata (post-merge), never per-label maps;
 3. the cascade — GDAL's smallest-first order is sequential (each
    merge changes the sizes later merges see) but it factorizes
    EXACTLY over connected components of the interaction graph
    (adjacency edges with a sub-threshold endpoint), so each group
    cascades independently inside one executor task; NOTHING is
    collected to the driver;
 4. the final label->value map joins back to the labeled tiles
    (cogrouped per tile, no whole-map broadcast) for the recolor pass.
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import grid as G
from .polygonize import _apply_remap, _label_remap, label_tile_np

_LBL_SCHEMA = T.StructType([
    T.StructField("tile_y", T.IntegerType(), False),
    T.StructField("tile_x", T.IntegerType(), False),
    T.StructField("px", T.ArrayType(T.DoubleType()), False),
    T.StructField("labels", T.ArrayType(T.LongType()), False),
])

_META_SCHEMA = T.StructType([
    T.StructField("kind", T.IntegerType(), False),   # 0 stats, 1 equiv, 2 adj
    T.StructField("a", T.LongType(), False),          # label / label_a
    T.StructField("b", T.LongType(), False),          # size / label_b
    T.StructField("v", T.DoubleType(), False),        # value (stats only)
    T.StructField("p", T.LongType(), False),          # min global px (stats)
])


def _tile_meta(arr, labels, tid, ox, oy, spec, connect8):
    rows = []
    nlab = int(labels.max())
    for lab in range(1, nlab + 1):
        m = labels == lab
        ys, xs = np.nonzero(m)
        # content-derived identity: the component's minimum global
        # pixel index — the cascade's tie keys must not depend on
        # labeling order (tiled vs global ids differ)
        pos = int(((ys.astype(np.int64) + oy) * spec.width
                   + (xs.astype(np.int64) + ox)).min())
        rows.append((0, int((tid << 32) | lab), int(m.sum()),
                     float(arr[ys[0], xs[0]]), pos))
    # in-tile adjacency between different components (4-neighbour)
    gl = np.where(labels > 0, (np.int64(tid) << 32) | labels, 0)
    for sa, sb in (((slice(None), slice(None, -1)), (slice(None), slice(1, None))),
                   ((slice(None, -1), slice(None)), (slice(1, None), slice(None)))):
        la, lb = gl[sa].ravel(), gl[sb].ravel()
        diff = (la != lb) & (la > 0) & (lb > 0)
        for x, y in set(zip(la[diff].tolist(), lb[diff].tolist())):
            rows.append((2, int(x), int(y), 0.0, 0))
    return rows


def _edge_meta(arr, labels, tid, ty, tx, spec):
    """Cross-tile relations from this tile's right/bottom edges paired
    with the next tile's left/top edges are emitted as positional rows
    keyed by a shared edge id — built downstream via a self-join, so
    here we only export the edge strips."""
    h, w = arr.shape
    out = []
    # (edge_key, pos, side, label, value)
    if tx + 1 < spec.tiles_x:
        key = (tx * spec.tile + w) * (1 << 32) + ty
        col, vals = labels[:, w - 1], arr[:, w - 1]
        for y in np.nonzero(col > 0)[0]:
            out.append((key, int(y), 0, int((tid << 32) | col[y]), float(vals[y])))
    if tx > 0:
        key = (tx * spec.tile) * (1 << 32) + ty
        col, vals = labels[:, 0], arr[:, 0]
        for y in np.nonzero(col > 0)[0]:
            out.append((key, int(y), 1, int((tid << 32) | col[y]), float(vals[y])))
    if ty + 1 < spec.tiles_y:
        key = (1 << 62) + (ty * spec.tile + h) * (1 << 32) + tx
        row, vals = labels[h - 1, :], arr[h - 1, :]
        for x in np.nonzero(row > 0)[0]:
            out.append((key, int(x), 0, int((tid << 32) | row[x]), float(vals[x])))
    if ty > 0:
        key = (1 << 62) + (ty * spec.tile) * (1 << 32) + tx
        row, vals = labels[0, :], arr[0, :]
        for x in np.nonzero(row > 0)[0]:
            out.append((key, int(x), 1, int((tid << 32) | row[x]), float(vals[x])))
    return out


_EDGE_SCHEMA = T.StructType([
    T.StructField("edge_key", T.LongType(), False),
    T.StructField("pos", T.LongType(), False),
    T.StructField("side", T.IntegerType(), False),
    T.StructField("label", T.LongType(), False),
    T.StructField("value", T.DoubleType(), False),
])


def _cascade(sizes: dict, values: dict, adj: dict, threshold: int,
             pos: dict) -> dict:
    """GDAL's smallest-first merge cascade on the component metadata.
    Returns {component: final_absorbing_component}.

    Every tie key is CONTENT-derived (value; `pos` = the component's
    min global pixel index, unique per component), never the label id:
    the distributed and single-node runs label the same components
    differently, and equal-size pop order / equal-(size,value) target
    choice must still be identical."""
    absorbed: dict[int, int] = {}

    def find(x):
        while x in absorbed:
            x = absorbed[x]
        return x

    heap = [(sz, pos[lab], lab) for lab, sz in sizes.items()
            if sz < threshold]
    heapq.heapify(heap)
    while heap:
        sz, _p, lab = heapq.heappop(heap)
        if lab in absorbed or sizes[lab] != sz or sizes[lab] >= threshold:
            continue
        neighbours = {}
        for nb in adj.get(lab, ()):  # resolve through prior merges
            r = find(nb)
            if r != lab:
                neighbours[r] = sizes[r]
        if not neighbours:
            continue  # isolated small blob: GDAL leaves it
        target = max(neighbours,
                     key=lambda r: (neighbours[r], values[r], -pos[r]))
        absorbed[lab] = target
        sizes[target] += sizes[lab]
        adj.setdefault(target, set()).update(adj.get(lab, ()))
        if sizes[target] < threshold:
            heapq.heappush(heap, (sizes[target], pos[target], target))
    return {lab: find(lab) for lab in sizes}


def sieve(tiles: DataFrame, spec: G.GridSpec, threshold: int,
          connect8: bool = False,
          distributed_merge: bool | None = None) -> DataFrame:
    """Distributed sieve -> tile DataFrame with merged values."""
    spark = tiles.sparkSession
    tiles_x = spec.tiles_x

    def labeler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                ty, tx = int(row["tile_y"]), int(row["tile_x"])
                h, w = spec.tile_shape(ty, tx)
                arr = np.asarray(row["px"], np.float64).reshape(h, w)
                labels = label_tile_np(arr, connect8)
                tid = np.int64(ty * tiles_x + tx)
                gl = np.where(labels > 0, (np.int64(tid) << 32) | labels, 0)
                out.append((ty, tx, arr.ravel().tolist(),
                            gl.ravel().astype(np.int64).tolist()))
            yield pd.DataFrame(out, columns=["tile_y", "tile_x", "px", "labels"])

    labeled = tiles.mapInPandas(labeler, _LBL_SCHEMA).persist()

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                ty, tx = int(row["tile_y"]), int(row["tile_x"])
                h, w = spec.tile_shape(ty, tx)
                arr = np.asarray(row["px"], np.float64).reshape(h, w)
                tid = ty * tiles_x + tx
                labels = (np.asarray(row["labels"], np.int64).reshape(h, w)
                          & 0xFFFFFFFF)
                rows.extend(_tile_meta(arr, labels, tid, tx * spec.tile,
                                       ty * spec.tile, spec, connect8))
            yield pd.DataFrame(rows, columns=["kind", "a", "b", "v", "p"])

    def edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                ty, tx = int(row["tile_y"]), int(row["tile_x"])
                h, w = spec.tile_shape(ty, tx)
                arr = np.asarray(row["px"], np.float64).reshape(h, w)
                labels = (np.asarray(row["labels"], np.int64).reshape(h, w)
                          & 0xFFFFFFFF)
                tid = ty * tiles_x + tx
                rows.extend(_edge_meta(arr, labels, tid, ty, tx, spec))
            yield pd.DataFrame(rows, columns=[f.name for f in _EDGE_SCHEMA])

    md = labeled.mapInPandas(meta, _META_SCHEMA).persist()
    ed = labeled.mapInPandas(edges, _EDGE_SCHEMA)

    lo = ed.filter(F.col("side") == 0).select(
        "edge_key", "pos", F.col("label").alias("la"), F.col("value").alias("va"))
    hi = ed.filter(F.col("side") == 1).select(
        "edge_key", "pos", F.col("label").alias("lb"), F.col("value").alias("vb"))
    cross = lo.join(hi, ["edge_key", "pos"]).select("la", "lb", "va", "vb").distinct()

    # phase 1: same-value merge -> (label, root), driver or distributed
    eq = (cross.filter(F.col("va") == F.col("vb"))
          .select(F.col("la").alias("label_a"), F.col("lb").alias("label_b")))
    rm = _label_remap(spark, eq, distributed_merge).persist()

    # per-ROOT stats and adjacency, aggregated DataFrame-side
    stats_r = _apply_remap(
        md.filter(F.col("kind") == 0).select(
            F.col("a").alias("label"), F.col("b").alias("size"),
            F.col("v").alias("value"), F.col("p").alias("pos")), rm).persist()
    root_stats = (stats_r.groupBy("root")
                  .agg(F.sum("size").alias("size"),
                       F.min("value").alias("value"),
                       F.min("pos").alias("pos")))

    adj_all = (md.filter(F.col("kind") == 2).select(
        F.col("a").alias("label_a"), F.col("b").alias("label_b"))
        .unionByName(cross.select(F.col("la").alias("label_a"),
                                  F.col("lb").alias("label_b"))))
    rma = rm.select(F.col("label").alias("label_a"), F.col("root").alias("ra"))
    rmb = rm.select(F.col("label").alias("label_b"), F.col("root").alias("rb"))
    adj_roots = (adj_all
                 .join(rma, "label_a", "left")
                 .join(rmb, "label_b", "left")
                 .select(F.coalesce("ra", "label_a").alias("ra"),
                         F.coalesce("rb", "label_b").alias("rb"))
                 .filter(F.col("ra") != F.col("rb")).distinct())

    # phase 2: the smallest-first cascade, DISTRIBUTED. The cascade
    # factorizes EXACTLY over connected components of the INTERACTION
    # graph — adjacency edges with at least one sub-threshold endpoint:
    # big-big edges are never consulted (adj is only read for popped
    # small components and for targets that were small), and a merge
    # mutates sizes/adjacency only within its own interaction group, so
    # per-group smallest-first order equals the global order restricted
    # to the group. Each group runs GDAL's sequential cascade inside
    # ONE executor task (group size = the cascade closure — tile-local
    # speckle in practice; a pathological whole-raster speckle degrades
    # to one task, never a driver collect).
    md.unpersist()
    sz_a = root_stats.select(F.col("root").alias("ra"),
                             F.col("size").alias("sza"))
    sz_b = root_stats.select(F.col("root").alias("rb"),
                             F.col("size").alias("szb"))
    inter = (adj_roots.join(sz_a, "ra").join(sz_b, "rb")
             .filter((F.col("sza") < threshold) | (F.col("szb") < threshold))
             .select(F.col("ra").alias("label_a"),
                     F.col("rb").alias("label_b")).persist())
    grp = _label_remap(spark, inter, distributed_merge)
    g_of = grp.select(F.col("label").alias("root"), F.col("root").alias("grp"))
    nodes = (root_stats.join(g_of, "root", "left")
             .select(F.coalesce("grp", "root").alias("grp"),
                     "root", "size", "value", "pos"))
    g_a = grp.select(F.col("label").alias("label_a"),
                     F.col("root").alias("grp"))
    # left join: _label_remap emits no row for a group's ROOT label
    # (it maps to itself), and an edge whose label_a IS the root must
    # not be dropped
    edges_g = (inter.join(g_a, "label_a", "left")
               .select(F.coalesce("grp", F.col("label_a")).alias("grp"),
                       "label_a", "label_b"))

    _NEWV_SCHEMA = T.StructType([
        T.StructField("root", T.LongType(), False),
        T.StructField("new_v", T.DoubleType(), False),
    ])

    def cascade_group(npdf: pd.DataFrame, epdf: pd.DataFrame) -> pd.DataFrame:
        sizes = {int(r): int(s) for r, s in zip(npdf["root"], npdf["size"])}
        values = {int(r): float(v) for r, v in zip(npdf["root"], npdf["value"])}
        pos = {int(r): int(p) for r, p in zip(npdf["root"], npdf["pos"])}
        adj: dict[int, set] = {}
        for a, b in zip(epdf["label_a"], epdf["label_b"]):
            adj.setdefault(int(a), set()).add(int(b))
            adj.setdefault(int(b), set()).add(int(a))
        final = _cascade(dict(sizes), values, adj, threshold, pos)
        return pd.DataFrame({"root": list(sizes),
                             "new_v": [values[final[r]] for r in sizes]})

    newv_df = (nodes.groupby("grp")
               .cogroup(edges_g.groupby("grp"))
               .applyInPandas(cascade_group, _NEWV_SCHEMA))

    # phase 3: recolor by JOIN (label -> new value rows cogrouped with
    # their tile — the tile id is embedded in the label's high bits),
    # so no whole-map driver broadcast
    label_value = (stats_r.select("label", "root").join(newv_df, "root")
                   .withColumn("tid", F.shiftright("label", 32))
                   .select(F.expr(f"CAST(tid DIV {tiles_x} AS INT)").alias("tile_y"),
                           F.pmod("tid", F.lit(tiles_x)).cast("int").alias("tile_x"),
                           "label", "new_v"))

    def recolor(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        vm = {int(k): float(v)
              for k, v in zip(rpdf["label"], rpdf["new_v"])}
        out = []
        for _, row in lpdf.iterrows():
            labels = np.asarray(row["labels"], np.int64)
            px = np.asarray(row["px"], np.float64)
            new = px.copy()
            for lab in np.unique(labels[labels > 0]):
                new[labels == lab] = vm[int(lab)]
            out.append((int(row["tile_y"]), int(row["tile_x"]), new.tolist()))
        return pd.DataFrame(out, columns=["tile_y", "tile_x", "px"])

    result = (labeled.groupby("tile_y", "tile_x")
              .cogroup(label_value.groupby("tile_y", "tile_x"))
              .applyInPandas(recolor, G.TILE_SCHEMA))
    return result


def sieve_np(canvas: np.ndarray, threshold: int,
             connect8: bool = False) -> np.ndarray:
    """Single-node oracle: same smallest-first cascade on the full
    canvas labels."""
    labels = label_tile_np(canvas, connect8)
    sizes, values, adj, pos = {}, {}, {}, {}
    nlab = int(labels.max())
    w = canvas.shape[1]
    for lab in range(1, nlab + 1):
        m = labels == lab
        ys, xs = np.nonzero(m)
        sizes[lab] = int(m.sum())
        values[lab] = float(canvas[ys[0], xs[0]])
        pos[lab] = int((ys.astype(np.int64) * w + xs.astype(np.int64)).min())
    for sa, sb in (((slice(None), slice(None, -1)), (slice(None), slice(1, None))),
                   ((slice(None, -1), slice(None)), (slice(1, None), slice(None)))):
        la, lb = labels[sa].ravel(), labels[sb].ravel()
        diff = (la != lb) & (la > 0) & (lb > 0)
        for a, b in set(zip(la[diff].tolist(), lb[diff].tolist())):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    final = _cascade(dict(sizes), values, adj, threshold, pos)
    out = canvas.copy()
    for lab in sizes:
        out[labels == lab] = values[final[lab]]
    return out
