"""Distributed connected components over an edge DataFrame.

The reference merges cross-tile raster components with a driver-side
union-find (our round-1 polygonize/sieve did the same, bounded by
boundary-component counts). At 100 TB a continental-scale component
set overflows the driver, so this module provides the GraphFrames-free
alternating large-star / small-star algorithm (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", ACM SoCC 2014): every step is a plain groupBy/min +
equi-join, the edge relation never leaves the cluster, and convergence
takes O(log n) rounds on any graph (each round halves the height of
the implicit forest).

  large-star: for each node u, hook every STRICTLY LARGER neighbor to
      the minimum of u's closed neighborhood.
  small-star: canonicalize edges to (hi -> lo); for each node u, hook
      u and all its smaller neighbors to the minimum.

At fixpoint the edge set is a forest of depth-1 stars rooted at each
component's minimum node id — exactly union-find's answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    # invariant: e arrives canonical (u > v) and distinct — initial
    # edges are canonicalized and _small_star emits that form — so the
    # symmetrization introduces no duplicates and large-star's output
    # needs no dedup of its own (small-star re-canonicalizes +
    # distincts next); this saves two shuffles per round
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (sym.groupBy("u").agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m")))
    return (sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v")))


def _small_star(e: DataFrame) -> DataFrame:
    canon = (e.select(F.greatest("u", "v").alias("u"),
                      F.least("u", "v").alias("v"))
             .filter(F.col("u") != F.col("v")).distinct())
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    hooked = (canon.join(mins, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v")))
    self_edges = mins.select("u", F.col("m").alias("v"))
    return (hooked.unionByName(self_edges)
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _signature(e: DataFrame):
    # bit_xor, not sum: order-independent, cannot overflow (the edge
    # set is distinct so xor-cancellation of duplicates cannot occur)
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.coalesce(F.bit_xor(F.xxhash64("u", "v")),
                           F.lit(0)).alias("h")).collect()[0]
    return int(row["n"]), int(row["h"])


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Small-graph fast path: classic union-find on the collected edge
    list, labels shipped back as a DataFrame. Bounded by the caller's
    edge-count guard — never reached on a fact-scale graph."""
    import numpy as np
    import pandas as pd

    pdf = e.toPandas()
    if len(pdf) == 0:
        return e.sparkSession.createDataFrame(
            [], "node long, comp long")
    uv = np.concatenate([pdf["u"].to_numpy(np.int64),
                         pdf["v"].to_numpy(np.int64)])
    ids, inv = np.unique(uv, return_inverse=True)
    m = len(pdf)
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(inv[:m], inv[m:]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # root = smaller index
    # full resolution, then root -> min original id (ids is sorted by
    # np.unique, so the min-index root IS the min-id member)
    roots = np.array([find(i) for i in range(len(ids))], dtype=np.int64)
    out = pd.DataFrame({"node": ids, "comp": ids[roots]})
    return e.sparkSession.createDataFrame(out)


def connected_components(edges: DataFrame,
                         src: str = "src", dst: str = "dst",
                         nodes: DataFrame | None = None,
                         node_col: str = "node",
                         max_rounds: int = 50,
                         driver_edge_cap: int = 1_000_000) -> DataFrame:
    """-> (node, comp) with comp = the component's minimum node id.

    edges: undirected edge list (long-castable ids; self-loops and
    duplicates tolerated). nodes (optional, single column `node_col`):
    the full node universe — isolated nodes come back as their own
    component. Deterministic; every round is two shuffles.

    Adaptive strategy choice (AQE-style): the distinct edge relation
    is counted once, and a graph under `driver_edge_cap` edges runs
    classic union-find on the driver instead of paying ~log(diameter)
    alternating-star rounds (each two shuffles + a fixpoint probe) for
    a graph that fits in one task. The distributed path is unchanged
    above the cap and remains the 100 TB shape; pass
    driver_edge_cap=0 to force it.
    """
    e = (edges.select(F.greatest(F.col(src).cast("long"),
                                 F.col(dst).cast("long")).alias("u"),
                      F.least(F.col(src).cast("long"),
                              F.col(dst).cast("long")).alias("v"))
         .filter(F.col("u") != F.col("v"))
         .distinct()
         # materialize ONCE before the strategy count: the upstream
         # edge derivation is often the expensive part (e.g. a
         # minhash candidate join), and without this the count and
         # the first CC round would each recompute it
         .localCheckpoint(eager=True))

    if driver_edge_cap and e.count() <= driver_edge_cap:
        labels = _driver_union_find(e)
        if nodes is not None:
            n = (nodes.select(F.col(node_col).cast("long").alias("node"))
                 .distinct())
            isolated = (n.join(labels, "node", "left_anti")
                        .select("node", F.col("node").alias("comp")))
            labels = labels.unionByName(isolated)
        return labels

    prev_sig = None
    for _ in range(max_rounds):
        # localCheckpoint truncates the logical plan each round —
        # without it the iterated lineage doubles per round and
        # Catalyst analysis time grows exponentially
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = _signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError("connected_components did not converge "
                           f"in {max_rounds} rounds")

    # fixpoint: stars (u -> root). Labels = members + roots.
    labels = (e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
              .unionByName(
                  e.select(F.col("v").alias("node"),
                           F.col("v").alias("comp")))
              .distinct())
    if nodes is not None:
        n = nodes.select(F.col(node_col).cast("long").alias("node")).distinct()
        isolated = (n.join(labels, "node", "left_anti")
                    .select("node", F.col("node").alias("comp")))
        labels = labels.unionByName(isolated)
    return labels
