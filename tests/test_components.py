"""Distributed CC (large-star/small-star) vs a union-find oracle."""

import numpy as np

from gdal_spark.operators.components import connected_components


def _uf_oracle(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min label per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members)
            for r, members in comp.items() for n in members}


def _check(spark, edges, nodes=None):
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        edf = edf.limit(0)
    kw = {}
    if nodes is not None:
        kw["nodes"] = spark.createDataFrame([(n,) for n in nodes],
                                            "node long")
    universe = set(nodes or [])
    for a, b in edges:
        universe.update((a, b))
    want = _uf_oracle(edges, sorted(universe))
    # both strategies: the adaptive driver union-find (default on
    # graphs this small) AND the distributed alternating-star path
    # (forced with driver_edge_cap=0) must agree with the oracle
    for cap in (1_000_000, 0):
        got = {r["node"]: r["comp"]
               for r in connected_components(
                   edf, driver_edge_cap=cap, **kw).collect()}
        assert got == want, f"driver_edge_cap={cap}"


def test_cc_long_chain(spark):
    # worst case for label propagation: diameter = n
    n = 64
    _check(spark, [(i, i + 1) for i in range(n)])


def test_cc_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(5)
    n = 200
    edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
             for _ in range(150)]
    _check(spark, edges, nodes=list(range(n)))  # incl. isolated nodes


def test_cc_two_cliques_and_bridge(spark):
    a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    _check(spark, a + b)           # two components
    _check(spark, a + b + [(4, 10)])  # bridged -> one


def test_cc_self_loops_and_duplicates(spark):
    _check(spark, [(1, 1), (1, 2), (2, 1), (1, 2), (7, 7)],
           nodes=[1, 2, 7, 9])
