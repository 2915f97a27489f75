"""S2 cube-face Hilbert cell index: the defining properties, plus the
three-way (numpy / Spark Column / DuckDB SQL) bit-identity the oracle
discipline requires."""

import duckdb
import numpy as np
import pytest

from gdal_spark.geo import s2


def _rand_lonlat(n, seed=11):
    rng = np.random.default_rng(seed)
    # all six faces: uniform on the sphere (not uniform lon/lat)
    z = rng.uniform(-1.0, 1.0, n)
    lam = rng.uniform(-np.pi, np.pi, n)
    lat = np.degrees(np.arcsin(z))
    return np.degrees(lam), lat


def test_face_coverage_and_determinism():
    lon, lat = _rand_lonlat(20_000)
    c = s2.s2_cell_np(lon, lat, 12)
    faces = np.unique(c >> 59)
    assert set(faces.tolist()) == {0, 1, 2, 3, 4, 5}
    assert (c > 0).all()  # level-29 layout keeps ids positive int64
    assert (s2.s2_level_np(c) == 12).all()
    # pole / equator / antimeridian special points encode somewhere sane
    sp = s2.s2_cell_np(np.array([0.0, 0.0, 180.0, -180.0, 13.0]),
                       np.array([90.0, -90.0, 0.0, 0.0, 0.0]), 12)
    assert (sp >> 59 == np.array([2, 5, 3, 3, 0])).all()


def test_roundtrip_center_reencodes():
    lon, lat = _rand_lonlat(5_000, seed=12)
    for level in (4, 10, 16, 24, s2.MAX_LEVEL):
        c = s2.s2_cell_np(lon, lat, level)
        clon, clat = s2.s2_center_lonlat_np(c)
        c2 = s2.s2_cell_np(clon, clat, level)
        assert (c == c2).all(), f"center re-encode broke at level {level}"


def test_hierarchy_prefix_consistency():
    """parent(encode(p, L)) == encode(p, L-1): the Hilbert digits are
    an MSB-first prefix code, so coarser cells are exact ancestors."""
    lon, lat = _rand_lonlat(5_000, seed=13)
    for level in (2, 7, 13, 20):
        fine = s2.s2_cell_np(lon, lat, level)
        coarse = s2.s2_cell_np(lon, lat, level - 1)
        assert (s2.s2_parent_np(fine) == coarse).all()
    # multi-step parent
    c20 = s2.s2_cell_np(lon, lat, 20)
    c15 = s2.s2_cell_np(lon, lat, 15)
    assert (s2.s2_parent_np(c20, steps=5) == c15).all()


def test_range_contains_exactly_descendants():
    lon, lat = _rand_lonlat(2_000, seed=14)
    parent = s2.s2_cell_np(lon, lat, 8)
    child = s2.s2_cell_np(lon, lat, 14)
    lo, hi = s2.s2_range_np(parent)
    assert ((child >= lo) & (child <= hi)).all()
    # a sibling parent's range must NOT contain these children
    other = parent[::-1]
    lo2, hi2 = s2.s2_range_np(other)
    diff = other != parent
    assert not ((child[diff] >= lo2[diff]) & (child[diff] <= hi2[diff])).any()


def test_hilbert_locality_stride1():
    """Within a face, consecutive curve positions are edge-adjacent
    cells (the Hilbert property that makes id-sorting a spatial
    sort)."""
    level = 6
    n = 1 << level
    pos = np.arange(n * n, dtype=np.int64)
    x, y = s2._hilbert_inv_np(pos, level)
    dx = np.abs(np.diff(x))
    dy = np.abs(np.diff(y))
    assert (dx + dy == 1).all()


def test_inverse_matches_forward_walk():
    from gdal_spark.geo.hilbert import hilbert_d_np
    rng = np.random.default_rng(15)
    for order in (1, 3, 8, 15):
        n = 1 << order
        x = rng.integers(0, n, 400).astype(np.int64)
        y = rng.integers(0, n, 400).astype(np.int64)
        d = hilbert_d_np(x, y, order)
        xi, yi = s2._hilbert_inv_np(d, order)
        assert (xi == x).all() and (yi == y).all()


def test_column_matches_numpy(spark):
    lon, lat = _rand_lonlat(4_000, seed=16)
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    for level in (5, 12):
        got = (s2.with_s2_cell(df, level=level, out="c")
               .select("c").toPandas()["c"].to_numpy(np.int64))
        want = s2.s2_cell_np(lon, lat, level)
        assert (got == want).all(), f"Column != numpy at level {level}"
        # parent column == parent numpy
        pgot = (s2.with_s2_cell(df, level=level, out="c")
                .select(s2.s2_parent_col(
                    __import__("pyspark.sql.functions", fromlist=["col"])
                    .col("c")).alias("p"))
                .toPandas()["p"].to_numpy(np.int64))
        assert (pgot == s2.s2_parent_np(want)).all()


def test_sql_matches_numpy():
    lon, lat = _rand_lonlat(4_000, seed=17)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (SELECT "
                "unnest(?) AS k, unnest(?) AS lon, unnest(?) AS lat)",
                [list(range(len(lon))), lon.tolist(), lat.tolist()])
    for level in (5, 12):
        cte, final = s2.s2_cell_cte_sql("pts", "lon", "lat", level, keys="k")
        got = con.execute(
            f"WITH {cte} SELECT s2_cell FROM {final} ORDER BY k"
        ).fetchnumpy()["s2_cell"].astype(np.int64)
        want = s2.s2_cell_np(lon, lat, level)
        assert (got == want).all(), f"SQL != numpy at level {level}"


def test_gate_margin_audit():
    """Gate soundness: the only cross-engine-divergent values in the
    pipeline are the trig outputs x, y, z (the argument products,
    divisions, sqrt, and all integer math are exactly rounded and
    therefore identical) — JVM Math and DuckDB's libm each guarantee
    sin/cos within ~1 ulp. So the gate is sound iff the cell id is
    INVARIANT under a generous +-4-ulp RELATIVE perturbation of each
    of x, y, z independently (all 8 sign corners; the id is monotone
    in each coordinate between corners). An absolute distance-to-
    boundary margin would be the wrong test: a point at lon=-180
    exactly has v ~ 1.2e-16 (the sin(pi) residue) — absolutely tiny
    but RELATIVELY robust, since libm error (~1e-32 there) can never
    flip its sign. Runs over the real sf0.01 and sf0.1 gate inputs."""
    import glob
    import itertools

    import duckdb as dk

    eps = 2.0 ** -50  # ~4 ulps relative
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        if not glob.glob(f"{sf_dir}/documents.parquet"):
            pytest.skip(f"no testdata at {sf_dir}")
        from gdal_spark.sources.pages import LAT_SQL, LON_SQL

        con = dk.connect()
        pdf = con.execute(
            f"""SELECT {LON_SQL} AS lon, {LAT_SQL} AS lat
                FROM read_parquet('{sf_dir}/documents.parquet')"""
        ).fetchnumpy()
        lon = pdf["lon"].astype(np.float64)
        lat = pdf["lat"].astype(np.float64)
        x, y, z = s2._xyz_np(lon, lat)

        def encode(xx, yy, zz, level=12):
            face = s2._face_np(xx, yy, zz)
            u, v = s2._uv_np(face, xx, yy, zz)
            i = s2._ij_np(s2._st_np(u), level)
            j = s2._ij_np(s2._st_np(v), level)
            odd = (face & 1) == 1
            hi = np.where(odd, j, i)
            hj = np.where(odd, i, j)
            from gdal_spark.geo.hilbert import hilbert_d_np
            pos = hilbert_d_np(hi, hj, level)
            shift = 2 * (s2.MAX_LEVEL - level)
            return (face << 59) | (pos << (shift + 1)) | (
                np.int64(1) << shift)

        nominal = encode(x, y, z)
        for sx, sy, sz in itertools.product((1 - eps, 1 + eps), repeat=3):
            got = encode(x * sx, y * sy, z * sz)
            bad = got != nominal
            assert not bad.any(), (
                f"{sf_dir}: cell flips under {sx, sy, sz} perturbation "
                f"at {bad.sum()} points")
