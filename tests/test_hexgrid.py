"""Hexagonal cell index (geo/hexgrid.py): lattice geometry properties,
pack/unpack, parent fan-in, and the three-engine bit-identity
(numpy / Catalyst columns / DuckDB SQL)."""

import duckdb
import numpy as np
from pyspark.sql import functions as F

from gdal_spark.geo import hexgrid as H
from gdal_spark.geo import mercator
from gdal_spark.sources import pages


def _rand_lonlat(n, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-179.9, 179.9, n)
    lat = rng.uniform(-80.0, 80.0, n)
    return lon, lat


def _doc_lonlat(n=2000):
    """The documents fixture's deterministic point derivation (numpy
    mirror of pages.LON_SQL/LAT_SQL)."""
    doc_id = np.arange(n, dtype=np.int64)
    lon = ((doc_id * pages.LON_MULT) % 360000000) / 1000000.0 - 180.0
    lat = ((doc_id * pages.LAT_MULT + pages.LAT_ADD) % 160000000) \
        / 1000000.0 - 80.0
    return lon, lat


# ------------------------------------------------------------ geometry

def test_hex_encode_is_nearest_center():
    """The encoded hex's center must be at least as close (in mercator
    meters) as every neighboring hex's center — the defining property
    of the axial cube-rounding."""
    lon, lat = _rand_lonlat(5000)
    res = 6
    q, r = H.hex_qr_np(lon, lat, res)
    mx, my = mercator.lonlat_to_meters_np(lon, lat)
    cx, cy = H.hex_center_m_np(q, r, res)
    d_own = np.hypot(mx - cx, my - cy)
    size = H.size_of(res)
    # own center within the circumradius
    assert np.all(d_own <= size * (1 + 1e-12))
    for dq, dr in H.grid_disk_offsets(1):
        if dq == 0 and dr == 0:
            continue
        nx, ny = H.hex_center_m_np(q + dq, r + dr, res)
        d_n = np.hypot(mx - nx, my - ny)
        assert np.all(d_own <= d_n * (1 + 1e-9))


def test_grid_disk_count_and_distances():
    for k in (0, 1, 2, 5):
        offs = H.grid_disk_offsets(k)
        assert len(offs) == 1 + 3 * k * (k + 1)
        dq = np.array([o[0] for o in offs])
        dr = np.array([o[1] for o in offs])
        d = H.hex_distance_np(dq, dr, 0, 0)
        assert d.max() == (k if k else 0) and np.all(d >= 0)
    # ring k = disk k minus disk k-1, all at exact distance k
    disk3 = set(H.grid_disk_offsets(3))
    disk2 = set(H.grid_disk_offsets(2))
    ring = disk3 - disk2
    assert len(ring) == 6 * 3
    for dq, dr in ring:
        assert int(H.hex_distance_np(dq, dr, 0, 0)) == 3


def test_hex_id_pack_unpack_roundtrip():
    lon, lat = _rand_lonlat(1000, seed=11)
    for res in (0, 6, H.MAX_RES):
        ids = H.hex_id_np(lon, lat, res)
        res2, q2, r2 = H.hex_unpack_np(ids)
        q, r = H.hex_qr_np(lon, lat, res)
        assert np.all(res2 == res) and np.all(q2 == q) and np.all(r2 == r)


def test_hex_parent_fan_in_and_containment():
    """Aperture-7: distinct children / distinct parents ~ 7 on dense
    data, and every child's center lies within its parent's
    out-circle."""
    lon, lat = _rand_lonlat(60_000, seed=3)
    res = 4  # ~3.7k world hexes at res 4: 60k points saturate them
    ids = H.hex_id_np(lon, lat, res)
    par = H.hex_parent_np(ids, steps=1)
    n_child = len(np.unique(ids))
    n_par = len(np.unique(par))
    ratio = n_child / n_par
    assert 5.0 <= ratio <= 9.0, ratio
    # containment: child center within parent circumradius
    _, q, r = H.hex_unpack_np(ids)
    cx, cy = H.hex_center_m_np(q, r, res)
    _, pq, pr = H.hex_unpack_np(par)
    px, py = H.hex_center_m_np(pq, pr, res - 1)
    assert np.all(np.hypot(cx - px, cy - py) <= H.size_of(res - 1)
                  * (1 + 1e-12))


def test_hex_rounding_margin_on_fixture():
    """Cross-engine robustness audit (the warp gates' margin rule):
    perturbing every fixture latitude/longitude by +-1e-9 degrees must
    not move any point across a hex boundary — so the ~1 ULP libm
    noise between Spark, numpy and DuckDB cannot flip the gate."""
    lon, lat = _doc_lonlat(2000)
    res = 5  # the gate's resolution
    q0, r0 = H.hex_qr_np(lon, lat, res)
    for dl in (-1e-9, 1e-9):
        q1, r1 = H.hex_qr_np(lon + dl, lat, res)
        q2, r2 = H.hex_qr_np(lon, lat + dl, res)
        assert np.all(q1 == q0) and np.all(r1 == r0)
        assert np.all(q2 == q0) and np.all(r2 == r0)


# ------------------------------------------------------- three engines

def test_hex_col_matches_np(spark):
    lon, lat = _doc_lonlat(2000)
    res = 5
    want = H.hex_id_np(lon, lat, res)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)],
        "lon double, lat double")
    got = np.array([r["h"] for r in df.select(
        H.hex_id_col(F.col("lon"), F.col("lat"), res).alias("h"))
        .collect()])
    assert sorted(got.tolist()) == sorted(want.tolist())


def test_hex_sql_matches_np():
    lon, lat = _doc_lonlat(2000)
    res = 5
    want = sorted(H.hex_id_np(lon, lat, res).tolist())
    con = duckdb.connect()
    con.execute("CREATE TABLE hx_src AS SELECT "
                "unnest(?) AS lon, unnest(?) AS lat",
                [lon.tolist(), lat.tolist()])
    cte, q, r = H.hex_qr_sql("lon", "lat", res)
    hid = H.hex_id_sql_from_qr(q, r, res)
    got = [row[0] for row in con.execute(
        f"WITH {cte} SELECT {hid} AS h FROM hx_r ORDER BY h").fetchall()]
    assert got == want
