"""Unit tests for the single-node raster kernels (the oracles the
distributed operators are verified against)."""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.raster import checksum as CK
from gdal_spark.raster import grid as G
from gdal_spark.raster import polygonize as PZ
from gdal_spark.raster import pyramid as P
from gdal_spark.raster import rasterize as R


# ---------------------------------------------------------------- checksum

def _checksum_loop(arr):
    """Literal transcription of the documented accumulation order."""
    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    acc, ip = 0, 0
    for y in range(arr.shape[0]):
        for x in range(arr.shape[1]):
            v = int(arr[y, x])
            r = v - primes[ip] * int(v / primes[ip])  # C truncated %
            acc = (acc + r) & 0xFFFF
            ip = 0 if ip == 10 else ip + 1
    return acc


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 13), st.integers(1, 13), st.integers(0, 3))
def test_checksum_matches_sequential(h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(-300, 300, size=(h, w)).astype(np.int64)
    assert CK.checksum_np(arr) == _checksum_loop(arr)


def test_checksum_float_conversion():
    arr = np.array([[0.4, 0.6, -0.6, np.nan, np.inf, 2.5e9, -2.5e9]])
    iv = CK.int_from_double_np(arr)
    # -0.6 + 0.5 = -0.1 -> floor = -1 (the +0.5-then-floor rule, not round-half-away)
    assert list(iv[0]) == [0, 1, -1, CK.INT_MIN, CK.INT_MIN, 2147483647, -2147483647]


def test_checksum_tile_partials_combine():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, size=(37, 53)).astype(np.int64)
    whole = CK.checksum_np(arr)
    parts = []
    ts = 16
    for ty in range(0, 37, ts):
        for tx in range(0, 53, ts):
            sub = arr[ty:ty + ts, tx:tx + ts]
            parts.append(CK.checksum_np(sub, x0=tx, y0=ty, full_width=53))
    assert CK.checksum_combine(parts) == whole


def test_checksum_sql_matches_np():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 100, size=(8, 11)).astype(np.int64)
    con = duckdb.connect()
    ys, xs = np.mgrid[0:8, 0:11]
    con.execute(
        "CREATE TABLE px AS SELECT unnest(?) AS x, unnest(?) AS y, unnest(?) AS v",
        [xs.ravel().tolist(), ys.ravel().tolist(), arr.ravel().tolist()])
    got = con.execute(
        f"SELECT {CK.checksum_sql('v', 'x', 'y', 11)} FROM px").fetchone()[0]
    assert got == CK.checksum_np(arr)


def test_checksum_sql_sparse_zeros_drop_out():
    """Zero pixels contribute 0 — a sparse pixel table gives the same
    checksum (the property the density-raster oracle relies on)."""
    arr = np.zeros((6, 7), dtype=np.int64)
    arr[2, 3], arr[5, 1] = 9, 41
    con = duckdb.connect()
    con.execute("CREATE TABLE px AS SELECT unnest(?) AS x, unnest(?) AS y, unnest(?) AS v",
                [[3, 1], [2, 5], [9, 41]])
    got = con.execute(
        f"SELECT {CK.checksum_sql('v', 'x', 'y', 7)} FROM px").fetchone()[0]
    assert got == CK.checksum_np(arr)


# --------------------------------------------------------------- rasterize

def _spec(w=10, h=10, tile=4):
    return G.GridSpec(w, h, (0.0, 1.0, 0.0, float(h), 0.0, -1.0), tile=tile)


def test_fill_pixel_center_rule():
    """A polygon covering world [2.2, 7.8]^2 burns exactly pixels whose
    CENTERS (x+0.5) lie inside — columns/rows 2..7."""
    ring = np.array([[2.2, 2.2], [7.8, 2.2], [7.8, 7.8], [2.2, 7.8], [2.2, 2.2]])
    canvas = R.rasterize_np(_spec(), [(1.0, [ring])])
    ys, xs = np.nonzero(canvas)
    assert xs.min() == 2 and xs.max() == 7 and ys.min() == 2 and ys.max() == 7
    assert (canvas > 0).sum() == 36


def test_fill_half_pixel_boundaries():
    """Edges exactly on pixel centers: half-open rule — left/bottom
    in-scan edges include, right excludes (floor(x+0.5) spans)."""
    ring = np.array([[1.5, 1.5], [4.5, 1.5], [4.5, 4.5], [1.5, 4.5], [1.5, 1.5]])
    canvas = R.rasterize_np(_spec(), [(1.0, [ring])])
    ys, xs = np.nonzero(canvas)
    # crossings at x=1.5 -> floor(2.0)=2 and x=4.5 -> floor(5.0)=5: cols 2..4
    assert xs.min() == 2 and xs.max() == 4
    # rows: world y [1.5, 4.5] -> pixel py [5.5, 8.5) (north-up flip),
    # dy=y+0.5 in that half-open range: rows 5,6,7
    assert ys.min() == 5 and ys.max() == 7


def test_fill_with_hole_and_merge_modes():
    shell = np.array([[0.5, 0.5], [9.5, 0.5], [9.5, 9.5], [0.5, 9.5]])
    hole = np.array([[3.5, 3.5], [6.5, 3.5], [6.5, 6.5], [3.5, 6.5]])
    rep = R.rasterize_np(_spec(), [(1.0, [shell, hole]), (2.0, [hole])])
    # hole interior burned only by the second feature
    assert rep[5, 5] == 2.0 and rep[1, 1] == 1.0
    add = R.rasterize_np(_spec(), [(1.0, [shell]), (2.0, [shell])], merge="add")
    assert add[5, 5] == 3.0


def test_fill_matches_center_in_polygon():
    """Property: for simple polygons the scanline fill equals the
    point-in-polygon test of pixel centers (llrasterize.cpp:41-45)."""
    from gdal_spark.geo import geom

    rng = np.random.default_rng(5)
    for trial in range(20):
        nv = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        r = rng.uniform(1.5, 4.8)
        cx, cy = rng.uniform(3, 7, 2)
        ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        # world == pixel space for this spec trick: use identity-ish grid
        spec = G.GridSpec(10, 10, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), tile=4)
        canvas = R.rasterize_np(spec, [(1.0, [ring])])
        ys, xs = np.mgrid[0:10, 0:10]
        want = geom.points_in_ring(xs.ravel() + 0.5, ys.ravel() + 0.5, ring)
        np.testing.assert_array_equal(canvas.ravel() > 0, want)


def test_all_touched_superset():
    # thin sliver: crosses many pixels whose centers stay outside
    ring = np.array([[0.3, 0.2], [9.6, 8.9], [9.7, 9.2], [0.3, 0.2]])
    base = R.rasterize_np(_spec(), [(1.0, [ring])])
    at = R.rasterize_np(_spec(), [(1.0, [ring])], all_touched=True)
    assert ((at > 0) | ~(base > 0)).all()
    assert (at > 0).sum() > (base > 0).sum()


# ----------------------------------------------------------------- pyramid

def test_downsample_kernels():
    t = np.arange(16, dtype=np.float64).reshape(4, 4)
    np.testing.assert_array_equal(
        P.downsample_2x2_np(t, "near"), [[0, 2], [8, 10]])
    np.testing.assert_array_equal(
        P.downsample_2x2_np(t, "average"), [[2.5, 4.5], [10.5, 12.5]])
    assert P.downsample_2x2_np(t, "sum").sum() == t.sum()
    rms = P.downsample_2x2_np(t, "rms")
    assert rms[0, 0] == pytest.approx(np.sqrt((0 + 1 + 16 + 25) / 4))
    m = P.downsample_2x2_np(np.array([[1, 1], [2, 3.]]), "mode")
    assert m[0, 0] == 1.0


def test_downsample_average_nodata():
    t = np.array([[5.0, -9, -9, -9], [5.0, -9, -9, -9],
                  [1.0, 3.0, -9, -9], [1.0, 3.0, -9, -9]])
    out = P.downsample_2x2_np(t, "average", nodata=-9.0)
    assert out[0, 0] == 5.0 and out[0, 1] == -9.0 and out[1, 0] == 2.0


# -------------------------------------------------------------- polygonize

def _flood_oracle(arr, connect8=False):
    """Independent flood-fill CCL for cross-checking label_tile_np."""
    h, w = arr.shape
    seen = np.zeros((h, w), dtype=bool)
    comps = []
    nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connect8:
        nbrs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    for y in range(h):
        for x in range(w):
            if arr[y, x] == 0 or seen[y, x]:
                continue
            stack, px = [(y, x)], []
            seen[y, x] = True
            while stack:
                cy, cx = stack.pop()
                px.append((cy, cx))
                for dy, dx in nbrs:
                    ny, nx = cy + dy, cx + dx
                    if 0 <= ny < h and 0 <= nx < w and not seen[ny, nx] \
                            and arr[ny, nx] == arr[y, x]:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            comps.append((arr[y, x], sorted(px)))
    return sorted((v, len(p), min(x for _, x in p), min(y for y, _ in p),
                   max(x for _, x in p), max(y for y, _ in p))
                  for v, p in comps)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10), st.booleans())
def test_ccl_matches_flood_fill(seed, connect8):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 3, size=(12, 15)).astype(np.float64)
    got = PZ.polygonize_np(arr, connect8)
    got_set = sorted(map(tuple, got.to_numpy().tolist()))
    want = [(float(v), float(n), float(a), float(b), float(c), float(d))
            for v, n, a, b, c, d in _flood_oracle(arr, connect8)]
    assert got_set == sorted(want)
