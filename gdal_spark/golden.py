"""Golden-literal DuckDB oracles for the three non-relational gates.

The reference's own test discipline pins GOLDEN CONSTANTS for exactly
this class of operator: autotest/pymod/gdaltest.py:298-366 compares
band checksums against pinned literals, and e.g.
autotest/alg/rasterize.py:71-77 expects the literal checksum 6452.
Sieve (smallest-first cascade), viewshed (iterated bilinear ray walk)
and unbounded-radius IDW (order-sensitive float sums) are not
relationally recomputable (each query's docstring carries the proof),
so — like the reference — their expected outputs are pinned: computed
ONCE here by the SINGLE-NODE numpy implementations (`sieve_np`,
`viewshed_np`, `idw_np` — the same oracles the pytest
distributed==single-node gates use, a code path with no Spark in it)
and emitted as `SELECT ... FROM (VALUES ...)` DuckDB SQL.  The driver
then checks the distributed engine against these literals exactly as
it checks every other gate (rows + schema + value hash).

The single-node derivation reads the sf0.01 parquet directly via
pyarrow and rebuilds the z3 density canvas with numpy-only math that
mirrors sources/pages.py (integer-exact lon/lat) and
raster/density.py (floor binning — IEEE-exact, see geo/mercator.py's
three-form contract).  tests/test_golden_oracles.py replays the
DuckDB literals against the live Spark queries, so a stale pin (e.g.
regenerated test data) fails loudly.
"""

from __future__ import annotations

import os

import numpy as np

GOLDEN_SF_DIR = os.environ.get("GDAL_SPARK_GOLDEN_SF", "/root/testdata/sf0.01")

# constants in lockstep with queries_raster (FZOOM/FTILE) and sources.pages
_FZOOM, _FTILE = 3, 64
_N = (1 << _FZOOM) * _FTILE  # 512 px world grid at z3


def _doc_arrays(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    doc_id = t.column("doc_id").to_numpy().astype(np.int64)
    n_chars = t.column("n_chars").to_numpy().astype(np.float64)
    return doc_id, n_chars


def _lonlat(doc_id: np.ndarray):
    """numpy mirror of sources.pages.lon_col/lat_col (int64-exact)."""
    from .sources import pages as P

    lon = ((doc_id * P.LON_MULT) % 360_000_000) / 1e6 - 180.0
    lat = ((doc_id * P.LAT_MULT + P.LAT_ADD) % 160_000_000) / 1e6 - 80.0
    return lon, lat


def _density_canvas(sf_dir: str) -> np.ndarray:
    """z3 density canvas: numpy mirror of density.points_to_pixel_counts."""
    from .geo import mercator as M

    doc_id, _ = _doc_arrays(sf_dir)
    lon, lat = _lonlat(doc_id)
    gx = np.clip(np.floor((lon + 180.0) / 360.0 * float(_N)), 0, _N - 1).astype(np.int64)
    my = np.log(np.tan((90.0 + np.clip(lat, -M.MERCATOR_MAX_LAT, M.MERCATOR_MAX_LAT))
                       * M.DEG2)) * M.EARTH_RADIUS
    gy = np.clip(np.floor((M.ORIGIN_SHIFT - my) / (2.0 * M.ORIGIN_SHIFT) * float(_N)),
                 0, _N - 1).astype(np.int64)
    canvas = np.zeros((_N, _N), dtype=np.float64)
    np.add.at(canvas, (gy, gx), 1.0)
    return canvas


def _occupied_tiles(canvas: np.ndarray):
    """(ty, tx) of tiles with >= 1 nonzero pixel — the sparse density
    tile set the distributed pipeline materializes."""
    out = []
    nt = _N // _FTILE
    for ty in range(nt):
        for tx in range(nt):
            blk = canvas[ty * _FTILE:(ty + 1) * _FTILE, tx * _FTILE:(tx + 1) * _FTILE]
            if (blk != 0).any():
                out.append((ty, tx))
    return out


def _values_sql(rows, cols, casts, order_cols) -> str:
    body = ",\n      ".join("(" + ", ".join(str(v) for v in r) + ")" for r in rows)
    sel = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, casts))
    return (f"SELECT {sel}\n    FROM (VALUES\n      {body}\n    ) AS t({', '.join(cols)})"
            f"\n    ORDER BY {', '.join(order_cols)}")


def _golden_viewshed(canvas: np.ndarray) -> str:
    from .raster.viewshed import viewshed_np

    vis = viewshed_np(canvas, ox=_N // 2, oy=_N // 2, obs_height=50.0,
                      max_distance=200.0, out_of_range=-1.0)
    rows = []
    nt = _N // _FTILE
    for ty in range(nt):
        for tx in range(nt):
            blk = vis[ty * _FTILE:(ty + 1) * _FTILE, tx * _FTILE:(tx + 1) * _FTILE]
            nv = int((blk == 1.0).sum())
            nh = int((blk == 0.0).sum())
            if nv > 0 or nh > 0:
                rows.append((ty, tx, nv, nh))
    return _values_sql(rows, ["tile_y", "tile_x", "n_visible", "n_hidden"],
                       ["INTEGER", "INTEGER", "BIGINT", "BIGINT"],
                       ["tile_y", "tile_x"])


def _golden_sieve(canvas: np.ndarray) -> str:
    from .raster import checksum as CK
    from .raster.sieve import sieve_np

    out = sieve_np(canvas, threshold=2)
    rows = []
    for ty, tx in _occupied_tiles(canvas):
        blk = out[ty * _FTILE:(ty + 1) * _FTILE, tx * _FTILE:(tx + 1) * _FTILE]
        cs = CK.checksum_np(blk, x0=tx * _FTILE, y0=ty * _FTILE,
                            full_width=_N, is_float=True)
        rows.append((ty, tx, cs, int((blk != 0).sum())))
    return _values_sql(rows, ["tile_y", "tile_x", "checksum", "n_nonzero"],
                       ["INTEGER", "INTEGER", "BIGINT", "BIGINT"],
                       ["tile_y", "tile_x"])


def _golden_idw(sf_dir: str) -> str:
    from .geo import mercator as M
    from .raster import checksum as CK
    from .raster import grid as G
    from .raster.gridding import _tile_nodes, idw_np, sort_points

    doc_id, n_chars = _doc_arrays(sf_dir)
    lon, lat = _lonlat(doc_id)
    px = lon * M.LON2M
    py = np.log(np.tan((90.0 + np.clip(lat, -M.MERCATOR_MAX_LAT, M.MERCATOR_MAX_LAT))
                       * M.DEG2)) * M.EARTH_RADIUS
    px, py, pv = sort_points(px, py, n_chars)
    spec = G.world_3857(1, 64)  # same 128px/4-tile grid as the gate
    rows = []
    for ty in range(spec.tiles_y):
        for tx in range(spec.tiles_x):
            wx, wy = _tile_nodes(spec, ty, tx)
            surf = idw_np(wx, wy, px, py, pv, power=2.0)
            h, w = spec.tile_shape(ty, tx)
            cs = CK.checksum_np(surf.reshape(h, w), x0=tx * spec.tile,
                                y0=ty * spec.tile, full_width=spec.width,
                                is_float=True)
            rows.append((ty, tx, cs, int((surf != 0).sum())))
    return _values_sql(rows, ["tile_y", "tile_x", "checksum", "n_nonzero"],
                       ["INTEGER", "INTEGER", "BIGINT", "BIGINT"],
                       ["tile_y", "tile_x"])


_CACHE: dict[str, dict[str, str]] = {}


def compute_oracles(sf_dir: str) -> dict[str, str]:
    """Recompute the three golden SQL texts from the parquet at
    `sf_dir` via the single-node numpy kernels.  Used by
    tools/freeze_golden.py to generate the FROZEN pins in
    golden_pins.py, and by golden_oracles() only as a staleness
    assert against those pins — never as the served oracle for a
    pinned scale factor."""
    if sf_dir in _CACHE:
        return dict(_CACHE[sf_dir])
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        return {}
    canvas = _density_canvas(sf_dir)
    _CACHE[sf_dir] = {
        "raster_viewshed_counts": _golden_viewshed(canvas),
        "raster_sieve_checksum": _golden_sieve(canvas),
        "raster_grid_idw": _golden_idw(sf_dir),
    }
    return dict(_CACHE[sf_dir])


def golden_oracles(sf_dir: str = GOLDEN_SF_DIR) -> dict[str, str]:
    """{gate name -> pinned-literal DuckDB SQL} for the parquet at
    `sf_dir` (default: the driver's sf0.01 gate); {} if data is
    absent.

    For scale factors with a FROZEN pin in golden_pins.py (committed
    source constants, the reference's own discipline —
    autotest/alg/rasterize.py:71-77 pins the literal 6452) the frozen
    text is returned; the kernels are re-run only to ASSERT the pin is
    not stale, and any mismatch hard-fails.  A kernel regression
    therefore breaks the gate visibly instead of moving oracle and
    engine together.  Unpinned directories fall back to live
    recompute (tests at ad-hoc SFs)."""
    key = os.path.basename(os.path.normpath(sf_dir))
    try:
        from . import golden_pins as GP
        pinned = GP.PINS.get(key)
    except ImportError:  # pins not generated yet (fresh checkout bootstrap)
        pinned = None
    live = compute_oracles(sf_dir)
    if pinned is None:
        return live
    if live and live != pinned:
        stale = sorted(k for k in pinned if live.get(k) != pinned[k])
        raise RuntimeError(
            f"golden pin mismatch for {key} (gates {stale}): either the test "
            "data was regenerated or a numpy kernel regressed. Diff the "
            "recomputed text against gdal_spark/golden_pins.py before even "
            "considering `python tools/freeze_golden.py` — a re-pin without a "
            "diff review defeats the frozen-oracle gate.")
    return dict(pinned)
