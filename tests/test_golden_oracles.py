"""Golden-literal oracles (gdal_spark/golden.py): the pinned VALUES
SQL for the three non-relational gates must (a) execute in DuckDB with
the gate's exact schema, (b) agree with a fresh single-node
recomputation (stale-pin detection), and (c) satisfy the partial-
checksum combine law (per-tile sums == full-band checksum mod 2^16,
gdalchecksum.cpp:177-181)."""

import duckdb
import numpy as np
import pytest

from gdal_spark import golden
from gdal_spark.raster import checksum as CK
from gdal_spark.raster.sieve import sieve_np

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(f"{golden.GOLDEN_SF_DIR}/documents.parquet"),
    reason="driver testdata absent",
)


def _run(sql):
    return duckdb.sql(sql)


def test_golden_oracles_execute_with_gate_schema():
    g = golden.golden_oracles()
    assert set(g) == {"raster_viewshed_counts", "raster_sieve_checksum",
                      "raster_grid_idw"}
    vs = _run(g["raster_viewshed_counts"])
    assert vs.columns == ["tile_y", "tile_x", "n_visible", "n_hidden"]
    assert [str(t) for t in vs.types] == ["INTEGER", "INTEGER", "BIGINT", "BIGINT"]
    for k in ("raster_sieve_checksum", "raster_grid_idw"):
        r = _run(g[k])
        assert r.columns == ["tile_y", "tile_x", "checksum", "n_nonzero"]
        assert [str(t) for t in r.types] == ["INTEGER", "INTEGER", "BIGINT", "BIGINT"]
    assert len(_run(g["raster_grid_idw"]).fetchall()) == 4


def test_frozen_pins_are_committed_source_constants():
    """The served oracle text must BE the frozen literal in
    golden_pins.py (generated once by tools/freeze_golden.py), not a
    fresh recomputation — the reference pins literals in test source
    the same way (autotest/alg/rasterize.py:71-77)."""
    from gdal_spark import golden_pins as GP

    key = __import__("os").path.basename(golden.GOLDEN_SF_DIR)
    assert key in GP.PINS and key in GP.DATA_FINGERPRINTS
    served = golden.golden_oracles()
    assert served == GP.PINS[key]


def test_golden_pins_match_fresh_recomputation():
    pinned = golden.golden_oracles()
    golden._CACHE.clear()  # force regeneration from the parquet
    fresh = golden.compute_oracles(golden.GOLDEN_SF_DIR)
    assert pinned == fresh


def test_kernel_regression_breaks_the_gate_loudly():
    """A divergence between the frozen pin and the recomputed text
    must hard-fail golden_oracles() — the whole point of freezing."""
    from gdal_spark import golden_pins as GP

    key = __import__("os").path.basename(golden.GOLDEN_SF_DIR)
    orig = GP.PINS[key]["raster_sieve_checksum"]
    golden._CACHE.clear()
    try:
        GP.PINS[key]["raster_sieve_checksum"] = orig + " -- tampered"
        with pytest.raises(RuntimeError, match="golden pin mismatch"):
            golden.golden_oracles()
    finally:
        GP.PINS[key]["raster_sieve_checksum"] = orig


def test_pin_fingerprint_matches_live_data():
    """The committed fingerprint of documents.parquet must match the
    live file — distinguishes 'data regenerated' from 'kernel bug'."""
    import sys

    sys.path.insert(0, __import__("os").path.join(
        __import__("os").path.dirname(__import__("os").path.dirname(
            __import__("os").path.abspath(__file__)))))
    from gdal_spark import golden_pins as GP
    from tools.freeze_golden import fingerprint

    key = __import__("os").path.basename(golden.GOLDEN_SF_DIR)
    assert fingerprint(golden.GOLDEN_SF_DIR) == GP.DATA_FINGERPRINTS[key]


def test_sieve_golden_satisfies_checksum_combine_law():
    g = golden.golden_oracles()
    rows = _run(g["raster_sieve_checksum"]).fetchall()
    canvas = golden._density_canvas(golden.GOLDEN_SF_DIR)
    sieved = sieve_np(canvas, threshold=2)
    # tiles absent from the sparse set are all-zero -> checksum 0, so
    # the occupied-tile partial sums combine to the full-band checksum
    assert np.count_nonzero(canvas) and len(rows)
    full = CK.checksum_np(sieved, 0, 0, sieved.shape[1], is_float=True)
    assert CK.checksum_combine([r[2] for r in rows]) == full
