"""The driver contract, as a pytest gate: every queries() entry with an
oracle must match DuckDB bit-for-bit at sf0.001 (order-insensitive,
repr-exact values — the same comparison tools/verify_local.py runs at
sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as E

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * "
                  f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    return c


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _multiset(cols, rows):
    order = sorted(cols)
    return sorted(tuple(_norm(dict(zip(cols, r))[c]) for c in order) for r in rows)


QUERIES = E.queries()
ORACLES = E.oracle_sql()


@pytest.fixture(scope="module", autouse=True)
def _golden_at_test_sf(sf_dir):
    """oracle_sql() pins golden literals at the driver's sf0.01; this
    suite runs at sf0.001, so re-pin them from the suite's data."""
    from gdal_spark import golden

    ORACLES.update(golden.golden_oracles(sf_dir))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, sf_dir, con):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only contract
        return
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count differs"
    assert _multiset(scols, srows) == _multiset(ocols, orows), \
        f"{name}: values differ"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["poly_id", "tile_x", "tile_y", "n_pages", "first_url"]


def test_multimodal_decode_non_png_raises(spark, sf_dir):
    """Formats with no codec in this container (HTML bytes standing in
    for JPEG/WebP) must fail loudly, never silently."""
    from gdal_spark.operators import multimodal
    from gdal_spark.sources import pages

    p = pages.pages_from_documents(spark, sf_dir).limit(5) \
        .selectExpr("doc_id", "html as payload")
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        multimodal.decode_image(p).collect()


def test_multimodal_decode_png_real(spark, sf_dir):
    """decode_image REALLY decodes PNG payloads (engine's own codec):
    dimensions, channel means, and the 8x8 luma fingerprint check out;
    thumbnail8 re-encodes a decodable 8x8 PNG."""
    import numpy as np

    from gdal_spark.operators import multimodal
    from gdal_spark.raster import png as PNG

    rng = np.random.default_rng(9)
    imgs = {1: rng.integers(0, 256, (24, 16, 3)).astype(np.uint8),
            2: rng.integers(0, 256, (10, 10)).astype(np.uint8)}
    rows = [(i, bytearray(PNG.encode(a))) for i, a in imgs.items()]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in multimodal.decode_image(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (16, 24, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (10, 10, 1)
    np.testing.assert_allclose(got[2]["mean"][0], imgs[2].mean(), rtol=1e-12)
    assert len(got[1]["luma8"]) == 64

    thumbs = {r["doc_id"]: bytes(r["thumb_png"])
              for r in multimodal.thumbnail8(df).collect()}
    t = PNG.decode(thumbs[1])
    assert t.shape == (8, 8) and t.dtype == np.uint8
