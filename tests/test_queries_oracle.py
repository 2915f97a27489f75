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


def test_multimodal_decode_stub_raises(spark, sf_dir):
    from gdal_spark.operators import multimodal
    from gdal_spark.sources import pages

    p = pages.pages_from_documents(spark, sf_dir).limit(5) \
        .selectExpr("doc_id", "html as payload")
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        multimodal.decode_image(p).collect()
