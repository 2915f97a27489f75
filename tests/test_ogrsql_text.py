"""OGRSQL text front-end: representative statement shapes ported from
the reference's SQL corpus (autotest/ogr/ogr_sql_test.py) run through
plans.sql.execute_sql(dialect="OGRSQL") against literal fixtures that
mirror the autotest's my_layer/my_layer2 tables."""

import pytest

from gdal_spark.plans import execute_sql


@pytest.fixture()
def layers(spark):
    # autotest my_layer analog: (intfield, strfield, realfield)
    my_layer = spark.createDataFrame(
        [(1, "one", 1.5), (2, "two", 2.5), (3, "three", 3.5),
         (4, "two", 4.5), (5, None, 5.5)],
        "intfield int, strfield string, realfield double")
    # secondary with DUPLICATE keys (first-match semantics visible)
    my_layer2 = spark.createDataFrame(
        [("one", 10), ("two", 20), ("two", 21), ("three", 30)],
        "strfield2 string, extra int")
    my_layer3 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "bb"), (9, "z")],
        "k3 int, tag string")
    return {"my_layer": my_layer, "my_layer2": my_layer2,
            "my_layer3": my_layer3}


def _rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


def test_select_distinct_order_by(spark, layers):
    # ogr_sql_test.py: test_ogr_sql_24-style DISTINCT + ORDER BY
    out = execute_sql(spark, """
        SELECT DISTINCT strfield FROM my_layer
        WHERE strfield IS NOT NULL ORDER BY strfield DESC""",
        layers, dialect="OGRSQL")
    assert _rows(out, "strfield") == [("two",), ("three",), ("one",)]


def test_count_distinct_and_aggregates(spark, layers):
    out = execute_sql(spark, """
        SELECT COUNT(DISTINCT strfield) AS nd, COUNT(*) AS n,
               MIN(realfield) AS mn, MAX(realfield) AS mx,
               SUM(intfield) AS s, AVG(intfield) AS a
        FROM my_layer""", layers, dialect="OGRSQL")
    r = out.collect()[0]
    assert (r["nd"], r["n"], r["mn"], r["mx"], r["s"], r["a"]) == \
        (3, 5, 1.5, 5.5, 15, 3.0)


def test_like_vs_ilike_option(spark, layers):
    # swq_op_general.cpp LIKE; OGR_SQL_LIKE_AS_ILIKE
    # (ogr_sql_test.py:353-375)
    strict = execute_sql(spark,
                         "SELECT * FROM my_layer WHERE strfield LIKE 'T%'",
                         layers, dialect="OGRSQL")
    assert strict.count() == 0
    loose = execute_sql(spark,
                        "SELECT * FROM my_layer WHERE strfield LIKE 'T%'",
                        layers, dialect="OGRSQL", like_as_ilike=True)
    assert loose.count() == 3


def test_cast_substr_concat(spark, layers):
    out = execute_sql(spark, """
        SELECT intfield, SUBSTR(strfield, 1, 2) AS s2,
               CONCAT(strfield, '#', CAST(intfield AS STRING)) AS c,
               CAST(realfield AS INT) AS ri
        FROM my_layer WHERE strfield = 'one'""", layers, dialect="OGRSQL")
    assert _rows(out, "intfield", "s2", "c", "ri") == [(1, "on", "one#1", 1)]


def test_in_between_null_predicates(spark, layers):
    out = execute_sql(spark, """
        SELECT intfield FROM my_layer
        WHERE (intfield IN (2, 3, 9) OR strfield IS NULL)
          AND realfield BETWEEN 2.0 AND 6.0
        ORDER BY intfield""", layers, dialect="OGRSQL")
    assert _rows(out, "intfield") == [(2,), (3,), (5,)]


def test_first_match_left_join(spark, layers):
    """OGRSQL joins take ONE secondary feature per primary row — the
    first in FID order (ogr_gensql.cpp) — visible on key 'two' which
    has two secondary records."""
    out = execute_sql(spark, """
        SELECT my_layer.intfield, my_layer2.extra
        FROM my_layer LEFT JOIN my_layer2
          ON my_layer.strfield = my_layer2.strfield2
        ORDER BY my_layer.intfield""", layers, dialect="OGRSQL")
    assert _rows(out, "intfield", "extra") == [
        (1, 10), (2, 20), (3, 30), (4, 20), (5, None)]


def test_bare_join_is_left_first_match(spark, layers):
    """swq grammar accepts bare JOIN (swq_parser.y:1088); OGRSQL
    processes it with the same LEFT first-match semantics."""
    out = execute_sql(spark, """
        SELECT my_layer.intfield, my_layer2.extra
        FROM my_layer JOIN my_layer2
          ON my_layer.strfield = my_layer2.strfield2
        ORDER BY my_layer.intfield""", layers, dialect="OGRSQL")
    assert _rows(out, "intfield", "extra") == [
        (1, 10), (2, 20), (3, 30), (4, 20), (5, None)]


def test_multiple_joins(spark, layers):
    """opt_joins recursion (swq_parser.y:1087-1094): chain two
    secondaries, each first-match."""
    out = execute_sql(spark, """
        SELECT my_layer.intfield, my_layer2.extra, my_layer3.tag
        FROM my_layer
        LEFT JOIN my_layer2 ON my_layer.strfield = my_layer2.strfield2
        LEFT JOIN my_layer3 ON my_layer.intfield = my_layer3.k3
        ORDER BY my_layer.intfield""", layers, dialect="OGRSQL")
    assert _rows(out, "intfield", "extra", "tag") == [
        (1, 10, "a"), (2, 20, "b"), (3, 30, None),
        (4, 20, None), (5, None, None)]


def test_union_all_chain(spark, layers):
    """UNION ALL chains (swq_parser.y:840), three branches."""
    out = execute_sql(spark, """
        SELECT intfield AS v FROM my_layer WHERE intfield <= 2
        UNION ALL
        SELECT extra AS v FROM my_layer2 WHERE extra = 30
        UNION ALL
        SELECT k3 AS v FROM my_layer3 WHERE k3 = 9
        ORDER BY v""", layers, dialect="OGRSQL")
    assert _rows(out, "v") == [(1,), (2,), (9,), (30,)]


def test_union_all_with_join_branch(spark, layers):
    """A join inside a UNION ALL branch still gets the first-match
    rewrite."""
    out = execute_sql(spark, """
        SELECT my_layer.intfield AS v
        FROM my_layer JOIN my_layer2
          ON my_layer.strfield = my_layer2.strfield2
        WHERE my_layer2.extra = 20
        UNION ALL
        SELECT k3 AS v FROM my_layer3 WHERE tag = 'z'
        ORDER BY v""", layers, dialect="OGRSQL")
    assert _rows(out, "v") == [(2,), (4,), (9,)]


def test_orderby_limit_offset(spark, layers):
    out = execute_sql(spark, """
        SELECT intfield FROM my_layer
        ORDER BY realfield DESC LIMIT 2 OFFSET 1""",
        layers, dialect="OGRSQL")
    assert _rows(out, "intfield") == [(4,), (3,)]


def test_fid_special_field(spark, layers):
    """FID pseudo-column (ogr/ogr_p.h:134) is exposed per layer."""
    out = execute_sql(spark, """
        SELECT FID, intfield FROM my_layer WHERE intfield = 1""",
        layers, dialect="OGRSQL")
    r = out.collect()
    assert len(r) == 1 and r[0]["intfield"] == 1

def test_unsupported_join_shapes_raise(spark, layers):
    for bad in (
        "SELECT * FROM my_layer INNER JOIN my_layer2 "
        "ON my_layer.strfield = my_layer2.strfield2",
        "SELECT * FROM my_layer RIGHT JOIN my_layer2 "
        "ON my_layer.strfield = my_layer2.strfield2",
        # ON may not reference ANOTHER layer than the primary and the
        # joined secondary (ogr_sql_test.py:834, swq_select.cpp:916)
        "SELECT * FROM my_layer LEFT JOIN my_layer2 "
        "ON my_layer.intfield = my_layer3.k3",
        # unknown joined layer (ogr_sql_test.py:832-833)
        "SELECT * FROM my_layer LEFT JOIN foo "
        "ON my_layer.strfield = foo.strfield",
    ):
        with pytest.raises(NotImplementedError):
            execute_sql(spark, bad, layers, dialect="OGRSQL")


def test_join_with_table_aliases(spark, layers):
    """ogr_join_test.py:112-128 (tests 5-7): aliased primary and
    secondary."""
    out = execute_sql(spark, """
        SELECT p.intfield, il.extra
        FROM my_layer p LEFT JOIN my_layer2 il
          ON p.strfield = il.strfield2
        ORDER BY p.intfield""", layers, dialect="OGRSQL")
    assert _rows(out, "intfield", "extra") == [
        (1, 10), (2, 20), (3, 30), (4, 20), (5, None)]


def test_join_on_and_of_equalities(spark, layers):
    """ogr_join_test.py:429-443 (test 22): compound AND equi ON."""
    out = execute_sql(spark, """
        SELECT my_layer.intfield, my_layer3.tag
        FROM my_layer LEFT JOIN my_layer3
          ON my_layer.intfield = my_layer3.k3 AND my_layer3.tag = 'b'
        ORDER BY my_layer.intfield""", layers, dialect="OGRSQL")
    assert _rows(out, "intfield", "tag") == [
        (1, None), (2, "b"), (3, None), (4, None), (5, None)]


def test_join_on_inequality_first_match(spark, layers):
    """Arbitrary ON expression (GetFilterForJoin ogr_gensql.cpp:1333):
    each primary row pairs with the FIRST secondary in FID order
    satisfying the expression."""
    out = execute_sql(spark, """
        SELECT my_layer.intfield, my_layer3.tag
        FROM my_layer LEFT JOIN my_layer3
          ON my_layer3.k3 > my_layer.intfield
        ORDER BY my_layer.intfield""", layers, dialect="OGRSQL")
    # FID order of my_layer3 rows: (1,a) (2,b) (2,bb) (9,z)
    assert _rows(out, "intfield", "tag") == [
        (1, "b"), (2, "z"), (3, "z"), (4, "z"), (5, "z")]


def test_join_on_primary_only_condition(spark, layers):
    """ogr_join_test.py:489-540 (join ON a primary-only predicate):
    rows satisfying it join the secondary's FIRST record, others get
    NULL."""
    out = execute_sql(spark, """
        SELECT my_layer.intfield, my_layer2.extra
        FROM my_layer LEFT JOIN my_layer2
          ON my_layer.realfield = 2.5
        ORDER BY my_layer.intfield""", layers, dialect="OGRSQL")
    assert _rows(out, "intfield", "extra") == [
        (1, None), (2, 10), (3, None), (4, None), (5, None)]


def test_same_secondary_joined_in_two_union_branches(spark, layers):
    """Two UNION ALL branches each joining my_layer2 (the round-3
    ADVICE regression case): the per-clause rewrite must not clobber
    the later branch's ON references."""
    out = execute_sql(spark, """
        SELECT my_layer.intfield AS v, my_layer2.extra AS e
        FROM my_layer JOIN my_layer2
          ON my_layer.strfield = my_layer2.strfield2
        WHERE my_layer.intfield = 1
        UNION ALL
        SELECT my_layer.intfield AS v, my_layer2.extra AS e
        FROM my_layer JOIN my_layer2
          ON my_layer.strfield = my_layer2.strfield2
        WHERE my_layer.intfield = 4
        ORDER BY v""", layers, dialect="OGRSQL")
    assert _rows(out, "v", "e") == [(1, 10), (4, 20)]


def test_join_reversed_on_orientation(spark, layers):
    """ogr_join_test.py:369-374 (test 18): secondary.key = primary.key."""
    out = execute_sql(spark, """
        SELECT my_layer.intfield, my_layer2.extra
        FROM my_layer LEFT JOIN my_layer2
          ON my_layer2.strfield2 = my_layer.strfield
        ORDER BY my_layer.intfield""", layers, dialect="OGRSQL")
    assert _rows(out, "intfield", "extra") == [
        (1, 10), (2, 20), (3, 30), (4, 20), (5, None)]
