"""C4/RefinedWeb line-level boilerplate removal + Gopher repetition
metrics (operators/boilerplate.py)."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import boilerplate as BP

NAV = "Home | About | Contact"
FOOT = "(c) 2026 Example Corp"


def _docs(spark):
    rows = [
        (1, f"{NAV}\nUnique article one text.\nMore body here.\n{FOOT}"),
        (2, f"{NAV}\nAnother distinct article body.\n{FOOT}"),
        (3, f"{NAV}\nThird page talks about turtles.\n{FOOT}"),
        (4, "Completely standalone document.\nNo boilerplate at all."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_frequencies(spark):
    freq = BP.line_frequencies(_docs(spark))
    counts = sorted(r.n_docs for r in freq.collect())
    # NAV and FOOT appear in 3 docs each; 6 unique lines appear once
    assert counts == [1, 1, 1, 1, 1, 1, 3, 3]


def test_remove_boilerplate(spark):
    docs = _docs(spark)
    out = BP.remove_boilerplate_lines(docs, max_docs_per_line=2)
    texts = {r.doc_id: r.text for r in out.collect()}
    assert NAV not in texts[1] and FOOT not in texts[1]
    assert texts[1] == "Unique article one text.\nMore body here."
    assert texts[4] == "Completely standalone document.\nNo boilerplate at all."
    # schema preserved
    assert set(out.columns) == {"doc_id", "text"}
    # a permissive threshold keeps everything
    keep = BP.remove_boilerplate_lines(docs, max_docs_per_line=10)
    orig = {r.doc_id: r.text for r in docs.collect()}
    assert {r.doc_id: r.text for r in keep.collect()} == orig


def test_gopher_metrics(spark):
    rows = [
        # 4 lines, one duplicated once -> dup_line_frac = 1/4
        (1, "alpha beta\nsame line\nsame line\ngamma delta"),
        # no duplicate lines, heavy 3-gram repetition
        (2, "the quick fox " * 10),
        (3, "clean text with zero repeats and many distinct words "
            "spread across one longer single line of prose here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = {r.doc_id: r for r in
         BP.gopher_repetition_metrics(docs).collect()}
    assert m[1].dup_line_frac == pytest.approx(0.25)
    # duplicate chars: one extra "same line" (9 chars) over total line chars
    total = len("alpha beta") + 2 * len("same line") + len("gamma delta")
    assert m[1].dup_line_char_frac == pytest.approx(9 / total)
    assert m[2].top_ngram_char_frac > 0.3  # dominated by one 3-gram
    assert m[3].top_ngram_char_frac < 0.5
    assert m[3].dup_line_frac == 0.0
