"""Line-level boilerplate removal + within-document repetition quality
metrics — the C4 / RefinedWeb / Gopher cleaning stages a web-corpus
pipeline runs between raw extraction and dedup.

Public recipes implemented (no reference-repo counterpart — these are
the training-data ops the brief adds on top of the GDAL surface):
 - C4-style cross-document line dedup: a LINE that repeats across
   many documents is navigation/boilerplate; drop every occurrence
   beyond the threshold and rebuild the documents (Raffel et al. 2020,
   "three-sentence span seen more than once" family; RefinedWeb uses
   the same line-frequency form).
 - Gopher repetition metrics (Rae et al. 2021, Table A1): duplicate
   line fraction, duplicate line CHARACTER fraction, top-n-gram
   character fraction — the standard quality-filter inputs.

Scale shape: everything is explode -> hash -> groupBy -> join —
JVM-side line splitting and hashing, one shuffle per stage, no Python
in the hot path; the line-frequency relation is the only broadcast
candidate and is bounded by the distinct-boilerplate-line count, not
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spread(docs: DataFrame) -> DataFrame:
    """The explode-heavy stages below do their partial aggregation in
    the MAP stage; a single-file input would run that serially, so
    fan narrow inputs out to the cluster width first (cost: one round
    of the small doc relation, repaid ~core-count-fold in the
    explode)."""
    want = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < max(2, want // 2):
        return docs.repartition(want)
    return docs


def line_frequencies(docs: DataFrame, text_col: str = "text",
                     min_len: int = 1) -> DataFrame:
    """(line_hash, n_docs) — how many DISTINCT documents contain each
    (trimmed) line. Lines shorter than min_len chars are ignored."""
    docs = _spread(docs)
    lines = (docs.select(F.col("__id__") if "__id__" in docs.columns
                         else F.monotonically_increasing_id().alias("__id__"),
                         F.explode(F.split(F.col(text_col), "\n"))
                         .alias("line"))
             .withColumn("line", F.trim("line"))
             .filter(F.length("line") >= min_len))
    return (lines.select("__id__", F.xxhash64("line").alias("line_hash"))
            .distinct()
            .groupBy("line_hash")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def remove_boilerplate_lines(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             max_docs_per_line: int = 2,
                             min_len: int = 1) -> DataFrame:
    """Rebuild documents without lines that appear in more than
    max_docs_per_line documents (the C4/RefinedWeb boilerplate rule).
    Returns the input columns with text_col rewritten (line order
    preserved; empty/short lines kept verbatim)."""
    tagged = _spread(docs).withColumn("__id__", F.col(id_col))
    freq = line_frequencies(tagged, text_col, min_len=min_len)
    # broadcast the DROP side: boilerplate lines (freq > threshold) are
    # few; the keep side is corpus-sized and must never ship anywhere
    drop_set = (freq.filter(F.col("n_docs") > max_docs_per_line)
                .select("line_hash"))
    exploded = (tagged.select(
        "__id__",
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "line")))
    hashed = (exploded
              .withColumn("line_hash", F.xxhash64(F.trim("line")))
              .withColumn("short",
                          F.length(F.trim("line")) < min_len))
    kept = (hashed.filter(~F.col("short"))
            .join(F.broadcast(drop_set), "line_hash", "left_anti")
            .unionByName(hashed.filter(F.col("short"))))
    rebuilt = (kept.groupBy("__id__")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "line"))),
                       lambda s: s["line"]),
                   "\n").alias("__new_text__")))
    out = (tagged.join(rebuilt, "__id__", "left")
           .withColumn(text_col, F.coalesce("__new_text__", F.lit("")))
           .drop("__id__", "__new_text__"))
    return out


def gopher_repetition_metrics(docs: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text",
                              ngram: int = 3) -> DataFrame:
    """Per-document repetition metrics (Gopher Table A1 family):
    dup_line_frac        duplicate lines / total lines
    dup_line_char_frac   characters in duplicate lines / total chars
    top_ngram_char_frac  chars covered by the most frequent word
                         n-gram / total chars
    All JVM expressions (split/explode/window-free groupBys)."""
    docs = _spread(docs)
    lines = (docs.select(id_col,
                         F.explode(F.split(F.col(text_col), "\n"))
                         .alias("line"))
             .withColumn("line", F.trim("line"))
             .filter(F.length("line") > 0))
    per_line = (lines.groupBy(id_col, "line")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.length(F.first("line")).alias("len")))
    line_stats = (per_line.groupBy(id_col).agg(
        (F.sum(F.when(F.col("n") > 1, F.col("n") - 1)
               .otherwise(0)) / F.sum("n")).alias("dup_line_frac"),
        (F.sum(F.when(F.col("n") > 1,
                      (F.col("n") - 1) * F.col("len")).otherwise(0))
         / F.sum(F.col("n") * F.col("len")))
        .alias("dup_line_char_frac")))

    # NOTE: hashing each window inside the transform lambda
    # (xxhash64(w[i], ...) per element) was A/B-measured ~5x SLOWER —
    # SQL higher-order functions evaluate their lambda interpreted
    # per element (same finding as the PIP HOF A/B in BASELINE.md),
    # so the codegen'd concat_ws + explode stays.
    words = (docs.withColumn("w", F.split(F.col(text_col), r"\s+"))
             .select(id_col, F.expr(
                 f"CASE WHEN size(w) >= {ngram} THEN "
                 f"transform(sequence(0, size(w) - {ngram}), "
                 f"i -> concat_ws(' ', slice(w, i + 1, {ngram}))) "
                 f"ELSE array() END")
                 .alias("grams"),
                 F.length(F.col(text_col)).alias("n_chars")))
    grams = (words.select(id_col, "n_chars",
                          F.explode("grams").alias("g"))
             .groupBy(id_col, "n_chars", "g")
             .agg(F.count(F.lit(1)).alias("n")))
    top = (grams.groupBy(id_col, "n_chars")
           .agg(F.max(F.struct(F.col("n"), F.length("g").alias("gl")))
                .alias("t"))
           .select(id_col,
                   (F.col("t.n") * F.col("t.gl")
                    / F.greatest(F.col("n_chars"), F.lit(1)))
                   .alias("top_ngram_char_frac")))
    return line_stats.join(top, id_col, "full")