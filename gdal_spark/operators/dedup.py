"""Deduplication operators over web-text tables.

 - exact_dedup:       content-hash groupBy (map-side combined).
 - minhash_lsh_pairs: MinHash + LSH banding. Spark-first shape: token
   explode → per-doc min-hash aggregation (partial agg) → per-band
   equi-join on the band key → union → distinct. No cross product:
   the only joins are hash joins on band hashes, so candidate
   generation scales linearly with docs + pairs-in-same-bucket.
 - simhash64 / simhash_pairs: 64-bit SimHash near-dup detection via
   banded exact match on 4x16-bit chunks.
 - ngram_jaccard_pairs: exact n-gram Jaccard on candidate pairs
   (verification stage after LSH).

Hashes are md5-hex-string based BY DEFAULT so results are
engine-portable (the DuckDB oracle reproduces them exactly); md5 is
overkill per token but is computed JVM-side by Catalyst — no Python
in the hot path. For production throughput pass hash_fn="xxhash64":
per-token hashing drops from n_hashes md5 digests (each a full MD5
round over the token bytes, emitted as a 32-char hex string) to
n_hashes xxhash64 longs — same one-shuffle plan, ~2-4x cheaper CPU
and an 8-byte instead of 32-byte signature column (A/B numbers in
BASELINE.md; the candidate-pair SET equality between the two hash
families on the test corpus is gated by
tests/test_operators.py::test_minhash_xxhash_same_pairs).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (text_hash, n_dups, keeper): one row per distinct content."""
    return df.groupBy(F.md5(F.encode(F.col(text_col), "utf-8")).alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper")
    )


def tokenize_distinct(df: DataFrame, id_col: str, text_col: str,
                      shingle: int = 1) -> DataFrame:
    """Distinct token features per doc: (id, tok).

    shingle=1 -> whitespace unigrams; shingle=w -> w-word shingles
    (the standard MinHash feature for near-dup detection: joined with
    a separator so shingle boundaries stay unambiguous)."""
    toks = F.split(F.col(text_col), " ")
    if shingle <= 1:
        return df.select(F.col(id_col), F.explode(toks).alias("tok")).distinct()
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - shingle + 1, F.lit(1))),
        lambda i: F.concat_ws("\x1f", F.slice(toks, i, shingle)))
    return df.select(F.col(id_col), F.explode(sh).alias("tok")).distinct()


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n_hashes: int = 16, shingle: int = 1,
                       hash_fn: str = "md5") -> DataFrame:
    """(id, s0..s{n-1}): per-doc min over tokens of the i-th hash.
    One shuffle (groupBy id), n_hashes JVM hash evals per token, all
    partial-aggregated map-side.

    hash_fn="md5" (default): min of md5(tok || '#i') hex strings —
    bit-reproducible in DuckDB, the oracle-gate family.
    hash_fn="xxhash64": min of xxhash64(tok, i) longs — the i literal
    mixed into the hash stream acts as the per-function seed. Much
    cheaper (no digest loop, no hex encode) and 4x narrower; use for
    production corpora."""
    toks = tokenize_distinct(df, id_col, text_col, shingle)
    if hash_fn == "xxhash64":
        aggs = [F.min(F.xxhash64(F.col("tok"), F.lit(i))).alias(f"s{i}")
                for i in range(n_hashes)]
    elif hash_fn == "md5":
        aggs = [
            F.min(F.md5(F.encode(F.concat(F.col("tok"), F.lit(f"#{i}")), "utf-8"))).alias(f"s{i}")
            for i in range(n_hashes)
        ]
    else:
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    return toks.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n_hashes: int = 16, bands: int = 4,
                      shingle: int = 1, hash_fn: str = "md5") -> DataFrame:
    """Candidate near-dup pairs (a_id < b_id) whose signatures collide
    in >= 1 LSH band.

    Physical shape: band keys melt into ONE (band_id, band_key)
    relation and a single self-equi-join on the composite key replaces
    the per-band join+union (one shuffle instead of `bands`; the
    band_id in the key keeps buckets from different bands apart).

    hash_fn: see minhash_signatures — "md5" (oracle-exact) or
    "xxhash64" (production; band keys collapse to one long too)."""
    rows = n_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle,
                              hash_fn=hash_fn)
    if hash_fn == "xxhash64":
        band_cols = [
            F.xxhash64(*[F.col(f"s{b * rows + r}") for r in range(rows)]).alias(f"b{b}")
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.md5(F.encode(F.concat(*[F.col(f"s{b * rows + r}") for r in range(rows)]),
                           "utf-8")).alias(f"b{b}")
            for b in range(bands)
        ]
    bandt = sigs.select(F.col(id_col).alias("bid"), *band_cols)
    melted = bandt.select(
        "bid",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"), F.col(f"b{b}").alias("bk"))
            for b in range(bands)])).alias("e")
    ).select("bid", F.col("e.band_id").alias("band_id"), F.col("e.bk").alias("bk"))
    a = melted.select(F.col("bid").alias("a_id"), "band_id", "bk")
    b2 = melted.select(F.col("bid").alias("b_id"), "band_id", "bk")
    return (a.join(b2, ["band_id", "bk"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id").distinct())


def dup_clusters(pairs: DataFrame, docs: DataFrame | None = None,
                 id_col: str = "doc_id") -> DataFrame:
    """Near-dup PAIRS -> dup CLUSTERS: (id, cluster_id, is_keeper).

    A training-data pipeline needs keeper-per-cluster, not pairs: this
    runs connected components (operators/components.py: the
    distributed large-star/small-star loop, or driver union-find when
    the distinct pair graph is tiny) over the candidate-pair graph and
    labels each doc with its cluster's minimum id; the minimum is the
    keeper (deterministic survivor choice). With `docs` given, docs in
    no pair come back as singleton clusters (their own keeper), so the
    output is a total keep/drop verdict over the corpus."""
    from .components import connected_components

    nodes = docs.select(F.col(id_col).alias("node")) if docs is not None else None
    cc = connected_components(pairs, src="a_id", dst="b_id",
                              nodes=nodes, node_col="node")
    return cc.select(F.col("node").alias(id_col),
                     F.col("comp").alias("cluster_id"),
                     (F.col("node") == F.col("comp")).alias("is_keeper"))


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of per-token xxhash64 bits.

    Implemented with JVM expressions only: per (doc, tok) the token's
    xxhash64 contributes +1/-1 to each of 64 bit counters; the
    aggregate sign vector re-packs into one long. The 64 per-bit sums
    ride one groupBy (partial agg)."""
    toks = tokenize_distinct(df, id_col, text_col)
    h = F.xxhash64(F.col("tok"))
    bit_aggs = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"c{i}")
        for i in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_aggs)
    packed = reduce(
        lambda acc, i: acc.bitwiseOR(
            F.shiftleft(F.when(F.col(f"c{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i)
        ),
        range(1, 64),
        F.when(F.col("c0") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    return agg.select(F.col(id_col), packed.alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4x16 chunks
    (pigeonhole: hamming<=3 => >=1 identical chunk), equi-join per
    chunk, verify exact hamming distance with bit_count."""
    sh = simhash64(df, id_col, text_col)
    chunks = sh.select(
        F.col(id_col).alias("sid"), F.col("simhash"),
        *[F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias(f"k{c}")
          for c in range(4)],
    )
    parts = []
    for c in range(4):
        a = chunks.select(F.col("sid").alias("a_id"), F.col("simhash").alias("ha"),
                          F.col(f"k{c}").alias("kk"))
        b = chunks.select(F.col("sid").alias("b_id"), F.col("simhash").alias("hb"),
                          F.col(f"k{c}").alias("kk"))
        parts.append(a.join(b, "kk").filter(F.col("a_id") < F.col("b_id"))
                     .select("a_id", "b_id", "ha", "hb"))
    cand = reduce(DataFrame.unionByName, parts).distinct()
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("a_id", "b_id", "hamming"))


def ngram_jaccard(df: DataFrame, pairs: DataFrame, id_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """Exact character-n-gram Jaccard similarity for candidate pairs
    (the verify stage after minhash/simhash candidates).

    Distributed shape: explode each doc to its distinct n-gram set
    once, then two semi-joins restrict to docs appearing in pairs,
    intersection sizes via (gram equi-join + groupBy pair)."""
    docs_needed = (pairs.select(F.col("a_id").alias("did"))
                   .unionByName(pairs.select(F.col("b_id").alias("did"))).distinct())
    base = df.join(docs_needed, F.col(id_col) == F.col("did"), "left_semi")
    grams = base.select(
        F.col(id_col).alias("gid"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(text_col) - n + 1, F.lit(1))),
                lambda i: F.col(text_col).substr(i, F.lit(n)),
            )
        ).alias("gram"),
    ).distinct()
    sizes = grams.groupBy("gid").agg(F.count(F.lit(1)).alias("n_grams"))
    ga = grams.select(F.col("gid").alias("a_id"), "gram")
    gb = grams.select(F.col("gid").alias("b_id"), "gram")
    inter = (pairs.join(ga, "a_id").join(gb, ["b_id", "gram"])
             .groupBy("a_id", "b_id").agg(F.count(F.lit(1)).alias("n_inter")))
    out = (inter
           .join(sizes.select(F.col("gid").alias("a_id"), F.col("n_grams").alias("na")), "a_id")
           .join(sizes.select(F.col("gid").alias("b_id"), F.col("n_grams").alias("nb")), "b_id"))
    return out.select(
        "a_id", "b_id",
        (F.col("n_inter").cast("double")
         / (F.col("na") + F.col("nb") - F.col("n_inter"))).alias("jaccard"),
    )
