"""A/B: md5 oracle hash family vs the xxhash64 production family for
MinHash+LSH candidate generation (VERDICT r2 task 9 — "add an opt-in
xxhash64 production hash path, keep md5 for the oracle").

Same plan both sides (tokenize -> one groupBy -> band self-equi-join);
only the per-token hash expression changes: 16 md5 digests + hex
strings vs 16 xxhash64 longs. Min-of-3 per variant, one JVM.

Usage: python tools/minhash_ab_bench.py [sf_dir]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from gdal_spark.operators import dedup
    from gdal_spark.session import get_spark

    spark = get_spark("minhash_ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n = docs.count()

    def timeit(hash_fn):
        def run():
            return dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", hash_fn=hash_fn).count()
        pairs = run()  # warm-up (worker spawn / codegen)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        return best, pairs

    md5_s, md5_pairs = timeit("md5")
    xx_s, xx_pairs = timeit("xxhash64")
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_docs": n,
        "md5_wall_s": round(md5_s, 3),
        "md5_docs_per_sec": round(n / md5_s, 1),
        "md5_pairs": md5_pairs,
        "xxhash64_wall_s": round(xx_s, 3),
        "xxhash64_docs_per_sec": round(n / xx_s, 1),
        "xxhash64_pairs": xx_pairs,
        "speedup_xx_over_md5": round(md5_s / xx_s, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
