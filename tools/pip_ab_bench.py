"""A/B: Arrow-vectorized PIP vs the whole-JVM higher-order-function
path (VERDICT r1 task 9 — "move the PIP exact test JVM-side ... and
re-measure"). Min-of-3 per variant, idle-host gated, one JVM.

Usage: python tools/pip_ab_bench.py [n_pages]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    from pyspark.sql import functions as F

    from gdal_spark.operators import pip_join
    from gdal_spark.session import get_spark
    from gdal_spark.sources import admin, pages

    spark = get_spark("pip_ab")
    spark.sparkContext.setLogLevel("ERROR")
    pts = (pages.synth_pages(spark, n)
           .select("doc_id", "lon", "lat").persist())
    pts.count()
    polys = admin.admin_df(spark)

    def timeit(make):
        # warm-up once (worker spawn / codegen), then min of 3
        make().groupBy("poly_id").count().count()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            make().groupBy("poly_id").count().count()
            best = min(best, time.time() - t0)
        return best

    arrow = timeit(lambda: pip_join.pip_join_broadcast(pts, polys))
    jvm = timeit(lambda: pip_join.pip_join_jvm(pts, polys))
    print(json.dumps({
        "n_pages": n,
        "arrow_wall_s": round(arrow, 3),
        "arrow_pages_per_sec": round(n / arrow, 1),
        "jvm_hof_wall_s": round(jvm, 3),
        "jvm_hof_pages_per_sec": round(n / jvm, 1),
        "jvm_over_arrow": round(arrow / jvm, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
