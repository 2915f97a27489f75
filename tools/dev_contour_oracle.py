"""Dev harness for the raster_contour_polygons oracle: numpy reference
vs DuckDB SQL, no Spark. Run: python tools/dev_contour_oracle.py"""
import sys

import duckdb
import numpy as np

sys.path.insert(0, "/root/repo")
from gdal_spark.raster import contour as CN  # noqa: E402
from gdal_spark.raster import grid as G  # noqa: E402
from gdal_spark.sources import pages  # noqa: E402
from gdal_spark.queries_raster import (  # noqa: E402
    PGZOOM, PGTILE, NPG, PGLEVELS, _contour_polygons_oracle)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")

gx, gy = G.pixel_index_sql_3857(PGZOOM, PGTILE, "lon", "lat")
px = con.execute(f"""
    WITH pts AS (SELECT doc_id, {pages.LON_SQL} AS lon, {pages.LAT_SQL} AS lat
                 FROM documents),
    px AS (SELECT gx, gy, CAST(count(*) AS DOUBLE) AS v
           FROM (SELECT {gx} AS gx, {gy} AS gy FROM pts) GROUP BY gx, gy)
    SELECT gx, gy, v FROM px
""").fetchnumpy()
canvas = np.zeros((NPG, NPG), np.float64)
canvas[px["gy"], px["gx"]] = px["v"]

# --- numpy reference rows ---
boundary = CN.slot_boundary_np(canvas, list(PGLEVELS))
by_slot = {}
for slot, x1, y1, x2, y2 in boundary:
    by_slot.setdefault(slot, []).append((x1, y1, x2, y2))
np_rows = []
for slot, segs in sorted(by_slot.items()):
    for ring in CN.assemble_rings(segs):
        x, y = ring[:, 0], ring[:, 1]
        area2 = float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
        np_rows.append((slot, len(ring) - 1, area2,
                        float(x[:-1].min()), float(y[:-1].min()),
                        float(x[:-1].max()), float(y[:-1].max())))

# --- oracle rows ---
sql_rows = con.execute(_contour_polygons_oracle()).fetchall()
print(f"np rings: {len(np_rows)}   sql rings: {len(sql_rows)}")


def key(r):
    return (r[0], r[1], round(r[2], 5), r[3], r[4], r[5], r[6])


nk = sorted(key(r) for r in np_rows)
sk = sorted(key(r) for r in sql_rows)
if nk == sk:
    print("MATCH: per-ring rows identical (area2 to 5dp; rest exact)")
else:
    miss_np = [k for k in nk if k not in sk][:5]
    miss_sql = [k for k in sk if k not in nk][:5]
    print("MISMATCH")
    print("np-only:", miss_np)
    print("sql-only:", miss_sql)
    sys.exit(1)
