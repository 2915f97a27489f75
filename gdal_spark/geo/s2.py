"""S2-style cube-face Hilbert cell index.

The north-star names "H3/S2 cell encoding"; `geo/cells.py` provides
the web-mercator Morton quadtree, and this module adds the real
S2 scheme (public algorithm — s2geometry.io docs / Google's S2 paper):
project the sphere onto the 6 faces of a cube, correct the per-face
(u, v) coordinates with the quadratic ST transform so cells have
near-uniform area (the mercator quadtree degenerates toward the
poles), and order cells within a face by a HILBERT curve so that
id-range partitioning is a spatial sort with stride-1 locality.

Differences from Google's implementation (deliberate, documented):
  - MAX_LEVEL = 29, not 30: ids are 3 face bits + 2*29 position bits
    + 1 trailing marker = 62 bits, so every id is a POSITIVE int64 in
    both Spark and DuckDB (S2's level-30 uint64 ids go negative in
    signed engines, which breaks BETWEEN range joins).
  - The within-face curve is the classic rotate/reflect Hilbert walk
    (geo/hilbert.py), seeded with a swapped frame on odd faces (the
    analog of S2's kSwapMask face seed). Locality within a face and
    hierarchical prefix consistency are exactly Hilbert's; cross-face
    curve continuity is NOT claimed (S2 gets it from its lookup-table
    orientation chain; nothing in the engine depends on it).

id layout at level L (S2's trailing-bit scheme):

    id = face << 59  |  pos << (2*(29-L) + 1)  |  1 << (2*(29-L))

  lsb(id)       = id & -id  — encodes the level;
  parent        = clear the last 2 digits, move the marker up;
  range_min/max = id -/+ (lsb - 1): every descendant's id lies in
                  [range_min, range_max] — containment joins are a
                  plain BETWEEN on int64.

Three bit-identical forms (the engine's oracle discipline):
  *_np (numpy), *_col (Spark Columns — whole-stage codegen bit math),
  and a SQL-text generator for DuckDB oracles. All integer steps are
  exact; the only float steps are lon/lat -> xyz (cos/sin) and the
  exactly-rounded sqrt/divisions of the ST transform, so cross-engine
  drift is confined to <= 1-ulp libm noise ahead of a floor() whose
  distance-to-boundary is margin-audited per gate (tests/test_s2.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hilbert import hilbert_d_np

MAX_LEVEL = 29

_RAD = np.pi / 180.0


# ------------------------------------------------------------- numpy

def _xyz_np(lon, lat):
    lam = np.asarray(lon, np.float64) * _RAD
    phi = np.asarray(lat, np.float64) * _RAD
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _face_np(x, y, z):
    """0 +x, 1 +y, 2 +z, 3 -x, 4 -y, 5 -z; ties break z, then y
    (mirrored verbatim by the SQL/Column forms)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    f = np.where((az >= ax) & (az >= ay), 2,
                 np.where(ay >= ax, 1, 0)).astype(np.int64)
    neg = np.where(f == 2, z < 0.0, np.where(f == 1, y < 0.0, x < 0.0))
    return f + np.where(neg, 3, 0)


def _uv_np(face, x, y, z):
    u = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [y / x, -x / y, -x / z, z / x, z / y], default=-y / z)
    v = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [z / x, z / y, -y / z, y / x, -x / y], default=-x / z)
    return u, v


def _st_np(u):
    """S2 quadratic ST transform: cell-area equalization.
    1 - 3u == 1 + 3|u| exactly for u < 0, so routing both branches
    through sqrt(1 + 3|u|) is bit-identical to the SQL form's
    branch-local sqrt while keeping numpy's eager where() out of
    negative sqrt territory."""
    u = np.asarray(u, np.float64)
    q = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0.0, q, 1.0 - q)


def _st_inv_np(s):
    s = np.asarray(s, np.float64)
    return np.where(s >= 0.5,
                    (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def _ij_np(s, level: int):
    n = 1 << level
    return np.clip(np.floor(s * n), 0, n - 1).astype(np.int64)


def s2_cell_np(lon, lat, level: int) -> np.ndarray:
    """S2 cell id (int64, trailing-bit layout) of each point."""
    if not 0 < level <= MAX_LEVEL:
        raise ValueError(f"level must be in 1..{MAX_LEVEL}")
    x, y, z = _xyz_np(lon, lat)
    face = _face_np(x, y, z)
    u, v = _uv_np(face, x, y, z)
    i = _ij_np(_st_np(u), level)
    j = _ij_np(_st_np(v), level)
    odd = (face & 1) == 1
    hi = np.where(odd, j, i)
    hj = np.where(odd, i, j)
    pos = hilbert_d_np(hi, hj, level)
    shift = 2 * (MAX_LEVEL - level)
    return (face << 59) | (pos << (shift + 1)) | (np.int64(1) << shift)


def s2_lsb_np(cell):
    c = np.asarray(cell, np.int64)
    return c & -c


def s2_level_np(cell) -> np.ndarray:
    lsb = s2_lsb_np(cell)
    # trailing zero count via float64 exponent is unsafe >= 2^53;
    # use a de-Bruijn-free log2 on exact powers of two
    tz = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
    return MAX_LEVEL - tz // 2


def s2_parent_np(cell, steps: int = 1) -> np.ndarray:
    c = np.asarray(cell, np.int64)
    nl = s2_lsb_np(c) << (2 * steps)
    return (c & -nl) | nl


def s2_range_np(cell):
    """(range_min, range_max): the id interval holding every
    descendant of `cell` — containment is BETWEEN."""
    c = np.asarray(cell, np.int64)
    lsb = s2_lsb_np(c)
    return c - (lsb - 1), c + (lsb - 1)


def _hilbert_inv_np(d, order: int):
    """Inverse of hilbert_d_np: position -> (x, y)."""
    d = np.asarray(d, np.int64).copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    s = np.int64(1)
    while s < (np.int64(1) << order):
        rx = 1 & (d // (2 * s * s))       # quadrant digit bits
        ry = 1 & ((d // (s * s)) ^ rx)
        refl = (ry == 0) & (rx == 1)
        x2 = np.where(refl, s - 1 - x, x)
        y2 = np.where(refl, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        x = x + s * rx
        y = y + s * ry
        d = d - s * s * (3 * rx ^ ry)
        s <<= 1
    return x, y


def s2_center_lonlat_np(cell):
    """Center (lon, lat) of each cell (numpy; used by tests and any
    decode path — centers re-encode to the same cell at the same
    level, the roundtrip property)."""
    c = np.asarray(cell, np.int64)
    level = s2_level_np(c)
    if not (level == level.flat[0]).all():
        raise ValueError("mixed levels in one decode batch")
    lv = int(level.flat[0])
    face = c >> 59
    shift = 2 * (MAX_LEVEL - lv)
    pos = (c >> (shift + 1)) & ((np.int64(1) << (2 * lv)) - 1)
    hi, hj = _hilbert_inv_np(pos, lv)
    odd = (face & 1) == 1
    i = np.where(odd, hj, hi)
    j = np.where(odd, hi, hj)
    n = float(1 << lv)
    u = _st_inv_np((i.astype(np.float64) + 0.5) / n)
    v = _st_inv_np((j.astype(np.float64) + 0.5) / n)
    one = np.ones_like(u)
    # face -> xyz: the exact inverse of _uv_np's ratio table, face
    # axis at +-1 (e.g. face 3 has u = z/x, v = y/x, x = -1, so
    # (x, y, z) = (-1, -v, -u)); roundtrip-verified in tests
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [one, -u, -u, -one, v], default=v)
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [u, one, -v, -v, -one], default=u)
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [v, v, one, -u, -u], default=-one)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


# ----------------------------------------------------------- Columns

def with_s2_cell(df: DataFrame, lon: str = "lon", lat: str = "lat",
                 level: int = 12, out: str = "s2_cell") -> DataFrame:
    """Add the S2 cell id as column `out` — pure JVM column math
    (trig + exactly-rounded arithmetic + the per-bit Hilbert walk as
    a linear withColumn chain, same shape as hilbert.with_hilbert_key
    so whole-stage codegen sees straight-line bit ops)."""
    if not 0 < level <= MAX_LEVEL:
        raise ValueError(f"level must be in 1..{MAX_LEVEL}")
    lam = F.col(lon) * F.lit(_RAD)
    phi = F.col(lat) * F.lit(_RAD)
    X, Y, Z = f"{out}_X", f"{out}_Y", f"{out}_Z"
    df = (df.withColumn(X, F.cos(phi) * F.cos(lam))
            .withColumn(Y, F.cos(phi) * F.sin(lam))
            .withColumn(Z, F.sin(phi)))
    ax, ay, az = F.abs(F.col(X)), F.abs(F.col(Y)), F.abs(F.col(Z))
    f0 = (F.when((az >= ax) & (az >= ay), F.lit(2))
           .when(ay >= ax, F.lit(1)).otherwise(F.lit(0)))
    FC = f"{out}_face"
    df = df.withColumn(FC, f0.cast("long"))
    neg = (F.when(F.col(FC) == 2, F.col(Z) < 0)
            .when(F.col(FC) == 1, F.col(Y) < 0)
            .otherwise(F.col(X) < 0))
    df = df.withColumn(FC, F.col(FC) + F.when(neg, F.lit(3)).otherwise(F.lit(0)))
    x, y, z = F.col(X), F.col(Y), F.col(Z)
    u = (F.when(F.col(FC) == 0, y / x).when(F.col(FC) == 1, -x / y)
          .when(F.col(FC) == 2, -x / z).when(F.col(FC) == 3, z / x)
          .when(F.col(FC) == 4, z / y).otherwise(-y / z))
    v = (F.when(F.col(FC) == 0, z / x).when(F.col(FC) == 1, z / y)
          .when(F.col(FC) == 2, -y / z).when(F.col(FC) == 3, y / x)
          .when(F.col(FC) == 4, -x / y).otherwise(-x / z))

    def st(c: Column) -> Column:
        return (F.when(c >= 0, F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * c))
                 .otherwise(F.lit(1.0) - F.lit(0.5)
                            * F.sqrt(F.lit(1.0) - F.lit(3.0) * c)))

    n = 1 << level

    def ij(c: Column) -> Column:
        return F.greatest(F.lit(0), F.least(
            F.lit(n - 1), F.floor(c * F.lit(float(n))).cast("long")))

    I, J = f"{out}_i", f"{out}_j"
    df = df.withColumn(I, ij(st(u))).withColumn(J, ij(st(v)))
    odd = F.col(FC).bitwiseAND(F.lit(1)) == 1
    cx, cy, cd = f"{out}_hx", f"{out}_hy", f"{out}_hd"
    df = (df.withColumn(cx, F.when(odd, F.col(J)).otherwise(F.col(I)))
            .withColumn(cy, F.when(odd, F.col(I)).otherwise(F.col(J)))
            .withColumn(cd, F.lit(0).cast("long")))
    for b in range(level - 1, -1, -1):
        s = 1 << b
        rx = F.when(F.col(cx).bitwiseAND(F.lit(s)) > 0, 1).otherwise(0).cast("long")
        ry = F.when(F.col(cy).bitwiseAND(F.lit(s)) > 0, 1).otherwise(0).cast("long")
        df = df.withColumn(f"{out}_rx", rx).withColumn(f"{out}_ry", ry)
        rxc, ryc = F.col(f"{out}_rx"), F.col(f"{out}_ry")
        d2 = F.col(cd) + F.lit(s) * F.lit(s) * ((F.lit(3) * rxc).bitwiseXOR(ryc))
        refl = (ryc == 0) & (rxc == 1)
        x2 = F.when(refl, F.lit(s - 1) - F.col(cx)).otherwise(F.col(cx))
        y2 = F.when(refl, F.lit(s - 1) - F.col(cy)).otherwise(F.col(cy))
        df = df.withColumn(f"{out}_x2", x2).withColumn(f"{out}_y2", y2)
        swap = F.col(f"{out}_ry") == 0
        df = (df.withColumn(cd, d2)
              .withColumn(cx, F.when(swap, F.col(f"{out}_y2")).otherwise(F.col(f"{out}_x2")))
              .withColumn(cy, F.when(swap, F.col(f"{out}_x2")).otherwise(F.col(f"{out}_y2"))))
    shift = 2 * (MAX_LEVEL - level)
    cell = (F.shiftleft(F.col(FC), 59)
            .bitwiseOR(F.shiftleft(F.col(cd), shift + 1))
            .bitwiseOR(F.lit(np.int64(1) << shift)))
    return (df.withColumn(out, cell)
            .drop(X, Y, Z, FC, I, J, cx, cy, cd,
                  f"{out}_rx", f"{out}_ry", f"{out}_x2", f"{out}_y2"))


def s2_parent_col(cell: Column, steps: int = 1) -> Column:
    lsb = cell.bitwiseAND(-cell)
    nl = F.shiftleft(lsb, 2 * steps)
    return cell.bitwiseAND(-nl).bitwiseOR(nl)


# --------------------------------------------------------------- SQL

def s2_cell_cte_sql(src: str, lon: str, lat: str, level: int,
                    keys: str, out: str = "s2_cell") -> tuple[str, str]:
    """(cte_text, final_cte_name): DuckDB CTE chain computing the S2
    cell id of (lon, lat) from CTE `src`, mirroring s2_cell_np stage
    by stage (verbatim operand order; the Hilbert walk unrolls one CTE
    per bit exactly like the projection-inverse oracles). `keys` are
    passthrough column names carried to the final CTE."""
    n = 1 << level
    shift = 2 * (MAX_LEVEL - level)
    st = ("CASE WHEN {u} >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * {u}) "
          "ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {u}) END")
    ij = (f"greatest(0, least({n - 1}, "
          f"CAST(floor({{s}} * {float(n)!r}) AS BIGINT)))")
    stages = [f"""
    {out}_xyz AS (
      SELECT {keys},
             cos({lat} * {_RAD!r}) * cos({lon} * {_RAD!r}) AS px,
             cos({lat} * {_RAD!r}) * sin({lon} * {_RAD!r}) AS py,
             sin({lat} * {_RAD!r}) AS pz
      FROM {src}),
    {out}_face AS (
      SELECT {keys}, px, py, pz,
             (CASE WHEN abs(pz) >= abs(px) AND abs(pz) >= abs(py) THEN 2
                   WHEN abs(py) >= abs(px) THEN 1 ELSE 0 END
              + CASE WHEN (CASE WHEN abs(pz) >= abs(px) AND abs(pz) >= abs(py)
                                THEN pz
                                WHEN abs(py) >= abs(px) THEN py ELSE px END)
                          < 0.0 THEN 3 ELSE 0 END) AS face
      FROM {out}_xyz),
    {out}_uv AS (
      SELECT {keys}, face,
             CASE face WHEN 0 THEN py / px WHEN 1 THEN -px / py
                       WHEN 2 THEN -px / pz WHEN 3 THEN pz / px
                       WHEN 4 THEN pz / py ELSE -py / pz END AS fu,
             CASE face WHEN 0 THEN pz / px WHEN 1 THEN pz / py
                       WHEN 2 THEN -py / pz WHEN 3 THEN py / px
                       WHEN 4 THEN -px / py ELSE -px / pz END AS fv
      FROM {out}_face),
    {out}_ij AS (
      SELECT {keys}, face,
             {ij.format(s=st.format(u='fu'))} AS fi,
             {ij.format(s=st.format(u='fv'))} AS fj
      FROM {out}_uv),
    {out}_w{level} AS (
      SELECT {keys}, face,
             CASE WHEN face % 2 = 1 THEN fj ELSE fi END AS hx,
             CASE WHEN face % 2 = 1 THEN fi ELSE fj END AS hy,
             CAST(0 AS BIGINT) AS hd
      FROM {out}_ij)"""]
    for b in range(level - 1, -1, -1):
        s = 1 << b
        stages.append(f""",
    {out}_w{b} AS (
      SELECT {keys}, face,
             CASE WHEN ry = 0 THEN
                    CASE WHEN rx = 1 THEN {s - 1} - hy ELSE hy END
                  ELSE hx END AS hx,
             CASE WHEN ry = 0 THEN
                    CASE WHEN rx = 1 THEN {s - 1} - hx ELSE hx END
                  ELSE hy END AS hy,
             hd + {s} * {s} * xor(3 * rx, ry) AS hd
      FROM (SELECT {keys}, face, hx, hy, hd,
                   CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS rx,
                   CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS ry
            FROM {out}_w{b + 1}))""")
    stages.append(f""",
    {out}_id AS (
      SELECT {keys},
             ((CAST(face AS BIGINT) << 59) | (hd << {shift + 1})
              | CAST({np.int64(1) << shift} AS BIGINT)) AS {out}
      FROM {out}_w0)""")
    return "".join(stages), f"{out}_id"
