"""GDAL-checksum oracle, re-implemented from the documented semantics.

The reference's golden-output function (alg/gdalchecksum.cpp:48
`GDALChecksumImage`) used across its autotest suite: walk the band
window in row-major order, accumulate `int(value) % primes[i]` where
the prime cycles through {7,11,13,17,19,23,29,31,37,41,43} keyed by
the linear pixel position mod 11 (alg/gdalchecksum.cpp:54-56, the
iPrime re-seeding at :180), masking the accumulator to 16 bits after
every value (:230-232).

Because `x &= 0xffff` is arithmetic mod 2^16 and integer addition
commutes with mod, the checksum is equivalently

    ( sum over pixels of  c_mod(int(v), primes[(y*W + x) % 11]) ) mod 2^16

with c_mod = C truncated remainder. That closed form makes the
checksum a *plain distributive aggregate*: computable per tile in
numpy, per band in SQL (the DuckDB oracle), and combinable across
partitions — exactly what a distributed engine needs from its golden
oracle. Float bands first convert via GDALCopyWords' float->Int32
rule: +0.5 then floor, clamped to +/-2147483647, non-finite -> INT_MIN
(alg/gdalchecksum.cpp:67-88).
"""

from __future__ import annotations

import numpy as np

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)
INT_MIN = -2147483648


def int_from_double_np(vals: np.ndarray) -> np.ndarray:
    """GDALCopyWords float->Int32 conversion rule (gdalchecksum.cpp:67-88)."""
    v = np.asarray(vals, np.float64)
    out = np.empty(v.shape, dtype=np.int64)
    finite = np.isfinite(v)
    shifted = v + 0.5
    out[~finite] = INT_MIN
    lo = shifted < -2147483647.0
    hi = shifted > 2147483647.0
    mid = finite & ~lo & ~hi
    out[finite & lo] = -2147483647
    out[finite & hi] = 2147483647
    out[mid] = np.floor(shifted[mid]).astype(np.int64)
    return out


def _c_mod(a: np.ndarray, m: np.ndarray) -> np.ndarray:
    """C truncated remainder (numpy % is floored)."""
    return a - m * np.trunc(a / m).astype(np.int64)


def checksum_np(arr: np.ndarray, x0: int = 0, y0: int = 0,
                full_width: int | None = None, is_float: bool | None = None) -> int:
    """Checksum of a 2-D window.

    `arr` is the window's pixel values; (x0, y0) its offset inside the
    full band and `full_width` the full band width — the prime phase
    is keyed by *full-band* linear position (gdalchecksum.cpp:177-181),
    which is what lets per-tile partial checksums sum to the whole-band
    checksum.
    """
    a = np.asarray(arr)
    h, w = a.shape
    if full_width is None:
        full_width = w
    if is_float is None:
        is_float = np.issubdtype(a.dtype, np.floating)
    iv = int_from_double_np(a) if is_float else a.astype(np.int64)
    ys, xs = np.mgrid[0:h, 0:w]
    phase = ((ys + y0).astype(np.int64) * full_width + (xs + x0)) % 11
    terms = _c_mod(iv, PRIMES[phase])
    return int(terms.sum() % 65536)


def checksum_combine(partials: list[int]) -> int:
    """Combine per-tile partial sums (tiles must not overlap and must
    have been computed with the full-band phase offsets)."""
    return int(sum(partials) % 65536)


def checksum_sql(value_expr: str, x_expr: str, y_expr: str, width: int) -> str:
    """DuckDB oracle: checksum as a plain aggregate over pixel rows.

    Rows not present are implicitly 0, and 0 % p == 0, so a sparse
    pixel table (only nonzero pixels) yields the same checksum.

    Pixel values convert with GDALCopyWords' exact float->Int32 rule
    (+0.5 then floor, clamp to +/-2147483647, non-finite -> INT_MIN) —
    NOT a plain CAST, whose round-half-to-even would diverge from
    checksum_np at values like 2.5 (CAST -> 2, GDAL -> 3). For
    integer-valued inputs floor(v + 0.5) == v, so the rule is a no-op
    there and the oracle stays valid for every band type.
    """
    primes = ",".join(str(int(p)) for p in PRIMES)
    v = f"CAST(({value_expr}) AS DOUBLE)"
    iv = (
        f"(CASE WHEN NOT isfinite({v}) THEN CAST(-2147483648 AS BIGINT) "
        f"WHEN {v} + 0.5 < -2147483647.0 THEN CAST(-2147483647 AS BIGINT) "
        f"WHEN {v} + 0.5 > 2147483647.0 THEN CAST(2147483647 AS BIGINT) "
        f"ELSE CAST(floor({v} + 0.5) AS BIGINT) END)"
    )
    return (
        f"CAST(sum({iv} % "
        f"([{primes}])[(({y_expr}) * {width} + ({x_expr})) % 11 + 1]) % 65536 "
        f"AS BIGINT)"
    )
