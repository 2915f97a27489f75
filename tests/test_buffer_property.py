"""Property tests for the buffer operator (derandomized, house style).

Invariants from the Minkowski definition: dilation contains the
original and grows monotonically with r; the discretized (inscribed
k-gon) buffer is squeezed between the exact closed-form bounds for
convex polygons; erosion stays inside the original and annihilates
below the inradius; opening (erode then dilate) never exceeds the
original area.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.geo import buffer, geom, overlay


def _convex(seed: int, n: int) -> list:
    """Random convex polygon via convex hull of random points."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-5, 5, (max(n, 4), 2))
    hull = geom.convex_hull(pts[:, 0], pts[:, 1])
    return [hull]


@settings(max_examples=20, deadline=None, derandomize=True)
@given(st.integers(0, 10_000), st.integers(4, 12),
       st.floats(0.1, 2.0))
def test_convex_dilation_area_bounds(seed, n, r):
    poly = _convex(seed, n)
    shell = overlay.normalize(poly)[0]
    a0 = abs(geom.ring_area(shell))
    if a0 < 1e-6:
        return
    per = geom.line_length(shell)
    out = buffer.buffer_polygon(poly, r)
    a = overlay.multi_area(out)
    k = 32
    kgon = 0.5 * k * np.sin(2 * np.pi / k) * r * r
    # convex: exact area sits between the inscribed-k-gon and the
    # true-circle corner contributions
    assert a >= a0 + per * r + kgon - 1e-9 * max(a0, 1)
    assert a <= a0 + per * r + np.pi * r * r + 1e-9 * max(a0, 1)


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.integers(0, 10_000), st.floats(0.2, 1.0), st.floats(1.2, 2.5))
def test_dilation_monotone_in_r(seed, r1, factor):
    poly = _convex(seed, 8)
    a1 = overlay.multi_area(buffer.buffer_polygon(poly, r1))
    a2 = overlay.multi_area(buffer.buffer_polygon(poly, r1 * factor))
    assert a2 > a1


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.integers(0, 10_000), st.floats(0.05, 0.3))
def test_opening_never_grows(seed, r):
    poly = _convex(seed, 8)
    a0 = overlay.multi_area([overlay.normalize(poly)])
    eroded = buffer.buffer_polygon(poly, -r)
    if not eroded:
        return  # annihilated: trivially <= a0
    opened = []
    for p in eroded:
        opened.extend(buffer.buffer_polygon(p, r))
    assert overlay.multi_area(opened) <= a0 + 1e-9 * max(a0, 1)


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.integers(0, 10_000))
def test_erosion_beyond_inradius_annihilates(seed):
    poly = _convex(seed, 8)
    shell = overlay.normalize(poly)[0]
    a0 = abs(geom.ring_area(shell))
    per = geom.line_length(shell)
    if a0 < 1e-6:
        return
    # inradius of any convex region <= 2*A/P; eroding past it -> empty
    assert buffer.buffer_polygon(poly, -(2 * a0 / per + 1e-6)) == []
