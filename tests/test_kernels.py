"""Property-style kernel tests vs brute-force/shapely-free oracles
(reference oracle style: tests/kd_tests/*, tests/r_tests/*)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from locus_ray import kernels

coord = st.floats(-1000, 1000, allow_nan=False)


@given(coord, coord, coord, coord, coord, coord)
@settings(max_examples=200, deadline=None)
def test_contains_point_closed(a, b, c, d, x, y):
    mnx, mxx = sorted((a, b))
    mny, mxy = sorted((c, d))
    got = bool(kernels.contains_point(mnx, mxx, mny, mxy, x, y))
    assert got == (mnx <= x <= mxx and mny <= y <= mxy)


def test_overlap_strict_edge_sharing():
    # boxes sharing only an edge must NOT overlap (locus/_core/box.py:12-18)
    assert not kernels.boxes_overlap(0, 1, 0, 1, 1, 2, 0, 1)
    assert kernels.boxes_overlap(0, 1, 0, 1, 0.5, 2, 0, 1)


@given(coord, coord, coord, coord)
@settings(max_examples=100, deadline=None)
def test_points_squared_distance(ax, ay, bx, by):
    assert kernels.points_squared_distance(ax, ay, bx, by) == (ax - bx) ** 2 + (ay - by) ** 2


@given(coord, coord, coord, coord, coord, coord)
@settings(max_examples=200, deadline=None)
def test_box_point_distance_vs_dense_sample(a, b, c, d, x, y):
    mnx, mxx = sorted((a, b))
    mny, mxy = sorted((c, d))
    d2 = float(kernels.box_point_squared_distance(mnx, mxx, mny, mxy, x, y))
    # clamp-based closed-form check
    cx = min(max(x, mnx), mxx)
    cy = min(max(y, mny), mxy)
    assert np.isclose(d2, (x - cx) ** 2 + (y - cy) ** 2, rtol=1e-12, atol=1e-12)
    if kernels.contains_point(mnx, mxx, mny, mxy, x, y):
        assert d2 == 0.0


def test_segment_point_distance_cases():
    # projection inside, clamped to endpoints, on-segment
    assert kernels.segment_point_squared_distance(0, 0, 10, 0, 5, 3) == 9.0
    assert kernels.segment_point_squared_distance(0, 0, 10, 0, -2, 0) == 4.0
    assert kernels.segment_point_squared_distance(0, 0, 10, 0, 12, 1) == 5.0
    assert kernels.segment_point_squared_distance(0, 0, 10, 0, 7, 0) == 0.0


def test_segments_distance_and_intersection():
    # crossing -> 0; touching -> 0; parallel -> gap
    assert kernels.segments_squared_distance(0, 0, 10, 0, 5, -5, 5, 5) == 0.0
    assert kernels.segments_squared_distance(0, 0, 10, 0, 10, 0, 20, 5) == 0.0
    assert kernels.segments_squared_distance(0, 0, 10, 0, 0, 2, 10, 2) == 4.0
    # collinear overlapping
    assert kernels.segments_squared_distance(0, 0, 10, 0, 5, 0, 15, 0) == 0.0
    # collinear disjoint
    assert kernels.segments_squared_distance(0, 0, 4, 0, 6, 0, 9, 0) == 4.0


@given(st.integers(3, 9), coord, coord)
@settings(max_examples=100, deadline=None)
def test_pip_convex_polygon(n, px, py):
    # regular convex polygon centered at origin, radius 100
    ang = np.arange(n) * (2 * np.pi / n)
    rx = 100 * np.cos(ang)
    ry = 100 * np.sin(ang)
    got = bool(kernels.points_in_polygon(rx, ry, np.array([px]), np.array([py]))[0])
    # convex oracle: inside iff on the same side of every edge (or on edge)
    inside = True
    for i in range(n):
        x1, y1 = rx[i], ry[i]
        x2, y2 = rx[(i + 1) % n], ry[(i + 1) % n]
        if (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) < 0:
            inside = False
    assert got == inside


def test_pip_boundary_closed():
    sq_x = np.array([0.0, 10.0, 10.0, 0.0])
    sq_y = np.array([0.0, 0.0, 10.0, 10.0])
    px = np.array([5.0, 0.0, 10.0, 5.0, 15.0])
    py = np.array([5.0, 5.0, 10.0, 0.0, 5.0])
    got = kernels.points_in_polygon(sq_x, sq_y, px, py)
    assert got.tolist() == [True, True, True, True, False]


def test_box_segment_distance_degenerate_boxes():
    """P8 on zero-extent boxes must return the true distance, not the
    NaN its zero-length edges fed through P7's t = ./len2 projection.
    Non-degenerate results keep the exact original op sequence."""
    a = np.array
    # vertical-line box at x=1, segment x=5 spanning the box's y range
    d = kernels.box_segment_squared_distance(
        a([1.0]), a([1.0]), a([0.0]), a([2.0]),
        a([5.0]), a([0.0]), a([5.0]), a([2.0]))
    assert d[0] == 16.0
    # point box
    d = kernels.box_segment_squared_distance(
        a([1.0]), a([1.0]), a([1.0]), a([1.0]),
        a([4.0]), a([1.0]), a([6.0]), a([1.0]))
    assert d[0] == 9.0
    # touching degenerate box -> 0
    d = kernels.box_segment_squared_distance(
        a([5.0]), a([5.0]), a([1.0]), a([1.0]),
        a([4.0]), a([1.0]), a([6.0]), a([1.0]))
    assert d[0] == 0.0
    # normal box result unchanged
    d = kernels.box_segment_squared_distance(
        a([0.0]), a([2.0]), a([0.0]), a([2.0]),
        a([5.0]), a([0.0]), a([5.0]), a([2.0]))
    assert d[0] == 9.0


def test_derive_mod_first_no_int64_wrap():
    """doc_xy/zone_box/segment_coords must agree with the DuckDB-side
    expression at ids far beyond the old id * A int64 wrap point
    (~3.5e9), and stay bit-identical at small ids."""
    import duckdb

    from locus_ray import derive

    small = np.arange(1000, dtype=np.int64)
    x, _ = derive.doc_xy(small)
    h1 = (small * 2654435761) % 1000003  # old form, exact at small ids
    u1 = h1 / 1000003.0
    x_old = np.where(small % 5 == 0, 10.0 + (u1 * 4.0 - 2.0),
                     u1 * 360.0 - 180.0)
    assert (x == x_old).all()
    for d in (4_000_000_000_001, 4_000_000_000_000, 2**61):
        xb, _ = derive.doc_xy(np.array([d], dtype=np.int64))
        expr = f"(({d} % 1000003) * 2654435761 % 1000003) / 1000003.0e0"
        sql = (f"SELECT 10.0e0 + ({expr} * 4.0e0 - 2.0e0)" if d % 5 == 0
               else f"SELECT {expr} * 360.0e0 - 180.0e0")
        assert xb[0] == duckdb.sql(sql).fetchone()[0], d
    # zone/segment derivations run (no OverflowError / wrap asymmetry)
    derive.zone_box(np.array([2**61], dtype=np.int64))
    derive.segment_coords(np.array([2**61], dtype=np.int64))
