"""Exact-refine parity tests: cases where float64 orientation lies."""

import numpy as np
from fractions import Fraction

from locus_ray.exact import (
    orientation,
    points_in_polygon_exact,
    segments_intersect_exact,
)


def _orient_fraction(ox, oy, ax, ay, bx, by):
    d = (Fraction(ax) - Fraction(ox)) * (Fraction(by) - Fraction(oy)) - (
        Fraction(ay) - Fraction(oy)
    ) * (Fraction(bx) - Fraction(ox))
    return (d > 0) - (d < 0)


def test_orientation_matches_fraction_oracle_near_collinear():
    rng = np.random.default_rng(42)
    # construct nearly-collinear triples: points on a line + tiny ulp nudges
    n = 3000
    t = rng.uniform(0, 1, n)
    ox = rng.uniform(-100, 100, n)
    oy = rng.uniform(-100, 100, n)
    dx = rng.uniform(-10, 10, n)
    dy = rng.uniform(-10, 10, n)
    ax = ox + dx
    ay = oy + dy
    bx = ox + t * dx
    by = oy + t * dy
    # nudge b by -2..2 ulps in y
    nudge = rng.integers(-2, 3, n)
    by = np.asarray(
        [np.nextafter(v, np.inf) if k > 0 else (np.nextafter(v, -np.inf) if k < 0 else v)
         for v, k in zip(by, nudge)]
    )
    got = orientation(ox, oy, ax, ay, bx, by)
    for i in range(n):
        assert got[i] == _orient_fraction(ox[i], oy[i], ax[i], ay[i], bx[i], by[i]), i


def test_orientation_exact_zero_on_collinear():
    # exactly-representable collinear points -> sign 0, never +-1
    got = orientation(
        np.array([0.0]), np.array([0.0]),
        np.array([1e16]), np.array([1e16]),
        np.array([0.5e16]), np.array([0.5e16]),
    )
    assert got[0] == 0


def test_segments_intersect_exact_touching():
    # endpoint exactly on the other segment, huge coordinates
    a = segments_intersect_exact(
        np.array([0.0]), np.array([0.0]), np.array([1e15]), np.array([1e15]),
        np.array([0.25e15]), np.array([0.25e15]), np.array([1.0]), np.array([-5.0]),
    )
    assert bool(a[0])


def test_pip_exact_boundary_large_coords():
    rx = np.array([0.0, 1e15, 1e15, 0.0])
    ry = np.array([0.0, 0.0, 1e15, 1e15])
    px = np.array([0.5e15, 2e15])
    py = np.array([0.0, 0.0])  # first exactly on bottom edge
    got = points_in_polygon_exact(rx, ry, px, py)
    assert got.tolist() == [True, False]
