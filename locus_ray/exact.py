"""Exact-arithmetic refinement for boundary-sensitive predicates.

The reference is exact under rational scalars (``Fraction`` contexts,
tests/strategies/base.py:61-68): its orientation-style predicates never
lie, even for nearly-degenerate inputs.  Float64 cross products can
flip sign within roundoff of zero.  This module restores reference
parity with the standard two-stage scheme:

1. **static filter** — evaluate the determinant in float64 and bound
   its rounding error (Shewchuk-style: |err| <= C * (|t1| + |t2|) with
   C = 3.33e-16 for a 2x2 determinant of differences); results outside
   the bound are certain;
2. **exact fallback** — only the (rare) filtered-in cases are
   recomputed with ``fractions.Fraction`` (binary floats convert to
   rationals exactly, so the integer cross product is exact — the same
   guarantee the reference gets from its Fraction contexts).

Used by the exact variants of segment intersection and PIP; the pure
comparison predicates (P1-P3) are already exact on float64 and need no
refinement.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

# rounding-error coefficient for det = (a1*b2) - (a2*b1) built from
# differences of inputs: each difference 1 ulp, each product 1 ulp,
# the subtraction 1 ulp -> < 6 ulps of the magnitude sum; be generous.
_FILTER_C = 8.0 * np.finfo(np.float64).eps


def orientation(ox, oy, ax, ay, bx, by) -> np.ndarray:
    """Exact sign of cross((A-O), (B-O)): -1, 0, +1 per element.

    Vectorized float64 with static filter; uncertain entries recomputed
    exactly with Fractions.
    """
    ox = np.asarray(ox, dtype=np.float64)
    oy = np.asarray(oy, dtype=np.float64)
    ax_, ay_ = np.broadcast_arrays(np.asarray(ax, dtype=np.float64), np.asarray(ay, dtype=np.float64))
    bx_, by_ = np.broadcast_arrays(np.asarray(bx, dtype=np.float64), np.asarray(by, dtype=np.float64))
    ox, oy, ax_, ay_, bx_, by_ = np.broadcast_arrays(ox, oy, ax_, ay_, bx_, by_)

    t1 = (ax_ - ox) * (by_ - oy)
    t2 = (ay_ - oy) * (bx_ - ox)
    det = t1 - t2
    bound = _FILTER_C * (np.abs(t1) + np.abs(t2))
    sign = np.sign(det).astype(np.int8)
    uncertain = np.abs(det) <= bound
    if uncertain.any():
        idx = np.nonzero(uncertain.ravel())[0]
        fo = ox.ravel()
        fy = oy.ravel()
        fax = ax_.ravel()
        fay = ay_.ravel()
        fbx = bx_.ravel()
        fby = by_.ravel()
        out = sign.ravel()
        for i in idx:
            d = (
                (Fraction(fax[i]) - Fraction(fo[i])) * (Fraction(fby[i]) - Fraction(fy[i]))
                - (Fraction(fay[i]) - Fraction(fy[i])) * (Fraction(fbx[i]) - Fraction(fo[i]))
            )
            out[i] = (d > 0) - (d < 0)
        sign = out.reshape(sign.shape)
    return sign


def segments_intersect_exact(asx, asy, aex, aey, bsx, bsy, bex, bey) -> np.ndarray:
    """Closed segment intersection with exact orientation signs.

    Same truth table as kernels.segments_intersect but immune to
    float64 sign flips on nearly-collinear configurations.
    """
    d1 = orientation(bsx, bsy, bex, bey, asx, asy)
    d2 = orientation(bsx, bsy, bex, bey, aex, aey)
    d3 = orientation(asx, asy, aex, aey, bsx, bsy)
    d4 = orientation(asx, asy, aex, aey, bex, bey)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)

    def on_seg(sx, sy, ex, ey, px, py):
        return (
            (np.minimum(sx, ex) <= px) & (px <= np.maximum(sx, ex))
            & (np.minimum(sy, ey) <= py) & (py <= np.maximum(sy, ey))
        )

    touch = (
        ((d1 == 0) & on_seg(bsx, bsy, bex, bey, asx, asy))
        | ((d2 == 0) & on_seg(bsx, bsy, bex, bey, aex, aey))
        | ((d3 == 0) & on_seg(asx, asy, aex, aey, bsx, bsy))
        | ((d4 == 0) & on_seg(asx, asy, aex, aey, bex, bey))
    )
    return proper | touch


def segments_squared_distance_exact(asx, asy, aex, aey, bsx, bsy, bex, bey) -> np.ndarray:
    """P7 with the zero-distance (intersection) PREDICATE decided
    exactly: nearly-collinear touching configurations that float64
    orientation misclassifies are forced to distance 0 (or non-0)
    correctly.  Non-zero distance VALUES remain float64 — the exactness
    contract covers predicates/comparisons (the reference's Fraction
    contexts), not the returned magnitudes."""
    from .kernels import segment_point_squared_distance

    d = np.minimum(
        np.minimum(
            segment_point_squared_distance(bsx, bsy, bex, bey, asx, asy),
            segment_point_squared_distance(bsx, bsy, bex, bey, aex, aey),
        ),
        np.minimum(
            segment_point_squared_distance(asx, asy, aex, aey, bsx, bsy),
            segment_point_squared_distance(asx, asy, aex, aey, bex, bey),
        ),
    )
    hit = segments_intersect_exact(asx, asy, aex, aey, bsx, bsy, bex, bey)
    return np.where(hit, 0.0, d)


def points_in_polygon_exact(ring_x, ring_y, px, py) -> np.ndarray:
    """Crossing-number PIP, fully exact (closed boundary).

    The float kernel's crossing comparison ``px < x_int`` is an
    orientation predicate in disguise (multiply through by ``y2 - y1``),
    so both the parity test AND the on-edge classification run on
    :func:`orientation` — the y-straddle condition and the bbox checks
    are plain comparisons, exact on float64 already.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(ring_x)
    inside = np.zeros(len(px), dtype=bool)
    on_edge = np.zeros(len(px), dtype=bool)
    for i in range(n):
        x1, y1 = float(ring_x[i]), float(ring_y[i])
        x2, y2 = float(ring_x[(i + 1) % n]), float(ring_y[(i + 1) % n])
        s = orientation(x1, y1, np.full_like(px, x2), np.full_like(py, y2), px, py)
        within = (
            (min(x1, x2) <= px) & (px <= max(x1, x2))
            & (min(y1, y2) <= py) & (py <= max(y1, y2))
        )
        on_edge |= (s == 0) & within
        cond = (y1 > py) != (y2 > py)
        crossed = cond & ((s > 0) if y2 > y1 else (s < 0))
        inside ^= crossed
    return inside | on_edge
