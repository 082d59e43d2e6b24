"""Vectorized geometric predicate / metric kernels (P1-P11).

Each kernel is a numpy formulation of a scalar kernel the reference
relies on (cited below); all distance kernels return *squared*
distances, mirroring the reference's sqrt-free exact-metric design
(locus/kd.py:53, locus/r.py:58, locus/segmental.py:68-73).

IEEE determinism contract: every kernel fixes a specific sequence of
float64 operations (sub, mul, add, min/max, clamp) so the DuckDB
oracle SQL in ``locus_ray.sql`` can evaluate the *same* sequence and
produce bit-identical doubles.  Do not "simplify" expressions here
without updating the SQL builders.

All kernels broadcast: pass arrays of equal length for pairwise
evaluation, or one side scalar/length-1 for one-vs-many.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Box predicates (closed / strict semantics per the reference)
# ---------------------------------------------------------------------------

def contains_point(min_x, max_x, min_y, max_y, x, y) -> np.ndarray:
    """P1 — closed containment: min<=v<=max on both axes
    (semantics of locus/_core/box.py:6-9)."""
    return (min_x <= x) & (x <= max_x) & (min_y <= y) & (y <= max_y)


def boxes_overlap(amin_x, amax_x, amin_y, amax_y, bmin_x, bmax_x, bmin_y, bmax_y) -> np.ndarray:
    """P2 — STRICT interior overlap: boxes sharing only an edge do NOT
    overlap (semantics of locus/_core/box.py:12-18)."""
    return (
        (amin_x < bmax_x) & (bmin_x < amax_x)
        & (amin_y < bmax_y) & (bmin_y < amax_y)
    )


def box_is_subset(amin_x, amax_x, amin_y, amax_y, bmin_x, bmax_x, bmin_y, bmax_y) -> np.ndarray:
    """P3 — closed: box A inside box B (semantics of locus/_core/box.py:21-27)."""
    return (
        (bmin_x <= amin_x) & (amax_x <= bmax_x)
        & (bmin_y <= amin_y) & (amax_y <= bmax_y)
    )


# ---------------------------------------------------------------------------
# Squared-distance kernels
# ---------------------------------------------------------------------------

def points_squared_distance(ax, ay, bx, by) -> np.ndarray:
    """P4 — (semantics of ground metric used at locus/kd.py:53)."""
    dx = ax - bx
    dy = ay - by
    return dx * dx + dy * dy


def box_point_squared_distance(min_x, max_x, min_y, max_y, x, y) -> np.ndarray:
    """P5 — 0 inside; per-axis clamp (used at locus/r.py:58).

    gap = max(min-v, v-max, 0) per axis; result gx*gx + gy*gy.
    """
    gx = np.maximum(np.maximum(min_x - x, x - max_x), 0.0)
    gy = np.maximum(np.maximum(min_y - y, y - max_y), 0.0)
    return gx * gx + gy * gy


def segment_point_squared_distance(sx, sy, ex, ey, px, py) -> np.ndarray:
    """P6 — projection-clamp point-to-segment (used at locus/segmental.py:72).

    Requires distinct endpoints (len2 > 0), which the fixture domain
    guarantees (tests/strategies/base.py:80-85).
    """
    dx = ex - sx
    dy = ey - sy
    len2 = dx * dx + dy * dy
    t = ((px - sx) * dx + (py - sy) * dy) / len2
    t = np.minimum(np.maximum(t, 0.0), 1.0)
    cx = sx + t * dx
    cy = sy + t * dy
    qx = px - cx
    qy = py - cy
    return qx * qx + qy * qy


def _cross(ox, oy, ax, ay, bx, by) -> np.ndarray:
    """Signed cross product of (A-O) x (B-O)."""
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def segments_intersect(asx, asy, aex, aey, bsx, bsy, bex, bey) -> np.ndarray:
    """Closed segment intersection test (touching counts).

    Standard orientation test + collinear on-segment checks; feeds the
    "zero distance" case of P7 (reference maps exact hits to -inf for
    heap ordering, locus/_core/segmental.py:82-104 — here the flag is
    carried as a column instead).
    """
    d1 = _cross(bsx, bsy, bex, bey, asx, asy)
    d2 = _cross(bsx, bsy, bex, bey, aex, aey)
    d3 = _cross(asx, asy, aex, aey, bsx, bsy)
    d4 = _cross(asx, asy, aex, aey, bex, bey)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )

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


def segments_squared_distance(asx, asy, aex, aey, bsx, bsy, bex, bey) -> np.ndarray:
    """P7 — 0 if intersecting, else min of the four endpoint-to-segment
    distances (used at locus/segmental.py:73)."""
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
    hit = segments_intersect(asx, asy, aex, aey, bsx, bsy, bex, bey)
    return np.where(hit, 0.0, d)


def box_segment_intersects(min_x, max_x, min_y, max_y, sx, sy, ex, ey) -> np.ndarray:
    """Closed box-segment intersection predicate — exactly the
    ``box_segment_squared_distance == 0`` case of P8 (an endpoint lies
    in the closed box, or the segment meets one of the four edges),
    evaluated as pure comparisons on cross products so the SQL mirror
    is trivially bit-exact."""
    hit = contains_point(min_x, max_x, min_y, max_y, sx, sy) | contains_point(
        min_x, max_x, min_y, max_y, ex, ey
    )
    edges = (
        (min_x, min_y, max_x, min_y),
        (max_x, min_y, max_x, max_y),
        (max_x, max_y, min_x, max_y),
        (min_x, max_y, min_x, min_y),
    )
    for (e1x, e1y, e2x, e2y) in edges:
        hit = hit | segments_intersect(e1x, e1y, e2x, e2y, sx, sy, ex, ey)
    return hit


def box_segment_squared_distance(min_x, max_x, min_y, max_y, sx, sy, ex, ey) -> np.ndarray:
    """P8 — 0 if the segment touches/enters the box, else min distance
    to the four box edges (used at locus/segmental.py:69)."""
    inside = contains_point(min_x, max_x, min_y, max_y, sx, sy) | contains_point(
        min_x, max_x, min_y, max_y, ex, ey
    )
    edges = (
        (min_x, min_y, max_x, min_y),
        (max_x, min_y, max_x, max_y),
        (max_x, max_y, min_x, max_y),
        (min_x, max_y, min_x, min_y),
    )
    d = None
    for (e1x, e1y, e2x, e2y) in edges:
        # a DEGENERATE box (min == max on an axis) makes two edges
        # zero-length, and P7's projection (t = ·/len2) would emit
        # 0/0 = NaN that poisons the min — score those edges as the
        # corner POINT against the query segment instead.  Boxes with
        # positive extent take the exact original op sequence (the
        # SQL mirrors rely on it; fixture boxes are never degenerate).
        deg = np.asarray((e1x == e2x) & (e1y == e2y))
        if deg.any():
            with np.errstate(invalid="ignore", divide="ignore"):
                dd = segments_squared_distance(e1x, e1y, e2x, e2y,
                                               sx, sy, ex, ey)
            dd = np.where(
                deg, segment_point_squared_distance(sx, sy, ex, ey, e1x, e1y),
                dd)
        else:
            dd = segments_squared_distance(e1x, e1y, e2x, e2y, sx, sy, ex, ey)
        d = dd if d is None else np.minimum(d, dd)
    return np.where(inside, 0.0, d)


def merge_boxes(min_x, max_x, min_y, max_y) -> tuple[float, float, float, float]:
    """P9 — bbox union over arrays (reduce analog of locus/_core/r.py:103)."""
    return (
        float(np.min(min_x)),
        float(np.max(max_x)),
        float(np.min(min_y)),
        float(np.max(max_y)),
    )


# ---------------------------------------------------------------------------
# Point-in-polygon (north-star extension; crossing number)
# ---------------------------------------------------------------------------

def points_in_polygon(ring_x: np.ndarray, ring_y: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Crossing-number PIP for one simple polygon vs many points.

    Boundary points count as inside (closed semantics, consistent with
    the reference's closed box predicates).  ``ring_*`` are the
    polygon's vertices (not repeated at the end).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(ring_x)
    inside = np.zeros(len(px), dtype=bool)
    on_edge = np.zeros(len(px), dtype=bool)
    for i in range(n):
        x1, y1 = ring_x[i], ring_y[i]
        x2, y2 = ring_x[(i + 1) % n], ring_y[(i + 1) % n]
        # boundary check: collinear + within bbox of the edge
        cr = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        on = (cr == 0.0) & (
            (np.minimum(x1, x2) <= px) & (px <= np.maximum(x1, x2))
            & (np.minimum(y1, y2) <= py) & (py <= np.maximum(y1, y2))
        )
        on_edge |= on
        # crossing test (half-open rule avoids double-counting vertices)
        cond = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
        inside ^= cond & (px < x_int)
    return inside | on_edge
