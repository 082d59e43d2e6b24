"""Exact-rational (``fractions.Fraction``) kernels for the compat API.

The reference's trees accept any rational scalar type through the
``ground`` context (``Context(coordinate_factory=Fraction, ...)``,
/root/reference/README.md:50-51; the hypothesis strategies feed
``st.fractions`` at tests/strategies/base.py:61-68).  The distributed
engine is float64 throughout (SURVEY.md §2.6), but the in-memory
compat trees (:mod:`locus_ray.compat`) honor the same contract: when a
geometry sequence carries ``Fraction`` scalars, queries run through
these pure-Python exact kernels and return the ORIGINAL scalars, so
two build points closer together than one float64 ulp still resolve to
the true nearest neighbor.

This path is a correctness/parity surface, not a throughput surface:
it is an O(n)-per-query scan over exact arithmetic (every operation
below — +, -, *, /, comparisons, min/max — is closed and exact over
``Fraction``).  The distributed operators never see it.

Ordering contracts match the float path (and the engine invariant):
results sort ascending by (squared distance, id); ``n >= size``
returns all items; closed box / containment comparisons.
"""

from __future__ import annotations

from fractions import Fraction

__all__ = [
    "has_fraction",
    "point_point_d2",
    "box_point_d2",
    "segment_point_d2",
    "segment_segment_d2",
    "top_n",
]


def has_fraction(scalars) -> bool:
    """True when any scalar in the (flat) iterable is a ``Fraction``.

    Ints and floats take the float64 engine path (exact for ints up to
    2**53, and floats ARE the float64 values); only ``Fraction``
    coordinates request exact rational arithmetic, mirroring the
    reference's opt-in ``coordinate_factory=Fraction`` context.
    """
    return any(isinstance(s, Fraction) for s in scalars)


def _fr(v) -> Fraction:
    """Coerce to Fraction.  Floats are exactly-representable rationals;
    WITHOUT this, one float operand (e.g. a float query point against a
    Fraction-built tree) silently degrades the whole expression to
    float64 (Fraction * float -> float in Python), breaking the
    documented sub-ulp exactness (round-5 review repro: two build
    points 2^-80 apart collapsed to a float tie)."""
    return v if isinstance(v, Fraction) else Fraction(v)


def point_point_d2(ax, ay, bx, by):
    ax, ay, bx, by = _fr(ax), _fr(ay), _fr(bx), _fr(by)
    dx = ax - bx
    dy = ay - by
    return dx * dx + dy * dy


def box_point_d2(min_x, max_x, min_y, max_y, x, y):
    min_x, max_x = _fr(min_x), _fr(max_x)
    min_y, max_y = _fr(min_y), _fr(max_y)
    x, y = _fr(x), _fr(y)
    gx = max(min_x - x, x - max_x, 0)
    gy = max(min_y - y, y - max_y, 0)
    return gx * gx + gy * gy


def segment_point_d2(sx, sy, ex, ey, x, y):
    sx, sy, ex, ey = _fr(sx), _fr(sy), _fr(ex), _fr(ey)
    x, y = _fr(x), _fr(y)
    dx = ex - sx
    dy = ey - sy
    l2 = dx * dx + dy * dy
    if l2 == 0:
        return point_point_d2(sx, sy, x, y)
    t = ((x - sx) * dx + (y - sy) * dy) / l2
    if t < 0:
        t = 0
    elif t > 1:
        t = 1
    return point_point_d2(sx + t * dx, sy + t * dy, x, y)


def _orient(ax, ay, bx, by, cx, cy):
    """Sign of the cross product (b-a) x (c-a) — exact over rationals."""
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return (v > 0) - (v < 0)


def _on_segment(ax, ay, bx, by, px, py):
    """p collinear-with and inside the closed bbox of segment ab."""
    return (min(ax, bx) <= px <= max(ax, bx)
            and min(ay, by) <= py <= max(ay, by))


def _segments_intersect(asx, asy, aex, aey, bsx, bsy, bex, bey) -> bool:
    o1 = _orient(asx, asy, aex, aey, bsx, bsy)
    o2 = _orient(asx, asy, aex, aey, bex, bey)
    o3 = _orient(bsx, bsy, bex, bey, asx, asy)
    o4 = _orient(bsx, bsy, bex, bey, aex, aey)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and _on_segment(asx, asy, aex, aey, bsx, bsy):
        return True
    if o2 == 0 and _on_segment(asx, asy, aex, aey, bex, bey):
        return True
    if o3 == 0 and _on_segment(bsx, bsy, bex, bey, asx, asy):
        return True
    if o4 == 0 and _on_segment(bsx, bsy, bex, bey, aex, aey):
        return True
    return False


def segment_segment_d2(asx, asy, aex, aey, bsx, bsy, bex, bey):
    """Exact squared distance between two closed segments (P7
    contract, kernels.py:125: 0 when they intersect, else the min of
    the four endpoint-to-other-segment distances)."""
    asx, asy, aex, aey = _fr(asx), _fr(asy), _fr(aex), _fr(aey)
    bsx, bsy, bex, bey = _fr(bsx), _fr(bsy), _fr(bex), _fr(bey)
    if _segments_intersect(asx, asy, aex, aey, bsx, bsy, bex, bey):
        return Fraction(0)
    return min(
        segment_point_d2(bsx, bsy, bex, bey, asx, asy),
        segment_point_d2(bsx, bsy, bex, bey, aex, aey),
        segment_point_d2(asx, asy, aex, aey, bsx, bsy),
        segment_point_d2(asx, asy, aex, aey, bex, bey),
    )


def top_n(d2s, n: int) -> list[int]:
    """Indices of the n smallest squared distances, ascending by
    (d2, id) — the engine's deterministic tie-break (SURVEY.md §2.6).
    ``n >= len`` returns every index (the reference's fast path)."""
    order = sorted(range(len(d2s)), key=lambda i: (d2s[i], i))
    return order[:n]
