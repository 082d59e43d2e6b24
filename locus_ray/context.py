"""Pluggable metric/predicate contexts (SURVEY.md §2.7).

The reference's trees take a ``Context`` supplying the geometric
kernels (locus/kd.py:34, via the ``ground`` context protocol); this
module is the engine's equivalent: a registry of kernel bundles that
the batched indexes (:class:`locus_ray.grid_index.GridKnn`,
``SegSegGridKnn``, ``GridContain``) and the compat trees accept.

Three built-ins:

* ``default`` — the float64 kernels of :mod:`locus_ray.kernels`
  (bit-parity with the DuckDB oracles);
* ``exact``   — same metrics, but boundary-sensitive PREDICATES
  (segment intersection, PIP) run through the static-filtered exact
  path of :mod:`locus_ray.exact` (the reference's Fraction-context
  exactness);
* ``manhattan`` — an L1 point metric, demonstrating a genuinely
  different pluggable ground metric.

Grid-pruning safety: ring expansion guarantees every unseen geometry
is at EUCLIDEAN distance >= r*min_cell.  A context must translate that
guarantee into its own metric via ``grid_bound(squared_euclid)`` — a
LOWER bound on the context metric for anything at that euclidean
distance.  Identity for (squared-)euclidean contexts; ``sqrt`` for L1
(since d1 >= d2).  Contexts whose metric can undercut euclidean
distance must return 0.0 (disabling early retirement — still exact,
just unpruned).  The per-cell U_all ceilings additionally assume the
default squared-euclidean metric, so they stay enabled only for the
``default``/``exact`` contexts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from . import kernels


@dataclass(frozen=True)
class Context:
    name: str
    points_squared_distance: Callable = kernels.points_squared_distance
    box_point_squared_distance: Callable = kernels.box_point_squared_distance
    segment_point_squared_distance: Callable = kernels.segment_point_squared_distance
    segments_squared_distance: Callable = kernels.segments_squared_distance
    contains_point: Callable = kernels.contains_point
    points_in_polygon: Callable = kernels.points_in_polygon
    # euclidean ring guarantee (squared) -> lower bound in THIS metric
    grid_bound: Callable = field(default=lambda b: b)

    @property
    def uses_euclidean_bounds(self) -> bool:
        return self.name in ("default", "exact")


def _manhattan_points(ax, ay, bx, by):
    return np.abs(ax - bx) + np.abs(ay - by)


def _manhattan_box_point(min_x, max_x, min_y, max_y, x, y):
    gx = np.maximum(np.maximum(min_x - x, x - max_x), 0.0)
    gy = np.maximum(np.maximum(min_y - y, y - max_y), 0.0)
    return gx + gy


def _manhattan_segment_point(sx, sy, ex, ey, px, py):
    """L1 point-to-segment distance.  f(t) = |sx+t·dx−px| + |sy+t·dy−py|
    is convex piecewise-linear in t, so the min over [0, 1] is attained
    at a clipped breakpoint: t ∈ {0, 1, tx, ty} where each |·| term
    vanishes.  (The euclidean projection kernel here would make ring
    retirement compare a squared-euclid kth against the L1 grid_bound
    and retire early — the round-5 manhattan-segment bug.)"""
    dx = ex - sx
    dy = ey - sy
    with np.errstate(divide="ignore", invalid="ignore"):
        tx = np.where(dx != 0, (px - sx) / np.where(dx != 0, dx, 1.0), 0.0)
        ty = np.where(dy != 0, (py - sy) / np.where(dy != 0, dy, 1.0), 0.0)
    best = None
    for t in (np.zeros_like(tx), np.ones_like(tx),
              np.clip(tx, 0.0, 1.0), np.clip(ty, 0.0, 1.0)):
        d = np.abs(sx + t * dx - px) + np.abs(sy + t * dy - py)
        best = d if best is None else np.minimum(best, d)
    return best


def _manhattan_segments(asx, asy, aex, aey, bsx, bsy, bex, bey):
    """L1 segment-to-segment distance: 0 if intersecting, else the min
    of the four endpoint-to-segment L1 distances.  Valid for ANY norm:
    the difference set {a − b} is a convex polygon, and the norm's min
    over a convex polygon not containing the origin lies on an edge —
    each edge fixes one parameter at an endpoint."""
    d = np.minimum(
        np.minimum(_manhattan_segment_point(bsx, bsy, bex, bey, asx, asy),
                   _manhattan_segment_point(bsx, bsy, bex, bey, aex, aey)),
        np.minimum(_manhattan_segment_point(asx, asy, aex, aey, bsx, bsy),
                   _manhattan_segment_point(asx, asy, aex, aey, bex, bey)),
    )
    hit = kernels.segments_intersect(asx, asy, aex, aey, bsx, bsy, bex, bey)
    return np.where(hit, 0.0, d)


def _exact_context() -> Context:
    from . import exact

    return Context(
        name="exact",
        segments_squared_distance=exact.segments_squared_distance_exact,
        points_in_polygon=exact.points_in_polygon_exact,
    )


_REGISTRY: dict[str, Context] = {}


def register_context(ctx: Context) -> Context:
    _REGISTRY[ctx.name] = ctx
    return ctx


def get_context(ctx: "Context | str | None") -> Context:
    if ctx is None:
        return _REGISTRY["default"]
    if isinstance(ctx, Context):
        return ctx
    return _REGISTRY[ctx]


register_context(Context(name="default"))
register_context(_exact_context())
register_context(Context(
    name="manhattan",
    points_squared_distance=_manhattan_points,
    box_point_squared_distance=_manhattan_box_point,
    # EVERY metric kernel must be L1 — a squared-euclid segment kernel
    # against the sqrt grid_bound retired ring expansion early and
    # returned wrong nearest segments (round-5 review repro)
    segment_point_squared_distance=_manhattan_segment_point,
    segments_squared_distance=_manhattan_segments,
    # d1 >= d2 = sqrt(squared euclid) -> a valid L1 lower bound
    grid_bound=lambda b: np.sqrt(b),
))
