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
    # d1 >= d2 = sqrt(squared euclid) -> a valid L1 lower bound
    grid_bound=lambda b: np.sqrt(b),
))
