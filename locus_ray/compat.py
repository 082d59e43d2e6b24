"""locus-style convenience API over the engine's index structures.

A user of the reference's in-memory API (``locus.kd.Tree``,
``locus.r.Tree``, ``locus.segmental.Tree``) can switch to these classes
with the same call shapes: items are ``(id, geometry)`` pairs, queries
offer the item/index/geometry projections, ``n >= size`` returns all
items, empty kd-tree ``nearest_*`` raises ``ValueError``.

Differences (documented, per SURVEY.md §2.6): distance ties resolve to
the SMALLEST id deterministically (the reference's tie winner is a
traversal artifact and differs between its own r/segmental variants,
locus/r.py:603 vs locus/segmental.py:521); results order ascending by
(distance, id).

Scalar types: int/float go through the float64 engine.  ``Fraction``
coordinates (the reference's ``coordinate_factory=Fraction`` context,
README.md:50-51, tests/strategies/base.py:61-68) switch the tree to
the exact-rational path of :mod:`locus_ray.rational`: queries run in
pure ``Fraction`` arithmetic and return the original scalars, so
geometries closer together than one float64 ulp still resolve
exactly.  The exact path supports the euclidean (default/exact)
contexts only.

Geometries are plain tuples: Point ``(x, y)``, Box ``(min_x, max_x,
min_y, max_y)`` (the reference's construction order, README.md:68),
Segment ``((sx, sy), (ex, ey))``.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from . import rational
from .index import KDTree, PackedRTree, SegmentTree

Point = tuple[float, float]
Box = tuple[float, float, float, float]
Segment = tuple[Point, Point]


def _require_euclidean(ctx) -> None:
    if not ctx.uses_euclidean_bounds:
        raise ValueError(
            f"exact-rational (Fraction) geometries support the euclidean "
            f"default/exact contexts only, not {ctx.name!r}")


class KdTree:
    """Parity: locus/kd.py:19-55 (build) and its query surface.

    ``context`` mirrors the reference's pluggable ground context
    (locus/kd.py:34): pass a :class:`locus_ray.context.Context` (or its
    registered name, e.g. ``"manhattan"``/``"exact"``) to swap the
    metric/predicate kernels; non-default contexts route the nearest
    queries through the batched :class:`~locus_ray.grid_index.GridKnn`
    engine, which honors the context's metric and bound transform."""

    def __init__(self, points: Sequence[Point], context=None):
        from .context import get_context

        self.points = list(points)
        self._ctx = get_context(context)
        self._exact = rational.has_fraction(
            s for p in self.points for s in p)
        if self._exact:
            _require_euclidean(self._ctx)
            self._tree = self._grid = None
            return
        xs = np.asarray([p[0] for p in points], dtype=np.float64)
        ys = np.asarray([p[1] for p in points], dtype=np.float64)
        self._tree = KDTree(xs, ys)
        self._grid = None
        if self._ctx.name != "default":
            from .grid_index import GridKnn

            self._grid = GridKnn("point", {"x": xs, "y": ys},
                                 np.arange(len(xs), dtype=np.int64), 8,
                                 context=self._ctx)

    def _d2s(self, point: Point) -> list:
        return [rational.point_point_d2(px, py, point[0], point[1])
                for px, py in self.points]

    # nearest (locus/kd.py:320-374 contract)
    def nearest_item(self, point: Point) -> tuple[int, Point]:
        if self._exact:
            if not self.points:
                raise ValueError("empty tree")
            i = rational.top_n(self._d2s(point), 1)[0]
            return i, self.points[i]
        if self._grid is not None:
            if not self.points:
                raise ValueError("empty tree")
            ids, _ = self._grid.query(np.asarray([point[0]]), np.asarray([point[1]]), 1)
            return int(ids[0, 0]), self.points[int(ids[0, 0])]
        i, _ = self._tree.nearest(point[0], point[1])
        return i, self.points[i]

    def nearest_index(self, point: Point) -> int:
        return self.nearest_item(point)[0]

    def nearest_point(self, point: Point) -> Point:
        return self.nearest_item(point)[1]

    # n_nearest (locus/kd.py:176-253 contract incl. n >= size fast path)
    def n_nearest_items(self, n: int, point: Point) -> list[tuple[int, Point]]:
        if self._exact:
            return [(i, self.points[i])
                    for i in rational.top_n(self._d2s(point), n)]
        if self._grid is not None:
            ids, _ = self._grid.query(np.asarray([point[0]]), np.asarray([point[1]]), n)
            return [(int(i), self.points[int(i)]) for i in ids[0] if i >= 0]
        return [(i, self.points[i]) for i, _ in self._tree.n_nearest(n, point[0], point[1])]

    def n_nearest_indices(self, n: int, point: Point) -> list[int]:
        return [i for i, _ in self.n_nearest_items(n, point)]

    def n_nearest_points(self, n: int, point: Point) -> list[Point]:
        return [p for _, p in self.n_nearest_items(n, point)]

    # box range (locus/kd.py:449-507 contract, closed box)
    def find_box_items(self, box: Box) -> list[tuple[int, Point]]:
        if self._exact:
            mnx, mxx, mny, mxy = box
            return [(i, p) for i, p in enumerate(self.points)
                    if mnx <= p[0] <= mxx and mny <= p[1] <= mxy]
        ids = self._tree.find_box(*box)
        return [(int(i), self.points[int(i)]) for i in ids]

    def find_box_indices(self, box: Box) -> list[int]:
        return [i for i, _ in self.find_box_items(box)]

    def find_box_points(self, box: Box) -> list[Point]:
        return [p for _, p in self.find_box_items(box)]


class RTree:
    """Parity: locus/r.py:21-60 (packed Hilbert bulk load) + queries."""

    def __init__(self, boxes: Sequence[Box], max_children: int = 16,
                 context=None):
        from .context import get_context

        if not boxes:
            raise ValueError("R-tree requires at least one box")
        self.boxes = list(boxes)
        self._ctx = get_context(context)
        self._exact = rational.has_fraction(
            s for b in self.boxes for s in b)
        if self._exact:
            _require_euclidean(self._ctx)
            self._tree = self._grid = None
            return
        arr = np.asarray(boxes, dtype=np.float64)
        self._tree = PackedRTree(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3],
                                 max_children=max_children)
        self._grid = None
        if self._ctx.name != "default":
            from .grid_index import GridKnn

            self._grid = GridKnn(
                "box",
                {"min_x": arr[:, 0], "max_x": arr[:, 1],
                 "min_y": arr[:, 2], "max_y": arr[:, 3]},
                np.arange(len(arr), dtype=np.int64), 8, context=self._ctx)

    def _d2s(self, point: Point) -> list:
        return [rational.box_point_d2(*b, point[0], point[1])
                for b in self.boxes]

    def nearest_item(self, point: Point) -> tuple[int, Box]:
        if self._exact:
            i = rational.top_n(self._d2s(point), 1)[0]
            return i, self.boxes[i]
        if self._grid is not None:
            ids, _ = self._grid.query(np.asarray([point[0]]),
                                      np.asarray([point[1]]), 1)
            return int(ids[0, 0]), self.boxes[int(ids[0, 0])]
        i, _ = self._tree.nearest(point[0], point[1])
        return i, self.boxes[i]

    def nearest_index(self, point: Point) -> int:
        return self.nearest_item(point)[0]

    def nearest_box(self, point: Point) -> Box:
        return self.nearest_item(point)[1]

    def n_nearest_items(self, n: int, point: Point) -> list[tuple[int, Box]]:
        if self._exact:
            return [(i, self.boxes[i])
                    for i in rational.top_n(self._d2s(point), n)]
        if self._grid is not None:
            ids, _ = self._grid.query(np.asarray([point[0]]),
                                      np.asarray([point[1]]), n)
            return [(int(i), self.boxes[int(i)]) for i in ids[0] if i >= 0]
        return [(i, self.boxes[i]) for i, _ in self._tree.n_nearest(n, point[0], point[1])]

    def n_nearest_indices(self, n: int, point: Point) -> list[int]:
        return [i for i, _ in self.n_nearest_items(n, point)]

    def n_nearest_boxes(self, n: int, point: Point) -> list[Box]:
        return [b for _, b in self.n_nearest_items(n, point)]

    # containment (locus/r.py:120-353 contracts)
    def find_subsets_items(self, box: Box) -> list[tuple[int, Box]]:
        if self._exact:
            mnx, mxx, mny, mxy = box
            return [(i, b) for i, b in enumerate(self.boxes)
                    if mnx <= b[0] and b[1] <= mxx
                    and mny <= b[2] and b[3] <= mxy]
        return [(int(i), self.boxes[int(i)]) for i in self._tree.find_subsets(*box)]

    def find_subsets_indices(self, box: Box) -> list[int]:
        return [i for i, _ in self.find_subsets_items(box)]

    def find_subsets(self, box: Box) -> list[Box]:
        return [b for _, b in self.find_subsets_items(box)]

    def find_supersets_items(self, box: Box) -> list[tuple[int, Box]]:
        if self._exact:
            mnx, mxx, mny, mxy = box
            return [(i, b) for i, b in enumerate(self.boxes)
                    if b[0] <= mnx and mxx <= b[1]
                    and b[2] <= mny and mxy <= b[3]]
        return [(int(i), self.boxes[int(i)]) for i in self._tree.find_supersets(*box)]

    def find_supersets_indices(self, box: Box) -> list[int]:
        return [i for i, _ in self.find_supersets_items(box)]

    def find_supersets(self, box: Box) -> list[Box]:
        return [b for _, b in self.find_supersets_items(box)]


class SegmentalTree:
    """Parity: locus/segmental.py:18-77 + the four query families."""

    def __init__(self, segments: Sequence[Segment], max_children: int = 16,
                 context=None):
        from .context import get_context

        if not segments:
            raise ValueError("segmental tree requires at least one segment")
        self.segments = list(segments)
        self._ctx = get_context(context)
        self._exact = rational.has_fraction(
            s for seg in self.segments for pt in seg for s in pt)
        if self._exact:
            _require_euclidean(self._ctx)
            self._tree = self._grid = None
            return
        arr = np.asarray([(s[0][0], s[0][1], s[1][0], s[1][1]) for s in segments],
                         dtype=np.float64)
        self._tree = SegmentTree(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3],
                                 max_children=max_children)
        self._grid = None
        self._pt_grid = None
        if self._ctx.name != "default":
            from .grid_index import GridKnn, SegSegGridKnn

            geoms = {"start_x": arr[:, 0], "start_y": arr[:, 1],
                     "end_x": arr[:, 2], "end_y": arr[:, 3]}
            ids = np.arange(len(arr), dtype=np.int64)
            self._grid = SegSegGridKnn(geoms, ids, 8, context=self._ctx)
            # the point-query family needs its own context-aware engine
            # (SegSegGridKnn only answers segment queries)
            self._pt_grid = GridKnn("segment", geoms, ids, 8,
                                    context=self._ctx)

    def _seg_d2s(self, segment: Segment) -> list:
        (sx, sy), (ex, ey) = segment
        return [rational.segment_segment_d2(
                    s[0][0], s[0][1], s[1][0], s[1][1], sx, sy, ex, ey)
                for s in self.segments]

    def _pt_d2s(self, point: Point) -> list:
        return [rational.segment_point_d2(
                    s[0][0], s[0][1], s[1][0], s[1][1], point[0], point[1])
                for s in self.segments]

    def nearest_item(self, segment: Segment) -> tuple[int, Segment]:
        if self._exact:
            i = rational.top_n(self._seg_d2s(segment), 1)[0]
            return i, self.segments[i]
        if self._grid is not None:
            # non-default context: same route as n_nearest_items — the
            # euclidean SegmentTree would return the L2 winner and
            # contradict the k>1 family under the same index
            return self.n_nearest_items(1, segment)[0]
        i, _ = self._tree.nearest_to_segment(
            segment[0][0], segment[0][1], segment[1][0], segment[1][1]
        )
        return i, self.segments[i]

    def nearest_index(self, segment: Segment) -> int:
        return self.nearest_item(segment)[0]

    def nearest_segment(self, segment: Segment) -> Segment:
        return self.nearest_item(segment)[1]

    def n_nearest_items(self, n: int, segment: Segment) -> list[tuple[int, Segment]]:
        if self._exact:
            return [(i, self.segments[i])
                    for i in rational.top_n(self._seg_d2s(segment), n)]
        if self._grid is not None:
            ids, _ = self._grid.query(
                np.asarray([segment[0][0]]), np.asarray([segment[0][1]]),
                np.asarray([segment[1][0]]), np.asarray([segment[1][1]]), n)
            return [(int(i), self.segments[int(i)]) for i in ids[0] if i >= 0]
        return [
            (i, self.segments[i])
            for i, _ in self._tree.n_nearest_to_segment(
                n, segment[0][0], segment[0][1], segment[1][0], segment[1][1]
            )
        ]

    def n_nearest_indices(self, n: int, segment: Segment) -> list[int]:
        return [i for i, _ in self.n_nearest_items(n, segment)]

    def n_nearest_segments(self, n: int, segment: Segment) -> list[Segment]:
        return [s for _, s in self.n_nearest_items(n, segment)]

    def nearest_to_point_item(self, point: Point) -> tuple[int, Segment]:
        if self._exact:
            i = rational.top_n(self._pt_d2s(point), 1)[0]
            return i, self.segments[i]
        if self._grid is not None:  # context-aware route (see nearest_item)
            return self.n_nearest_to_point_items(1, point)[0]
        i, _ = self._tree.nearest_to_point(point[0], point[1])
        return i, self.segments[i]

    def nearest_to_point_index(self, point: Point) -> int:
        return self.nearest_to_point_item(point)[0]

    def nearest_to_point_segment(self, point: Point) -> Segment:
        return self.nearest_to_point_item(point)[1]

    def n_nearest_to_point_items(self, n: int, point: Point) -> list[tuple[int, Segment]]:
        if self._exact:
            return [(i, self.segments[i])
                    for i in rational.top_n(self._pt_d2s(point), n)]
        if self._pt_grid is not None:  # context-aware point route
            ids, _ = self._pt_grid.query(
                np.asarray([point[0]]), np.asarray([point[1]]), n)
            return [(int(i), self.segments[int(i)]) for i in ids[0] if i >= 0]
        return [(i, self.segments[i])
                for i, _ in self._tree.n_nearest_to_point(n, point[0], point[1])]

    def n_nearest_to_point_indices(self, n: int, point: Point) -> list[int]:
        return [i for i, _ in self.n_nearest_to_point_items(n, point)]

    def n_nearest_to_point_segments(self, n: int, point: Point) -> list[Segment]:
        return [s for _, s in self.n_nearest_to_point_items(n, point)]
