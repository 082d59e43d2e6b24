"""Packed Hilbert R-tree over segments (the segmental variant).

Mirrors the reference's segmental tree (locus/segmental.py:18-77):
per-segment bboxes are derived by normalizing endpoint order
(locus/segmental.py:53-65), the packing is the same Hilbert bulk load
as :class:`PackedRTree` (locus/_core/segmental.py:159-244, including
the degenerate-extent guard at :195-200), and queries refine branch
pruning with ``box_*_squared_distance`` but score leaves with the exact
segment metrics (locus/segmental.py:68-73).

The reference maps exact-hit leaf distances (0) to -inf so intersecting
segments always pop first (locus/_core/segmental.py:82-104); with this
engine's (d2, kind, id) heap ordering a 0-distance leaf already beats
everything, so the flag is unnecessary — ties at any distance resolve
to the smallest id (documented engine tie-break, SURVEY.md §2.6).
"""

from __future__ import annotations

import heapq

import numpy as np

from ..config import DEFAULT_MAX_CHILDREN
from ..kernels import (
    box_point_squared_distance,
    box_segment_squared_distance,
    segment_point_squared_distance,
    segments_squared_distance,
)
from .rtree import PackedRTree


class SegmentTree:
    """Static packed tree over segments; ``ids`` default to positions."""

    __slots__ = ("sx", "sy", "ex", "ey", "tree", "size", "ids")

    def __init__(
        self,
        sx: np.ndarray,
        sy: np.ndarray,
        ex: np.ndarray,
        ey: np.ndarray,
        ids: np.ndarray | None = None,
        max_children: int = DEFAULT_MAX_CHILDREN,
    ):
        self.sx = np.ascontiguousarray(sx, dtype=np.float64)
        self.sy = np.ascontiguousarray(sy, dtype=np.float64)
        self.ex = np.ascontiguousarray(ex, dtype=np.float64)
        self.ey = np.ascontiguousarray(ey, dtype=np.float64)
        self.size = len(self.sx)
        self.ids = (
            np.arange(self.size, dtype=np.int64)
            if ids is None
            else np.asarray(ids, dtype=np.int64)
        )
        # normalized per-segment bboxes (locus/segmental.py:53-65)
        min_x = np.minimum(self.sx, self.ex)
        max_x = np.maximum(self.sx, self.ex)
        min_y = np.minimum(self.sy, self.ey)
        max_y = np.maximum(self.sy, self.ey)
        # reuse the packed R-tree but key leaves by *position* so leaf
        # geometry lookups stay array-indexed; public ids map at yield.
        self.tree = PackedRTree(
            min_x, max_x, min_y, max_y,
            ids=np.arange(self.size, dtype=np.int64),
            max_children=max_children,
        )

    def _iter_nearest(self, leaf_d2, branch_d2):
        """Best-first (d2, kind, pos) traversal; ``leaf_d2(pos_slice)``
        scores leaf segments exactly; ``branch_d2(s, e)`` scores node
        bboxes.  Heap ties resolve branch-before-leaf then smallest
        position, giving the smallest-id deterministic tie-break."""
        t = self.tree
        heap: list[tuple[float, int, int]] = [(0.0, 0, t.root)]
        while heap:
            d, kind, ref = heapq.heappop(heap)
            if kind == 1:
                yield ref, float(d)
                continue
            s, e = t.child_start[ref], t.child_end[ref]
            if t.is_leaf_parent[ref]:
                pos = t.ids[s:e]  # positions into segment arrays
                dd = leaf_d2(pos)
                # keyed by public id -> equal distances pop smallest-id-first
                for p, dj in zip(pos, dd, strict=True):
                    heapq.heappush(heap, (float(dj), 1, int(self.ids[p])))
            else:
                dd = branch_d2(s, e)
                for j, dj in zip(range(s, e), dd, strict=True):
                    heapq.heappush(heap, (float(dj), 0, j))

    # -- queries ------------------------------------------------------------

    def nearest_to_point(self, qx: float, qy: float) -> tuple[int, float]:
        for item in self.n_nearest_to_point_iter(qx, qy):
            return item
        raise ValueError("empty segment tree")

    def n_nearest_to_point(self, n: int, qx: float, qy: float) -> list[tuple[int, float]]:
        if n <= 0:  # see rtree.n_nearest
            return []
        if n >= self.size:
            d = segment_point_squared_distance(self.sx, self.sy, self.ex, self.ey, qx, qy)
            order = np.lexsort((self.ids, d))
            return [(int(self.ids[i]), float(d[i])) for i in order]
        out = []
        for item in self.n_nearest_to_point_iter(qx, qy):
            out.append(item)
            if len(out) == n:
                break
        return out

    def n_nearest_to_point_iter(self, qx: float, qy: float):
        t = self.tree
        branch = lambda s, e: box_point_squared_distance(
            t.nmin_x[s:e], t.nmax_x[s:e], t.nmin_y[s:e], t.nmax_y[s:e], qx, qy
        )
        leaf = lambda pos: segment_point_squared_distance(
            self.sx[pos], self.sy[pos], self.ex[pos], self.ey[pos], qx, qy
        )
        return self._iter_nearest(leaf, branch)

    def nearest_to_segment(self, asx: float, asy: float, aex: float, aey: float) -> tuple[int, float]:
        for item in self.n_nearest_to_segment_iter(asx, asy, aex, aey):
            return item
        raise ValueError("empty segment tree")

    def n_nearest_to_segment(self, n: int, asx: float, asy: float, aex: float, aey: float) -> list[tuple[int, float]]:
        if n <= 0:  # see rtree.n_nearest
            return []
        if n >= self.size:
            d = segments_squared_distance(
                self.sx, self.sy, self.ex, self.ey, asx, asy, aex, aey
            )
            order = np.lexsort((self.ids, d))
            return [(int(self.ids[i]), float(d[i])) for i in order]
        out = []
        for item in self.n_nearest_to_segment_iter(asx, asy, aex, aey):
            out.append(item)
            if len(out) == n:
                break
        return out

    def n_nearest_to_segment_iter(self, asx: float, asy: float, aex: float, aey: float):
        t = self.tree
        branch = lambda s, e: box_segment_squared_distance(
            t.nmin_x[s:e], t.nmax_x[s:e], t.nmin_y[s:e], t.nmax_y[s:e],
            asx, asy, aex, aey,
        )
        leaf = lambda pos: segments_squared_distance(
            self.sx[pos], self.sy[pos], self.ex[pos], self.ey[pos],
            asx, asy, aex, aey,
        )
        return self._iter_nearest(leaf, branch)
