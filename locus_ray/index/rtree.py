"""Packed Hilbert R-tree (numpy-backed, contiguous-run layout).

Build semantics match the reference bulk load (locus/_core/r.py:93-161):
leaves wrap (id, box); if ``n <= max_children`` a single root holds all
leaves; otherwise leaves are sorted by the Hilbert rank of their box
center scaled onto a 2^16 grid over the global bbox, then packed
bottom-up in contiguous runs of ``max_children`` per level.  The
degenerate-extent guard ``2 * (max - min) or 1`` is adopted from the
segmental variant (locus/_core/segmental.py:195-200) — the reference's
box variant lacks it and ZeroDivisionErrors on zero-extent inputs
(SURVEY.md C4 note); adopting the guard everywhere is a deliberate,
documented improvement.

Because packing is contiguous, the whole tree is six flat arrays: per
node (bbox, child_start, child_end, leaf_level flag) — cheap to build
vectorized, cheap to serialize into an actor, cache-friendly to probe.

Queries reproduce the reference contracts (SURVEY.md §2.3, §2.6):
``nearest`` / ``n_nearest`` by ``box_point_squared_distance``
best-first search with a deterministic (distance, id) tie-break (the
reference's own tie winners are traversal artifacts, locus/r.py:603);
``find_subsets`` (closed ⊆ emission, STRICT-overlap descent,
locus/_core/r.py:164-172) and ``find_supersets``
(locus/_core/r.py:175-183) with the whole-tree root fast path
(locus/r.py:355-362).
"""

from __future__ import annotations

import heapq

import numpy as np

from ..config import DEFAULT_MAX_CHILDREN, MAX_COORDINATE
from ..hilbert import hilbert_index
from ..kernels import box_is_subset, box_point_squared_distance, boxes_overlap


def hilbert_sort_order(
    min_x: np.ndarray, max_x: np.ndarray, min_y: np.ndarray, max_y: np.ndarray
) -> np.ndarray:
    """Order that sorts boxes by Hilbert rank of their centers, scaled
    onto a 2^16 grid over the global bbox (the reference's packing key,
    locus/_core/r.py:112-134, with the degenerate-extent guard)."""
    gmin_x, gmax_x = float(np.min(min_x)), float(np.max(max_x))
    gmin_y, gmax_y = float(np.min(min_y)), float(np.max(max_y))
    ex = 2.0 * (gmax_x - gmin_x) or 1.0
    ey = 2.0 * (gmax_y - gmin_y) or 1.0
    # center*2 = min+max keeps the scale exact without halving
    hx = np.floor(((min_x + max_x) - 2.0 * gmin_x) * (MAX_COORDINATE / ex))
    hy = np.floor(((min_y + max_y) - 2.0 * gmin_y) * (MAX_COORDINATE / ey))
    hx = np.clip(hx, 0, MAX_COORDINATE).astype(np.uint32)
    hy = np.clip(hy, 0, MAX_COORDINATE).astype(np.uint32)
    key = hilbert_index(hx, hy)
    return np.argsort(key, kind="stable")


class PackedRTree:
    """Static packed R-tree over boxes; ``ids`` default to positions."""

    __slots__ = (
        "ids", "bmin_x", "bmax_x", "bmin_y", "bmax_y", "size", "max_children",
        "nmin_x", "nmax_x", "nmin_y", "nmax_y", "child_start", "child_end",
        "is_leaf_parent", "root", "height",
    )

    def __init__(
        self,
        min_x: np.ndarray,
        max_x: np.ndarray,
        min_y: np.ndarray,
        max_y: np.ndarray,
        ids: np.ndarray | None = None,
        max_children: int = DEFAULT_MAX_CHILDREN,
    ):
        n = len(min_x)
        if n == 0:
            raise ValueError("packed R-tree needs at least one box")
        self.size = n
        self.max_children = max_children
        order = (
            hilbert_sort_order(np.asarray(min_x, dtype=np.float64),
                               np.asarray(max_x, dtype=np.float64),
                               np.asarray(min_y, dtype=np.float64),
                               np.asarray(max_y, dtype=np.float64))
            if n > max_children
            else np.arange(n, dtype=np.int64)
        )
        self.bmin_x = np.ascontiguousarray(np.asarray(min_x, dtype=np.float64)[order])
        self.bmax_x = np.ascontiguousarray(np.asarray(max_x, dtype=np.float64)[order])
        self.bmin_y = np.ascontiguousarray(np.asarray(min_y, dtype=np.float64)[order])
        self.bmax_y = np.ascontiguousarray(np.asarray(max_y, dtype=np.float64)[order])
        base_ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids, dtype=np.int64)
        self.ids = base_ids[order]

        # bottom-up packing in contiguous runs of max_children per level
        # (the packing shape of locus/_core/r.py:137-158, array-ified).
        def pack(lmin_x, lmax_x, lmin_y, lmax_y):
            m = len(lmin_x)
            k = -(-m // max_children)  # ceil_division (locus/_core/utils.py:1-2)
            cuts = np.arange(k + 1, dtype=np.int64) * max_children
            cuts[-1] = m
            return (
                np.minimum.reduceat(lmin_x, cuts[:-1]),
                np.maximum.reduceat(lmax_x, cuts[:-1]),
                np.minimum.reduceat(lmin_y, cuts[:-1]),
                np.maximum.reduceat(lmax_y, cuts[:-1]),
                cuts,
            )

        levels = []  # per level: (bboxes..., child cut offsets)
        cur = (self.bmin_x, self.bmax_x, self.bmin_y, self.bmax_y)
        while True:
            *bb, cuts = pack(*cur)
            levels.append((bb, cuts))
            if len(bb[0]) == 1:
                break
            cur = tuple(bb)

        level_sizes = [len(bb[0]) for bb, _ in levels]
        # flat node table: level 0 first; children of level i>0 index into
        # the flat table at the start of level i-1; level-0 children index
        # the leaf arrays directly.
        starts = np.concatenate(([0], np.cumsum(level_sizes)))[:-1]
        child_start, child_end, leaf_parent = [], [], []
        for i, (bb, cuts) in enumerate(levels):
            base = 0 if i == 0 else starts[i - 1]
            child_start.append(cuts[:-1] + base)
            child_end.append(cuts[1:] + base)
            leaf_parent.append(np.full(len(bb[0]), i == 0, dtype=bool))

        self.nmin_x = np.concatenate([bb[0] for bb, _ in levels])
        self.nmax_x = np.concatenate([bb[1] for bb, _ in levels])
        self.nmin_y = np.concatenate([bb[2] for bb, _ in levels])
        self.nmax_y = np.concatenate([bb[3] for bb, _ in levels])
        self.child_start = np.concatenate(child_start)
        self.child_end = np.concatenate(child_end)
        self.is_leaf_parent = np.concatenate(leaf_parent)
        self.root = len(self.nmin_x) - 1  # the last level has exactly 1 node
        self.height = len(levels) + 1  # leaves + node levels

    # -- helpers ------------------------------------------------------------

    def _leaves_below(self, node: int) -> np.ndarray:
        """Positions (into leaf arrays) of every leaf under ``node``."""
        out = []
        stack = [node]
        while stack:
            nd = stack.pop()
            s, e = self.child_start[nd], self.child_end[nd]
            if self.is_leaf_parent[nd]:
                out.append(np.arange(s, e, dtype=np.int64))
            else:
                stack.extend(range(s, e))
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)

    # -- queries ------------------------------------------------------------

    def nearest(self, qx: float, qy: float) -> tuple[int, float]:
        """(id, squared box-point distance); ties -> smallest id."""
        for i, d in self.n_nearest_iter(qx, qy):
            return i, d
        raise ValueError("empty R-tree")

    def n_nearest(self, n: int, qx: float, qy: float) -> list[tuple[int, float]]:
        """n nearest (id, d2) ordered by (d2, id); n >= size returns all
        (fast path parity with locus/r.py:406-410); n <= 0 returns []
        (the len(out) == n break fires only AFTER an append, so a zero
        n used to drain the whole tree)."""
        if n <= 0:
            return []
        if n >= self.size:
            d = box_point_squared_distance(
                self.bmin_x, self.bmax_x, self.bmin_y, self.bmax_y, qx, qy
            )
            order = np.lexsort((self.ids, d))
            return [(int(self.ids[i]), float(d[i])) for i in order]
        out = []
        for item in self.n_nearest_iter(qx, qy):
            out.append(item)
            if len(out) == n:
                break
        return out

    def n_nearest_iter(self, qx: float, qy: float):
        """Incremental best-first traversal yielding (id, d2) in
        (d2, id) order — the engine analog of locus/r.py:613-635.

        Heap entries: (d2, kind, id_or_node); branches (kind=0) expand
        before equal-distance leaves (kind=1) so every tied leaf is in
        the heap before the first leaf pops -> smallest id wins ties.
        """
        heap: list[tuple[float, int, int]] = [
            (
                float(box_point_squared_distance(
                    self.nmin_x[self.root], self.nmax_x[self.root],
                    self.nmin_y[self.root], self.nmax_y[self.root], qx, qy,
                )),
                0,
                self.root,
            )
        ]
        while heap:
            d, kind, ref = heapq.heappop(heap)
            if kind == 1:
                yield ref, float(d)
                continue
            s, e = self.child_start[ref], self.child_end[ref]
            if self.is_leaf_parent[ref]:
                dd = box_point_squared_distance(
                    self.bmin_x[s:e], self.bmax_x[s:e],
                    self.bmin_y[s:e], self.bmax_y[s:e], qx, qy,
                )
                # leaves enter the heap keyed by their public id so that
                # equal-distance leaves pop smallest-id-first
                for j, dj in zip(range(s, e), dd, strict=True):
                    heapq.heappush(heap, (float(dj), 1, int(self.ids[j])))
            else:
                dd = box_point_squared_distance(
                    self.nmin_x[s:e], self.nmax_x[s:e],
                    self.nmin_y[s:e], self.nmax_y[s:e], qx, qy,
                )
                for j, dj in zip(range(s, e), dd, strict=True):
                    heapq.heappush(heap, (float(dj), 0, j))

    def find_subsets(self, min_x: float, max_x: float, min_y: float, max_y: float) -> np.ndarray:
        """ids of stored boxes contained (closed) in the query box.

        Descent: emit whole subtree when node bbox ⊆ query
        (locus/_core/r.py:167-169); recurse only when interiors
        STRICTLY overlap (locus/_core/r.py:170-172).
        """
        out = []
        stack = [self.root]
        while stack:
            nd = stack.pop()
            nb = (self.nmin_x[nd], self.nmax_x[nd], self.nmin_y[nd], self.nmax_y[nd])
            if box_is_subset(nb[0], nb[1], nb[2], nb[3], min_x, max_x, min_y, max_y):
                pos = self._leaves_below(nd)
                out.append(self.ids[pos])
                continue
            if not boxes_overlap(nb[0], nb[1], nb[2], nb[3], min_x, max_x, min_y, max_y):
                continue
            s, e = self.child_start[nd], self.child_end[nd]
            if self.is_leaf_parent[nd]:
                mask = box_is_subset(
                    self.bmin_x[s:e], self.bmax_x[s:e], self.bmin_y[s:e], self.bmax_y[s:e],
                    min_x, max_x, min_y, max_y,
                )
                out.append(self.ids[s:e][mask])
            else:
                stack.extend(range(s, e))
        return np.sort(np.concatenate(out)) if out else np.empty(0, dtype=np.int64)

    def find_supersets(self, min_x: float, max_x: float, min_y: float, max_y: float) -> np.ndarray:
        """ids of stored boxes containing (closed) the query box
        (descent rule of locus/_core/r.py:175-183)."""
        out = []
        stack = [self.root]
        while stack:
            nd = stack.pop()
            if not box_is_subset(
                min_x, max_x, min_y, max_y,
                self.nmin_x[nd], self.nmax_x[nd], self.nmin_y[nd], self.nmax_y[nd],
            ):
                continue
            s, e = self.child_start[nd], self.child_end[nd]
            if self.is_leaf_parent[nd]:
                mask = box_is_subset(
                    min_x, max_x, min_y, max_y,
                    self.bmin_x[s:e], self.bmax_x[s:e], self.bmin_y[s:e], self.bmax_y[s:e],
                )
                out.append(self.ids[s:e][mask])
            else:
                stack.extend(range(s, e))
        return np.sort(np.concatenate(out)) if out else np.empty(0, dtype=np.int64)

    # -- structural checks (for tests) --------------------------------------

    def is_valid(self) -> bool:
        """Every node bbox contains its children's bboxes; every leaf is
        below exactly one level-0 node (mirrors tests/utils.py:44-171)."""
        for nd in range(len(self.nmin_x)):
            s, e = self.child_start[nd], self.child_end[nd]
            if self.is_leaf_parent[nd]:
                cx0, cx1 = self.bmin_x[s:e], self.bmax_x[s:e]
                cy0, cy1 = self.bmin_y[s:e], self.bmax_y[s:e]
            else:
                cx0, cx1 = self.nmin_x[s:e], self.nmax_x[s:e]
                cy0, cy1 = self.nmin_y[s:e], self.nmax_y[s:e]
            if not (
                np.all(self.nmin_x[nd] <= cx0) and np.all(cx1 <= self.nmax_x[nd])
                and np.all(self.nmin_y[nd] <= cy0) and np.all(cy1 <= self.nmax_y[nd])
            ):
                return False
        return True
