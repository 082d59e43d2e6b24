"""Balanced 2-D kd-tree (numpy-backed).

Build semantics match the reference kd build kernel
(locus/_core/kd.py:103-142): stable sort of the active index set by the
current axis, pivot at ``(len - 1) // 2``, axes alternate starting with
x.  Queries reproduce the reference's result contracts (SURVEY.md
§2.6): exact minimal distance for ``nearest``, the multiset of the n
smallest distances for ``n_nearest``, closed-box containment sets for
``find_box`` — with a *documented deterministic tie-break*: smallest
point id wins among equal distances (the reference's winner is
traversal-order-dependent; its own tests only assert distance
equality, tests/kd_tests/test_nearest_item.py:49-50).

Complexities match the reference docstrings: build O(n log^2 n) (sort
per level, same as locus), 1-NN O(log n) expected, range
O(sqrt(n) + hits).
"""

from __future__ import annotations

import heapq

import numpy as np


class KDTree:
    """Static kd-tree over points; ``ids`` default to positions."""

    __slots__ = ("xs", "ys", "ids", "_pt", "_left", "_right", "_root", "size")

    def __init__(self, xs: np.ndarray, ys: np.ndarray, ids: np.ndarray | None = None):
        self.xs = np.ascontiguousarray(xs, dtype=np.float64)
        self.ys = np.ascontiguousarray(ys, dtype=np.float64)
        n = len(self.xs)
        self.size = n
        self.ids = (
            np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids, dtype=np.int64)
        )
        # node arrays: node i stores point index _pt[i]; children _left/_right (-1 = none)
        self._pt = np.full(n, -1, dtype=np.int64)
        self._left = np.full(n, -1, dtype=np.int64)
        self._right = np.full(n, -1, dtype=np.int64)
        self._root = -1
        if n:
            self._root = self._build(np.arange(n, dtype=np.int64), False, 0)[0]

    def _build(self, idx: np.ndarray, is_y: bool, next_node: int) -> tuple[int, int]:
        """Returns (node_id, next free node slot). Iterative-on-stack to
        keep Python recursion bounded: implemented recursively here but
        depth is O(log n) for balanced splits."""
        coords = self.ys if is_y else self.xs
        order = np.argsort(coords[idx], kind="stable")
        idx = idx[order]
        middle = (len(idx) - 1) // 2
        node = next_node
        self._pt[node] = idx[middle]
        next_free = next_node + 1
        if middle > 0:
            left, next_free = self._build(idx[:middle], not is_y, next_free)
            self._left[node] = left
        if middle + 1 < len(idx):
            right, next_free = self._build(idx[middle + 1:], not is_y, next_free)
            self._right[node] = right
        return node, next_free

    # -- queries ------------------------------------------------------------

    def nearest(self, qx: float, qy: float) -> tuple[int, float]:
        """(id, squared_distance) of the nearest point; ties -> smallest id.

        Raises ValueError on an empty tree (parity with locus/kd.py:350-351).
        """
        if self.size == 0:
            raise ValueError("empty kd-tree has no nearest point")
        best_d = np.inf
        best_id = -1
        # stack of (node, is_y)
        stack = [(self._root, False)]
        while stack:
            node, is_y = stack.pop()
            if node < 0:
                continue
            p = self._pt[node]
            dx = self.xs[p] - qx
            dy = self.ys[p] - qy
            d = dx * dx + dy * dy
            pid = self.ids[p]
            if d < best_d or (d == best_d and pid < best_id):
                best_d, best_id = d, pid
            split = self.ys[p] if is_y else self.xs[p]
            q = qy if is_y else qx
            gap = q - split
            near, far = (self._right[node], self._left[node]) if gap > 0 else (
                self._left[node], self._right[node]
            )
            if gap * gap <= best_d and far >= 0:
                stack.append((far, not is_y))
            if near >= 0:
                stack.append((near, not is_y))
        return int(best_id), float(best_d)

    def n_nearest(self, n: int, qx: float, qy: float) -> list[tuple[int, float]]:
        """n nearest (id, squared_distance), ordered by (distance, id).

        ``n >= size`` returns all points (fast path parity with
        locus/kd.py:216-220).
        """
        if n <= 0:
            # an empty bounded heap would raise on heap[0]; zero
            # neighbors is a valid (empty) answer
            return []
        if n >= self.size:
            d = (self.xs - qx) ** 2 + (self.ys - qy) ** 2
            order = np.lexsort((self.ids, d))
            return [(int(self.ids[i]), float(d[i])) for i in order]
        # bounded max-heap of (-d, -id)
        heap: list[tuple[float, float]] = []
        stack = [(self._root, False)]
        while stack:
            node, is_y = stack.pop()
            if node < 0:
                continue
            p = self._pt[node]
            dx = self.xs[p] - qx
            dy = self.ys[p] - qy
            d = dx * dx + dy * dy
            key = (-d, -int(self.ids[p]))
            if len(heap) < n:
                heapq.heappush(heap, key)
            elif key > heap[0]:
                heapq.heapreplace(heap, key)
            split = self.ys[p] if is_y else self.xs[p]
            q = qy if is_y else qx
            gap = q - split
            near, far = (self._right[node], self._left[node]) if gap > 0 else (
                self._left[node], self._right[node]
            )
            if far >= 0 and (len(heap) < n or gap * gap <= -heap[0][0]):
                stack.append((far, not is_y))
            if near >= 0:
                stack.append((near, not is_y))
        out = sorted(((-d, -i) for d, i in heap), key=lambda t: (t[0], t[1]))
        return [(i, float(d)) for d, i in out]

    def find_box(self, min_x: float, max_x: float, min_y: float, max_y: float) -> np.ndarray:
        """ids of points inside the closed box (order: ascending id).

        Closed containment + descend rules per locus/kd.py:496-506.
        """
        out: list[int] = []
        stack = [(self._root, False)]
        while stack:
            node, is_y = stack.pop()
            if node < 0:
                continue
            p = self._pt[node]
            x, y = self.xs[p], self.ys[p]
            if min_x <= x <= max_x and min_y <= y <= max_y:
                out.append(int(self.ids[p]))
            split = y if is_y else x
            lo, hi = (min_y, max_y) if is_y else (min_x, max_x)
            if lo <= split and self._left[node] >= 0:
                stack.append((self._left[node], not is_y))
            if split <= hi and self._right[node] >= 0:
                stack.append((self._right[node], not is_y))
        return np.sort(np.asarray(out, dtype=np.int64))

    # -- structural checks (for tests) --------------------------------------

    def depth(self) -> int:
        def go(node: int) -> int:
            if node < 0:
                return 0
            return 1 + max(go(self._left[node]), go(self._right[node]))
        return go(self._root)

    def is_valid(self) -> bool:
        """BST-per-axis invariant (mirrors tests/utils.py checkers)."""
        ok = True

        def go(node: int, is_y: bool) -> None:
            nonlocal ok
            if node < 0 or not ok:
                return
            coords = self.ys if is_y else self.xs
            split = coords[self._pt[node]]
            for child, side in ((self._left[node], -1), (self._right[node], 1)):
                if child < 0:
                    continue
                sub = self._subtree_points(child)
                vals = coords[sub]
                if side < 0 and not np.all(vals <= split):
                    ok = False
                if side > 0 and not np.all(vals >= split):
                    ok = False
                go(child, not is_y)

        go(self._root, False)
        return ok

    def _subtree_points(self, node: int) -> np.ndarray:
        out = []
        stack = [node]
        while stack:
            nd = stack.pop()
            if nd < 0:
                continue
            out.append(self._pt[nd])
            stack.append(self._left[nd])
            stack.append(self._right[nd])
        return np.asarray(out, dtype=np.int64)
