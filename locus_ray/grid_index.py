"""Batched kNN engine: vectorized ring expansion over grid-cell buckets.

This is the engine's distributed answer to the reference's per-query
best-first heap searches (locus/kd.py:320-374, locus/r.py:557-635,
locus/segmental.py:477-737): instead of walking a pointer tree per
query row, a whole Arrow batch of query points advances through
Chebyshev rings of grid cells, scoring *all* candidates of a ring with
one vectorized kernel call and merging into running per-point top-k
arrays with one lexsort.  No Python loop over rows — the only loop is
over rings (a handful of iterations for realistic densities).

Correctness bound: after searching ring r (all cells within Chebyshev
distance r of a point's home cell), any unseen geometry lies in a cell
at Chebyshev >= r+1 and therefore at squared distance >=
(r * min(cell_w, cell_h))^2 from the point; a point is finished once
it holds k candidates whose worst distance is <= that bound.  This is
the ring-expansion re-probe invariant promised in SURVEY.md §7.6.

The same engine serves build sides of points (doc->doc kNN, K1/K2),
boxes (doc->zone kNN, R1/R2), and segments (snap-to-network, S3/S4) —
only the scorer differs.  Ties break on smallest id (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Callable, Literal

import numpy as np

from .cells import cover_boxes, grid_coords
from .config import SQUARE_SIZE, WORLD_H, WORLD_MIN_X, WORLD_MIN_Y, WORLD_W
from .kernels import (
    box_point_squared_distance,
    points_squared_distance,
    segment_point_squared_distance,
)


class GridKnn:
    """Build-once/query-many grid index over points, boxes or segments.

    Designed to be built once per actor (``__init__`` of a map_batches
    actor class) from a broadcast (``ray.put``) payload of numpy
    arrays, then probed per batch.
    """

    def __init__(
        self,
        kind: Literal["point", "box", "segment"],
        geoms: dict[str, np.ndarray],
        ids: np.ndarray,
        res: int,
    ):
        self.kind = kind
        self.ids = np.asarray(ids, dtype=np.int64)
        self.res = res
        self.n_cells_axis = 1 << res
        self.cell_w = WORLD_W / self.n_cells_axis
        self.cell_h = WORLD_H / self.n_cells_axis
        self.g = {k: np.asarray(v, dtype=np.float64) for k, v in geoms.items()}

        if kind == "point":
            ix, iy = grid_coords(self.g["x"], self.g["y"])
            shift = 16 - res
            row_idx = np.arange(len(self.ids), dtype=np.int64)
            cells = (ix >> shift) * self.n_cells_axis + (iy >> shift)
        elif kind == "box":
            row_idx, cells = cover_boxes(
                self.g["min_x"], self.g["max_x"], self.g["min_y"], self.g["max_y"], res
            )
        else:  # segment: cover by endpoint bbox (conservative and exact for refine)
            row_idx, cells = cover_boxes(
                np.minimum(self.g["start_x"], self.g["end_x"]),
                np.maximum(self.g["start_x"], self.g["end_x"]),
                np.minimum(self.g["start_y"], self.g["end_y"]),
                np.maximum(self.g["start_y"], self.g["end_y"]),
                res,
            )

        # CSR-style cell buckets: sorted unique cells + offsets into members
        order = np.argsort(cells, kind="stable")
        self._bucket_cells, starts = np.unique(cells[order], return_index=True)
        self._bucket_offsets = np.append(starts, len(cells))
        self._bucket_members = row_idx[order]

    # -- scoring -------------------------------------------------------------

    def _score(self, pos: np.ndarray, qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
        g = self.g
        if self.kind == "point":
            return points_squared_distance(g["x"][pos], g["y"][pos], qx, qy)
        if self.kind == "box":
            return box_point_squared_distance(
                g["min_x"][pos], g["max_x"][pos], g["min_y"][pos], g["max_y"][pos], qx, qy
            )
        return segment_point_squared_distance(
            g["start_x"][pos], g["start_y"][pos], g["end_x"][pos], g["end_y"][pos], qx, qy
        )

    # -- bucket lookup -------------------------------------------------------

    def _candidates_for_cells(self, cell_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(query_row_of_cell, member_pos) pairs for a flat list of cells
        (cell_ids[i] belongs to query row given by caller alignment)."""
        loc = np.searchsorted(self._bucket_cells, cell_ids)
        loc_clipped = np.minimum(loc, len(self._bucket_cells) - 1)
        hit = self._bucket_cells[loc_clipped] == cell_ids
        counts = np.where(
            hit,
            self._bucket_offsets[loc_clipped + 1] - self._bucket_offsets[loc_clipped],
            0,
        )
        total = int(counts.sum())
        src = np.repeat(np.arange(len(cell_ids), dtype=np.int64), counts)
        if total == 0:
            return src, np.empty(0, dtype=np.int64)
        starts = self._bucket_offsets[loc_clipped]
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)
        member_idx = np.repeat(starts, counts) + local
        return src, self._bucket_members[member_idx]

    # -- query ---------------------------------------------------------------

    def query(
        self, qx: np.ndarray, qy: np.ndarray, k: int, max_ring: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k (ids, squared distances) per query point.

        Returns ``(ids[n, k], d2[n, k])`` padded with (-1, inf) when the
        build side has fewer than k geometries.
        """
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        n = len(qx)
        if max_ring is None:
            max_ring = self.n_cells_axis  # full sweep worst case
        ix, iy = grid_coords(qx, qy)
        shift = 16 - self.res
        hcx = (ix >> shift).astype(np.int64)
        hcy = (iy >> shift).astype(np.int64)

        best_id = np.full((n, k), -1, dtype=np.int64)
        best_d = np.full((n, k), np.inf, dtype=np.float64)
        n_found = np.zeros(n, dtype=np.int64)

        active = np.arange(n, dtype=np.int64)
        min_cell = min(self.cell_w, self.cell_h)
        ring = 0
        while len(active) and ring <= max_ring:
            # cells at Chebyshev distance exactly `ring` from each active home
            acx = hcx[active]
            acy = hcy[active]
            if ring == 0:
                rows = np.arange(len(active), dtype=np.int64)
                cand_cx = acx
                cand_cy = acy
            else:
                offs = _ring_offsets(ring)
                rows = np.repeat(np.arange(len(active), dtype=np.int64), len(offs))
                cand_cx = (acx[:, None] + offs[:, 0][None, :]).ravel()
                cand_cy = (acy[:, None] + offs[:, 1][None, :]).ravel()
                valid = (
                    (cand_cx >= 0) & (cand_cx < self.n_cells_axis)
                    & (cand_cy >= 0) & (cand_cy < self.n_cells_axis)
                )
                rows = rows[valid]
                cand_cx = cand_cx[valid]
                cand_cy = cand_cy[valid]
            cell_ids = cand_cx * self.n_cells_axis + cand_cy
            src_row, pos = self._candidates_for_cells(cell_ids)
            q_row = rows[src_row]  # index into `active`

            if len(pos):
                d2 = self._score(pos, qx[active][q_row], qy[active][q_row])
                cand_ids = self.ids[pos]
                # merge candidates with current best: flatten current best
                # (found entries are packed left, so the mask is row-prefix)
                cur_mask = best_id[active] >= 0
                cur_rows = np.repeat(
                    np.arange(len(active), dtype=np.int64), n_found[active]
                )
                flat_best_id = best_id[active][cur_mask]
                flat_best_d = best_d[active][cur_mask]

                all_rows = np.concatenate((cur_rows, q_row))
                all_ids = np.concatenate((flat_best_id, cand_ids))
                all_d = np.concatenate((flat_best_d, d2))
                order = np.lexsort((all_ids, all_d, all_rows))
                all_rows = all_rows[order]
                all_ids = all_ids[order]
                all_d = all_d[order]
                # drop duplicate (row, id) pairs (box seen via several cells)
                if len(all_rows) > 1:
                    dup = np.zeros(len(all_rows), dtype=bool)
                    dup[1:] = (all_rows[1:] == all_rows[:-1]) & (all_ids[1:] == all_ids[:-1])
                    keep_first = ~dup
                    all_rows = all_rows[keep_first]
                    all_ids = all_ids[keep_first]
                    all_d = all_d[keep_first]
                # rank within row, keep rank < k
                row_start = np.searchsorted(all_rows, np.arange(len(active)))
                rank = np.arange(len(all_rows)) - row_start[all_rows]
                keep = rank < k
                kr = all_rows[keep]
                kk = rank[keep]
                bd = np.full((len(active), k), np.inf)
                bi = np.full((len(active), k), -1, dtype=np.int64)
                bi[kr, kk] = all_ids[keep]
                bd[kr, kk] = all_d[keep]
                best_id[active] = bi
                best_d[active] = bd
                n_found[active] = np.bincount(kr, minlength=len(active))

            # retire points that are provably done
            if ring >= 1:
                bound = (ring * min_cell) ** 2
                done = (n_found[active] >= min(k, self.size)) & (
                    best_d[active][:, min(k, self.size) - 1] <= bound
                )
                active = active[~done]
            ring += 1
        return best_id, best_d

    @property
    def size(self) -> int:
        return len(self.ids)


def _ring_offsets(r: int) -> np.ndarray:
    """(dx, dy) offsets of the square ring at Chebyshev distance r."""
    side = np.arange(-r, r + 1, dtype=np.int64)
    top = np.stack((side, np.full_like(side, -r)), axis=1)
    bot = np.stack((side, np.full_like(side, r)), axis=1)
    mid = np.arange(-r + 1, r, dtype=np.int64)
    left = np.stack((np.full_like(mid, -r), mid), axis=1)
    right = np.stack((np.full_like(mid, r), mid), axis=1)
    return np.concatenate((top, bot, left, right))


class GridContain:
    """Batched point->containing-boxes lookup (the R4 'which zones
    contain this doc' shape, locus/r.py:307-353, distributed).

    Two-level semantics per the north rule: cell prefilter (cover
    buckets) then exact closed containment refine
    (locus/_core/box.py:21-27 semantics).  A box covers each cell at
    most once and a point has one home cell, so candidate pairs are
    already unique — no dedup pass needed.
    """

    def __init__(self, geoms: dict[str, np.ndarray], ids: np.ndarray, res: int):
        self.ids = np.asarray(ids, dtype=np.int64)
        self.res = res
        self.n_cells_axis = 1 << res
        self.g = {k: np.asarray(v, dtype=np.float64) for k, v in geoms.items()}
        row_idx, cells = cover_boxes(
            self.g["min_x"], self.g["max_x"], self.g["min_y"], self.g["max_y"], res
        )
        order = np.argsort(cells, kind="stable")
        self._bucket_cells, starts = np.unique(cells[order], return_index=True)
        self._bucket_offsets = np.append(starts, len(cells))
        self._bucket_members = row_idx[order]

    def query(self, qx: np.ndarray, qy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(query_row, box_id) pairs where box contains point (closed)."""
        from .kernels import contains_point

        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        ix, iy = grid_coords(qx, qy)
        shift = 16 - self.res
        cell_ids = (ix >> shift) * self.n_cells_axis + (iy >> shift)

        loc = np.searchsorted(self._bucket_cells, cell_ids)
        loc_clipped = np.minimum(loc, max(len(self._bucket_cells) - 1, 0))
        hit = (
            self._bucket_cells[loc_clipped] == cell_ids
            if len(self._bucket_cells)
            else np.zeros(len(cell_ids), dtype=bool)
        )
        counts = np.where(
            hit,
            self._bucket_offsets[loc_clipped + 1] - self._bucket_offsets[loc_clipped],
            0,
        )
        total = int(counts.sum())
        src = np.repeat(np.arange(len(qx), dtype=np.int64), counts)
        if total == 0:
            return src, np.empty(0, dtype=np.int64)
        starts = self._bucket_offsets[loc_clipped]
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)
        pos = self._bucket_members[np.repeat(starts, counts) + local]

        g = self.g
        ok = contains_point(
            g["min_x"][pos], g["max_x"][pos], g["min_y"][pos], g["max_y"][pos],
            qx[src], qy[src],
        )
        return src[ok], self.ids[pos[ok]]
