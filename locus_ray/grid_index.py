"""Batched kNN / containment engines over grid-cell buckets.

This is the engine's distributed answer to the reference's per-query
best-first heap searches (locus/kd.py:320-374, locus/r.py:557-635,
locus/segmental.py:477-737): instead of walking a pointer tree per
query row, a whole Arrow batch of query points is resolved with a few
fully-vectorized passes — no Python loop over rows.

Two-population design (the skew answer for "one huge zone covers half
the world"):

* geometries whose cell cover at the working resolution exceeds
  ``LARGE_COVER_CELLS`` go to a **dense side**: they are few by
  construction, and every batch scores them with ONE broadcast kernel
  call (a (batch x n_large) matrix) — far cheaper than letting them
  inflate every cell bucket;
* everything else lives in **CSR cell buckets** probed by Chebyshev
  ring expansion in geometrically growing world-radius rounds
  ([0..1], (1..3], (3..7] cells...), so most points finish after one
  gather+merge pass.

Correctness bound (ring-expansion invariant, SURVEY.md §7.6): after a
round of world radius R the dense side is fully scored and every
unseen bucket geometry lies only in cells at Chebyshev > r = ceil(R /
min_cell), hence at squared distance >= (r * min_cell)^2 >= R^2; a
point retires once it holds k candidates at or below that bound.

The same engine serves build sides of points (doc->doc kNN, K1/K2),
boxes (doc->zone kNN, R1/R2), and segments (snap-to-network, S3/S4) —
only the scorer differs.  Ties break on smallest id (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Literal

import numpy as np

from .config import WORLD_H, WORLD_MIN_X, WORLD_MIN_Y, WORLD_W
from .kernels import (
    box_point_squared_distance,
    contains_point,
    points_squared_distance,
    segment_point_squared_distance,
)

LARGE_COVER_CELLS = 64    # cover bigger than this -> dense side
# Point cells denser than this move to the cluster-local fine level.
# The bucket res targets ~1-2 members/cell, so 128 is still ~100x over
# target — far above any uniform-density fluctuation — while catching
# the hot-cluster FRINGE cells (129-512 members) that the round-3
# value of 512 left in the cold buckets: those made every in-cluster
# query gather its whole neighborhood at fringe density (measured on
# the 1M bench corpus, k=4: cluster queries scored 344 main-ring
# candidates/query at 512 vs 2.8 at 128 with the excess moving to the
# self-paced fine level at ~44/query; overall candidate volume 113 ->
# 42 per query, interleaved same-process wall ratio 1.86x).
HOT_CELL_MEMBERS = 128
HOT_RING_CAP = 64         # fine-level ring cap before the bounded dump


def _next_main_ring(r: int) -> int:
    """Main-level ring schedule: the next swept Chebyshev radius.

    Linear while close (1,2,3,4), geometric after (8,16,...).  The
    density-adaptive bucket res puts the kth neighbor 1-3 cells out
    for most query rows, where the old pure-geometric 1,3,7 schedule
    overshot: rows needing ring 2 gathered rings 2-3 (40 cells for
    16).  Measured on the 1M bench corpus (k=4): uniform-region
    scored candidates 37 -> 22.9/query, segment probes 29.6 ->
    20.5/query, identical outputs, 1.34x interleaved wall on the
    mixed stream.  Geometric growth after ring 4 keeps the
    empty-region worst case (sparse build sides, out-of-world
    queries) at O(log axis) rounds."""
    return r + 1 if r < 4 else 2 * r


def _merge_topk(active, q_row, cand_ids, d2, best_id, best_d, n_found,
                k: int) -> None:
    """Fold new ``(q_row, cand_ids, d2)`` candidates into the running
    per-row top-k (``best_id``/``best_d``/``n_found``, mutated in place
    at the ``active`` rows): concat with the current winners, lexsort
    by (row, d2, id) — ties by smallest id, SURVEY.md §2.6 — drop
    adjacent duplicate (row, id) entries, keep rank < k, scatter back.
    Shared by GridKnn.query and SegSegGridKnn.query (one copy so a
    tie-break or bound fix can never drift between the kinds)."""
    cur_rows = np.repeat(np.arange(len(active), dtype=np.int64),
                         n_found[active])
    cur_mask = best_id[active] >= 0
    all_rows = np.concatenate((cur_rows, q_row))
    all_ids = np.concatenate((best_id[active][cur_mask], cand_ids))
    all_d = np.concatenate((best_d[active][cur_mask], d2))
    order = np.lexsort((all_ids, all_d, all_rows))
    all_rows = all_rows[order]
    all_ids = all_ids[order]
    all_d = all_d[order]
    if len(all_rows) > 1:
        keep = np.ones(len(all_rows), dtype=bool)
        keep[1:] = ~((all_rows[1:] == all_rows[:-1])
                     & (all_ids[1:] == all_ids[:-1]))
        all_rows, all_ids, all_d = all_rows[keep], all_ids[keep], all_d[keep]
    row_start = np.searchsorted(all_rows, np.arange(len(active)))
    rank = np.arange(len(all_rows)) - row_start[all_rows]
    sel = rank < k
    kr = all_rows[sel]
    kcol = rank[sel]
    bi = np.full((len(active), k), -1, dtype=np.int64)
    bd = np.full((len(active), k), np.inf)
    bi[kr, kcol] = all_ids[sel]
    bd[kr, kcol] = all_d[sel]
    best_id[active] = bi
    best_d[active] = bd
    n_found[active] = np.bincount(kr, minlength=len(active))


def _require_nondegenerate_segments(g: dict[str, np.ndarray]) -> None:
    """Segment build sides must have distinct endpoints (the reference
    contract — locus segments are constructed from two distinct points,
    reference locus/segmental.py; and kernels.segment_point_squared_
    distance's ``t = ·/len2`` yields 0/0 = NaN on a zero-length
    segment, which would silently poison the top-k merge ordering and
    the ring-retirement bound instead of failing loudly)."""
    dx = g["end_x"] - g["start_x"]
    dy = g["end_y"] - g["start_y"]
    bad = (dx == 0.0) & (dy == 0.0)
    if bad.any():
        raise ValueError(
            f"{int(bad.sum())} degenerate (zero-length) segment(s) in the "
            "build side; segments require distinct endpoints")


def _bbox_of(kind: str, g: dict[str, np.ndarray]):
    if kind == "point":
        return g["x"], g["x"], g["y"], g["y"]
    if kind == "box":
        return g["min_x"], g["max_x"], g["min_y"], g["max_y"]
    return (
        np.minimum(g["start_x"], g["end_x"]),
        np.maximum(g["start_x"], g["end_x"]),
        np.minimum(g["start_y"], g["end_y"]),
        np.maximum(g["start_y"], g["end_y"]),
    )


class _Buckets:
    """CSR cell -> member-position buckets at one resolution.

    ``extent=(x0, y0, w, h)`` anchors the grid to a LOCAL box instead
    of the world — the hot-cluster level uses this so an arbitrarily
    TIGHT cluster (geographic extent << one world cell at the max
    world-anchored res) still resolves to ~density-matched cells; the
    round-2 world-anchored fine level capped out at res 14 and
    degenerated to one cell for such clusters (VERDICT r2 missing #3).
    """

    __slots__ = ("axis", "cells", "offsets", "members", "x0", "y0", "w", "h")

    def __init__(self, res: int, mnx, mxx, mny, mxy, rows: np.ndarray,
                 extent: tuple | None = None):
        self.axis = 1 << res
        if extent is None:
            self.x0, self.y0 = WORLD_MIN_X, WORLD_MIN_Y
            self.w, self.h = WORLD_W, WORLD_H
        else:
            self.x0, self.y0, self.w, self.h = extent
        if len(rows) == 0:
            self.cells = np.empty(0, dtype=np.int64)
            self.offsets = np.zeros(1, dtype=np.int64)
            self.members = np.empty(0, dtype=np.int64)
            return
        cx_lo = np.clip(np.floor((mnx - self.x0) / self.w * self.axis), 0, self.axis - 1).astype(np.int64)
        cx_hi = np.clip(np.floor((mxx - self.x0) / self.w * self.axis), 0, self.axis - 1).astype(np.int64)
        cy_lo = np.clip(np.floor((mny - self.y0) / self.h * self.axis), 0, self.axis - 1).astype(np.int64)
        cy_hi = np.clip(np.floor((mxy - self.y0) / self.h * self.axis), 0, self.axis - 1).astype(np.int64)
        nx = cx_hi - cx_lo + 1
        ny = cy_hi - cy_lo + 1
        counts = nx * ny
        total = int(counts.sum())
        out_rows = np.repeat(rows, counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        ny_r = np.repeat(ny, counts)
        cx = np.repeat(cx_lo, counts) + local // ny_r
        cy = np.repeat(cy_lo, counts) + local % ny_r
        cells = cx * self.axis + cy
        order = np.argsort(cells, kind="stable")
        self.cells, idx = np.unique(cells[order], return_index=True)
        self.offsets = np.append(idx, len(cells))
        self.members = out_rows[order]

    @classmethod
    def from_points(cls, res: int, x: np.ndarray, y: np.ndarray,
                    rows: np.ndarray, extent: tuple | None = None):
        """Point-only constructor: every member covers exactly one
        cell, so the CSR build is one argsort — none of the box-cover
        repeat/cumsum explosion (3 of those dominated the 1M-point
        index build)."""
        b = cls.__new__(cls)
        b.axis = 1 << res
        if extent is None:
            b.x0, b.y0 = WORLD_MIN_X, WORLD_MIN_Y
            b.w, b.h = WORLD_W, WORLD_H
        else:
            b.x0, b.y0, b.w, b.h = extent
        if len(rows) == 0:
            b.cells = np.empty(0, dtype=np.int64)
            b.offsets = np.zeros(1, dtype=np.int64)
            b.members = np.empty(0, dtype=np.int64)
            return b
        cx = np.clip(np.floor((x - b.x0) / b.w * b.axis),
                     0, b.axis - 1).astype(np.int64)
        cy = np.clip(np.floor((y - b.y0) / b.h * b.axis),
                     0, b.axis - 1).astype(np.int64)
        cells = cx * b.axis + cy
        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        b.cells, idx = np.unique(sc, return_index=True)
        b.offsets = np.append(idx, len(sc))
        b.members = rows[order]
        return b

    def lookup(self, cell_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(caller_row, member_position) pairs for flat cell ids."""
        if not len(self.cells) or not len(cell_ids):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        loc = np.searchsorted(self.cells, cell_ids)
        loc_c = np.minimum(loc, len(self.cells) - 1)
        hit = self.cells[loc_c] == cell_ids
        counts = np.where(hit, self.offsets[loc_c + 1] - self.offsets[loc_c], 0)
        total = int(counts.sum())
        src = np.repeat(np.arange(len(cell_ids), dtype=np.int64), counts)
        if total == 0:
            return src, np.empty(0, dtype=np.int64)
        starts = self.offsets[loc_c]
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        return src, self.members[np.repeat(starts, counts) + local]


class GridKnn:
    """Build-once/query-many grid index over points, boxes or segments.

    Built once per actor (``__init__`` of a map_batches actor class)
    from a broadcast (``ray.put``) payload of numpy arrays, then probed
    per batch.
    """

    def __init__(
        self,
        kind: Literal["point", "box", "segment"],
        geoms: dict[str, np.ndarray],
        ids: np.ndarray,
        res: int,
        context=None,
    ):
        from .context import get_context

        self.ctx = get_context(context)
        self.kind = kind
        self.ids = np.asarray(ids, dtype=np.int64)
        n = len(self.ids)
        # density-adaptive bucket resolution: ~1-4 geometries per cell.
        # A sparse build side at a fine grid forces many empty expansion
        # rounds (each annulus grows quadratically); `res` only caps the
        # resolution, it does not force it.  Results are exact at any
        # resolution — this is purely a probe-cost knob.
        dens_res = max(2, int(round(np.log2(max(n, 2)) / 2)) + 1)
        if kind == "point":
            # bare points don't inflate bucket density via multi-cell
            # covers; for them the caller's res is IGNORED (it is a
            # partitioning knob, not a probe-cost one) so dense point
            # layers can bucket fine enough for ~1-2 members per cell —
            # a cap at the partition res left ring-1 gathers 20x
            # oversized for corpus-scale build sides
            res = min(max(2, dens_res - 1), 12)
        else:
            res = min(res, dens_res)
        self.res = res
        self.n_cells_axis = 1 << res
        self.cell_w = WORLD_W / self.n_cells_axis
        self.cell_h = WORLD_H / self.n_cells_axis
        self.g = {k: np.asarray(v, dtype=np.float64) for k, v in geoms.items()}
        if kind == "segment":
            _require_nondegenerate_segments(self.g)

        mnx, mxx, mny, mxy = _bbox_of(kind, self.g)
        rows = np.arange(n, dtype=np.int64)
        if kind == "point":
            # dedicated build path: points cover exactly one cell, so
            # hot-cell classification is one bincount over flat cell
            # ids and every bucket level uses the argsort-only
            # _Buckets.from_points — the generic path built (and then
            # DISCARDED) a full box-cover CSR just to find hot cells
            self.large_pos = rows[:0]
            self.hot_buckets = None
            x, y = self.g["x"], self.g["y"]
            cold_rows = rows
            if n > 4 * HOT_CELL_MEMBERS:
                axis = self.n_cells_axis
                cx = np.clip(np.floor((x - WORLD_MIN_X) / WORLD_W * axis),
                             0, axis - 1).astype(np.int64)
                cy = np.clip(np.floor((y - WORLD_MIN_Y) / WORLD_H * axis),
                             0, axis - 1).astype(np.int64)
                cells_all = cx * axis + cy
                sizes = np.bincount(cells_all)
                hot_mask = sizes[cells_all] > HOT_CELL_MEMBERS
                if hot_mask.any():
                    cold_rows = rows[~hot_mask]
                    # world bbox of hot members: gap distance to it
                    # lower-bounds distance to ANY hot member — O(1)
                    # per query row
                    xh, yh = x[hot_mask], y[hot_mask]
                    self._hot_world = (float(xh.min()), float(xh.max()),
                                       float(yh.min()), float(yh.max()))
                    # CLUSTER-LOCAL fine grid: anchored to the
                    # hot-member bbox (not the world), res sized so
                    # occupied cells hold ~8 members under UNIFORM
                    # in-cluster density — an arbitrarily tight
                    # cluster therefore always splits (round-2's
                    # world-anchored level capped at res 14 and left
                    # tiny clusters in a single cell)
                    n_hot = int(hot_mask.sum())
                    ex0, ex1, ey0, ey1 = self._hot_world
                    extent = (ex0, ey0, max(ex1 - ex0, 1e-12),
                              max(ey1 - ey0, 1e-12))
                    res_h = int(np.clip(
                        np.ceil(np.log2(max(np.sqrt(n_hot / 8.0), 2.0))),
                        2, 12))
                    self._hot_res = res_h
                    self._hot_extent = extent
                    self.hot_buckets = _Buckets.from_points(
                        res_h, xh, yh, rows[hot_mask], extent=extent)
                    self.hot_members = rows[hot_mask]
                    self._hot_bbox = self._occupied_bbox(self.hot_buckets)
                    # per-k dominance-truncated hot levels (_hot_level)
                    self._hot_k_cache = {}
            self.buckets = _Buckets.from_points(
                res, x[cold_rows], y[cold_rows], cold_rows)
            self._g32 = None
            return
        else:
            nx = np.floor((mxx - WORLD_MIN_X) / WORLD_W * self.n_cells_axis) - np.floor(
                (mnx - WORLD_MIN_X) / WORLD_W * self.n_cells_axis
            ) + 1
            ny = np.floor((mxy - WORLD_MIN_Y) / WORLD_H * self.n_cells_axis) - np.floor(
                (mny - WORLD_MIN_Y) / WORLD_H * self.n_cells_axis
            ) + 1
            large = (nx * ny) > LARGE_COVER_CELLS
        self.large_pos = rows[large]
        small = ~large
        self.buckets = _Buckets(res, mnx[small], mxx[small], mny[small], mxy[small],
                                rows[small])
        # float32 shadow copy for the fast path's pre-score pass (halves
        # the gather traffic on the bandwidth-bound scoring; results are
        # always confirmed in float64)
        self._g32 = None
        if kind == "box" and self.ctx.uses_euclidean_bounds:
            self._g32 = {k_: v.astype(np.float32) for k_, v in self.g.items()}

        # hot-cell sub-bucketing applies to the point kind only and is
        # handled entirely in the dedicated point branch above
        self.hot_buckets = None

    @property
    def size(self) -> int:
        return len(self.ids)

    @staticmethod
    def _occupied_bbox(b: _Buckets) -> tuple[int, int, int, int]:
        cx = b.cells // b.axis
        cy = b.cells % b.axis
        return (int(cx.min()), int(cx.max()), int(cy.min()), int(cy.max()))

    def _hot_level(self, kk: int) -> tuple[_Buckets, np.ndarray, tuple]:
        """(buckets, member rows, occupied-cell bbox) of the hot level
        with per-EXACT-COORDINATE dominance truncation for this kk.

        Members sharing one exact coordinate are equidistant from every
        query in any point metric, so only the kk smallest-id ones can
        appear in any top-kk (smallest-id tie-break) — the rest are
        dominated and dropped from rings AND the bounded dump.  This is
        what keeps the fully-degenerate cluster (10^5 docs at ONE
        landmark coordinate — no grid can split it) linear: its level
        holds kk members, not 10^5.  Callers that post-filter a
        self-match already ask for k+1, so the headroom composes.
        Cached per kk (per-actor lazy state, like _ensure_cell_bounds).
        """
        got = self._hot_k_cache.get(kk)
        if got is not None:
            return got
        rows = self.hot_members
        x, y, ids = self.g["x"][rows], self.g["y"][rows], self.ids[rows]
        order = np.lexsort((ids, y, x))
        xs, ys = x[order], y[order]
        newc = np.empty(len(order), dtype=bool)
        newc[:1] = True
        newc[1:] = (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])
        starts = np.flatnonzero(newc)
        rank = np.arange(len(order), dtype=np.int64) - starts[np.cumsum(newc) - 1]
        keep = rank < kk
        if keep.all():
            got = (self.hot_buckets, self.hot_members, self._hot_bbox)
        else:
            rows_k = np.sort(rows[order][keep])
            xk, yk = self.g["x"][rows_k], self.g["y"][rows_k]
            b = _Buckets.from_points(self._hot_res, xk, yk, rows_k,
                                     extent=self._hot_extent)
            got = (b, rows_k, self._occupied_bbox(b))
        self._hot_k_cache[kk] = got
        return got

    # -- per-cell bounds: kth-distance ceiling + dense prefilter -------------

    def _ensure_cell_bounds(self, k: int) -> bool:
        """Precompute, per (coarse) filter cell:

        * ``U_all(c)`` — an upper bound on any in-cell point's k-th
          nearest distance, from the k-th smallest of per-geometry
          worst-case distances ``u(c, g) = max_{p in c} d(p, g)``
          (rect-vs-rect worst gap for boxes/points; worst distance to
          one endpoint for segments — both are valid upper bounds of
          the true geometry distance).  Candidates scored above
          ``U_all`` can NEVER be in the top-k (strict), so query()
          drops them before the expensive merge.  Computed over a
          sample of at most ``_BOUND_SAMPLE`` geometries — a subset's
          k-th statistic is >= the full set's, so sampling only
          loosens, never breaks, the bound.
        * the dense-side relevant lists (box kind): dense geometries
          with ``d_min(c, z) > U_all(c)`` are excluded per cell.

        Built once with a k-ceiling (max(k, 8)): the 8th-distance bound
        is a valid (looser) ceiling for any k <= 8, so pools with
        different small k share one build.
        """
        if getattr(self, "_bounds_k", 0) >= k:
            return self._have_bounds
        if (len(self.ids) == 0 or self.kind == "segment"
                or not self.ctx.uses_euclidean_bounds):
            # empty build sides take the no-bounds path too: there is
            # no kth distance to ceiling (np.partition on a 0-wide
            # axis raised), and the ring loop already terminates on
            # empty buckets returning the padded (-1, inf) contract
            # the cheap per-segment upper bound (endpoint distance) is
            # too loose to pay for itself; segments skip the ceiling
            self._bounds_k = 1 << 30
            self._have_bounds = False
            self._dense_lists = False
            return False
        k = max(k, 8)
        # cap the bounds-grid so the once-per-actor list build stays
        # O(256M) cell x geometry evaluations even for huge build sides
        # (coarser cells only loosen the lists, never break them)
        budget = 268_435_456
        n_geoms = len(self.ids)
        f_cap = max(2, int(np.log2(max(budget // max(n_geoms, 1), 4))) // 2)
        f_res = min(self.res, 6, f_cap)
        axis = 1 << f_res
        f_w = WORLD_W / axis
        f_h = WORLD_H / axis
        n_cells = axis * axis

        mnx, mxx, mny, mxy = _bbox_of(self.kind, self.g)
        n = len(self.ids)
        # Subset kth >= full kth, so ANY sample gives a valid ceiling —
        # but tightness tracks coverage (a kth over an m-sample is only
        # the ~(k*n/m)th-tightest of the full set).  20k covers the
        # dimension-scale build layers exactly; larger builds pay one
        # n_cells x 20k pass (~82M evals at f_res 6), still once per
        # index.
        _BOUND_SAMPLE = 20000
        if n > _BOUND_SAMPLE:
            # seeded uniform sample — NOT a fixed stride, which can
            # alias with periodic structure in the build side (e.g. a
            # stride that is a multiple of the hot-cluster id period
            # samples ONLY cluster members, making U_all world-sized)
            sel = np.random.default_rng(0x5EED).choice(
                n, _BOUND_SAMPLE, replace=False)
            sel.sort()
        else:
            sel = np.arange(n)
        s_mnx, s_mxx = mnx[sel], mxx[sel]
        s_mny, s_mxy = mny[sel], mxy[sel]
        kk = min(k, len(sel))

        cell_ids_all = np.arange(n_cells, dtype=np.int64)
        ccx = cell_ids_all // axis
        ccy = cell_ids_all % axis
        c_mnx = WORLD_MIN_X + ccx * f_w
        c_mxx = c_mnx + f_w
        c_mny = WORLD_MIN_Y + ccy * f_h
        c_mxy = c_mny + f_h

        u_all = np.empty(n_cells, dtype=np.float64)
        chunk = max(1, 8_388_608 // max(len(sel), 1))
        for s in range(0, n_cells, chunk):
            e = min(s + chunk, n_cells)
            # worst-case per-axis gap between cell rect and geometry
            # upper-bound rect (max over p in cell of min-dist to rect,
            # PLUS the rect's own extent cannot reduce it: for boxes
            # u = max-gap formula on the box itself is exact)
            fx = np.maximum(np.maximum(s_mnx[None, :] - c_mnx[s:e, None],
                                       c_mxx[s:e, None] - s_mxx[None, :]), 0.0)
            fy = np.maximum(np.maximum(s_mny[None, :] - c_mny[s:e, None],
                                       c_mxy[s:e, None] - s_mxy[None, :]), 0.0)
            dmax = fx * fx + fy * fy
            u_all[s:e] = np.partition(dmax, kk - 1, axis=1)[:, kk - 1]

        self._u_all = u_all
        self._df_res = f_res

        # COMPLETE per-cell candidate lists (box kind): every zone whose
        # min-distance to the cell is <= U_all(cell) — by the U_all
        # argument this list contains the exact top-k candidate set of
        # every in-cell point for any k <= bounds_k, so in-world box
        # queries resolve in ONE gather+score+merge pass with no ring
        # expansion at all.  List sizes are O(local zone density), the
        # same volume rings would gather, minus the annulus machinery.
        if self.kind == "box":
            z_mnx = self.g["min_x"]
            z_mxx = self.g["max_x"]
            z_mny = self.g["min_y"]
            z_mxy = self.g["max_y"]
            members = []
            cells_of = []
            fulls = []
            chunk = max(1, 8_388_608 // max(n, 1))
            for s in range(0, n_cells, chunk):
                e = min(s + chunk, n_cells)
                gx = np.maximum(np.maximum(z_mnx[None, :] - c_mxx[s:e, None],
                                           c_mnx[s:e, None] - z_mxx[None, :]), 0.0)
                gy = np.maximum(np.maximum(z_mny[None, :] - c_mxy[s:e, None],
                                           c_mny[s:e, None] - z_mxy[None, :]), 0.0)
                dmin = gx * gx + gy * gy
                r, cpos = np.nonzero(dmin <= u_all[s:e, None])
                cells_of.append(r + s)
                members.append(cpos)
                fulls.append((z_mnx[cpos] <= c_mnx[r + s])
                             & (z_mxx[cpos] >= c_mxx[r + s])
                             & (z_mny[cpos] <= c_mny[r + s])
                             & (z_mxy[cpos] >= c_mxy[r + s]))
            cells_flat = np.concatenate(cells_of)
            memb_flat = np.concatenate(members)
            full_flat = np.concatenate(fulls)
            # ID-DOMINANCE truncation of FULL-COVER zones: a zone that
            # fully covers a cell is at distance 0 from EVERY in-cell
            # point (any metric), so among full-cover zones only the k
            # smallest-id ones can appear in any in-cell top-k (ties
            # break on smallest id) — a full-cover zone in a point's
            # top-k has, by the zero-tie order, fewer than k smaller-id
            # full-cover zones above it.  Heavily-overlapping zone
            # layers (the fixture averages ~31 containing zones per
            # doc, all d2 == 0) are IRREDUCIBLE by distance bounds but
            # collapse under this rule: measured list length 46.5 ->
            # ~boundary+k per cell at 20k zones / f_res 6.  Partial-
            # cover zones are never dropped.
            if full_flat.any():
                ids_flat = self.ids[memb_flat]
                fi = np.nonzero(full_flat)[0]
                forder = np.lexsort((ids_flat[fi], cells_flat[fi]))
                oc = cells_flat[fi][forder]
                newc = np.concatenate(([True], oc[1:] != oc[:-1]))
                frank = (np.arange(len(oc), dtype=np.int64)
                         - np.flatnonzero(newc)[np.cumsum(newc) - 1])
                drop = fi[forder[frank >= k]]
                if len(drop):
                    keep_m = np.ones(len(memb_flat), dtype=bool)
                    keep_m[drop] = False
                    cells_flat = cells_flat[keep_m]
                    memb_flat = memb_flat[keep_m]
            counts = np.bincount(cells_flat, minlength=n_cells)
            self._df_offsets = np.concatenate(([0], np.cumsum(counts)))
            self._df_members = memb_flat
            self._dense_lists = True
        else:
            self._dense_lists = False
        self._bounds_k = k
        self._have_bounds = True
        return True

    # -- scoring -------------------------------------------------------------

    def _score(self, pos: np.ndarray, qx, qy) -> np.ndarray:
        """Context metric of geometries at ``pos`` vs queries
        (broadcasting: pos/qx/qy shapes must broadcast together)."""
        g = self.g
        if self.kind == "point":
            return self.ctx.points_squared_distance(g["x"][pos], g["y"][pos], qx, qy)
        if self.kind == "box":
            return self.ctx.box_point_squared_distance(
                g["min_x"][pos], g["max_x"][pos], g["min_y"][pos], g["max_y"][pos], qx, qy
            )
        return self.ctx.segment_point_squared_distance(
            g["start_x"][pos], g["start_y"][pos], g["end_x"][pos], g["end_y"][pos], qx, qy
        )

    # -- query ---------------------------------------------------------------

    def query(
        self, qx: np.ndarray, qy: np.ndarray, k: int, first_ring: int = 1,
        dense_chunk: int = 2048,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k (ids, squared distances) per query point, ties by id.

        Precondition: query points lie inside the world box (the
        fixture domain guarantees it); out-of-box points still get
        exact distances but pay extra rounds.

        Returns ``(ids[n, k], d2[n, k])`` padded with (-1, inf) when
        the build side has fewer than k geometries.
        """
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        n = len(qx)
        min_cell = min(self.cell_w, self.cell_h)
        kk = min(k, self.size)
        # deterministic per-call probe-cost counters: loop rounds and
        # hot-dump fan-out.  Perf regression tests read these instead
        # of wall time (this VM's clock lies by up to 60x) — the
        # round-3 6x regression showed up here as rounds 2 -> 7 and
        # dump_rows 0 -> ~1 per 4k probes long before any bench ran
        self.last_query_stats = stats = {
            "rounds": 0, "dump_rows": 0,
            # scored-pairs breakdown (d2 kernel evaluations by source)
            # — the load-independent cost model the box-state protocol
            # requires (BASELINE.md): wall time on this VM lies, these
            # don't.  scored = fast + main + hot + dump + dense.
            "scored_fast": 0, "scored_main": 0, "scored_hot": 0,
            "scored_dump": 0, "scored_dense": 0, "merge_rows": 0,
        }

        best_id = np.full((n, k), -1, dtype=np.int64)
        best_d = np.full((n, k), np.inf, dtype=np.float64)
        n_found = np.zeros(n, dtype=np.int64)

        # 1) per-cell bounds: U_all ceiling (drops hopeless candidates
        # before the merge) + dense relevant lists (box kind); non-box
        # kinds with dense members fall back to full matrix seeding.
        have_bounds = self._ensure_cell_bounds(k)
        dense_filtered = self._dense_lists
        # per-cell bounds assume the point lies in its (unclamped) home
        # cell; out-of-world points fall back to the exhaustive path
        inworld = (
            (qx >= WORLD_MIN_X) & (qx <= WORLD_MIN_X + WORLD_W)
            & (qy >= WORLD_MIN_Y) & (qy <= WORLD_MIN_Y + WORLD_H)
        )
        u_pt = None
        if have_bounds:
            f_axis = 1 << self._df_res
            fhx = np.clip(np.floor((qx - WORLD_MIN_X) / WORLD_W * f_axis),
                          0, f_axis - 1).astype(np.int64)
            fhy = np.clip(np.floor((qy - WORLD_MIN_Y) / WORLD_H * f_axis),
                          0, f_axis - 1).astype(np.int64)
            u_pt = np.where(inworld, self._u_all[fhx * f_axis + fhy], np.inf)
        fast_mask = None
        if have_bounds and dense_filtered and self.kind == "box":
            fast_mask = inworld
        if fast_mask is not None:
            # FAST PATH: the per-cell lists are complete top-k candidate
            # sets for in-world points (see _ensure_cell_bounds), so one
            # gather + score + merge resolves them — no ring expansion.
            fast_rows = np.nonzero(fast_mask)[0]
            if len(fast_rows):
                home = fhx[fast_rows] * f_axis + fhy[fast_rows]
                cnt = self._df_offsets[home + 1] - self._df_offsets[home]
                total = int(cnt.sum())
                q_row = np.repeat(fast_rows, cnt)
                starts = self._df_offsets[home]
                offs_d = np.concatenate(([0], np.cumsum(cnt)[:-1]))
                local = np.arange(total, dtype=np.int64) - np.repeat(offs_d, cnt)
                pos = self._df_members[np.repeat(starts, cnt) + local]
                if self._g32 is not None and len(pos) > len(fast_rows):
                    # float32 pre-score: drop candidates provably above
                    # the ceiling using half-width gathers; the bound is
                    # inflated by an ABSOLUTE coordinate-rounding margin
                    # (f32 input rounding is ~2e-5 world units), so no
                    # true top-k candidate is ever excluded — survivors
                    # are re-scored exactly in float64 below
                    g32 = self._g32
                    z32 = np.float32(0.0)
                    qx32 = qx.astype(np.float32)
                    qy32 = qy.astype(np.float32)
                    gx = np.maximum(np.maximum(g32["min_x"][pos] - qx32[q_row],
                                               qx32[q_row] - g32["max_x"][pos]), z32)
                    gy = np.maximum(np.maximum(g32["min_y"][pos] - qy32[q_row],
                                               qy32[q_row] - g32["max_y"][pos]), z32)
                    d32 = gx * gx + gy * gy
                    u_infl = (np.sqrt(u_pt) + 1e-4) ** 2
                    pre = d32 <= u_infl[q_row]
                    q_row, pos = q_row[pre], pos[pre]
                stats["scored_fast"] += len(pos)
                d2 = self._score(pos, qx[q_row], qy[q_row])
                within = d2 <= u_pt[q_row]
                q_row, pos, d2 = q_row[within], pos[within], d2[within]
                cand_ids = self.ids[pos]
                order = np.lexsort((cand_ids, d2, q_row))
                rq, ri, rd = q_row[order], cand_ids[order], d2[order]
                if len(rq):
                    run_start = np.flatnonzero(
                        np.concatenate(([True], rq[1:] != rq[:-1])))
                    rcounts = np.diff(np.append(run_start, len(rq)))
                    rank = (np.arange(len(rq), dtype=np.int64)
                            - np.repeat(run_start, rcounts))
                    sel = rank < k
                    best_id[rq[sel], rank[sel]] = ri[sel]
                    best_d[rq[sel], rank[sel]] = rd[sel]
                    n_found[rq[run_start]] = np.minimum(rcounts, k)
            if fast_mask.all():
                return best_id, best_d

        if len(self.large_pos) and not dense_filtered:
            lp = self.large_pos
            l_ids = self.ids[lp]
            kd = min(k, len(lp))
            for s in range(0, n, dense_chunk):
                e = min(s + dense_chunk, n)
                d = self._score(lp[None, :], qx[s:e, None], qy[s:e, None])  # (c, m)
                if kd < len(lp):
                    part = np.argpartition(d, kd - 1, axis=1)[:, :kd]
                else:
                    part = np.broadcast_to(np.arange(len(lp)), (e - s, len(lp)))
                pd = np.take_along_axis(d, part, axis=1)
                pids = l_ids[part]
                # per-row sort by (d, id): stable argsort on id, then on d
                o1 = np.argsort(pids, axis=1, kind="stable")
                pd1 = np.take_along_axis(pd, o1, axis=1)
                pids1 = np.take_along_axis(pids, o1, axis=1)
                o2 = np.argsort(pd1, axis=1, kind="stable")
                best_d[s:e, :kd] = np.take_along_axis(pd1, o2, axis=1)
                best_id[s:e, :kd] = np.take_along_axis(pids1, o2, axis=1)
            n_found[:] = kd

        # 2) bucket side: ring expansion in geometric world-radius rounds
        # (fast-path kinds: only the out-of-world / hot-cell remainder)
        if fast_mask is not None:
            active = np.nonzero(~fast_mask)[0].astype(np.int64)
        else:
            active = np.arange(n, dtype=np.int64)
        axis = self.n_cells_axis
        hcx = np.clip(np.floor((qx - WORLD_MIN_X) / WORLD_W * axis), 0, axis - 1).astype(np.int64)
        hcy = np.clip(np.floor((qy - WORLD_MIN_Y) / WORLD_H * axis), 0, axis - 1).astype(np.int64)

        hot = self.hot_buckets
        hot_r_prev = -1
        hot_dumped = hot is None
        if hot is not None:
            # per-k dominance-truncated, CLUSTER-LOCAL level
            hot, hot_members_k, hot_bbox_k = self._hot_level(kk)
            hot_min_cell = min(hot.w / hot.axis, hot.h / hot.axis)
            hw = self._hot_world
            hd_all = np.sqrt(box_point_squared_distance(
                hw[0], hw[1], hw[2], hw[3], qx, qy))

        # per-row MAIN-level freeze: once a row's kth distance drops
        # strictly below its swept main radius, further main-ring
        # expansion cannot change its answer (kth only decreases, so
        # the freeze is permanent); the row then waits on the hot level
        # only.  main_r records the frozen radius for the bound.
        main_frozen = np.zeros(n, dtype=bool)
        main_r = np.zeros(n, dtype=np.int64)

        r_prev = -1
        r_new = min(first_ring, axis)
        while len(active):
            stats["rounds"] += 1
            adv_idx = np.nonzero(~main_frozen[active])[0]
            offs = _annulus_offsets(r_prev, r_new)
            rows = np.repeat(adv_idx, len(offs))
            ccx = (hcx[active[adv_idx]][:, None] + offs[:, 0][None, :]).ravel()
            ccy = (hcy[active[adv_idx]][:, None] + offs[:, 1][None, :]).ravel()
            valid = (ccx >= 0) & (ccx < axis) & (ccy >= 0) & (ccy < axis)
            rows = rows[valid]
            cell_ids = ccx[valid] * axis + ccy[valid]
            src, pos = self.buckets.lookup(cell_ids)
            q_row = rows[src]
            stats["scored_main"] += len(pos)

            if not hot_dumped:
                # the hot level advances at its own geometric pace; the
                # retirement bound below takes the min of both levels'
                # covered radii, so lagging here only delays retirement,
                # never breaks it.  Gathers are restricted to NEEDY rows
                # (kth >= distance-to-hot-region, or top-k not yet full):
                # once a row's kth drops strictly below hot_dist, no
                # unseen hot member can ever enter its top-k, and since
                # kth only decreases that exclusion is permanent.  Cell
                # enumeration clamps to the occupied hot-cell bbox — the
                # fine grid is world-sized but the cluster is tiny, so
                # unclamped rings over far rows were the straggler cost.
                hr_new = min(2 * hot_r_prev + 1 if hot_r_prev >= 0 else 1, hot.axis)
                hd = hd_all[active]
                # the hot-bbox gap hd is squared-EUCLIDEAN; best_d is
                # in the context metric, so the exclusion bound goes
                # through ctx.grid_bound like every other grid-derived
                # bound in this loop (ADVICE r2 #1 — a manhattan
                # context with hd > 1 would otherwise skip needy rows)
                needy = (n_found[active] < kk) | (
                    best_d[active][:, kk - 1] >= self.ctx.grid_bound(hd * hd))
                ridx = np.nonzero(needy)[0]
                if hr_new > HOT_RING_CAP or r_new >= axis:
                    # bounded dump, needy rows only, dominance-truncated
                    m = len(hot_members_k)
                    drws = np.repeat(ridx, m)
                    dps = np.tile(hot_members_k, len(ridx))
                    q_row = np.concatenate((q_row, drws))
                    pos = np.concatenate((pos, dps))
                    hot_dumped = True
                    stats["dump_rows"] += len(ridx)
                    stats["scored_dump"] += len(dps)
                elif hr_new > hot_r_prev:
                    if len(ridx):
                        ar = active[ridx]
                        hx = np.clip(np.floor((qx[ar] - hot.x0) / hot.w * hot.axis),
                                     0, hot.axis - 1).astype(np.int64)
                        hy = np.clip(np.floor((qy[ar] - hot.y0) / hot.h * hot.axis),
                                     0, hot.axis - 1).astype(np.int64)
                        hrows, hcells = _rect_band_cells(
                            hx, hx, hy, hy, hot_r_prev, hr_new, hot.axis,
                            clamp=hot_bbox_k,
                        )
                        hsrc, hpos = hot.lookup(hcells)
                        q_row = np.concatenate((q_row, ridx[hrows[hsrc]]))
                        pos = np.concatenate((pos, hpos))
                        stats["scored_hot"] += len(hpos)
                    hot_r_prev = hr_new

            if dense_filtered and r_prev == -1:
                # round 1: merge the per-cell dense candidates (complete
                # for the top-k by the _ensure_cell_bounds argument);
                # out-of-world points score ALL dense zones (the per-cell
                # exclusion argument requires the point inside its cell)
                home = fhx[active] * f_axis + fhy[active]
                dcounts = np.where(
                    inworld[active],
                    self._df_offsets[home + 1] - self._df_offsets[home],
                    len(self.large_pos),
                )
                drows = np.repeat(np.arange(len(active), dtype=np.int64), dcounts)
                starts = np.where(inworld[active], self._df_offsets[home], 0)
                offs_d = np.concatenate(([0], np.cumsum(dcounts)[:-1]))
                local = np.arange(int(dcounts.sum()), dtype=np.int64) - np.repeat(offs_d, dcounts)
                base = np.repeat(starts, dcounts) + local
                dpos = np.where(
                    np.repeat(inworld[active], dcounts),
                    self._df_members[np.minimum(base, len(self._df_members) - 1)],
                    self.large_pos[np.minimum(local, len(self.large_pos) - 1)],
                )
                q_row = np.concatenate((q_row, drows))
                pos = np.concatenate((pos, dpos))
                stats["scored_dense"] += len(dpos)

            if len(pos):
                ax = qx[active]
                ay = qy[active]
                d2 = self._score(pos, ax[q_row], ay[q_row])
                # drop candidates above the per-point kth-distance
                # ceiling BEFORE the merge sort: kth(p) <= U_all(cell)
                # so anything strictly above can never be in the top-k;
                # the closed comparison keeps boundary ties
                if u_pt is not None:
                    within = d2 <= u_pt[active][q_row]
                    if not within.all():
                        q_row = q_row[within]
                        pos = pos[within]
                        d2 = d2[within]
                stats["merge_rows"] += len(pos)
                cand_ids = self.ids[pos]
                _merge_topk(active, q_row, cand_ids, d2,
                            best_id, best_d, n_found, k)

            if r_new >= axis:
                break  # bucket grid fully swept (and hot dumped above)
            cov_main = np.where(main_frozen[active], main_r[active], r_new) * min_cell
            if not hot_dumped:
                # unseen hot members are beyond BOTH the hot level's
                # covered radius and the point's distance to the
                # nearest hot region — take whichever is larger, then
                # the min with the main guarantee.  For a query OUTSIDE
                # the (local) hot grid extent the rings are anchored to
                # its CLAMPED cell, which contains the extent's nearest
                # point p* with d(q, p*) == hd, so by the triangle
                # inequality any unseen member m (beyond Chebyshev ring
                # r of that cell, hence d(p*, m) >= r*min_cell) is at
                # d(q, m) >= r*min_cell - hd.  Interior rows have
                # hd == 0 and the term reduces to plain ring coverage.
                # (An earlier zero-outside rule kept near-cluster rows
                # active forever: 3.5x the loop rounds and a 187k-member
                # bounded dump per straggler — the round-3 6x kNN
                # regression.)
                hd_act = hd_all[active]
                ring_cov = np.maximum(
                    max(hot_r_prev, 0) * hot_min_cell - hd_act, 0.0)
                hot_guar = np.maximum(ring_cov, hd_act)
                cov = np.minimum(cov_main, hot_guar)
            else:
                cov = cov_main
            bound = self.ctx.grid_bound(cov * cov)
            # STRICT retirement: an unseen bucket geometry can sit exactly
            # at the ring-coverage distance (d2 == bound) with a smaller
            # id than the current kth candidate, so a closed comparison
            # would violate the smallest-id tie-break; mirror the U_all
            # filter, which deliberately keeps boundary ties instead
            kth = best_d[active][:, kk - 1]
            full = n_found[active] >= kk
            done = full & (kth < bound)
            main_bound = self.ctx.grid_bound((r_new * min_cell) ** 2)
            newfreeze = (~done) & (~main_frozen[active]) & full & (kth < main_bound)
            main_frozen[active[newfreeze]] = True
            main_r[active[newfreeze]] = r_new
            active = active[~done]
            r_prev = r_new
            r_new = min(_next_main_ring(r_new), axis)
        return best_id, best_d


class SegSegGridKnn:
    """Batched segment->segment kNN (S1/S2 at scale): ring expansion
    around each query segment's MIDPOINT cell over CSR buckets of build
    segment bboxes, scored with the vectorized P7 kernel — replaces the
    per-row best-first tree probes of round 1 (VERDICT.md #7).

    Expansion source is the query segment's COVER RECTANGLE (its bbox's
    cell range), not a midpoint cell: after sweeping the rectangle
    padded by r rings, every unseen build segment covers only cells
    with >= r whole cells of gap to the query bbox, so its distance to
    the query segment is >= r*min_cell — the bound pays no
    half-length penalty, which matters because fixture segments span
    multiple cells.  A row retires once it holds k candidates strictly
    inside that bound.  Ties break on smallest id; ``exclude`` ids
    (self-joins) are dropped before the merge.
    """

    def __init__(self, geoms: dict[str, np.ndarray], ids: np.ndarray, res: int,
                 exact: bool = False, context=None):
        from .context import get_context

        self.ctx = get_context("exact" if exact and context is None else context)
        self.ids = np.asarray(ids, dtype=np.int64)
        n = len(self.ids)
        res = min(res, max(2, int(round(np.log2(max(n, 2)) / 2)) + 1))
        self.res = res
        self.axis = 1 << res
        self.cell_w = WORLD_W / self.axis
        self.cell_h = WORLD_H / self.axis
        self.g = {k: np.asarray(v, dtype=np.float64) for k, v in geoms.items()}
        _require_nondegenerate_segments(self.g)
        mnx, mxx, mny, mxy = _bbox_of("segment", self.g)
        rows = np.arange(n, dtype=np.int64)
        nx = np.floor((mxx - WORLD_MIN_X) / WORLD_W * self.axis) - np.floor(
            (mnx - WORLD_MIN_X) / WORLD_W * self.axis) + 1
        ny = np.floor((mxy - WORLD_MIN_Y) / WORLD_H * self.axis) - np.floor(
            (mny - WORLD_MIN_Y) / WORLD_H * self.axis) + 1
        large = (nx * ny) > LARGE_COVER_CELLS
        self.large_pos = rows[large]
        small = ~large
        self.buckets = _Buckets(res, mnx[small], mxx[small], mny[small],
                                mxy[small], rows[small])

    @property
    def size(self) -> int:
        return len(self.ids)

    def _score(self, pos, qsx, qsy, qex, qey) -> np.ndarray:
        g = self.g
        return self.ctx.segments_squared_distance(
            g["start_x"][pos], g["start_y"][pos], g["end_x"][pos], g["end_y"][pos],
            qsx, qsy, qex, qey,
        )

    def query(self, qsx, qsy, qex, qey, k: int, exclude: np.ndarray | None = None,
              dense_chunk: int = 2048) -> tuple[np.ndarray, np.ndarray]:
        qsx = np.asarray(qsx, dtype=np.float64)
        qsy = np.asarray(qsy, dtype=np.float64)
        qex = np.asarray(qex, dtype=np.float64)
        qey = np.asarray(qey, dtype=np.float64)
        n = len(qsx)
        if exclude is None:
            exclude = np.full(n, -1, dtype=np.int64)
        min_cell = min(self.cell_w, self.cell_h)
        kk = min(k, self.size)

        best_id = np.full((n, k), -1, dtype=np.int64)
        best_d = np.full((n, k), np.inf, dtype=np.float64)
        n_found = np.zeros(n, dtype=np.int64)

        # dense side: oversized segments scored once per query chunk
        if len(self.large_pos):
            lp = self.large_pos
            l_ids = self.ids[lp]
            for s in range(0, n, dense_chunk):
                e = min(s + dense_chunk, n)
                d = self._score(lp[None, :], qsx[s:e, None], qsy[s:e, None],
                                qex[s:e, None], qey[s:e, None])
                d = np.where(l_ids[None, :] == exclude[s:e, None], np.inf, d)
                kd = min(k, d.shape[1])
                part = (np.argpartition(d, kd - 1, axis=1)[:, :kd]
                        if kd < d.shape[1]
                        else np.broadcast_to(np.arange(d.shape[1]), (e - s, d.shape[1])))
                pd = np.take_along_axis(d, part, axis=1)
                pids = np.where(np.isinf(pd), -1, l_ids[part])
                o1 = np.argsort(pids, axis=1, kind="stable")
                pd1 = np.take_along_axis(pd, o1, axis=1)
                pids1 = np.take_along_axis(pids, o1, axis=1)
                o2 = np.argsort(pd1, axis=1, kind="stable")
                best_d[s:e, :kd] = np.take_along_axis(pd1, o2, axis=1)
                best_id[s:e, :kd] = np.take_along_axis(pids1, o2, axis=1)
            n_found[:] = (best_id >= 0).sum(axis=1)

        active = np.arange(n, dtype=np.int64)
        axis = self.axis
        qmnx = np.minimum(qsx, qex)
        qmxx = np.maximum(qsx, qex)
        qmny = np.minimum(qsy, qey)
        qmxy = np.maximum(qsy, qey)
        cx0 = np.clip(np.floor((qmnx - WORLD_MIN_X) / WORLD_W * axis), 0, axis - 1).astype(np.int64)
        cx1 = np.clip(np.floor((qmxx - WORLD_MIN_X) / WORLD_W * axis), 0, axis - 1).astype(np.int64)
        cy0 = np.clip(np.floor((qmny - WORLD_MIN_Y) / WORLD_H * axis), 0, axis - 1).astype(np.int64)
        cy1 = np.clip(np.floor((qmxy - WORLD_MIN_Y) / WORLD_H * axis), 0, axis - 1).astype(np.int64)

        # first gather = cover rect + 1 ring in ONE band (the r=0 bound
        # is zero, so no row could retire after a cover-only round)
        r_prev = -1
        r_new = 1
        while len(active):
            rows, cells = _rect_band_cells(
                cx0[active], cx1[active], cy0[active], cy1[active],
                r_prev, r_new, axis,
            )
            src, pos = self.buckets.lookup(cells)
            q_row = rows[src]

            if len(pos):
                # dedupe (query, member) pairs gathered via several
                # cells of the same band before the expensive scoring
                keyed = q_row * np.int64(self.size) + pos
                uniq = np.unique(keyed)
                q_row = uniq // self.size
                pos = uniq % self.size
                cand_ids = self.ids[pos]
                ok = cand_ids != exclude[active][q_row]
                q_row, pos, cand_ids = q_row[ok], pos[ok], cand_ids[ok]
            if len(pos):
                aq = active[q_row]
                d2 = self._score(pos, qsx[aq], qsy[aq], qex[aq], qey[aq])
                _merge_topk(active, q_row, cand_ids, d2,
                            best_id, best_d, n_found, k)

            if r_new >= axis:
                break
            bound = self.ctx.grid_bound((r_new * min_cell) ** 2)
            done = (n_found[active] >= kk) & (best_d[active][:, kk - 1] < bound)
            active = active[~done]
            r_prev = r_new
            r_new = min(max(2 * r_new, 1), axis)
        return best_id, best_d


def _enum_rects(xlo, xhi, ylo, yhi, axis: int) -> tuple[np.ndarray, np.ndarray]:
    """Enumerate (row, cell_id) for per-row inclusive cell rectangles,
    clipped to the grid; rows with empty (or fully clipped) rectangles
    contribute nothing."""
    xlo = np.maximum(xlo, 0)
    xhi = np.minimum(xhi, axis - 1)
    ylo = np.maximum(ylo, 0)
    yhi = np.minimum(yhi, axis - 1)
    nx = np.maximum(xhi - xlo + 1, 0)
    ny = np.maximum(yhi - ylo + 1, 0)
    cnt = nx * ny
    total = int(cnt.sum())
    rows = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    if total == 0:
        return rows, np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
    ny_r = np.repeat(ny, cnt)
    cx = np.repeat(xlo, cnt) + local // ny_r
    cy = np.repeat(ylo, cnt) + local % ny_r
    return rows, cx * axis + cy


def _rect_band_cells(cx0, cx1, cy0, cy1, r_lo: int, r_hi: int, axis: int,
                     clamp: tuple[int, int, int, int] | None = None
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Cells of each row's rectangle padded by ``r_hi`` rings MINUS the
    same rectangle padded by ``r_lo`` (``r_lo < 0`` -> the full padded
    rectangle).  Disjoint 4-strip decomposition (top/bottom bands full
    width, left/right bands between them).  ``clamp`` intersects every
    strip with a fixed cell box (strip-wise clamping of the disjoint
    decomposition equals (outer minus inner) ∩ box exactly)."""

    def enum(xlo, xhi, ylo, yhi):
        if clamp is not None:
            bx0, bx1, by0, by1 = clamp
            xlo = np.maximum(xlo, bx0)
            xhi = np.minimum(xhi, bx1)
            ylo = np.maximum(ylo, by0)
            yhi = np.minimum(yhi, by1)
        return _enum_rects(xlo, xhi, ylo, yhi, axis)

    if r_lo < 0:
        return enum(cx0 - r_hi, cx1 + r_hi, cy0 - r_hi, cy1 + r_hi)
    parts = [
        enum(cx0 - r_hi, cx1 + r_hi, cy1 + r_lo + 1, cy1 + r_hi),
        enum(cx0 - r_hi, cx1 + r_hi, cy0 - r_hi, cy0 - r_lo - 1),
        enum(cx0 - r_hi, cx0 - r_lo - 1, cy0 - r_lo, cy1 + r_lo),
        enum(cx1 + r_lo + 1, cx1 + r_hi, cy0 - r_lo, cy1 + r_lo),
    ]
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]))


def _annulus_offsets(r_lo: int, r_hi: int) -> np.ndarray:
    """(dx, dy) offsets with Chebyshev distance in (r_lo, r_hi]."""
    side = np.arange(-r_hi, r_hi + 1, dtype=np.int64)
    ox, oy = np.meshgrid(side, side, indexing="ij")
    cheb = np.maximum(np.abs(ox), np.abs(oy))
    m = cheb > r_lo
    return np.stack((ox[m], oy[m]), axis=1)


class GridContain:
    """Batched point->containing-boxes lookup (the R4 'which zones
    contain this doc' shape, locus/r.py:307-353, distributed).

    Two-level semantics per the north rule: cell prefilter (bucket
    cover for normal zones, dense side for oversized ones) then exact
    closed containment refine (locus/_core/box.py:21-27 semantics).
    Candidate pairs are unique by construction: a box covers a cell at
    most once, a point has one home cell, and the dense side is
    disjoint from the bucket side.
    """

    def __init__(self, geoms: dict[str, np.ndarray], ids: np.ndarray, res: int,
                 context=None, radius: float = 0.0):
        from .context import get_context

        self.ctx = get_context(context)
        self.ids = np.asarray(ids, dtype=np.int64)
        self.res = res
        self.axis = 1 << res
        self.radius = float(radius)
        self.g = {k: np.asarray(v, dtype=np.float64) for k, v in geoms.items()}
        if self.radius > 0.0:
            # buffered ("within distance r") variant: the cover index is
            # built over boxes INFLATED by r per axis — the Chebyshev
            # superset of the euclidean r-buffer, so the bucket lookup
            # stays a superset prefilter; query_within refines with the
            # exact P5 distance on the ORIGINAL boxes.
            r = self.radius
            mnx, mxx, mny, mxy = (self.g["min_x"] - r, self.g["max_x"] + r,
                                  self.g["min_y"] - r, self.g["max_y"] + r)
        else:
            mnx, mxx, mny, mxy = (self.g["min_x"], self.g["max_x"],
                                  self.g["min_y"], self.g["max_y"])
        n = len(self.ids)
        rows = np.arange(n, dtype=np.int64)
        nx = np.floor((mxx - WORLD_MIN_X) / WORLD_W * self.axis) - np.floor(
            (mnx - WORLD_MIN_X) / WORLD_W * self.axis
        ) + 1
        ny = np.floor((mxy - WORLD_MIN_Y) / WORLD_H * self.axis) - np.floor(
            (mny - WORLD_MIN_Y) / WORLD_H * self.axis
        ) + 1
        large = (nx * ny) > LARGE_COVER_CELLS
        small = ~large
        self.buckets = _Buckets(res, mnx[small], mxx[small], mny[small], mxy[small],
                                rows[small])
        # oversized zones: coarse-level buckets (a zone can only contain
        # points in cells it overlaps, so a coarse cover lookup replaces
        # the brute-force all-large mask with ~a handful of candidates)
        self.big_buckets = None
        if large.any():
            coarse = max(2, min(res, 6))
            self.big_buckets = _Buckets(coarse, mnx[large], mxx[large],
                                        mny[large], mxy[large], rows[large])

    def query(self, qx: np.ndarray, qy: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray]:
        """(query_row, box_id) pairs where box contains point (closed)."""
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        g = self.g
        out_src = []
        out_ids = []
        for b in (self.buckets, self.big_buckets):
            if b is None:
                continue
            hcx = np.clip(np.floor((qx - WORLD_MIN_X) / WORLD_W * b.axis),
                          0, b.axis - 1).astype(np.int64)
            hcy = np.clip(np.floor((qy - WORLD_MIN_Y) / WORLD_H * b.axis),
                          0, b.axis - 1).astype(np.int64)
            src, pos = b.lookup(hcx * b.axis + hcy)
            if len(pos):
                ok = self.ctx.contains_point(
                    g["min_x"][pos], g["max_x"][pos], g["min_y"][pos], g["max_y"][pos],
                    qx[src], qy[src],
                )
                out_src.append(src[ok])
                out_ids.append(self.ids[pos[ok]])

        if not out_src:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_src), np.concatenate(out_ids)

    def query_within(self, qx: np.ndarray, qy: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(query_row, box_id, d2) pairs where the box-point squared
        distance (P5, closed) is <= radius**2 — the buffered
        containment / "docs within r of zone" range join.  Requires
        ``radius > 0`` at construction (the cover index must be built
        over the inflated boxes)."""
        if self.radius <= 0.0:
            raise ValueError("GridContain.query_within requires radius > 0")
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        g = self.g
        r2 = self.radius * self.radius
        out_src: list[np.ndarray] = []
        out_ids: list[np.ndarray] = []
        out_d2: list[np.ndarray] = []
        for b in (self.buckets, self.big_buckets):
            if b is None:
                continue
            hcx = np.clip(np.floor((qx - WORLD_MIN_X) / WORLD_W * b.axis),
                          0, b.axis - 1).astype(np.int64)
            hcy = np.clip(np.floor((qy - WORLD_MIN_Y) / WORLD_H * b.axis),
                          0, b.axis - 1).astype(np.int64)
            src, pos = b.lookup(hcx * b.axis + hcy)
            if len(pos):
                d2 = self.ctx.box_point_squared_distance(
                    g["min_x"][pos], g["max_x"][pos], g["min_y"][pos], g["max_y"][pos],
                    qx[src], qy[src],
                )
                ok = d2 <= r2
                out_src.append(src[ok])
                out_ids.append(self.ids[pos[ok]])
                out_d2.append(d2[ok])

        if not out_src:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        return (np.concatenate(out_src), np.concatenate(out_ids),
                np.concatenate(out_d2))
