"""Point-in-polygon / raster<->vector join (north-star extension).

Pipeline shape per the north rule: polygon layer -> rasterize each
polygon to its grid-cell set (coarse raster) -> route document points
by home cell -> exact crossing-number refine only where the cell is on
the polygon boundary (interior cells skip the exact test entirely).

The polygon layer is broadcast (``ray.put``) — polygon counts are
dimension-like.  The cell raster is the "two-level refine" structure:
``full`` cells accept immediately, ``edge`` cells run the exact PIP
kernel (:func:`locus_ray.kernels.points_in_polygon`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..cells import cell_bounds, cover_boxes, grid_coords
from ..config import DEFAULT_CELL_RES
from ..kernels import points_in_polygon


def polygon_payload(keys: np.ndarray) -> dict:
    """Deterministic star-convex polygons derived from integer keys
    (FIXTURES.md table 4): 5-12 vertices around a hashed center."""
    keys = np.asarray(keys, dtype=np.int64)
    rings = []
    for kid in keys:
        n = 5 + int(kid * 2654435761 % 8)
        h1 = (kid * 48271) % 1000003
        h2 = (kid * 69621 + 7) % 1000003
        cx = (h1 / 1000003.0) * 320.0 - 160.0
        cy = (h2 / 1000003.0) * 140.0 - 70.0
        ang = np.arange(n) * (2 * np.pi / n)
        rad = 2.0 + ((kid * np.arange(1, n + 1) * 7919) % 997) / 997.0 * 8.0
        rings.append({
            "polygon_id": int(kid),
            "ring_x": cx + rad * np.cos(ang),
            "ring_y": cy + rad * np.sin(ang),
        })
    return {"polygons": rings}


class PipIndex:
    """Build-once polygon raster index: CSR (cell -> (poly, is_full))
    plus the batched probe.  Build it ONCE on the driver and broadcast
    via ``ray.put`` (the ``spatial.prebuilt_knn_index`` pattern) so
    actors skip the per-polygon per-cell classification loop — built
    per actor, the raster made the PIP stage ANTI-scale with pool size
    exactly like the pre-b1d5ccd kNN stage did.

    ``exact=True`` (ROADMAP #8 / reference Fraction-context parity):
    the full-cell fast-accept is disabled and every candidate point
    runs the exact crossing-number kernel (static-filtered
    orientation, Fraction fallback) — correct on boundary-adversarial
    corpora where float64 signs can flip."""

    def __init__(self, payload: dict, res: int = DEFAULT_CELL_RES,
                 exact: bool = False):
        self.polys = payload["polygons"]
        self.res = res
        self.exact = exact
        n_axis = 1 << res

        # rasterize: per polygon, classify ALL covered cells full / edge
        # in one vectorized pass (one PIP call over 4*ncells corner
        # points + one cells x edges crossing matrix — the per-cell
        # Python loop here stalled the driver at large polygon layers,
        # VERDICT r3 "What's wrong" #4), then flatten into CSR
        # (cell -> [(poly, is_full)]) arrays so the per-batch probe is
        # a pure searchsorted gather
        from ..kernels import box_segment_intersects

        cell_chunks: list[np.ndarray] = []
        poly_chunks: list[np.ndarray] = []
        full_chunks: list[np.ndarray] = []
        for p_idx, p in enumerate(self.polys):
            rx, ry = p["ring_x"], p["ring_y"]
            _, cells = cover_boxes(
                np.array([rx.min()]), np.array([rx.max()]),
                np.array([ry.min()]), np.array([ry.max()]), res,
            )
            mnx, mxx, mny, mxy = cell_bounds(cells, res)
            m = len(cells)
            cx = np.stack((mnx, mnx, mxx, mxx), axis=1).ravel()
            cy = np.stack((mny, mxy, mny, mxy), axis=1).ravel()
            corners_in = points_in_polygon(rx, ry, cx, cy).reshape(m, 4)
            # boolean crossing predicate, NOT the full P8 distance —
            # box_segment_intersects is the documented d2 == 0 case and
            # profiles ~4x cheaper (the distance kernel was 70% of the
            # raster build at 10^4 polygons)
            crosses = box_segment_intersects(
                mnx[:, None], mxx[:, None], mny[:, None], mxy[:, None],
                rx[None, :], ry[None, :],
                np.roll(rx, -1)[None, :], np.roll(ry, -1)[None, :]).any(axis=1)
            all_in = corners_in.all(axis=1)
            any_in = corners_in.any(axis=1)
            keep = any_in | crosses
            # exact mode distrusts the float cell classification
            is_full = all_in & ~crosses & (not exact)
            cell_chunks.append(cells[keep].astype(np.int64))
            poly_chunks.append(np.full(int(keep.sum()), p_idx, dtype=np.int64))
            full_chunks.append(is_full[keep])
        entries_cell = np.concatenate(cell_chunks) if cell_chunks else np.empty(0, dtype=np.int64)
        entries_poly = np.concatenate(poly_chunks) if poly_chunks else np.empty(0, dtype=np.int64)
        entries_full = np.concatenate(full_chunks) if full_chunks else np.empty(0, dtype=bool)
        cells_arr = np.asarray(entries_cell, dtype=np.int64)
        order = np.argsort(cells_arr, kind="stable")
        self._cells, starts = np.unique(cells_arr[order], return_index=True)
        self._offsets = np.append(starts, len(cells_arr))
        self._poly = np.asarray(entries_poly, dtype=np.int64)[order]
        self._full = np.asarray(entries_full, dtype=bool)[order]

    def probe(self, x: np.ndarray, y: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray]:
        """(query_row, polygon_id) pairs, closed boundary semantics."""
        ix, iy = grid_coords(x, y)
        shift = 16 - self.res
        cells = (ix >> shift) * (1 << self.res) + (iy >> shift)

        # CSR gather: candidate (point, poly-entry) pairs
        if len(self._cells):
            loc = np.searchsorted(self._cells, cells)
            loc_c = np.minimum(loc, len(self._cells) - 1)
            hit = self._cells[loc_c] == cells
            counts = np.where(hit, self._offsets[loc_c + 1] - self._offsets[loc_c], 0)
            src = np.repeat(np.arange(len(x), dtype=np.int64), counts)
            starts = self._offsets[loc_c]
            # zero-row batch: ([0], cumsum) would be 1-long against
            # 0-long counts and np.repeat raises
            offs = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=offs[1:])
            local = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(offs, counts)
            entry = np.repeat(starts, counts) + local
        else:
            src = np.empty(0, dtype=np.int64)
            entry = np.empty(0, dtype=np.int64)

        poly = self._poly[entry]
        full = self._full[entry]
        out_src = [src[full]]
        out_poly = [poly[full]]
        # exact refine, grouped per polygon (few polygons -> short loop)
        e_src = src[~full]
        e_poly = poly[~full]
        pip_kernel = points_in_polygon
        if self.exact:
            from ..exact import points_in_polygon_exact as pip_kernel
        for p_idx in np.unique(e_poly):
            rows = e_src[e_poly == p_idx]
            p = self.polys[p_idx]
            ok = pip_kernel(p["ring_x"], p["ring_y"], x[rows], y[rows])
            out_src.append(rows[ok])
            out_poly.append(np.full(int(ok.sum()), p_idx, dtype=np.int64))
        src_all = np.concatenate(out_src)
        poly_all = np.concatenate(out_poly)
        pid = np.asarray([p["polygon_id"] for p in self.polys], dtype=np.int64)
        return src_all, pid[poly_all]


class PipJoinActor:
    """Actor-pool stage: (carry..., polygon_id) for each polygon
    containing the row's point (closed boundary semantics).

    ``poly_ref`` may be a raw polygon payload OR an already-built
    (typically ``ray.put``) :class:`PipIndex` — prefer the latter for
    large pools, same rationale as ``spatial.prebuilt_knn_index``."""

    def __init__(self, poly_ref, res: int | None = None,
                 x_col: str = "x", y_col: str = "y",
                 carry: tuple[str, ...] = ("doc_id",),
                 exact: bool | None = None):
        obj = ray.get(poly_ref) if isinstance(poly_ref, ray.ObjectRef) else poly_ref
        if isinstance(obj, PipIndex):
            # a prebuilt index OWNS its res/exact — silently honoring
            # mismatched kwargs would probe at the wrong granularity /
            # semantics (ADVICE r3 #1); omit them or pass them matching
            if res is not None and obj.res != res:
                raise ValueError(
                    f"PipJoinActor: prebuilt PipIndex was built at res="
                    f"{obj.res} but res={res} was requested")
            if exact is not None and obj.exact != exact:
                raise ValueError(
                    f"PipJoinActor: prebuilt PipIndex has exact="
                    f"{obj.exact} but exact={exact} was requested")
            self.index = obj
        else:
            self.index = PipIndex(obj,
                                  DEFAULT_CELL_RES if res is None else res,
                                  bool(exact))
        self.x_col, self.y_col, self.carry = x_col, y_col, carry

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column(self.x_col).to_numpy(zero_copy_only=False)
        y = batch.column(self.y_col).to_numpy(zero_copy_only=False)
        src_all, pids = self.index.probe(x, y)
        cols = {c: batch.column(c).take(pa.array(src_all)) for c in self.carry}
        cols["polygon_id"] = pa.array(pids)
        return pa.table(cols)


def _ring_intersects_box(rx, ry, mnx, mxx, mny, mxy) -> bool:
    """Any polygon edge intersects the box rectangle (scalar reference
    of the vectorized predicate inside :class:`PipIndex.__init__`)."""
    from ..kernels import box_segment_intersects

    return bool(np.any(box_segment_intersects(
        mnx, mxx, mny, mxy, rx, ry, np.roll(rx, -1), np.roll(ry, -1))))
