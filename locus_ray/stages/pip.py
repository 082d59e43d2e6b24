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


class PipJoinActor:
    """Actor-pool stage: (carry..., polygon_id) for each polygon
    containing the row's point (closed boundary semantics)."""

    def __init__(self, poly_ref, res: int = DEFAULT_CELL_RES,
                 x_col: str = "x", y_col: str = "y",
                 carry: tuple[str, ...] = ("doc_id",)):
        payload = ray.get(poly_ref) if isinstance(poly_ref, ray.ObjectRef) else poly_ref
        self.polys = payload["polygons"]
        self.res = res
        self.x_col, self.y_col, self.carry = x_col, y_col, carry
        n_axis = 1 << res

        # rasterize: per polygon, classify covered cells full / edge
        cell_map: dict[int, list[tuple[int, bool]]] = {}
        for p_idx, p in enumerate(self.polys):
            rx, ry = p["ring_x"], p["ring_y"]
            row_idx, cells = cover_boxes(
                np.array([rx.min()]), np.array([rx.max()]),
                np.array([ry.min()]), np.array([ry.max()]), res,
            )
            mnx, mxx, mny, mxy = cell_bounds(cells, res)
            for c, a, b, cdy, d in zip(cells, mnx, mxx, mny, mxy, strict=True):
                corners_in = points_in_polygon(
                    rx, ry, np.array([a, a, b, b]), np.array([cdy, d, cdy, d])
                )
                edge_crosses = _ring_intersects_box(rx, ry, a, b, cdy, d)
                if corners_in.all() and not edge_crosses:
                    cell_map.setdefault(int(c), []).append((p_idx, True))
                elif corners_in.any() or edge_crosses:
                    cell_map.setdefault(int(c), []).append((p_idx, False))
        self.cell_map = cell_map

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column(self.x_col).to_numpy(zero_copy_only=False)
        y = batch.column(self.y_col).to_numpy(zero_copy_only=False)
        ix, iy = grid_coords(x, y)
        shift = 16 - self.res
        cells = (ix >> shift) * (1 << self.res) + (iy >> shift)
        src_out, pid_out = [], []
        # group rows by (polygon, full/edge) via the cell map
        by_poly_exact: dict[int, list[int]] = {}
        for i, c in enumerate(cells):
            for p_idx, full in self.cell_map.get(int(c), ()):
                if full:
                    src_out.append(i)
                    pid_out.append(self.polys[p_idx]["polygon_id"])
                else:
                    by_poly_exact.setdefault(p_idx, []).append(i)
        for p_idx, rows in by_poly_exact.items():
            rows = np.asarray(rows, dtype=np.int64)
            p = self.polys[p_idx]
            ok = points_in_polygon(p["ring_x"], p["ring_y"], x[rows], y[rows])
            for r in rows[ok]:
                src_out.append(int(r))
                pid_out.append(p["polygon_id"])
        src = np.asarray(src_out, dtype=np.int64)
        cols = {c: batch.column(c).take(pa.array(src)) for c in self.carry}
        cols["polygon_id"] = pa.array(np.asarray(pid_out, dtype=np.int64))
        return pa.table(cols)


def _ring_intersects_box(rx, ry, mnx, mxx, mny, mxy) -> bool:
    """Any polygon edge intersects the box rectangle (conservative)."""
    from ..kernels import box_segment_squared_distance

    n = len(rx)
    sx = rx
    sy = ry
    ex = np.roll(rx, -1)
    ey = np.roll(ry, -1)
    d = box_segment_squared_distance(mnx, mxx, mny, mxy, sx, sy, ex, ey)
    return bool(np.any(d == 0.0))
