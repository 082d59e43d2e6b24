"""Grid / tile encoding — the engine's H3/S2 stand-in.

Maps float64 planar coordinates onto the 2^16 x 2^16 integer grid
(matching the reference's Hilbert grid, locus/_core/hilbert.py:3-4) and
derives from it:

* ``grid_coords``   — per-point integer grid coordinates (vectorized),
* ``cell_id``       — tile id at a coarse resolution ``res`` (cells per
  axis = 2**res); this is the engine's partitioning / shuffle key,
* ``cover_boxes``   — the set of cell ids intersecting each box (the
  "cell cover" used to route build-side geometries to partitions),
* ``expand_cover``  — ring expansion of a cover (for kNN re-probe).

Cell ids are ``cx * 2**res + cy`` (row-major) so they are expressible
in ANSI SQL for the DuckDB oracle; the Hilbert rank is kept as a
*separate* locality/sort key (``hilbert_index``) because it is not
SQL-expressible.

Scaling formula (float -> grid): ``ix = clip(floor((x - min_x) / w *
2**16), 0, 2**16 - 1)`` — same closed-world clamp the reference applies
when scaling box centers onto the Hilbert grid
(locus/_core/r.py:112-134 behavior; coordinates outside the world box
clamp to the border cell rather than erroring).
"""

from __future__ import annotations

import numpy as np

from .config import (
    GRID_BITS,
    MAX_COORDINATE,
    SQUARE_SIZE,
    WORLD_H,
    WORLD_MIN_X,
    WORLD_MIN_Y,
    WORLD_W,
)


def grid_coords(
    x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """float64 world coords -> int64 grid coords in [0, 65535].

    NaN coordinates raise: clip(NaN) passes through and the int64 cast
    is UNDEFINED (observed INT64_MIN), silently routing the row into a
    garbage cell that drops it from every shuffle join with no error."""
    xf = np.asarray(x, dtype=np.float64)
    yf = np.asarray(y, dtype=np.float64)
    if np.isnan(xf).any() or np.isnan(yf).any():
        raise ValueError("NaN coordinate in grid_coords input")
    ix = np.floor((xf - WORLD_MIN_X) / WORLD_W * SQUARE_SIZE)
    iy = np.floor((yf - WORLD_MIN_Y) / WORLD_H * SQUARE_SIZE)
    ix = np.clip(ix, 0, MAX_COORDINATE).astype(np.int64)
    iy = np.clip(iy, 0, MAX_COORDINATE).astype(np.int64)
    return ix, iy


def cell_of_grid(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """Grid coords -> row-major cell id at resolution ``res``."""
    if not 0 <= res <= GRID_BITS:
        # a negative shift count is numpy UB (observed all-zero cells)
        raise ValueError(f"res must be in [0, {GRID_BITS}], got {res}")
    shift = GRID_BITS - res
    cx = np.asarray(ix, dtype=np.int64) >> shift
    cy = np.asarray(iy, dtype=np.int64) >> shift
    return cx * (1 << res) + cy


def cell_id(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """float64 world coords -> cell id at resolution ``res``."""
    ix, iy = grid_coords(x, y)
    return cell_of_grid(ix, iy, res)


def cell_bounds(cid: np.ndarray, res: int) -> tuple[np.ndarray, ...]:
    """Cell id -> (min_x, max_x, min_y, max_y) of the cell rectangle."""
    n = 1 << res
    cx = np.asarray(cid, dtype=np.int64) // n
    cy = np.asarray(cid, dtype=np.int64) % n
    w = WORLD_W / n
    h = WORLD_H / n
    return (
        WORLD_MIN_X + cx * w,
        WORLD_MIN_X + (cx + 1) * w,
        WORLD_MIN_Y + cy * h,
        WORLD_MIN_Y + (cy + 1) * h,
    )


def _cell_range(lo: np.ndarray, hi: np.ndarray, world_min: float, world_extent: float, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-axis inclusive cell-index range [c_lo, c_hi] covering [lo, hi]."""
    n = 1 << res
    c_lo = np.clip(np.floor((lo - world_min) / world_extent * n), 0, n - 1).astype(np.int64)
    c_hi = np.clip(np.floor((hi - world_min) / world_extent * n), 0, n - 1).astype(np.int64)
    return c_lo, c_hi


def cover_boxes(
    min_x: np.ndarray,
    max_x: np.ndarray,
    min_y: np.ndarray,
    max_y: np.ndarray,
    res: int,
    pad: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Cell cover of each box (optionally padded by ``pad`` world units).

    Returns ``(row_idx, cell)`` arrays: row ``row_idx[j]`` intersects
    cell ``cell[j]``.  Vectorized via repeat/tile over the per-box
    (cx_lo..cx_hi) x (cy_lo..cy_hi) ranges; boxes spanning many cells
    expand into many rows — callers at scale should cap the resolution
    (or pre-clip giant boxes) so the cover stays bounded.
    """
    min_x = np.asarray(min_x, dtype=np.float64) - pad
    max_x = np.asarray(max_x, dtype=np.float64) + pad
    min_y = np.asarray(min_y, dtype=np.float64) - pad
    max_y = np.asarray(max_y, dtype=np.float64) + pad
    cx_lo, cx_hi = _cell_range(min_x, max_x, WORLD_MIN_X, WORLD_W, res)
    cy_lo, cy_hi = _cell_range(min_y, max_y, WORLD_MIN_Y, WORLD_H, res)

    nx = cx_hi - cx_lo + 1
    ny = cy_hi - cy_lo + 1
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    if total == 0:
        return row_idx, np.empty(0, dtype=np.int64)

    # per-output-row offsets 0..counts[i]-1
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    ny_r = np.repeat(ny, counts)
    dx = local // ny_r
    dy = local % ny_r
    cx = np.repeat(cx_lo, counts) + dx
    cy = np.repeat(cy_lo, counts) + dy
    return row_idx, cx * (1 << res) + cy


def neighbor_cells(cid: np.ndarray, res: int, ring: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Cells within Chebyshev distance ``ring`` of each input cell.

    Returns ``(row_idx, cell)`` pairs (clipped at world edges,
    deduplicated per row is NOT performed — edge clipping never
    produces duplicates because offsets are distinct and clipping uses
    masking, not clamping).
    """
    n = 1 << res
    cid = np.asarray(cid, dtype=np.int64)
    cx = cid // n
    cy = cid % n
    offs = np.arange(-ring, ring + 1, dtype=np.int64)
    ox, oy = np.meshgrid(offs, offs, indexing="ij")
    ox = ox.ravel()
    oy = oy.ravel()
    k = len(ox)
    ncx = cx[:, None] + ox[None, :]
    ncy = cy[:, None] + oy[None, :]
    valid = (ncx >= 0) & (ncx < n) & (ncy >= 0) & (ncy < n)
    row_idx = np.repeat(np.arange(len(cid), dtype=np.int64), k).reshape(-1, k)
    return row_idx[valid], (ncx * n + ncy)[valid]
