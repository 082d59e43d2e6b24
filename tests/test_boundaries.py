"""Boundary-semantics property tests (FIXTURES.md domains): points
exactly on box edges / cell boundaries, duplicate coordinates,
degenerate extents — the cases where closed/strict semantics and
tie-breaks actually bite."""

import numpy as np

from locus_ray.cells import cell_id, grid_coords
from locus_ray.config import SQUARE_SIZE, WORLD_MIN_X, WORLD_MIN_Y
from locus_ray.grid_index import GridContain, GridKnn
from locus_ray.kernels import box_point_squared_distance, contains_point

rng = np.random.default_rng(77)


def test_points_exactly_on_cell_boundaries():
    # grid lines at WORLD_MIN + i * (extent / 2^16): points exactly on
    # them must route deterministically (floor -> right/upper cell) and
    # still get exact join results
    i = np.array([100, 2000, 40000], dtype=np.int64)
    x = WORLD_MIN_X + i * (360.0 / SQUARE_SIZE)
    y = WORLD_MIN_Y + i * (180.0 / SQUARE_SIZE)
    ix, iy = grid_coords(x, y)
    # a point exactly on boundary i*w belongs to cell i (floor semantics)
    # up to float rounding of the product; assert consistency with floor
    assert np.array_equal(ix, np.floor((x - WORLD_MIN_X) / 360.0 * SQUARE_SIZE).astype(np.int64))
    assert np.array_equal(iy, np.floor((y - WORLD_MIN_Y) / 180.0 * SQUARE_SIZE).astype(np.int64))


def test_contain_on_box_edges():
    # query points exactly on min/max edges are inside (closed)
    boxes = {
        "min_x": np.array([0.0, 10.0]), "max_x": np.array([5.0, 20.0]),
        "min_y": np.array([0.0, -5.0]), "max_y": np.array([5.0, 5.0]),
    }
    gc = GridContain(boxes, np.array([0, 1]), res=8)
    qx = np.array([0.0, 5.0, 10.0, 20.0, 5.0000000001])
    qy = np.array([0.0, 5.0, 0.0, 5.0, 5.0])
    src, bid = gc.query(qx, qy)
    got = set(zip(src.tolist(), bid.tolist()))
    exp = set()
    for i in range(len(qx)):
        for j in range(2):
            if contains_point(boxes["min_x"][j], boxes["max_x"][j],
                              boxes["min_y"][j], boxes["max_y"][j], qx[i], qy[i]):
                exp.add((i, j))
    assert got == exp
    assert (0, 0) in got and (1, 0) in got  # corners count


def test_knn_with_duplicate_points_and_query_on_top():
    # multiple identical build points; query exactly at that spot:
    # smallest ids win the zero-distance ties
    bx = np.concatenate((np.full(7, -20.0), rng.uniform(-180, 180, 60)))
    by = np.concatenate((np.full(7, 33.0), rng.uniform(-90, 90, 60)))
    g = GridKnn("point", {"x": bx, "y": by}, np.arange(67), res=8)
    gi, gd = g.query(np.array([-20.0]), np.array([33.0]), 4)
    assert gi[0].tolist() == [0, 1, 2, 3]
    assert np.all(gd[0] == 0.0)


def test_knn_boxes_query_on_shared_edge():
    # two boxes sharing an edge; query point exactly on the shared edge
    # -> distance 0 to both, id order decides
    g = GridKnn("box", {
        "min_x": np.array([0.0, 5.0]), "max_x": np.array([5.0, 10.0]),
        "min_y": np.array([0.0, 0.0]), "max_y": np.array([5.0, 5.0]),
    }, np.array([10, 3]), res=8)
    gi, gd = g.query(np.array([5.0]), np.array([2.0]), 2)
    assert gi[0].tolist() == [3, 10]
    assert np.all(gd[0] == 0.0)


def test_random_worlds_property(seed=0):
    # randomized: mixed tiny/huge boxes + boundary-snapped queries;
    # engine top-k must equal brute force everywhere
    r = np.random.default_rng(seed)
    for trial in range(5):
        m = int(r.integers(5, 300))
        cx = r.uniform(-180, 180, m)
        cy = r.uniform(-90, 90, m)
        w = np.where(r.random(m) < 0.1, r.uniform(30, 150, m), r.uniform(0.01, 5, m))
        h = np.where(r.random(m) < 0.1, r.uniform(20, 80, m), r.uniform(0.01, 3, m))
        boxes = {"min_x": cx - w, "max_x": cx + w, "min_y": cy - h, "max_y": cy + h}
        g = GridKnn("box", boxes, np.arange(m), res=8)
        n = 120
        qx = r.uniform(-180, 180, n)
        qy = r.uniform(-90, 90, n)
        # snap a third of queries exactly onto box edges
        snap = r.integers(0, m, n // 3)
        qx[: n // 3] = boxes["min_x"][snap]
        qy[: n // 3] = np.clip(cy[snap], -90, 90)
        k = int(r.integers(1, 8))
        gi, gd = g.query(qx, qy, k)
        for i in range(n):
            d = box_point_squared_distance(
                boxes["min_x"], boxes["max_x"], boxes["min_y"], boxes["max_y"],
                qx[i], qy[i],
            )
            order = np.lexsort((np.arange(m), d))[: min(k, m)]
            assert np.array_equal(gi[i][: len(order)], order), (trial, i)
            assert np.allclose(gd[i][: len(order)], d[order])


def test_grid_coords_rejects_nan_and_res_bounds():
    """NaN coords must raise (clip(NaN)→int64 is UB, silently landing
    rows in garbage cells); res beyond GRID_BITS must raise (negative
    shift is numpy UB)."""
    import numpy as np
    import pytest

    from locus_ray import cells

    with pytest.raises(ValueError):
        cells.grid_coords(np.array([np.nan]), np.array([0.0]))
    with pytest.raises(ValueError):
        cells.grid_coords(np.array([0.0]), np.array([np.nan]))
    ix, iy = cells.grid_coords(np.array([0.0]), np.array([0.0]))
    with pytest.raises(ValueError):
        cells.cell_of_grid(ix, iy, 17)
    assert cells.cell_of_grid(ix, iy, 8).shape == (1,)
