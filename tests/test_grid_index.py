"""GridKnn / GridContain vs brute force (the batched join engines)."""

import numpy as np

from locus_ray.grid_index import GridContain, GridKnn
from locus_ray.kernels import box_point_squared_distance, segment_point_squared_distance

rng = np.random.default_rng(21)


def _check_topk(gi, gd, d_mat, k):
    n, m = d_mat.shape
    for i in range(n):
        order = np.lexsort((np.arange(m), d_mat[i]))[: min(k, m)]
        assert np.array_equal(gi[i][: len(order)], order)
        assert np.allclose(gd[i][: len(order)], d_mat[i][order])
        assert np.all(gi[i][len(order):] == -1)


def test_point_build_side():
    m, n, k = 800, 150, 7
    bx = rng.uniform(-180, 180, m)
    by = rng.uniform(-90, 90, m)
    g = GridKnn("point", {"x": bx, "y": by}, np.arange(m), res=6)
    qx = rng.uniform(-180, 180, n)
    qy = rng.uniform(-90, 90, n)
    gi, gd = g.query(qx, qy, k)
    _check_topk(gi, gd, (qx[:, None] - bx) ** 2 + (qy[:, None] - by) ** 2, k)


def test_box_build_side_k_exceeds_size():
    m, n, k = 12, 40, 30
    cx = rng.uniform(-180, 180, m)
    cy = rng.uniform(-90, 90, m)
    w = rng.uniform(0.5, 30, m)
    h = rng.uniform(0.5, 15, m)
    g = GridKnn("box", {"min_x": cx - w, "max_x": cx + w, "min_y": cy - h, "max_y": cy + h},
                np.arange(m), res=5)
    qx = rng.uniform(-180, 180, n)
    qy = rng.uniform(-90, 90, n)
    gi, gd = g.query(qx, qy, k)
    d_mat = np.stack([
        box_point_squared_distance(cx - w, cx + w, cy - h, cy + h, qx[i], qy[i])
        for i in range(n)
    ])
    _check_topk(gi, gd, d_mat, k)


def test_segment_build_side():
    m, n, k = 300, 80, 4
    sx = rng.uniform(-180, 180, m)
    sy = rng.uniform(-90, 90, m)
    ex = sx + rng.uniform(-4, 4, m) + 0.01
    ey = sy + rng.uniform(-4, 4, m) + 0.01
    g = GridKnn("segment", {"start_x": sx, "start_y": sy, "end_x": ex, "end_y": ey},
                np.arange(m), res=6)
    qx = rng.uniform(-180, 180, n)
    qy = rng.uniform(-90, 90, n)
    gi, gd = g.query(qx, qy, k)
    d_mat = np.stack([
        segment_point_squared_distance(sx, sy, ex, ey, qx[i], qy[i]) for i in range(n)
    ])
    _check_topk(gi, gd, d_mat, k)


def test_hot_cluster_ties():
    bx = np.concatenate((np.full(50, 10.0), rng.uniform(-180, 180, 50)))
    by = np.concatenate((np.full(50, 50.0), rng.uniform(-90, 90, 50)))
    g = GridKnn("point", {"x": bx, "y": by}, np.arange(100), res=8)
    gi, gd = g.query(np.array([10.0]), np.array([50.0]), 5)
    assert gi[0].tolist() == [0, 1, 2, 3, 4]
    assert np.all(gd[0] == 0.0)


def test_contain_vs_brute_force():
    m, n = 400, 300
    cx = rng.uniform(-180, 180, m)
    cy = rng.uniform(-90, 90, m)
    w = rng.uniform(0.1, 25, m)
    h = rng.uniform(0.1, 12, m)
    gc = GridContain({"min_x": cx - w, "max_x": cx + w, "min_y": cy - h, "max_y": cy + h},
                     np.arange(m), res=6)
    qx = rng.uniform(-180, 180, n)
    qy = rng.uniform(-90, 90, n)
    src, bid = gc.query(qx, qy)
    got = set(zip(src.tolist(), bid.tolist()))
    exp = {
        (i, j)
        for i in range(n)
        for j in np.where(
            (cx - w <= qx[i]) & (qx[i] <= cx + w) & (cy - h <= qy[i]) & (qy[i] <= cy + h)
        )[0]
    }
    assert got == exp
