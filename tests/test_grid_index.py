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


def test_box_out_of_world_queries_fall_back_to_rings():
    """Out-of-world points skip the per-cell-list fast path (its U_all
    argument needs the point inside its home cell) and must still get
    exact answers from the ring + dense fallback."""
    import numpy as np

    from locus_ray import derive
    from locus_ray.grid_index import GridKnn, box_point_squared_distance

    ids = np.arange(400, dtype=np.int64)
    mnx, mxx, mny, mxy = derive.zone_box(ids)
    g = GridKnn("box", {"min_x": mnx, "max_x": mxx, "min_y": mny, "max_y": mxy},
                ids, 8)
    qx = np.array([-250.0, 400.0, 10.0, 0.0])
    qy = np.array([5.0, -120.0, 300.0, 0.0])  # 3 out-of-world, 1 in
    bi, bd = g.query(qx, qy, 3)
    for i in range(len(qx)):
        d2 = box_point_squared_distance(mnx, mxx, mny, mxy, qx[i], qy[i])
        o = np.lexsort((ids, d2))
        assert list(bi[i]) == list(ids[o[:3]]), i


def test_point_build_single_cell_cluster():
    """All build points inside one tiny region (degenerate hot case)."""
    import numpy as np

    from locus_ray.grid_index import GridKnn

    rng = np.random.default_rng(3)
    n = 2000
    x = 10.0 + rng.uniform(0, 0.001, n)
    y = 50.0 + rng.uniform(0, 0.001, n)
    ids = np.arange(n, dtype=np.int64)
    g = GridKnn("point", {"x": x, "y": y}, ids, 8)
    qx = np.array([10.0005, -170.0])
    qy = np.array([50.0005, -80.0])
    bi, bd = g.query(qx, qy, 2)
    for i in range(2):
        d2 = (x - qx[i]) ** 2 + (y - qy[i]) ** 2
        o = np.lexsort((ids, d2))
        assert list(bi[i]) == list(ids[o[:2]]), i


def test_point_fully_degenerate_cluster():
    """10^5 build points at ONE exact coordinate (the cluster no grid
    can split) + uniform background.  The per-k dominance truncation in
    _hot_level must keep this linear — only the kk smallest-id members
    of the landmark can ever appear in a top-k — while staying exact
    for queries at the landmark, near it, and far away.

    Linearity is asserted STRUCTURALLY (the truncated hot level holds
    ~kk members, not 10^5) rather than by wall-clock — identical runs
    on this time-shared VM vary 0.6s..50s, so a timing assert only
    measures contention (BASELINE.md 'VM noise')."""
    import numpy as np

    from locus_ray.grid_index import GridKnn

    r = np.random.default_rng(11)
    n_hot, n_cold = 100_000, 5_000
    x = np.concatenate((np.full(n_hot, 10.0), r.uniform(-180, 180, n_cold)))
    y = np.concatenate((np.full(n_hot, 50.0), r.uniform(-90, 90, n_cold)))
    ids = np.arange(n_hot + n_cold, dtype=np.int64)
    g = GridKnn("point", {"x": x, "y": y}, ids, 8)
    qx = np.array([10.0, 10.001, 10.5, -170.0])
    qy = np.array([50.0, 50.001, 50.5, -80.0])
    bi, bd = g.query(qx, qy, 3)
    for i in range(len(qx)):
        d2 = (x - qx[i]) ** 2 + (y - qy[i]) ** 2
        o = np.lexsort((ids, d2))
        assert list(bi[i]) == list(ids[o[:3]]), i
        assert np.allclose(bd[i], d2[o[:3]])
    # the dominance truncation is what bounds the work: the kk=3 hot
    # level must keep only the 3 smallest-id landmark members (no other
    # hot cells exist), so rings and the bounded dump touch O(kk) rows
    # instead of the 10^5-member landmark dump
    _, members_k, _ = g._hot_level(3)
    assert len(members_k) == 3, len(members_k)
    assert list(np.sort(g.ids[members_k])) == [0, 1, 2]


def test_segseg_vs_brute_force():
    """SegSegGridKnn vs dense P7 — including overlapping/crossing
    segments (zero distance) and far pairs, random k."""
    import numpy as np

    from locus_ray.grid_index import SegSegGridKnn
    from locus_ray.kernels import segments_squared_distance

    r = np.random.default_rng(17)
    m, n, k = 250, 120, 4
    sx = r.uniform(-170, 170, m); sy = r.uniform(-80, 80, m)
    ex = sx + r.uniform(-6, 6, m); ey = sy + r.uniform(-6, 6, m)
    ids = np.arange(m, dtype=np.int64)
    g = SegSegGridKnn({"start_x": sx, "start_y": sy, "end_x": ex, "end_y": ey},
                      ids, 8)
    qsx = r.uniform(-170, 170, n); qsy = r.uniform(-80, 80, n)
    qex = qsx + r.uniform(-6, 6, n); qey = qsy + r.uniform(-6, 6, n)
    bi, bd = g.query(qsx, qsy, qex, qey, k)
    for i in range(n):
        d2 = segments_squared_distance(sx, sy, ex, ey,
                                       qsx[i], qsy[i], qex[i], qey[i])
        o = np.lexsort((ids, d2))[:k]
        assert list(bi[i]) == list(ids[o]), i
        assert np.allclose(bd[i], d2[o])


def test_segseg_k_exceeds_build_size():
    import numpy as np

    from locus_ray.grid_index import SegSegGridKnn

    sx = np.array([0.0, 10.0]); sy = np.array([0.0, 10.0])
    ex = np.array([1.0, 11.0]); ey = np.array([0.5, 10.5])
    g = SegSegGridKnn({"start_x": sx, "start_y": sy, "end_x": ex, "end_y": ey},
                      np.array([7, 9], dtype=np.int64), 8)
    bi, bd = g.query(np.array([5.0]), np.array([5.0]),
                     np.array([6.0]), np.array([5.5]), 5)
    assert set(bi[0][bi[0] >= 0]) == {7, 9}
    assert (bi[0] >= 0).sum() == 2


def test_near_cluster_queries_retire_without_dump():
    """Perf-invariant regression test for the round-3 hot-path bug:
    probes just OUTSIDE the hot-member bbox must retire through ring
    coverage (triangle bound max(hd, r*min_cell - hd)) — never by
    exhausting the ring cap into the bounded all-members dump.
    Checked via the deterministic last_query_stats counters, not wall
    time."""
    rng = np.random.default_rng(77)
    n_hot, n_cold = 30_000, 3_000
    # tight cluster in [0, 1]^2, sparse background elsewhere
    hx = rng.uniform(0.0, 1.0, n_hot)
    hy = rng.uniform(0.0, 1.0, n_hot)
    cx = rng.uniform(-170, 170, n_cold)
    cy = rng.uniform(-85, 85, n_cold)
    x = np.concatenate((hx, cx))
    y = np.concatenate((hy, cy))
    ids = np.arange(n_hot + n_cold, dtype=np.int64)
    g = GridKnn("point", {"x": x, "y": y}, ids, 8)
    assert g.hot_buckets is not None
    # probe a ring of points just outside the hot bbox (within ~one
    # in-cluster neighbor distance of the boundary on every side)
    t = rng.uniform(0.0, 1.0, 256)
    eps = 0.003
    qx = np.concatenate((t, t, np.full(256, -eps), np.full(256, 1 + eps)))
    qy = np.concatenate((np.full(256, -eps), np.full(256, 1 + eps), t, t))
    got_ids, got_d2 = g.query(qx, qy, 3)
    assert g.last_query_stats["dump_rows"] == 0
    assert g.last_query_stats["rounds"] <= 4
    # exactness vs brute force on a subset
    sub = rng.integers(0, len(qx), 40)
    dx = x[None, :] - qx[sub][:, None]
    dy = y[None, :] - qy[sub][:, None]
    dd = dx * dx + dy * dy
    order = np.lexsort((np.broadcast_to(ids, dd.shape), dd), axis=1)[:, :3]
    assert np.array_equal(got_ids[sub], ids[order])
    assert np.array_equal(got_d2[sub], np.take_along_axis(dd, order, axis=1))
