"""locus-style compat API parity tests (call shapes + contracts)."""

import numpy as np
import pytest

from locus_ray.compat import KdTree, RTree, SegmentalTree

rng = np.random.default_rng(31)


def test_kd_tree_api():
    pts = [(float(x), float(y)) for x, y in rng.uniform(-10, 10, (50, 2))]
    t = KdTree(pts)
    i, p = t.nearest_item((0.0, 0.0))
    assert p == pts[i]
    assert t.nearest_index((0.0, 0.0)) == i
    assert t.nearest_point((0.0, 0.0)) == p
    items = t.n_nearest_items(5, (0.0, 0.0))
    assert len(items) == 5
    assert t.n_nearest_indices(5, (0.0, 0.0)) == [i for i, _ in items]
    # n >= size returns all (locus/kd.py:216-220 contract)
    assert len(t.n_nearest_items(100, (0.0, 0.0))) == 50
    box = (-5.0, 5.0, -5.0, 5.0)
    got = t.find_box_items(box)
    exp = [(i, p) for i, p in enumerate(pts)
           if box[0] <= p[0] <= box[1] and box[2] <= p[1] <= box[3]]
    assert sorted(got) == sorted(exp)


def test_rtree_api():
    boxes = []
    for cx, cy in rng.uniform(-10, 10, (40, 2)):
        w, h = rng.uniform(0.1, 3, 2)
        boxes.append((float(cx - w), float(cx + w), float(cy - h), float(cy + h)))
    t = RTree(boxes, max_children=4)
    i, b = t.nearest_item((0.0, 0.0))
    assert b == boxes[i]
    assert len(t.n_nearest_items(7, (0.0, 0.0))) == 7
    assert len(t.n_nearest_boxes(100, (0.0, 0.0))) == 40
    world = (-20.0, 20.0, -20.0, 20.0)
    assert sorted(t.find_subsets_indices(world)) == list(range(40))
    # every box is a superset of a degenerate box at its center
    b0 = boxes[0]
    c = ((b0[0] + b0[1]) / 2, (b0[2] + b0[3]) / 2)
    assert 0 in t.find_supersets_indices((c[0], c[0], c[1], c[1]))
    with pytest.raises(ValueError):
        RTree([])


def test_segmental_tree_api():
    segs = []
    for sx, sy in rng.uniform(-10, 10, (30, 2)):
        dx, dy = rng.uniform(0.1, 2, 2)
        segs.append(((float(sx), float(sy)), (float(sx + dx), float(sy + dy))))
    t = SegmentalTree(segs)
    i, s = t.nearest_to_point_item((0.0, 0.0))
    assert s == segs[i]
    assert len(t.n_nearest_to_point_items(4, (0.0, 0.0))) == 4
    q = ((0.0, 0.0), (1.0, 1.0))
    i2, s2 = t.nearest_item(q)
    assert s2 == segs[i2]
    assert len(t.n_nearest_segments(100, q)) == 30


def test_kdtree_manhattan_context():
    """Pluggable ground metric (reference Context parity): L1 kNN
    ordering differs from euclidean and matches a brute-force oracle."""
    import numpy as np

    from locus_ray.compat import KdTree

    rng = np.random.default_rng(5)
    pts = [(float(x), float(y)) for x, y in rng.uniform(-50, 50, (300, 2))]
    t_l1 = KdTree(pts, context="manhattan")
    t_l2 = KdTree(pts)
    q = (3.7, -11.2)
    got = t_l1.n_nearest_indices(5, q)
    d1 = np.array([abs(p[0] - q[0]) + abs(p[1] - q[1]) for p in pts])
    order = np.lexsort((np.arange(len(pts)), d1))
    assert got == [int(i) for i in order[:5]]
    # sanity: the two metrics genuinely disagree somewhere on this set
    diff = any(t_l1.n_nearest_indices(5, tuple(p)) != t_l2.n_nearest_indices(5, tuple(p))
               for p in rng.uniform(-50, 50, (50, 2)))
    assert diff


def test_kdtree_exact_context_smoke():
    from locus_ray.compat import KdTree

    t = KdTree([(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)], context="exact")
    assert t.nearest_index((0.9, 0.9)) == 1


def test_rtree_and_segtree_exact_context_smoke():
    from locus_ray.compat import RTree, SegmentalTree

    rt = RTree([(0.0, 2.0, 0.0, 2.0), (5.0, 7.0, 5.0, 7.0)], context="exact")
    assert rt.nearest_index((6.0, 6.0)) == 1
    assert rt.n_nearest_indices(2, (0.0, 0.0)) == [0, 1]
    st = SegmentalTree([((0.0, 0.0), (1.0, 0.0)), ((5.0, 5.0), (6.0, 5.0))],
                       context="exact")
    assert st.n_nearest_indices(1, ((5.2, 5.1), (5.8, 5.1))) == [1]


def test_manhattan_segment_queries_vs_brute_force():
    """The manhattan context must score SEGMENTS in L1 too: with the
    euclidean segment kernel, ring retirement compared a squared-euclid
    kth against the L1 grid_bound and returned wrong nearest segments."""
    import numpy as np

    from locus_ray.context import (_manhattan_segment_point,
                                   _manhattan_segments)
    from locus_ray.grid_index import GridKnn, SegSegGridKnn

    rng = np.random.default_rng(11)
    n = 400
    sx = rng.uniform(-20, 20, n)
    sy = rng.uniform(-20, 20, n)
    ex = sx + rng.uniform(0.1, 3.0, n)
    ey = sy + rng.uniform(-3.0, 3.0, n)
    geoms = {"start_x": sx, "start_y": sy, "end_x": ex, "end_y": ey}
    ids = np.arange(n, dtype=np.int64)

    qx = rng.uniform(-20, 20, 40)
    qy = rng.uniform(-20, 20, 40)
    idx = GridKnn("segment", geoms, ids, res=8, context="manhattan")
    got_ids, got_d = idx.query(qx, qy, 3)
    bf = _manhattan_segment_point(sx[None, :], sy[None, :],
                                  ex[None, :], ey[None, :],
                                  qx[:, None], qy[:, None])
    for r in range(len(qx)):
        order = np.lexsort((ids, bf[r]))[:3]
        assert got_ids[r].tolist() == ids[order].tolist(), r
        assert np.allclose(got_d[r], bf[r][order])

    # seg-seg: query segments against the same build side
    qsx, qsy = qx[:10], qy[:10]
    qex, qey = qsx + 0.5, qsy - 0.7
    ss = SegSegGridKnn(geoms, ids, res=6, context="manhattan")
    ss_ids, ss_d = ss.query(qsx, qsy, qex, qey, 2)
    bf2 = _manhattan_segments(qsx[:, None], qsy[:, None],
                              qex[:, None], qey[:, None],
                              sx[None, :], sy[None, :],
                              ex[None, :], ey[None, :])
    for r in range(len(qsx)):
        order = np.lexsort((ids, bf2[r]))[:2]
        assert ss_ids[r].tolist() == ids[order].tolist(), r


def test_manhattan_l1_kernel_values():
    """Spot values of the L1 segment kernels (breakpoint minimum)."""
    import numpy as np

    from locus_ray.context import _manhattan_segment_point

    # vertical segment x=0, y in [0, 4]; query (3, 2): min at ty -> 3
    d = _manhattan_segment_point(np.array([0.0]), np.array([0.0]),
                                 np.array([0.0]), np.array([4.0]),
                                 np.array([3.0]), np.array([2.0]))
    assert d[0] == 3.0
    # diagonal segment (0,0)-(4,4); query (1, 3): best at t=0.5 via
    # breakpoints tx=0.25 (d=3-4t -> 2) / ty=0.75 (d=4t-... ) -> 2
    d = _manhattan_segment_point(np.array([0.0]), np.array([0.0]),
                                 np.array([4.0]), np.array([4.0]),
                                 np.array([1.0]), np.array([3.0]))
    assert d[0] == 2.0


def test_fraction_exactness_with_float_queries():
    """A float query against a Fraction-built tree must stay exact:
    Fraction * float degrades to float64 and collapsed sub-ulp build
    points into a float tie resolved by the wrong id."""
    from fractions import Fraction

    from locus_ray.compat import KdTree

    a = Fraction(1, 3)
    b = a + Fraction(1, 2**80)  # one sub-float64-ulp apart
    t = KdTree([(a, 0), (b, 0)])
    # 0.4 > 1/3, so the slightly-larger b (id 1) is strictly nearer
    assert t.nearest_index((0.4, 0.0)) == 1
    assert t.nearest_index((Fraction(2, 5), Fraction(0))) == 1
