"""Index structures vs brute force: structural invariants + oracle
equality (reference pattern: tests/kd_tests/test_initialization.py:27-32,
tests/kd_tests/test_nearest_item.py:43-50,
tests/r_tests/test_find_subsets_items.py:31-39)."""

import math

import numpy as np
import pytest

from locus_ray.index import KDTree, PackedRTree, SegmentTree
from locus_ray.kernels import (
    box_is_subset,
    box_point_squared_distance,
    segment_point_squared_distance,
    segments_squared_distance,
)

rng = np.random.default_rng(11)


@pytest.mark.parametrize("n", [1, 2, 3, 10, 257])
def test_kd_structure(n):
    xs = rng.uniform(-100, 100, n)
    ys = rng.uniform(-100, 100, n)
    t = KDTree(xs, ys)
    assert t.is_valid()
    assert t.depth() <= math.ceil(math.log2(n + 1))  # balanced (exact-height analog)


def test_kd_queries_vs_brute_force():
    n = 400
    xs = rng.uniform(-100, 100, n)
    ys = rng.uniform(-100, 100, n)
    t = KDTree(xs, ys)
    for _ in range(30):
        qx, qy = rng.uniform(-120, 120, 2)
        d = (xs - qx) ** 2 + (ys - qy) ** 2
        order = np.lexsort((np.arange(n), d))
        assert t.nearest(qx, qy) == (order[0], d[order[0]])
        k = int(rng.integers(1, 25))
        assert [i for i, _ in t.n_nearest(k, qx, qy)] == list(order[:k])
        a, b = sorted(rng.uniform(-120, 120, 2))
        c, e = sorted(rng.uniform(-120, 120, 2))
        exp = np.where((a <= xs) & (xs <= b) & (c <= ys) & (ys <= e))[0]
        assert np.array_equal(t.find_box(a, b, c, e), exp)


def test_kd_empty_and_duplicates():
    with pytest.raises(ValueError):
        KDTree(np.array([]), np.array([])).nearest(0, 0)
    t = KDTree(np.array([1.0, 1.0, 1.0]), np.array([2.0, 2.0, 2.0]))
    assert t.nearest(1, 2) == (0, 0.0)  # smallest-id tie-break
    # n >= size fast path returns all
    assert len(t.n_nearest(10, 0, 0)) == 3


@pytest.mark.parametrize("n,mc", [(1, 16), (2, 2), (16, 16), (17, 16), (300, 4), (300, 16)])
def test_rtree_structure_and_queries(n, mc):
    cx = rng.uniform(-100, 100, n)
    cy = rng.uniform(-100, 100, n)
    w = rng.uniform(0.01, 10, n)
    h = rng.uniform(0.01, 10, n)
    boxes = (cx - w, cx + w, cy - h, cy + h)
    t = PackedRTree(*boxes, max_children=mc)
    assert t.is_valid()
    for _ in range(15):
        qx, qy = rng.uniform(-120, 120, 2)
        d = box_point_squared_distance(*boxes, qx, qy)
        order = np.lexsort((np.arange(n), d))
        assert t.nearest(qx, qy) == (order[0], d[order[0]])
        k = int(rng.integers(1, n + 2))
        assert [i for i, _ in t.n_nearest(k, qx, qy)] == list(order[:min(k, n)])
        a, b = sorted(rng.uniform(-120, 120, 2))
        c, e = sorted(rng.uniform(-120, 120, 2))
        assert np.array_equal(
            t.find_subsets(a, b, c, e),
            np.where(box_is_subset(*boxes, a, b, c, e))[0],
        )
        assert np.array_equal(
            t.find_supersets(a, b, c, e),
            np.where(box_is_subset(a, b, c, e, *boxes))[0],
        )


def test_rtree_degenerate_extent():
    # all-identical boxes: zero-extent root must not crash (the `or 1`
    # guard adopted from locus/_core/segmental.py:195-200)
    z = np.zeros(50)
    t = PackedRTree(z, z, z, z)
    assert t.nearest(3.0, 4.0) == (0, 25.0)


def test_rtree_self_inclusion():
    # every stored box is in its own subsets result
    # (tests/r_tests/test_find_subsets_items.py:22-27 analog)
    n = 64
    cx = rng.uniform(-50, 50, n)
    cy = rng.uniform(-50, 50, n)
    w = rng.uniform(0.1, 5, n)
    h = rng.uniform(0.1, 5, n)
    t = PackedRTree(cx - w, cx + w, cy - h, cy + h)
    for i in range(0, n, 7):
        got = t.find_subsets(cx[i] - w[i], cx[i] + w[i], cy[i] - h[i], cy[i] + h[i])
        assert i in got


def test_segment_tree_vs_brute_force():
    n = 200
    sx = rng.uniform(-100, 100, n)
    sy = rng.uniform(-100, 100, n)
    ex = sx + rng.uniform(-5, 5, n) + 0.01
    ey = sy + rng.uniform(-5, 5, n) + 0.01
    t = SegmentTree(sx, sy, ex, ey)
    for _ in range(15):
        qx, qy = rng.uniform(-120, 120, 2)
        d = segment_point_squared_distance(sx, sy, ex, ey, qx, qy)
        order = np.lexsort((np.arange(n), d))
        assert t.nearest_to_point(qx, qy) == (order[0], d[order[0]])
        k = int(rng.integers(1, 12))
        assert [i for i, _ in t.n_nearest_to_point(k, qx, qy)] == list(order[:k])
        a = rng.uniform(-100, 100, 2)
        b = a + rng.uniform(-5, 5, 2) + 0.01
        d = segments_squared_distance(sx, sy, ex, ey, a[0], a[1], b[0], b[1])
        order = np.lexsort((np.arange(n), d))
        assert t.nearest_to_segment(a[0], a[1], b[0], b[1]) == (order[0], d[order[0]])


def test_segment_tree_intersecting_is_zero():
    # a query segment crossing a stored one -> distance 0 (the -inf
    # exact-hit analog, locus/_core/segmental.py:82-104)
    t = SegmentTree(np.array([0.0]), np.array([0.0]), np.array([10.0]), np.array([0.0]))
    i, d = t.nearest_to_segment(5.0, -1.0, 5.0, 1.0)
    assert (i, d) == (0, 0.0)


def test_rtree_max_children_sweep():
    """Reference parity: tests/r_tests/strategies.py:17-19 sweeps
    max_children over {2..2^9} union [2, 65535]; validity + query
    results must be identical at every fan-out."""
    import numpy as np

    from locus_ray import derive
    from locus_ray.index import PackedRTree
    from locus_ray.kernels import box_point_squared_distance

    ids = np.arange(150, dtype=np.int64)
    mnx, mxx, mny, mxy = derive.zone_box(ids)
    qx, qy = 12.5, -33.0
    d2 = box_point_squared_distance(mnx, mxx, mny, mxy, qx, qy)
    expect = ids[np.lexsort((ids, d2))[:4]].tolist()
    expect_subsets = None
    for mc in (2, 3, 4, 5, 8, 16, 64, 128, 512, 65535):
        t = PackedRTree(mnx, mxx, mny, mxy, ids=ids, max_children=mc)
        assert t.is_valid(), mc
        got = [i for i, _ in t.n_nearest(4, qx, qy)]
        assert got == expect, mc
        subs = sorted(t.find_subsets(-50.0, 50.0, -50.0, 50.0))
        if expect_subsets is None:
            expect_subsets = subs
        assert subs == expect_subsets, mc


def test_segment_tree_max_children_sweep():
    import numpy as np

    from locus_ray import derive
    from locus_ray.index import SegmentTree
    from locus_ray.kernels import segment_point_squared_distance

    ids = np.arange(120, dtype=np.int64)
    sx, sy, ex, ey = derive.segment_coords(ids)
    qx, qy = -8.0, 14.0
    d2 = segment_point_squared_distance(sx, sy, ex, ey, qx, qy)
    expect = ids[np.lexsort((ids, d2))[:3]].tolist()
    for mc in (2, 3, 7, 16, 255, 65535):
        t = SegmentTree(sx, sy, ex, ey, ids=ids, max_children=mc)
        got = [i for i, _ in t.n_nearest_to_point(3, qx, qy)]
        assert got == expect, mc


def test_trees_n_zero_returns_empty():
    """n <= 0 must return [] — the iter-drain break fires only AFTER an
    append (r/seg trees returned ALL items) and the kd bounded heap
    indexed heap[0] on an empty heap."""
    import numpy as np

    from locus_ray import derive
    from locus_ray.index import KDTree, PackedRTree, SegmentTree

    ids = np.arange(50, dtype=np.int64)
    x, y = derive.doc_xy(ids)
    kd = KDTree(x, y, ids=ids)
    assert kd.n_nearest(0, 0.0, 0.0) == []
    mnx, mxx, mny, mxy = derive.zone_box(ids)
    rt = PackedRTree(mnx, mxx, mny, mxy, ids=ids)
    assert rt.n_nearest(0, 0.0, 0.0) == []
    sx, sy, ex, ey = derive.segment_coords(ids)
    st = SegmentTree(sx, sy, ex, ey, ids=ids)
    assert st.n_nearest_to_point(0, 0.0, 0.0) == []
    assert st.n_nearest_to_segment(0, 0.0, 0.0, 1.0, 1.0) == []
