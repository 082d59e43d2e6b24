"""Exact-rational (Fraction) scalars through the compat trees.

Reference contract: the trees accept any rational coordinate type via
the ground context (README.md:50-51 doctests build every tree with
``coordinate_factory=Fraction``; the hypothesis strategies feed
``st.fractions``, tests/strategies/base.py:61-68).  These tests drive
the same shapes through ``locus_ray.compat`` and additionally assert
what only exact arithmetic can deliver: sub-float64-ulp resolution.
"""

from fractions import Fraction as F

import numpy as np
import pytest

from locus_ray.compat import KdTree, RTree, SegmentalTree


def test_kd_readme_doctest_shapes():
    # README.md:48-66 with Fraction coordinates (engine tie-break:
    # smallest id, ascending (d2, id) — documented deviation)
    points = [(F(x), F(y)) for x, y in zip(range(-10, 11), range(0, 20))]
    t = KdTree(points)
    assert t.nearest_index((F(0), F(0))) == 5
    assert t.nearest_point((F(0), F(0))) == (F(-5), F(5))
    # d2(5)=50 unique min; 4 and 6 tie at 52 -> smallest id first
    assert t.n_nearest_indices(2, (F(0), F(0))) == [5, 4]
    got = t.find_box_indices((F(-1), F(1), F(0), F(10)))
    assert got == [9, 10]
    assert t.find_box_points((F(-1), F(1), F(0), F(10))) == \
        [(F(-1), F(9)), (F(0), F(10))]
    # returned scalars are the ORIGINAL Fractions
    assert isinstance(t.nearest_point((F(0), F(0)))[0], F)


def test_kd_sub_ulp_resolution():
    # two points separated by 2^-100: float64 sees ONE point, the
    # exact path must still pick the true nearest for a query biased
    # toward the second
    eps = F(1, 2**100)
    pts = [(F(1), F(0)), (F(1) + eps, F(0)), (F(50), F(50))]
    t = KdTree(pts)
    q = (F(1) + eps + eps / 2, F(0))  # closer to pts[1]
    assert t.nearest_index(q) == 1
    assert t.n_nearest_indices(2, q) == [1, 0]
    # and the float64 engine provably cannot make this distinction
    assert float(pts[0][0]) == float(pts[1][0])


def test_kd_exact_boundary_closed_box():
    # closed-box edge at exactly 1/3 — unrepresentable in float64
    third = F(1, 3)
    pts = [(third, F(0)), (third + F(1, 2**80), F(0)), (F(2), F(2))]
    t = KdTree(pts)
    ids = t.find_box_indices((F(0), third, F(-1), F(1)))
    assert ids == [0]  # pts[1] sits just past the closed edge


def test_kd_matches_float_path_on_dyadic():
    # dyadic rationals are exactly representable -> the exact path and
    # the float64 engine must agree bit-for-bit, ties included
    rng = np.random.default_rng(7)
    raw = rng.integers(-512, 512, (40, 2))
    pts_f = [(v[0] / 64.0, v[1] / 64.0) for v in raw]
    pts_r = [(F(int(v[0]), 64), F(int(v[1]), 64)) for v in raw]
    tf, tr = KdTree(pts_f), KdTree(pts_r)
    for q in [(0.0, 0.0), (3.5, -2.25), (-7.984375, 7.984375)]:
        qf = (q[0], q[1])
        qr = (F(q[0]), F(q[1]))
        assert tr.nearest_index(qr) == tf.nearest_index(qf)
        assert tr.n_nearest_indices(7, qr) == tf.n_nearest_indices(7, qf)
    box_f = (-4.0, 4.0, -4.0, 4.0)
    box_r = tuple(map(F, box_f))
    assert tr.find_box_indices(box_r) == sorted(tf.find_box_indices(box_f))


def test_kd_empty_and_n_ge_size():
    with pytest.raises(ValueError):
        KdTree([]).nearest_item((F(0), F(0)))
    # (empty build has no Fraction scalars; force the exact branch
    # through a 1-point Fraction tree for the n >= size contract)
    t = KdTree([(F(1, 3), F(1, 7))])
    assert t.n_nearest_items(5, (F(0), F(0))) == [(0, (F(1, 3), F(1, 7)))]


def test_rtree_readme_doctest_shapes():
    boxes = [(F(a), F(b), F(c), F(d)) for a, b, c, d in
             zip(range(-10, 11), range(0, 20), range(-20, 0), range(-10, 11))]
    t = RTree(boxes)
    assert t.nearest_index((F(0), F(0))) == 10
    assert t.nearest_box((F(0), F(0))) == (F(0), F(10), F(-10), F(0))
    # containment, closed comparisons
    sub = t.find_subsets_indices((F(-10), F(10), F(-20), F(10)))
    exp = [i for i, b in enumerate(boxes)
           if -10 <= b[0] and b[1] <= 10 and -20 <= b[2] and b[3] <= 10]
    assert sub == exp
    sup = t.find_supersets_indices((F(0), F(1), F(-5), F(-4)))
    exp = [i for i, b in enumerate(boxes)
           if b[0] <= 0 and 1 <= b[1] and b[2] <= -5 and -4 <= b[3]]
    assert sup == exp


def test_rtree_sub_ulp_nearest():
    eps = F(1, 2**90)
    # gap to box 0 is eps smaller than to box 1; float64 ties them
    boxes = [(F(2) + eps, F(3), F(0), F(1)),
             (F(2) + 2 * eps, F(3), F(0), F(1))]
    t = RTree(boxes)
    assert t.nearest_index((F(0), F(0))) == 0
    q_biased = (F(4), F(0))  # to the right: gaps equal -> smallest id
    assert t.nearest_index(q_biased) == 0


def test_segmental_fraction_queries():
    segs = [((F(0), F(0)), (F(2), F(0))),
            ((F(0), F(1, 3)), (F(2), F(1, 3))),
            ((F(10), F(10)), (F(12), F(12)))]
    t = SegmentalTree(segs)
    # point at y=1/6 is equidistant (1/6) to segs 0 and 1 -> id 0
    assert t.nearest_to_point_index((F(1), F(1, 6))) == 0
    # nudge by 2^-80 toward seg 1 -> exact path must flip to 1
    assert t.nearest_to_point_index((F(1), F(1, 6) + F(1, 2**80))) == 1
    # seg-seg: a crossing segment has distance 0 to both horizontals
    cross = ((F(1), F(-1)), (F(1), F(1)))
    assert t.nearest_index(cross) == 0
    items = t.n_nearest_items(2, cross)
    assert [i for i, _ in items] == [0, 1]
    assert t.n_nearest_to_point_indices(5, (F(1), F(0))) == [0, 1, 2]


def test_fraction_rejects_non_euclidean_context():
    with pytest.raises(ValueError, match="manhattan"):
        KdTree([(F(0), F(0))], context="manhattan")


def test_mixed_float_stays_on_engine_path():
    # no Fractions -> the numpy engine path builds as before
    t = KdTree([(0.0, 0.0), (1.0, 1.0)])
    assert t._tree is not None and not t._exact
