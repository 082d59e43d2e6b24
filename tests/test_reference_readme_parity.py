"""Parity with the reference's own README doctest scenario
(README.md:47-96): identical results wherever the reference's answer is
unique; distance-multiset equality where its tie winner is a traversal
artifact (SURVEY.md §2.6 — the reference's own tests assert only
distance multisets, tests/kd_tests/test_n_nearest_items.py:40-42)."""

from locus_ray.compat import KdTree, RTree


def test_kd_readme_scenario():
    # points = Point(i, j) for i in -10..10, j in 0..19 zipped (21x20 -> 20? no:
    # zip stops at the shorter range) — reference: range(-10,11) x range(0,20)
    points = [(float(i), float(j)) for i, j in zip(range(-10, 11), range(0, 20))]
    t = KdTree(points)

    # unique nearest: reference returns index 5 / Point(-5, 5)
    assert t.nearest_index((0.0, 0.0)) == 5
    assert t.nearest_point((0.0, 0.0)) == (-5.0, 5.0)

    # 2-NN: reference returns [6, 5] — index 6 vs 4 is a d2=52 tie and
    # its [far, near] order is heap-pop order; the engine contract is
    # ascending (d2, id).  Assert the distance multiset instead.
    got = t.n_nearest_items(2, (0.0, 0.0))
    d2s = sorted((p[0] ** 2 + p[1] ** 2) for _, p in got)
    assert d2s == [50.0, 52.0]
    assert got[0][0] == 5  # the unique minimum is first

    # closed box range: unique answer, exact parity with README
    assert t.find_box_indices((-1.0, 1.0, 0.0, 10.0)) == [9, 10]
    assert t.find_box_points((-1.0, 1.0, 0.0, 10.0)) == [(-1.0, 9.0), (0.0, 10.0)]


def test_r_readme_scenario():
    # boxes = Box(i, i+10, i-20, i-10)-ish zip of four ranges (len 20)
    boxes = [
        (float(a), float(b), float(c), float(d))
        for a, b, c, d in zip(range(-10, 11), range(0, 20), range(-20, 0),
                              range(-10, 11))
    ]
    t = RTree(boxes)

    # unique nearest: box 10 touches the origin (d2 = 0)
    assert t.nearest_index((0.0, 0.0)) == 10
    assert t.nearest_box((0.0, 0.0)) == (0.0, 10.0, -10.0, 0.0)

    # 2-NN: reference returns [10, 11]; boxes 9 and 11 tie at d2=1 —
    # assert multiset + unique head (engine tie-break picks 9)
    got = t.n_nearest_items(2, (0.0, 0.0))
    assert got[0][0] == 10
    assert got[1][0] in (9, 11)

    # containment: unique answers, exact parity
    assert t.find_subsets_indices((0.0, 10.0, -10.0, 10.0)) == [10]
    assert t.find_subsets((0.0, 10.0, -10.0, 10.0)) == [(0.0, 10.0, -10.0, 0.0)]
    assert t.find_supersets_indices((0.0, 10.0, -10.0, 0.0)) == [10]
    assert t.find_supersets((0.0, 10.0, -10.0, 0.0)) == [(0.0, 10.0, -10.0, 0.0)]
