"""Ordered-join kernels (stages/events.py): as-of + range join.

Pure pyarrow->pyarrow functions, so these tests need no Ray session.
Each kernel is checked against an O(n^2) brute force on randomized
logs plus hand-built edge cases (equal timestamps, user boundaries,
window endpoints).
"""

import numpy as np
import pyarrow as pa

from locus_ray.stages.events import (_union_searchsorted,
                                     asof_join_partition,
                                     range_join_partition)


def _log(eids, uids, uss, types):
    return pa.table({
        "event_id": pa.array(np.asarray(eids, dtype=np.int64)),
        "user_id": pa.array(np.asarray(uids, dtype=np.int64)),
        "ts": pa.array(np.asarray(uss, dtype=np.int64),
                       type=pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(list(types)),
    })


def _brute_asof(tbl, probe, build):
    rows = tbl.to_pylist()
    us = tbl.column("ts").cast(pa.int64()).to_pylist()
    out = []
    for i, r in enumerate(rows):
        if r["event_type"] != probe:
            continue
        cands = [(us[j], rows[j]["event_id"]) for j, s in enumerate(rows)
                 if s["event_type"] == build and s["user_id"] == r["user_id"]
                 and (us[j], s["event_id"]) < (us[i], r["event_id"])]
        if cands:
            mu, mid = max(cands)
            out.append((r["event_id"], mid, us[i] - mu))
    return sorted(out)


def _brute_range(tbl, probe, build, w):
    rows = tbl.to_pylist()
    us = tbl.column("ts").cast(pa.int64()).to_pylist()
    out = []
    for i, r in enumerate(rows):
        if r["event_type"] != probe:
            continue
        for j, s in enumerate(rows):
            if (s["event_type"] == build and s["user_id"] == r["user_id"]
                    and us[i] - w <= us[j] < us[i]):
                out.append((r["event_id"], s["event_id"], us[i] - us[j]))
    return sorted(out)


def _rows(tbl):
    return sorted(zip(*(tbl.column(c).to_pylist() for c in tbl.column_names)))


def test_union_searchsorted_matches_composite():
    rng = np.random.default_rng(7)
    duid = rng.integers(0, 5, 200)
    dus = rng.integers(0, 50, 200)
    order = np.lexsort((dus, duid))
    duid, dus = duid[order], dus[order]
    quid = rng.integers(0, 5, 100)
    qus = rng.integers(-5, 55, 100)
    comp_d = duid * 1000 + dus
    comp_q = quid * 1000 + qus
    for side in ("left", "right"):
        got = _union_searchsorted(duid, dus, quid, qus, side)
        want = np.searchsorted(comp_d, comp_q, side=side)
        assert np.array_equal(got, want), side


def test_asof_edges():
    # user 1: click@10, purchase@10 (tie ts, click id smaller -> match),
    #         purchase@5 (no prior), click@20, purchase@30 (matches @20)
    # user 2: purchase@100 with user 1 clicks only -> no match
    tbl = _log(eids=[1, 2, 3, 4, 5, 6],
               uids=[1, 1, 1, 1, 1, 2],
               uss=[10, 10, 5, 20, 30, 100],
               types=["click", "purchase", "purchase", "click",
                      "purchase", "purchase"])
    got = _rows(asof_join_partition(tbl, probe_type="purchase",
                                    build_type="click"))
    assert got == [(2, 1, 0), (5, 4, 10)]


def test_asof_tie_is_strict_order():
    # purchase id 1 < click id 2 at the same ts: (10,1) < (10,2) is
    # FALSE for the click, so the purchase has no prior
    tbl = _log([1, 2], [1, 1], [10, 10], ["purchase", "click"])
    assert _rows(asof_join_partition(
        tbl, probe_type="purchase", build_type="click")) == []


def test_range_window_endpoints():
    # window [p-100, p): build at exactly p-100 IN, at p OUT
    tbl = _log([1, 2, 3, 4], [1, 1, 1, 1], [100, 200, 200, 201],
               ["view", "view", "purchase", "purchase"])
    got = _rows(range_join_partition(tbl, probe_type="purchase",
                                     build_type="view", window_us=100))
    assert got == [(3, 1, 100), (4, 2, 1)]


def test_kernels_vs_brute_force():
    rng = np.random.default_rng(42)
    n = 400
    tbl = _log(eids=rng.permutation(n),
               uids=rng.integers(0, 8, n),
               uss=rng.integers(0, 500, n),
               types=rng.choice(["click", "purchase", "view"], n))
    got = _rows(asof_join_partition(tbl, probe_type="purchase",
                                    build_type="click"))
    assert got == _brute_asof(tbl, "purchase", "click")
    got = _rows(range_join_partition(tbl, probe_type="purchase",
                                     build_type="view", window_us=60))
    assert got == _brute_range(tbl, "purchase", "view", 60)


def test_range_empty_sides():
    tbl = _log([1], [1], [10], ["purchase"])
    out = range_join_partition(tbl, probe_type="purchase",
                               build_type="view", window_us=60)
    assert out.num_rows == 0
    assert out.schema.names == ["probe_id", "build_id", "delta_us"]
