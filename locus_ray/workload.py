"""Shared query workloads (FIXTURES.md table 5).

Constants are generated once here and injected verbatim into BOTH the
Ray pipelines and the DuckDB oracle SQL (``repr`` round-trips float64
exactly), so the two sides are guaranteed to evaluate identical
literals.  Mix mirrors the fixture spec: uniform points, hot-cluster
points, a world-box query, empty-region queries, nested boxes.
"""

from __future__ import annotations

import numpy as np

from .derive import HOT_X, HOT_Y

_rng = np.random.default_rng(7)

_upx = _rng.uniform(-170.0, 170.0, 6)
_upy = _rng.uniform(-85.0, 85.0, 6)
QUERY_POINTS = {
    "query_id": np.arange(10, dtype=np.int64),
    "x": np.concatenate((
        _upx,
        [HOT_X + 0.5, HOT_X - 1.2, HOT_X],
        [-179.5],
    )),
    "y": np.concatenate((
        _upy,
        [HOT_Y - 0.3, HOT_Y + 0.8, HOT_Y],
        [-89.5],
    )),
}

_c = _rng.uniform(-150.0, 150.0, (6, 2))
_w = _rng.uniform(1.0, 40.0, 6)
_h = _rng.uniform(1.0, 25.0, 6)
QUERY_BOXES = {
    "query_id": np.arange(10, dtype=np.int64),
    "min_x": np.concatenate((_c[:, 0] - _w, [HOT_X - 3.0, -180.0, 170.0, 100.0])),
    "max_x": np.concatenate((_c[:, 0] + _w, [HOT_X + 3.0, 180.0, 171.0, 101.0])),
    "min_y": np.concatenate((_c[:, 1] - _h, [HOT_Y - 2.0, -90.0, 85.0, -89.0])),
    "max_y": np.concatenate((_c[:, 1] + _h, [HOT_Y + 2.0, 90.0, 86.0, -88.0])),
}

K_ZONES = 3   # doc -> k nearest zone boxes (R2 shape)
K_DOCS = 5    # query point -> k nearest docs (K2 shape)
K_SEGMENTS = 4  # query point -> k nearest segments (S4 shape)
ANN_K = 10
ANN_QUERY_IDS = [0, 1, 2, 3]  # embeddings used as ANN query vectors
# chosen to fire on the fixture embeddings (max off-diag cosine ~0.5)
# with >5e-4 separation from the nearest sims on both sides at every sf
EMBED_DUP_THRESHOLD = 0.4
NEAR_ZONE_RADIUS = 1.0  # buffered containment join radius (world units)
RKNN_TARGET_MOD = 50    # reverse-kNN target docs: doc_id % 50 == 0


def sql_query_points() -> str:
    """VALUES clause for the query points (exact float literals)."""
    from .derive import F

    rows = ", ".join(
        f"(CAST({int(q)} AS BIGINT), {F(x)}, {F(y)})"
        for q, x, y in zip(QUERY_POINTS["query_id"], QUERY_POINTS["x"], QUERY_POINTS["y"])
    )
    return f"(VALUES {rows}) AS qp(query_id, qx, qy)"


def sql_query_boxes() -> str:
    from .derive import F

    rows = ", ".join(
        f"(CAST({int(q)} AS BIGINT), {F(a)}, {F(b)}, {F(c)}, {F(d)})"
        for q, a, b, c, d in zip(
            QUERY_BOXES["query_id"], QUERY_BOXES["min_x"], QUERY_BOXES["max_x"],
            QUERY_BOXES["min_y"], QUERY_BOXES["max_y"],
        )
    )
    return f"(VALUES {rows}) AS qb(query_id, qmin_x, qmax_x, qmin_y, qmax_y)"
