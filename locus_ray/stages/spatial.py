"""Spatial Ray Data stages: tile assignment, containment joins, kNN joins.

Shapes (SURVEY.md §2 mapping):

* :func:`assign_tiles`       — the H3/S2-style cell-encode stage (C7/P10):
  stateless ``map_batches`` over zero-copy Arrow adding grid coords,
  Hilbert rank and ``cell_id``.
* :class:`ContainJoinActor`  — R4-shaped "zones containing this doc"
  broadcast join: zones are ``ray.put`` once, each actor builds a
  :class:`GridContain` cover index in ``__init__`` (once per actor, NOT
  per batch) and probes batches vectorized.
* :class:`KnnJoinActor`      — K1/K2/R1/R2/S3/S4-shaped kNN join of the
  streaming side against a broadcast build side (points, boxes or
  segments) via :class:`GridKnn` ring expansion.
* :func:`find_in_boxes`      — K3-shaped range query: a small broadcast
  set of query boxes vs the streaming points (vectorized mask).
* :func:`subset_join` / :func:`superset_join` — R3/R4-shaped
  containment of streaming *boxes* vs broadcast query boxes.

Broadcast protocol: the small side is ``ray.put`` ONCE on the driver;
``fn_constructor_kwargs`` ships only the ObjectRef; each actor
``ray.get``-s it in ``__init__`` — the payload crosses the object store
once per node, not once per batch.

Scale notes: the streaming side is never materialized; all stages are
row-wise parallel with no shuffle.  The shuffle-based variants (for
build sides too large to broadcast) live in
:mod:`locus_ray.stages.partitioned`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..cells import cell_of_grid, grid_coords
from ..config import DEFAULT_CELL_RES
from ..grid_index import GridContain, GridKnn
from ..hilbert import hilbert_index
from ..kernels import box_is_subset, contains_point


def assign_tiles(ds, res: int = DEFAULT_CELL_RES, x_col: str = "x", y_col: str = "y"):
    """Add ``ix, iy, hilbert_key, cell_id`` columns (tile assignment).

    The engine analog of the reference's Hilbert scaling + ranking
    (locus/_core/hilbert.py:7-42, locus/_core/r.py:112-134) as one
    vectorized, stateless Arrow stage.
    """

    def encode(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        ix, iy = grid_coords(x, y)
        hk = hilbert_index(ix.astype(np.uint32), iy.astype(np.uint32))
        cid = cell_of_grid(ix, iy, res)
        return (
            batch.append_column("ix", pa.array(ix))
            .append_column("iy", pa.array(iy))
            .append_column("hilbert_key", pa.array(hk.astype(np.int64)))
            .append_column("cell_id", pa.array(cid))
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


class ContainJoinActor:
    """Actor-pool stage: emit (carry columns + zone_id) for every
    broadcast zone box containing the row's point (closed semantics).

    ``anti=True`` flips it into the spatial ANTI-join: emit the carry
    columns of rows contained by NO zone (block-local NOT EXISTS —
    the index lookup is the same, only the emit side inverts, so no
    extra shuffle or second pass).

    ``radius > 0`` turns it into the buffered within-distance join
    ("zones within r of this doc", the vector buffer-join): candidates
    come from a cover index over the r-inflated boxes, the refine is
    the exact P5 box-point squared distance (closed ``<= r*r``), and
    the distance is emitted as ``dist_out``."""

    def __init__(self, zones_ref, res: int, x_col: str = "x", y_col: str = "y",
                 carry: tuple[str, ...] = ("doc_id",), id_out: str = "zone_id",
                 anti: bool = False, radius: float = 0.0,
                 dist_out: str = "d2"):
        zones = ray.get(zones_ref) if isinstance(zones_ref, ray.ObjectRef) else zones_ref
        self.index = GridContain(
            {k: zones[k] for k in ("min_x", "max_x", "min_y", "max_y")},
            zones["ids"], res, radius=radius,
        )
        self.x_col, self.y_col, self.carry, self.id_out = x_col, y_col, carry, id_out
        self.anti = anti
        self.radius = float(radius)
        self.dist_out = dist_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = batch.column(self.x_col).to_numpy(zero_copy_only=False)
        qy = batch.column(self.y_col).to_numpy(zero_copy_only=False)
        if self.radius > 0.0:
            src, zone_id, d2 = self.index.query_within(qx, qy)
        else:
            src, zone_id = self.index.query(qx, qy)
        if self.anti:
            outside = np.ones(len(batch), dtype=bool)
            outside[src] = False
            rows = np.nonzero(outside)[0]
            return pa.table(
                {c: batch.column(c).take(pa.array(rows)) for c in self.carry})
        cols = {c: batch.column(c).take(pa.array(src)) for c in self.carry}
        cols[self.id_out] = pa.array(zone_id)
        if self.radius > 0.0:
            cols[self.dist_out] = pa.array(d2)
        return pa.table(cols)


class KnnJoinActor:
    """Actor-pool stage: per row, top-k broadcast geometries by squared
    distance, exploded to one output row per (row, rank) with a
    deterministic (distance, id) order."""

    def __init__(self, build_ref, kind: str, res: int, k: int,
                 x_col: str = "x", y_col: str = "y",
                 carry: tuple[str, ...] = ("doc_id",),
                 id_out: str = "neighbor_id", rank_out: str = "rnk",
                 dist_out: str = "d2", contains_out: str | None = None):
        payload = ray.get(build_ref) if isinstance(build_ref, ray.ObjectRef) else build_ref
        if isinstance(payload, GridKnn):
            # prebuilt index (driver builds ONCE, every actor shares the
            # ray.put copy zero-copy) — avoids paying the per-actor
            # bounds-list construction in autoscaling pools
            self.index = payload
        else:
            geoms = {k_: v for k_, v in payload.items() if k_ != "ids"}
            self.index = GridKnn(kind, geoms, payload["ids"], res)
        self.k = k
        self.x_col, self.y_col, self.carry = x_col, y_col, carry
        self.id_out, self.rank_out, self.dist_out = id_out, rank_out, dist_out
        self.contains_out = contains_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = batch.column(self.x_col).to_numpy(zero_copy_only=False)
        qy = batch.column(self.y_col).to_numpy(zero_copy_only=False)
        ids, d2 = self.index.query(qx, qy, self.k)
        found = ids >= 0
        src = np.repeat(np.arange(len(qx), dtype=np.int64), found.sum(axis=1))
        ranks = np.tile(np.arange(self.k, dtype=np.int64), len(qx)).reshape(len(qx), self.k)[found]
        cols = {c: batch.column(c).take(pa.array(src)) for c in self.carry}
        cols[self.id_out] = pa.array(ids[found])
        cols[self.rank_out] = pa.array(ranks + 1)  # 1-based, matches SQL ROW_NUMBER
        cols[self.dist_out] = pa.array(d2[found])
        if self.contains_out is not None:
            # fused containment refine (box kind): the box-point gap is
            # 0 exactly iff the probe point lies in the CLOSED neighbor
            # box (P1 semantics, kernels.py:27) — no box re-lookup, no
            # extra join, zero added shuffle bytes
            cols[self.contains_out] = pa.array(d2[found] == 0.0)
        return pa.table(cols)


class SegSegKnnActor:
    """S1/S2-shaped segment->segment kNN join: streaming segment batches
    probe a broadcast :class:`locus_ray.grid_index.SegSegGridKnn`
    (built once per actor) in fully vectorized ring-expansion passes —
    no per-row Python or per-row tree descents (VERDICT.md #7/#8).
    Self-match is excluded by id before the merge."""

    def __init__(self, segs_ref, k: int, id_col: str = "segment_id",
                 id_out: str = "neighbor_id",
                 res: int = DEFAULT_CELL_RES, exact: bool = False):
        import ray as _ray

        from ..grid_index import SegSegGridKnn

        p = _ray.get(segs_ref) if isinstance(segs_ref, _ray.ObjectRef) else segs_ref
        self.index = SegSegGridKnn(
            {k_: p[k_] for k_ in ("start_x", "start_y", "end_x", "end_y")},
            p["ids"], res, exact=exact,
        )
        self.k = k
        self.id_col, self.id_out = id_col, id_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sid = batch.column(self.id_col).to_numpy()
        sx = batch.column("start_x").to_numpy(zero_copy_only=False)
        sy = batch.column("start_y").to_numpy(zero_copy_only=False)
        ex = batch.column("end_x").to_numpy(zero_copy_only=False)
        ey = batch.column("end_y").to_numpy(zero_copy_only=False)
        ids, d2 = self.index.query(sx, sy, ex, ey, self.k,
                                   exclude=sid.astype(np.int64))
        found = ids >= 0
        src = np.repeat(np.arange(len(sid), dtype=np.int64), found.sum(axis=1))
        ranks = np.tile(np.arange(self.k, dtype=np.int64),
                        len(sid)).reshape(len(sid), self.k)[found]
        return pa.table({
            self.id_col: pa.array(sid[src]),
            self.id_out: pa.array(ids[found]),
            "rnk": pa.array(ranks + 1),
            "d2": pa.array(d2[found]),
        })


def prebuilt_knn_index(payload: dict[str, np.ndarray], kind: str, res: int,
                       k_hint: int = 8) -> GridKnn:
    """Build a :class:`GridKnn` (including its per-cell bounds/lists)
    once on the driver for broadcasting via ``ray.put`` — pass the
    result as ``build_ref`` to :class:`KnnJoinActor`.  ``k_hint`` caps
    the prebuilt bounds ceiling (queries with larger k trigger an
    actor-local rebuild on their copy)."""
    idx = GridKnn(kind, {k_: v for k_, v in payload.items() if k_ != "ids"},
                  payload["ids"], res)
    idx._ensure_cell_bounds(k_hint)
    return idx


def find_in_boxes(ds, query_boxes: dict[str, np.ndarray],
                  x_col: str = "x", y_col: str = "y",
                  carry: tuple[str, ...] = ("doc_id",)):
    """K3-shaped range query: (query_id, carry...) for every streaming
    point inside each closed query box (locus/kd.py:449-507 contract).

    ``query_boxes`` is a small driver-side dict with keys
    ``query_id, min_x, max_x, min_y, max_y`` — shipped in the task
    closure (tiny), mask evaluated vectorized per batch.
    """
    qid = np.asarray(query_boxes["query_id"], dtype=np.int64)
    mnx = np.asarray(query_boxes["min_x"], dtype=np.float64)
    mxx = np.asarray(query_boxes["max_x"], dtype=np.float64)
    mny = np.asarray(query_boxes["min_y"], dtype=np.float64)
    mxy = np.asarray(query_boxes["max_y"], dtype=np.float64)

    def probe(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        # (n_points, n_queries) closed containment mask
        m = contains_point(mnx[None, :], mxx[None, :], mny[None, :], mxy[None, :],
                           x[:, None], y[:, None])
        src, q = np.nonzero(m)
        cols = {"query_id": pa.array(qid[q])}
        for c in carry:
            cols[c] = batch.column(c).take(pa.array(src))
        return pa.table(cols)

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def knn_segments_to_boxes(ds, query_boxes: dict[str, np.ndarray], k: int,
                          id_col: str = "segment_id"):
    """Box -> segment kNN (P8 distance ranking): for each broadcast
    query box, the ``k`` nearest streaming segments by
    ``box_segment_squared_distance``, deterministic (d2, id) order.

    Same shape as the cosine top-k: per-batch vectorized partial top-k
    with kth-boundary ties kept (equal-distance candidates must reach
    the merge or the smallest-id tie-break diverges), then one tiny
    ``groupby(query_id)`` merge."""
    from ..kernels import box_segment_squared_distance

    qid = np.asarray(query_boxes["query_id"], dtype=np.int64)
    mnx = np.asarray(query_boxes["min_x"], dtype=np.float64)
    mxx = np.asarray(query_boxes["max_x"], dtype=np.float64)
    mny = np.asarray(query_boxes["min_y"], dtype=np.float64)
    mxy = np.asarray(query_boxes["max_y"], dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        sx = batch.column("start_x").to_numpy(zero_copy_only=False)
        sy = batch.column("start_y").to_numpy(zero_copy_only=False)
        ex = batch.column("end_x").to_numpy(zero_copy_only=False)
        ey = batch.column("end_y").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # (segments, queries) P8 distance matrix
        d2 = box_segment_squared_distance(
            mnx[None, :], mxx[None, :], mny[None, :], mxy[None, :],
            sx[:, None], sy[:, None], ex[:, None], ey[:, None])
        kk = min(k, d2.shape[0])
        if kk == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "d2": pa.array([], type=pa.float64())})
        part = np.argpartition(d2, kk - 1, axis=0)[:kk]
        kth = np.take_along_axis(d2, part, axis=0).max(axis=0)  # (q,)
        rows, cols = np.nonzero(d2 <= kth[None, :])
        return pa.table({"query_id": pa.array(qid[cols]),
                         id_col: pa.array(ids[rows]),
                         "d2": pa.array(d2[rows, cols])})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(group):
        g = group.sort_values(["d2", id_col]).head(k).copy()
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", id_col, "rnk", "d2"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def _box_vs_queries(ds, query_boxes: dict[str, np.ndarray], mode: str,
                    id_col: str = "zone_id"):
    qid = np.asarray(query_boxes["query_id"], dtype=np.int64)
    mnx = np.asarray(query_boxes["min_x"], dtype=np.float64)
    mxx = np.asarray(query_boxes["max_x"], dtype=np.float64)
    mny = np.asarray(query_boxes["min_y"], dtype=np.float64)
    mxy = np.asarray(query_boxes["max_y"], dtype=np.float64)

    def probe(batch: pa.Table) -> pa.Table:
        bmnx = batch.column("min_x").to_numpy(zero_copy_only=False)
        bmxx = batch.column("max_x").to_numpy(zero_copy_only=False)
        bmny = batch.column("min_y").to_numpy(zero_copy_only=False)
        bmxy = batch.column("max_y").to_numpy(zero_copy_only=False)
        if mode == "subset":  # streaming box ⊆ query box (R3)
            m = box_is_subset(bmnx[:, None], bmxx[:, None], bmny[:, None], bmxy[:, None],
                              mnx[None, :], mxx[None, :], mny[None, :], mxy[None, :])
        else:  # query box ⊆ streaming box (R4)
            m = box_is_subset(mnx[None, :], mxx[None, :], mny[None, :], mxy[None, :],
                              bmnx[:, None], bmxx[:, None], bmny[:, None], bmxy[:, None])
        src, q = np.nonzero(m)
        return pa.table({
            "query_id": pa.array(qid[q]),
            id_col: batch.column(id_col).take(pa.array(src)),
        })

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def subset_join(ds, query_boxes, id_col: str = "zone_id"):
    """R3 contract (locus/r.py:190-235): streaming boxes contained in
    each query box (closed)."""
    return _box_vs_queries(ds, query_boxes, "subset", id_col)


def superset_join(ds, query_boxes, id_col: str = "zone_id"):
    """R4 contract (locus/r.py:307-353): streaming boxes containing
    each query box (closed)."""
    return _box_vs_queries(ds, query_boxes, "superset", id_col)


class AttachPayloadActor:
    """Re-attach a wide payload column (e.g. interleaved ``spans``) to
    join results by id — the tail of the SURVEY.md §7 pattern "carry
    doc_id only through shuffles, re-join spans at the end".

    Hash joins cannot carry nested list<struct> payloads through Acero
    (ArrowInvalid), and shipping spans through a shuffle would multiply
    the shuffle bytes anyway.  Instead the payload table is held
    id-sorted per actor (broadcast here; at corpus scale each actor
    reads only the key-range shard aligned with its input partition —
    same code, different source) and rows are attached with
    ``searchsorted`` + ``take``, which is nested-type-safe and
    zero-copy on the Arrow side.
    """

    def __init__(self, payload_ref, key: str = "doc_id",
                 columns: tuple[str, ...] = ("spans",)):
        import ray as _ray

        t = _ray.get(payload_ref) if isinstance(payload_ref, _ray.ObjectRef) else payload_ref
        if isinstance(t, pa.Table):
            tab = t
        else:
            tab = pa.table(t)
        keys = tab.column(key).to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        self.sorted_keys = keys[order]
        self.payload = tab.select(list(columns)).take(pa.array(order))
        self.key = key
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        bk = batch.column(self.key).to_numpy(zero_copy_only=False)
        if len(self.sorted_keys) == 0:
            # empty payload shard: every row is unmatched — drop them
            # all (the clamp below would index sorted_keys[-1])
            out = batch.slice(0, 0)
            for c in self.columns:
                out = out.append_column(c, self.payload.column(c).slice(0, 0))
            return out
        loc = np.searchsorted(self.sorted_keys, bk)
        loc = np.minimum(loc, len(self.sorted_keys) - 1)
        ok = self.sorted_keys[loc] == bk
        if not ok.all():
            batch = batch.filter(pa.array(ok))
            loc = loc[ok]
        out = batch
        for c in self.columns:
            out = out.append_column(c, self.payload.column(c).take(pa.array(loc)))
        return out
