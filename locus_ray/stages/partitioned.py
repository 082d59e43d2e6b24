"""Shuffle-based spatial joins for build sides too large to broadcast.

These are the all-to-all variants of the broadcast stages in
:mod:`locus_ray.stages.spatial`, built on ``Dataset.join`` (hash
partitioned on the cell key) with *explicit skew handling*:

1. docs get ``cell_id`` (home cell) — one row each;
2. zones explode to their cell cover — one row per (zone, cell);
3. hot cells (doc count above threshold) are *salted*: doc key space
   inside a hot cell splits into S sub-keys, and the zone side
   replicates its rows for each salt — bounding the largest join
   partition at ~threshold docs (the north rule's "skew salting of
   hot tiles");
4. inner hash join on the (salted) cell key;
5. vectorized exact refine (containment or distance);
6. for kNN: per-doc top-k merge (``groupby(doc).map_groups``) with a
   ring-bound completeness check — the small set of docs whose kth
   neighbor is NOT provably inside the searched rings is re-probed
   against the broadcast index (ring-expansion re-probe, SURVEY.md §7.6;
   at realistic densities this is a fraction of a percent of rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..cells import cover_boxes, grid_coords
from ..config import DEFAULT_CELL_RES, WORLD_H, WORLD_W, actor_pool
from ..kernels import box_point_squared_distance, contains_point


def _doc_cells(ds, res: int, x_col="x", y_col="y"):
    def f(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        ix, iy = grid_coords(x, y)
        shift = 16 - res
        cid = (ix >> shift) * (1 << res) + (iy >> shift)
        return batch.append_column("cell_id", pa.array(cid))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _zone_cover(zones, res: int, pad_rings: int = 0):
    """Explode zones to (cell_id, zone geometry) cover rows."""
    pad = pad_rings * min(WORLD_W, WORLD_H) / (1 << res)

    def f(batch: pa.Table) -> pa.Table:
        mnx = batch.column("min_x").to_numpy(zero_copy_only=False)
        mxx = batch.column("max_x").to_numpy(zero_copy_only=False)
        mny = batch.column("min_y").to_numpy(zero_copy_only=False)
        mxy = batch.column("max_y").to_numpy(zero_copy_only=False)
        row, cell = cover_boxes(mnx, mxx, mny, mxy, res, pad=pad)
        t = batch.take(pa.array(row))
        return t.append_column("cell_id", pa.array(cell))

    return zones.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


#: distinct-cell count up to which detect_hot_cells reduces partial
#: counts on the driver instead of paying a Ray groupby shuffle.  A
#: dense int64 count vector of this size is 128 MB — trivially
#: driver-resident — while the aggregate shuffle's fixed cost (~10 s
#: observed at 2M rows) dwarfs the whole detection when nothing is hot.
_DRIVER_REDUCE_KEYSPACE = 1 << 24


def detect_hot_cells(docs_with_cells, threshold: int,
                     keyspace: int | None = None) -> dict[int, int]:
    """cell_id -> salt fan-out for cells above ``threshold`` docs.

    Per-block partial counts (``np.unique`` inside ``map_batches``),
    then ONE reduce.  ``keyspace`` is the number of possible cell ids
    (``4**res`` for grid keys): when given and small, the reduce is a
    driver-side dense ``np.add.at`` over the streamed partials —
    skipping the aggregate shuffle's fixed cost entirely.  At fine
    resolutions (or unknown keyspace) the reduce stays a distributed
    groupby with the hot filter applied BEFORE collection: pulling
    every distinct cell's count to the driver would be a 10^8-row
    materialization on a 10^12-doc corpus.
    """

    # deterministic stride sample: a cell at ``threshold`` rows shows
    # >= ~1000 sampled rows whichever way rows are blocked (exactly
    # n/stride if a block is cell-clustered, Binomial(n, 1/stride)
    # otherwise — vanishing miss probability at this margin), so
    # detection quality is unchanged while the partial-count volume
    # and the reduce shrink by the stride.  Salting is a load-bounding
    # heuristic: a near-threshold cell salted or not is correct either
    # way (the engine equivalence tests drive both), so the sampled
    # estimate n_hat = stride * sampled is a legitimate fan input.
    stride = max(1, threshold // 1000)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("cell_id").to_numpy(zero_copy_only=False)
        # hash-derived per-block offset (ADVICE r4 #3): sampling every
        # block from row 0 rounds each block's per-cell estimate UP to
        # a stride multiple, so many-tiny-block layouts systematically
        # overestimate; a content-derived offset keeps the estimator
        # deterministic while removing the row-0 bias.
        off = 0
        if stride > 1 and len(col):
            # Python ints: numpy uint64 scalar multiply raises a
            # RuntimeWarning on (intended) wraparound, once per block
            h = (int(col[0]) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            off = (h ^ len(col)) % stride
        cid, cnt = np.unique(col[off::stride], return_counts=True)
        return pa.table({"cell_id": pa.array(cid), "n": pa.array(cnt * stride)})

    partials = docs_with_cells.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)

    if keyspace is not None and 0 < keyspace <= _DRIVER_REDUCE_KEYSPACE:
        dense = np.zeros(keyspace, dtype=np.int64)
        for batch in partials.iter_batches(batch_format="pyarrow"):
            cid = batch.column("cell_id").to_numpy(zero_copy_only=False)
            np.add.at(dense, cid, batch.column("n").to_numpy(zero_copy_only=False))
        hot_ids = np.flatnonzero(dense > threshold)
        return {int(c): int(-(-dense[c] // threshold)) for c in hot_ids}

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    hot = (
        partials.groupby("cell_id").aggregate(Sum("n", alias_name="n"))
        .map_batches(lambda t: t.filter(pc.greater(t.column("n"), threshold)),
                     batch_format="pyarrow")
        .to_pandas()
    )
    if hot.empty:  # all-empty blocks lose the schema in to_pandas
        return {}
    return {
        int(c): int(-(-n // threshold)) for c, n in zip(hot["cell_id"], hot["n"])
    }


def _apply_salting(d, z, hot_threshold: int, max_fan: int = 64,
                   keyspace: int | None = None):
    """Salt hot cells: docs in a hot cell split across ``fan`` sub-keys
    (deterministic from batch row position), the geometry side
    replicates its rows once per sub-key — bounding the largest join
    partition at ~``hot_threshold`` docs.  No-op when nothing is hot."""
    salts = detect_hot_cells(d, hot_threshold, keyspace=keyspace)
    if not salts:
        return d, z
    # sorted hot-cell key + fan arrays: the per-row fan lookup is a
    # vectorized searchsorted gather, not a per-row dict lookup on the
    # shuffle's hottest path (VERDICT r3 "What's wrong" #1)
    hot_keys = np.fromiter(salts.keys(), dtype=np.int64, count=len(salts))
    order = np.argsort(hot_keys)
    hot_keys = hot_keys[order]
    hot_fans = np.minimum(
        np.fromiter(salts.values(), dtype=np.int64, count=len(salts))[order],
        max_fan)
    ref = ray.put((hot_keys, hot_fans))

    def _fans(cid: np.ndarray, keys: np.ndarray, fans: np.ndarray) -> np.ndarray:
        fan = np.ones(len(cid), dtype=np.int64)
        pos = np.minimum(np.searchsorted(keys, cid), len(keys) - 1)
        hit = keys[pos] == cid
        fan[hit] = fans[pos[hit]]
        return fan

    def salt_docs(batch: pa.Table) -> pa.Table:
        keys, fans = ray.get(ref)
        cid = batch.column("cell_id").to_numpy(zero_copy_only=False)
        fan = _fans(cid, keys, fans)
        salt = np.arange(len(cid), dtype=np.int64) % fan
        key = cid * max_fan + salt
        return batch.set_column(
            batch.schema.get_field_index("cell_id"), "cell_id", pa.array(key)
        )

    def salt_geoms(batch: pa.Table) -> pa.Table:
        keys, fans = ray.get(ref)
        cid = batch.column("cell_id").to_numpy(zero_copy_only=False)
        fan = _fans(cid, keys, fans)
        row = np.repeat(np.arange(len(cid), dtype=np.int64), fan)
        # empty block (all-big or filtered upstreams): ([0], cumsum)
        # would be 1-long against 0-long fan and np.repeat raises
        starts = np.zeros(len(fan), dtype=np.int64)
        np.cumsum(fan[:-1], out=starts[1:])
        salt = np.arange(int(fan.sum()), dtype=np.int64) - np.repeat(starts, fan)
        t = batch.take(pa.array(row))
        key = cid[row] * max_fan + salt
        return t.set_column(
            t.schema.get_field_index("cell_id"), "cell_id", pa.array(key)
        )

    return (
        d.map_batches(salt_docs, batch_format="pyarrow", zero_copy_batch=True),
        z.map_batches(salt_geoms, batch_format="pyarrow", zero_copy_batch=True),
    )


#: Gkey groups per shuffle partition.  Group count trades per-call
#: ``map_groups`` overhead (ruinous at one-group-per-cell: ~4**res
#: calls) against LOAD BALANCE: ``groupby`` range-partitions by gkey,
#: so a single gkey group can never split across tasks, and with only
#: ``num_partitions`` groups a hot doc cluster's cells hash together
#: into one straggler task (round-5 profile: max group_fn task 9.0 s
#: vs 0.68 s mean at 2M docs / 32 groups — 525k-row max block vs 21k
#: mean).  8x partitions keeps calls amortized (~hundreds, not 65k)
#: while bounding a group near the hottest single cell (cells are
#: never split; salting handles cell-level heat).  Measured: 2M docs
#: x 20k zones kNN @32 CPUs best 31.8 s (fan 1) -> 19.3 s (fan 8).
GROUP_FAN = 8


def _gkey_of(cell: np.ndarray, n_groups: int) -> np.ndarray:
    """Deterministic (salted) cell -> coarse int32 group key.

    The grouped exchanges group MANY cells per ``map_groups`` call:
    one group per grid cell fired the group function ~4**res times on
    ~30-row groups, and the per-call Python/Arrow overhead dominated
    the stage (measured ~half the wall time at 2M docs).  Hashing
    cells into ``n_groups`` coarse keys amortizes that overhead over
    ~rows/n_groups-row groups; the within-cell pairing happens
    vectorized inside the group function (:func:`_cell_pairs`).  The
    multiplicative hash decorrelates the row-major cell layout (and
    salted sub-keys) from the group assignment."""
    h = cell.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) % np.uint64(n_groups)).astype(np.int32)


def _csr_pairs(cell: np.ndarray, di: np.ndarray, zi: np.ndarray):
    """Vectorized probe<->build pairing WITHIN exact cell over a
    multi-cell group (CSR gather — the grid_index bucket technique).
    ``di``/``zi`` are row-index arrays into ``cell`` and may overlap
    (e.g. a self-join pairs residents against ALL rows).

    Returns ``(di, zi, pd, pz)`` with ``zi`` re-sorted by cell; pair
    ``p`` joins probe row ``di[pd[p]]`` with build row ``zi[pz[p]]``
    sharing its cell."""
    if not len(di):
        # probe-less group (finer gkey fans make zone-only groups
        # routine at small scale): np.concatenate(([0], ...)) below
        # would yield a 1-long ``starts`` against a 0-long ``cnt``
        e = np.empty(0, dtype=np.int64)
        return di, zi, e, e
    zcell = cell[zi]
    zo = np.argsort(zcell, kind="stable")
    zi = zi[zo]
    zcell = zcell[zo]
    dcell = cell[di]
    lo = np.searchsorted(zcell, dcell, "left")
    cnt = np.searchsorted(zcell, dcell, "right") - lo
    pd = np.repeat(np.arange(len(di), dtype=np.int64), cnt)
    total = int(cnt.sum())
    starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
    pz = lo[pd] + within
    return di, zi, pd, pz


def _cell_pairs(cell: np.ndarray, is_zone: np.ndarray):
    """:func:`_csr_pairs` with the doc/zone split given as a mask."""
    return _csr_pairs(cell, np.nonzero(~is_zone)[0], np.nonzero(is_zone)[0])


def _int_carry(ds, key: str) -> bool:
    """True when ``key`` is an int64 column of ``ds`` — the grouped
    exchange unions doc and zone ids into ONE ``gid`` column against
    the zone side's int64 zone_id (and the empty group tables are
    int64), so a string carry cannot ride it and a NARROWER int carry
    would produce mismatched union schemas at runtime (ADVICE r4 #1);
    both take the join engine instead."""
    try:
        sch = ds.schema(fetch_if_missing=True)
        tp = dict(zip(sch.names, sch.types)).get(key)
        return tp is not None and pa.types.is_int64(tp)
    except Exception:
        return False


def contain_join_partitioned(docs, zones, res: int = DEFAULT_CELL_RES,
                             num_partitions: int | None = None,
                             hot_threshold: int | None = None,
                             carry: tuple[str, ...] = ("doc_id",),
                             large_cover_cells: int = 64,
                             engine: str = "group"):
    """Containment join via one cell-keyed exchange (salted).

    Hybrid skew handling: zones whose cell cover exceeds
    ``large_cover_cells`` would explode the shuffle (every doc in every
    covered cell joins them), so they are pulled out and probed via a
    broadcast :class:`GridContain` branch instead — the "broadcast the
    small side, shuffle the rest" rule applied per geometry.  The two
    branches union to the final (carry..., zone_id) rows.

    ``engine`` picks the exchange shape:

    - ``"group"`` (default): docs and zone-cover rows UNION into one
      cell-keyed stream; ``groupby(cell_id).map_groups`` runs the
      containment predicate per cell.  Each input row crosses the wire
      exactly once and the doc x zone candidate cross-product lives
      only in group-local numpy — the hash join materialized it to the
      object store at ~8 columns x ~37 candidates/doc (the dominant
      byte volume of the stage).  Requires a single integer carry
      column; non-integer or multi-column carries fall back to the
      join engine automatically.
    - ``"join"``: ``Dataset.join`` on the salted cell key + vectorized
      refine — kept for multi-column carries and as the A/B control.
    """
    import pyarrow.compute as pc

    from ..grid_index import GridContain
    from .spatial import ContainJoinActor

    # split the zone layer by cover size (streamed, vectorized)
    def tag_cover(batch: pa.Table) -> pa.Table:
        mnx = batch.column("min_x").to_numpy(zero_copy_only=False)
        mxx = batch.column("max_x").to_numpy(zero_copy_only=False)
        mny = batch.column("min_y").to_numpy(zero_copy_only=False)
        mxy = batch.column("max_y").to_numpy(zero_copy_only=False)
        axis = 1 << res
        nx = np.floor((mxx + 180.0) / 360.0 * axis) - np.floor((mnx + 180.0) / 360.0 * axis) + 1
        ny = np.floor((mxy + 90.0) / 180.0 * axis) - np.floor((mny + 90.0) / 180.0 * axis) + 1
        return batch.append_column("big", pa.array((nx * ny) > large_cover_cells))

    if num_partitions is None:
        from ..config import num_partitions_for

        # metadata-only for fresh reads; derived inputs should pass
        # num_partitions explicitly (num_partitions_for docstring)
        num_partitions = num_partitions_for(docs.count(),
                                            rows_per_partition=100_000)

    # materialize ONCE: the big-side drain below plus the zones_small
    # branch would otherwise each re-run the tag_cover lineage — the
    # zone layer was scanned ~3x per join (ADVICE r3 #3)
    tagged = zones.map_batches(
        tag_cover, batch_format="pyarrow", zero_copy_batch=True).materialize()
    # the big side is tiny by construction -> safe to collect for broadcast
    big_chunks = list(
        tagged.map_batches(
            lambda t: t.filter(t.column("big")).drop_columns(["big"]),
            batch_format="pyarrow",
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    broadcast_branch = None
    if big_chunks and sum(len(c) for c in big_chunks):
        big_tab = pa.concat_tables(big_chunks)
        big_payload = {
            "ids": big_tab.column("zone_id").to_numpy().astype(np.int64),
            "min_x": big_tab.column("min_x").to_numpy(zero_copy_only=False),
            "max_x": big_tab.column("max_x").to_numpy(zero_copy_only=False),
            "min_y": big_tab.column("min_y").to_numpy(zero_copy_only=False),
            "max_y": big_tab.column("max_y").to_numpy(zero_copy_only=False),
        }
        big_ref = ray.put(big_payload)
        broadcast_branch = docs.map_batches(
            ContainJoinActor, batch_format="pyarrow", zero_copy_batch=True,
            fn_constructor_kwargs={"zones_ref": big_ref, "res": res, "carry": carry},
            concurrency=actor_pool(), batch_size=8192,
        )

    zones_small = tagged.map_batches(
        lambda t: t.filter(pc.invert(t.column("big"))).drop_columns(["big"]),
        batch_format="pyarrow",
    )

    d = _doc_cells(docs, res)
    z = _zone_cover(zones_small, res)
    if hot_threshold is not None:
        d, z = _apply_salting(d, z, hot_threshold, keyspace=1 << (2 * res))

    if engine == "group" and len(carry) == 1 and _int_carry(docs, carry[0]):
        key = carry[0]

        n_groups = num_partitions * GROUP_FAN  # load-balance, see GROUP_FAN

        def docs_shared(batch: pa.Table) -> pa.Table:
            x = batch.column("x").to_numpy(zero_copy_only=False)
            cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
            return pa.table({
                "gkey": pa.array(_gkey_of(cell, n_groups)),
                "cell_id": pa.array(cell),
                "gid": batch.column(key),
                "c0": pa.array(x),
                "c1": batch.column("y"),
                "c2": pa.array(np.zeros(len(x))),
                "c3": pa.array(np.zeros(len(x))),
                "is_zone": pa.array(np.zeros(len(x), dtype=bool)),
            })

        def zones_shared(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
            return pa.table({
                "gkey": pa.array(_gkey_of(cell, n_groups)),
                "cell_id": pa.array(cell),
                "gid": batch.column("zone_id"),
                "c0": batch.column("min_x"),
                "c1": batch.column("max_x"),
                "c2": batch.column("min_y"),
                "c3": batch.column("max_y"),
                "is_zone": pa.array(np.ones(n, dtype=bool)),
            })

        def group_fn(batch: pa.Table) -> pa.Table:
            """One group = MANY cells (hashed gkey); candidate pairs
            form within exact cell via the CSR gather and the
            containment predicate runs on the flat pair arrays."""
            empty = pa.table({key: pa.array([], type=pa.int64()),
                              "zone_id": pa.array([], type=pa.int64())})
            is_zone = batch.column("is_zone").to_numpy(zero_copy_only=False)
            if is_zone.all() or not is_zone.any():
                return empty
            cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
            di, zi, pd_, pz = _cell_pairs(cell, is_zone)
            if not len(pd_):
                return empty
            gid = batch.column("gid").to_numpy(zero_copy_only=False)
            c0 = batch.column("c0").to_numpy(zero_copy_only=False)
            c1 = batch.column("c1").to_numpy(zero_copy_only=False)
            c2 = batch.column("c2").to_numpy(zero_copy_only=False)
            c3 = batch.column("c3").to_numpy(zero_copy_only=False)
            dj, zj = di[pd_], zi[pz]
            ok = contains_point(c0[zj], c1[zj], c2[zj], c3[zj],
                                c0[dj], c1[dj])
            return pa.table({key: pa.array(gid[dj][ok]),
                             "zone_id": pa.array(gid[zj][ok])})

        exchanged = d.map_batches(
            docs_shared, batch_format="pyarrow", zero_copy_batch=True
        ).union(z.map_batches(
            zones_shared, batch_format="pyarrow", zero_copy_batch=True))
        out = exchanged.groupby("gkey").map_groups(
            group_fn, batch_format="pyarrow")
        if broadcast_branch is not None:
            out = out.union(broadcast_branch)
        return out

    joined = d.join(z, "inner", num_partitions, on=("cell_id",))

    def refine(batch: pa.Table) -> pa.Table:
        ok = contains_point(
            batch.column("min_x").to_numpy(zero_copy_only=False),
            batch.column("max_x").to_numpy(zero_copy_only=False),
            batch.column("min_y").to_numpy(zero_copy_only=False),
            batch.column("max_y").to_numpy(zero_copy_only=False),
            batch.column("x").to_numpy(zero_copy_only=False),
            batch.column("y").to_numpy(zero_copy_only=False),
        )
        return batch.filter(pa.array(ok)).select([*carry, "zone_id"])

    out = joined.map_batches(refine, batch_format="pyarrow", zero_copy_batch=True)
    if broadcast_branch is not None:
        out = out.union(broadcast_branch)
    return out


def _dominance_prune_cover(z, res: int, kk: int, num_partitions: int):
    """ID-dominance prune of FULL-COVER zone rows, per cell (exact).

    A zone whose box covers a cell's entire doc-preimage scores
    d2 == 0 for EVERY doc in the cell, so under the (d2, smallest-id)
    tie-break only the ``kk`` smallest-id such zones can ever reach a
    top-k there — the rest of the cell's full-cover rows are dead
    exchange weight (the per-cell-list analog lives in
    grid_index._ensure_cell_bounds; the fixture carries ~31 containing
    zones per doc, so this collapses most of the zero-distance tie
    bulk before it is ever shuffled to the doc side).  PARTIAL-cover
    rows are never touched — their distance depends on the query
    point.  Conservative full-cover test: the cell preimage is
    widened by one 16-bit fine-grid cell against float boundary
    rounding, and grid-EDGE cells (whose preimage is unbounded — the
    grid clip absorbs out-of-range coords) are never classified full.
    Runs BEFORE salting so dominance applies to the raw cell; salting
    then replicates the surviving rows only.  One cheap zone-side
    exchange (cover rows are the small side)."""
    from ..config import WORLD_H, WORLD_MIN_X, WORLD_MIN_Y, WORLD_W

    axis = 1 << res
    cw = WORLD_W / axis
    ch = WORLD_H / axis
    mx_ = WORLD_W / 65536.0
    my_ = WORLD_H / 65536.0

    def add_gk(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
        return batch.append_column("zgk", pa.array(_gkey_of(cell, num_partitions)))

    def prune(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
        zid = batch.column("zone_id").to_numpy(zero_copy_only=False)
        mnx = batch.column("min_x").to_numpy(zero_copy_only=False)
        mxx = batch.column("max_x").to_numpy(zero_copy_only=False)
        mny = batch.column("min_y").to_numpy(zero_copy_only=False)
        mxy = batch.column("max_y").to_numpy(zero_copy_only=False)
        cx = cell >> res
        cy = cell & (axis - 1)
        x0 = WORLD_MIN_X + cx * cw
        y0 = WORLD_MIN_Y + cy * ch
        interior = (cx > 0) & (cx < axis - 1) & (cy > 0) & (cy < axis - 1)
        full = (interior & (mnx <= x0 - mx_) & (mxx >= x0 + cw + mx_)
                & (mny <= y0 - my_) & (mxy >= y0 + ch + my_))
        keep = ~full
        fi = np.nonzero(full)[0]
        if len(fi):
            order = np.lexsort((zid[fi], cell[fi]))
            fc = cell[fi][order]
            starts = np.flatnonzero(
                np.concatenate(([True], fc[1:] != fc[:-1])))
            counts = np.diff(np.append(starts, len(fc)))
            rank = np.arange(len(fc), dtype=np.int64) - np.repeat(starts, counts)
            keep[fi[order][rank < kk]] = True
        return batch.filter(pa.array(keep)).drop_columns(["zgk"])

    return z.map_batches(add_gk, batch_format="pyarrow", zero_copy_batch=True
                         ).groupby("zgk").map_groups(prune,
                                                     batch_format="pyarrow")


def knn_join_partitioned(docs, zones, zones_broadcast_payload, k: int,
                         res: int = DEFAULT_CELL_RES, pad_rings: int = 1,
                         num_partitions: int | None = None,
                         carry: tuple[str, ...] = ("doc_id",),
                         hot_threshold: int | None = None,
                         engine: str = "group",
                         prebuilt_ref=None):
    """kNN join via cell-cover candidate shuffle + ring-bound fallback.

    Main path: zones explode their cover padded by ``pad_rings`` rings;
    docs meet candidates on their home cell; per-doc top-k merge.  Docs
    whose kth distance exceeds the searched-ring guarantee (or with < k
    candidates) are re-probed exactly via the broadcast
    :class:`GridKnn` (ring expansion continues from scratch for that
    small remainder).

    ``engine`` picks the exchange shape (contain_join_partitioned's
    scheme):

    - ``"group"`` (default): docs and padded zone-cover rows UNION into
      one cell-keyed stream; ``groupby(cell_id).map_groups`` scores the
      doc x zone cross-product group-locally and emits only the <=k
      winners + re-probe markers.  Each input row crosses the exchange
      exactly once — the hash join materialized every (doc, candidate)
      pair at ~9 columns to the object store, the dominant byte volume
      of the stage — and per-doc candidate COLOCATION IS STRUCTURAL
      (a group is exactly one cell), retiring the join path's
      block-split hazard guard.  Requires a single integer carry
      column; non-integer or multi-column carries fall back to the
      join engine automatically.
    - ``"join"``: left-outer ``Dataset.join`` on the salted cell key —
      kept for multi-column carries and as the A/B control; needs the
      block-size guard below.
    """
    from ..grid_index import GridKnn

    if num_partitions is None:
        from ..config import num_partitions_for

        # smaller rows_per_partition than the contain join: candidate
        # fan-out (pad-ring cover) multiplies per-partition join rows,
        # and score_and_topk's colocation invariant needs each
        # partition block well under the block-split threshold
        num_partitions = num_partitions_for(docs.count(),
                                            rows_per_partition=50_000)

    # hybrid skew split: only WORLD-SPANNING zones are scored densely
    # inside the per-doc top-k merge; everything else flows through the
    # cover-explode shuffle.  The dense side costs |big| x n_docs
    # scores while exploding a zone costs ~cover x docs_per_cell, so
    # explode wins until a zone's cover approaches the WHOLE grid —
    # the break-even is cover ~ 4**res, not a fixed count (at the old
    # threshold of 64 cells the 402 moderately-big fixture zones cost
    # 804M dense scores vs 66M exploded pairs).
    axis = 1 << res
    large_cover = max(64, (axis * axis) // 4)
    p = zones_broadcast_payload
    nx = np.floor((p["max_x"] + 180.0) / 360.0 * axis) - np.floor(
        (p["min_x"] + 180.0) / 360.0 * axis) + 1
    ny = np.floor((p["max_y"] + 90.0) / 180.0 * axis) - np.floor(
        (p["min_y"] + 90.0) / 180.0 * axis) + 1
    big_mask = (nx * ny) > large_cover
    bp = {k_: np.ascontiguousarray(v[big_mask]) for k_, v in p.items()}

    def drop_big(batch: pa.Table) -> pa.Table:
        mnx = batch.column("min_x").to_numpy(zero_copy_only=False)
        mxx = batch.column("max_x").to_numpy(zero_copy_only=False)
        mny = batch.column("min_y").to_numpy(zero_copy_only=False)
        mxy = batch.column("max_y").to_numpy(zero_copy_only=False)
        bnx = np.floor((mxx + 180.0) / 360.0 * axis) - np.floor((mnx + 180.0) / 360.0 * axis) + 1
        bny = np.floor((mxy + 90.0) / 180.0 * axis) - np.floor((mny + 90.0) / 180.0 * axis) + 1
        return batch.filter(pa.array((bnx * bny) <= large_cover))

    zones_small = zones.map_batches(drop_big, batch_format="pyarrow", zero_copy_batch=True)

    min_cell = min(WORLD_W, WORLD_H) / (1 << res)
    bound = (pad_rings * min_cell) ** 2
    kk_total = min(k, len(zones_broadcast_payload["ids"]))

    d = _doc_cells(docs, res)
    z = _zone_cover(zones_small, res, pad_rings=pad_rings)
    z = _dominance_prune_cover(z, res, kk_total, num_partitions)
    if hot_threshold is not None:
        d, z = _apply_salting(d, z, hot_threshold, keyspace=1 << (2 * res))
    key = carry[0]  # the vectorized merge keys on the first carry column

    def _emit(n_done, rdoc_keep, rzone_keep, rd2_keep, rnk_keep,
              r_doc, rx, ry) -> pa.Table:
        """Assemble the output table: ``n_done`` kept winner rows
        followed by one re-probe marker row per incomplete doc.

        BYTE DIET (VERDICT r4 "What's wrong" #2 / ROADMAP): the
        materialized top-k stream is ~k rows per doc while re-probe
        markers are ~0.1% of docs, so dedicated x/y float64 columns
        were ~16 B/row of dead weight on the stage's largest
        materialization.  Markers now OVERLOAD the winner columns: a
        marker row (``complete == False``, ``zone_id == -1``) carries
        the doc's x in ``d2`` and its y BIT-EXACTLY in ``rnk``
        (float64 bits viewed as int64); the redo filter decodes them
        back.  Winner rows are untouched."""
        out_cols = {
            key: np.concatenate((rdoc_keep, r_doc)),
            "zone_id": np.concatenate((rzone_keep,
                                       np.full(len(r_doc), -1, dtype=np.int64))),
            "d2": np.concatenate((rd2_keep, np.ascontiguousarray(rx))),
            "rnk": np.concatenate((
                rnk_keep, np.ascontiguousarray(ry).view(np.int64))),
        }
        t = pa.table({c: pa.array(v) for c, v in out_cols.items()})
        return t.append_column(
            "complete",
            pa.array(np.concatenate((np.ones(n_done, dtype=bool),
                                     np.zeros(len(r_doc), dtype=bool)))),
        )

    def topk_emit_contiguous(u_doc, ux, uy, rdoc, rzone, rd2) -> pa.Table:
        """Per-doc top-k merge for DOC-CONTIGUOUS candidate rows (the
        grouped engine's _cell_pairs emits runs per doc), valid only
        when the dense big-zone side is empty (appended bp rows would
        break contiguity).

        kk_total rounds of segmented argmin (``np.minimum.reduceat``
        over the run starts, zone-id tie-break via a second reduceat
        over the tied rows) replace the 3-key lexsort — O(n) passes
        instead of O(n log n) stable argsorts on the stage's largest
        transient (~35 candidates/doc in the dense fixture).  Bit-
        identical output to the lexsort path (the engine equivalence
        test drives both)."""
        if not len(rdoc):
            return _emit(0, np.empty(0, dtype=np.int64),
                         np.empty(0, dtype=np.int64),
                         np.empty(0, dtype=np.float64),
                         np.empty(0, dtype=np.int64), u_doc, ux, uy)
        starts = np.flatnonzero(
            np.concatenate(([True], rdoc[1:] != rdoc[:-1])))
        counts = np.diff(np.append(starts, len(rdoc)))
        g_doc = rdoc[starts]
        nruns = len(starts)
        run_of = np.repeat(np.arange(nruns, dtype=np.int64), counts)
        work = rd2.copy()
        imax = np.iinfo(np.int64).max
        sel_d2 = np.empty((kk_total, nruns))
        sel_zone = np.empty((kk_total, nruns), dtype=np.int64)
        for r in range(kk_total):
            m = np.minimum.reduceat(work, starts)
            tie = work == m[run_of]
            z = np.minimum.reduceat(np.where(tie, rzone, imax), starts)
            sel_d2[r], sel_zone[r] = m, z
            work[tie & (rzone == z[run_of])] = np.inf
        # pruned input guarantees every candidate d2 < bound, so the
        # strict kth < bound retirement reduces to counts >= kk_total
        g_complete = counts >= kk_total
        n_comp = int(g_complete.sum())
        done_docs = g_doc[g_complete]
        redo_mask = ~np.isin(u_doc, done_docs, assume_unique=True)
        return _emit(
            n_comp * kk_total,
            np.repeat(done_docs, kk_total),
            sel_zone[:, g_complete].T.ravel(),
            sel_d2[:, g_complete].T.ravel(),
            np.tile(np.arange(1, kk_total + 1, dtype=np.int64), n_comp),
            u_doc[redo_mask], ux[redo_mask], uy[redo_mask],
        )

    def topk_emit(u_doc, ux, uy, rdoc, rzone, rd2) -> pa.Table:
        """Per-doc top-k merge + completeness emit (shared by both
        engines).  Fully vectorized (lexsort + run-length ranks — the
        technique of grid_index.query's merge): flat candidate rows
        (rdoc, rzone, rd2) dense-merge with the broadcast big zones,
        the k smallest (d2, zone_id) per doc are kept, and docs whose
        kth distance is not STRICTLY inside the searched-ring
        guarantee emit ONE re-probe marker row instead."""
        if len(bp["ids"]):
            # dense-score the broadcast big zones once per unique doc,
            # but merge only each doc's tie-inclusive top-k of the big
            # side: entries with d2 > the doc's kth-smallest big d2 can
            # never reach the global top-k, and keeping ALL entries at
            # <= that threshold preserves the (d2, id) tie-break for
            # the final lexsort to resolve.  Without this prune every
            # doc dragged all |big| rows into the concat + lexsort
            # (2M docs x 402 big zones = 800M sorted rows — the
            # dominant cost of the whole stage); the transient
            # nd x |big| score matrix is chunked to ~32 MB.
            m = len(bp["ids"])
            bdocs, bzones, bd2s = [], [], []
            step = max(1, 4_000_000 // m)
            for s in range(0, len(u_doc), step):
                e = min(s + step, len(u_doc))
                bd2 = box_point_squared_distance(
                    bp["min_x"][None, :], bp["max_x"][None, :],
                    bp["min_y"][None, :], bp["max_y"][None, :],
                    ux[s:e, None], uy[s:e, None],
                )
                if m > kk_total:
                    kthv = np.partition(bd2, kk_total - 1, axis=1)[:, kk_total - 1]
                    mask = bd2 <= kthv[:, None]
                    cnt = mask.sum(axis=1)
                    bdocs.append(np.repeat(u_doc[s:e], cnt))
                    bzones.append(np.broadcast_to(bp["ids"], bd2.shape)[mask])
                    bd2s.append(bd2[mask])
                else:
                    bdocs.append(np.repeat(u_doc[s:e], m))
                    bzones.append(np.tile(bp["ids"], e - s))
                    bd2s.append(bd2.ravel())
            rdoc = np.concatenate([rdoc, *bdocs])
            rzone = np.concatenate([rzone, *bzones])
            rd2 = np.concatenate([rd2, *bd2s])

        if len(rdoc):
            order = np.lexsort((rzone, rd2, rdoc))
            rdoc, rzone, rd2 = rdoc[order], rzone[order], rd2[order]
            starts = np.flatnonzero(
                np.concatenate(([True], rdoc[1:] != rdoc[:-1])))
            counts = np.diff(np.append(starts, len(rdoc)))
            rank = np.arange(len(rdoc), dtype=np.int64) - np.repeat(starts, counts)
            g_doc = rdoc[starts]
            kth = rd2[starts + np.minimum(counts, kk_total) - 1]
            # STRICT kth < bound: a zone exactly AT the pad-ring
            # distance with a smaller id than a seen tie would violate
            # the smallest-id tie-break if the doc retired here —
            # boundary-tied docs fall through to the exact re-probe
            # (same strict retirement as GridKnn.query; ADVICE r2 #2)
            g_complete = (counts >= kk_total) & (kth < bound)
            keep = (rank < k) & np.repeat(g_complete, counts)
            n_done = int(keep.sum())
        else:
            g_doc = np.empty(0, dtype=np.int64)
            g_complete = np.empty(0, dtype=bool)
            keep = np.empty(0, dtype=bool)
            rank = np.empty(0, dtype=np.int64)
            rdoc = np.asarray(rdoc, dtype=np.int64)
            rzone = np.asarray(rzone, dtype=np.int64)
            rd2 = np.asarray(rd2, dtype=np.float64)
            n_done = 0

        # incomplete docs (ring bound not conclusive, or zero shuffled
        # candidates) emit ONE re-probe marker row each
        done_docs = g_doc[g_complete]
        redo_mask = ~np.isin(u_doc, done_docs, assume_unique=True)
        return _emit(n_done, rdoc[keep], rzone[keep], rd2[keep],
                     rank[keep] + 1,
                     u_doc[redo_mask], ux[redo_mask], uy[redo_mask])

    if engine == "group" and len(carry) == 1 and _int_carry(docs, key):
        n_groups = num_partitions * GROUP_FAN  # load-balance, see GROUP_FAN

        def docs_shared(batch: pa.Table) -> pa.Table:
            x = batch.column("x").to_numpy(zero_copy_only=False)
            cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
            return pa.table({
                "gkey": pa.array(_gkey_of(cell, n_groups)),
                "cell_id": pa.array(cell),
                "gid": batch.column(key),
                "c0": pa.array(x),
                "c1": batch.column("y"),
                "c2": pa.array(np.zeros(len(x))),
                "c3": pa.array(np.zeros(len(x))),
                "is_zone": pa.array(np.zeros(len(x), dtype=bool)),
            })

        def zones_shared(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
            return pa.table({
                "gkey": pa.array(_gkey_of(cell, n_groups)),
                "cell_id": pa.array(cell),
                "gid": batch.column("zone_id"),
                "c0": batch.column("min_x"),
                "c1": batch.column("max_x"),
                "c2": batch.column("min_y"),
                "c3": batch.column("max_y"),
                "is_zone": pa.array(np.ones(n, dtype=bool)),
            })

        def group_fn(batch: pa.Table) -> pa.Table:
            """One group = MANY cells (hashed gkey); every doc's home
            cell hashes to exactly one group, so ALL of its shuffled
            candidates are here by construction.  Candidate pairs form
            within exact cell via the CSR gather, are scored on the
            flat pair arrays, and only the <=k winners + re-probe
            markers leave — the exchange never carries a candidate
            pair."""
            is_zone = batch.column("is_zone").to_numpy(zero_copy_only=False)
            gid = batch.column("gid").to_numpy(zero_copy_only=False)
            cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
            c0 = batch.column("c0").to_numpy(zero_copy_only=False)
            c1 = batch.column("c1").to_numpy(zero_copy_only=False)
            # _cell_pairs emits pairs in doc-run order, so the
            # segmented-argmin merge applies whenever no dense bp rows
            # get appended (they would break run contiguity)
            emit = topk_emit if len(bp["ids"]) else topk_emit_contiguous
            di, zi, pd_, pz = _cell_pairs(cell, is_zone)
            u_doc, ux, uy = gid[di], c0[di], c1[di]
            if not len(pd_):
                return emit(u_doc, ux, uy,
                            np.empty(0, dtype=np.int64),
                            np.empty(0, dtype=np.int64),
                            np.empty(0, dtype=np.float64))
            c2 = batch.column("c2").to_numpy(zero_copy_only=False)
            c3 = batch.column("c3").to_numpy(zero_copy_only=False)
            dj, zj = di[pd_], zi[pz]
            rd2 = box_point_squared_distance(c0[zj], c1[zj], c2[zj], c3[zj],
                                             c0[dj], c1[dj])
            # EXACT prune before the per-doc merge: a candidate with
            # d2 >= bound can never be emitted — a COMPLETE doc's
            # top-k all satisfy d2 <= kth < bound, and an incomplete
            # doc discards its pairs for the re-probe marker.  And
            # completeness itself is unchanged: complete <=> at least
            # k candidates with d2 < bound, which the pruned set
            # preserves by construction.
            near = rd2 < bound
            return emit(u_doc, ux, uy, gid[dj][near], gid[zj][near],
                        rd2[near])

        exchanged = d.map_batches(
            docs_shared, batch_format="pyarrow", zero_copy_batch=True
        ).union(z.map_batches(
            zones_shared, batch_format="pyarrow", zero_copy_batch=True))
        # materialize ONCE: the compact top-k rows (<= k per doc) — the
        # done filter and the redo filter both read this
        merged = exchanged.groupby("gkey").map_groups(
            group_fn, batch_format="pyarrow").materialize()
    else:
        # LEFT OUTER so every doc reaches the top-k merge even with zero
        # shuffled candidates (null zone rows become -1/inf sentinels)
        joined = d.join(z, "left_outer", num_partitions, on=("cell_id",))

        def score_and_topk(batch: pa.Table) -> pa.Table:
            """Fused score + per-doc top-k merge over one join partition.

            PARTITIONING INVARIANT: every doc carries exactly ONE
            (salted) cell key, so the hash join co-locates all of a
            doc's candidate rows in one partition; with
            ``batch_size=None`` this function sees whole partition
            blocks.  ``num_partitions`` must keep a partition's
            candidate rows under the block-split threshold
            (DataContext.target_max_block_size) — the salting stage
            bounds per-partition doc counts, making this a sizing
            invariant of the same kind as any hash join's memory
            bound.  (The "group" engine has no such hazard.)
            """
            import pyarrow.compute as pc
            from ray.data import DataContext

            # fail LOUDLY if the partitioning invariant is at risk: a
            # join partition block at/near the block-split threshold has
            # likely been split by the executor, scattering one doc's
            # candidate rows across blocks, silently truncating its top-k.
            tgt = DataContext.get_current().target_max_block_size
            if tgt and batch.nbytes >= int(0.9 * tgt):
                raise RuntimeError(
                    f"knn_join_partitioned: join partition block is "
                    f"{batch.nbytes}B, within 10% of target_max_block_size "
                    f"({tgt}B) — block splitting would break per-doc candidate "
                    f"colocation; raise num_partitions so each partition stays "
                    f"well under the block-split threshold")

            mnx = batch.column("min_x").to_numpy(zero_copy_only=False)
            mxx = batch.column("max_x").to_numpy(zero_copy_only=False)
            mny = batch.column("min_y").to_numpy(zero_copy_only=False)
            mxy = batch.column("max_y").to_numpy(zero_copy_only=False)
            x = batch.column("x").to_numpy(zero_copy_only=False)
            y = batch.column("y").to_numpy(zero_copy_only=False)
            doc = batch.column(key).to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore"):
                d2 = box_point_squared_distance(mnx, mxx, mny, mxy, x, y)
            zid = pc.fill_null(batch.column("zone_id"), -1).to_numpy(
                zero_copy_only=False)

            u_doc, first_idx = np.unique(doc, return_index=True)
            ux, uy = x[first_idx], y[first_idx]

            real = zid >= 0
            return topk_emit(u_doc, ux, uy, doc[real], zid[real], d2[real])

        # materialize ONCE: the compact top-k rows (<= k per doc) — both
        # the done filter and the redo filter read this, instead of
        # re-running the whole shuffle DAG twice (ADVICE.md round 1)
        merged = joined.map_batches(
            score_and_topk, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ).materialize()

    done = merged.map_batches(
        lambda t: t.filter(t.column("complete")).select([key, "zone_id", "d2", "rnk"]),
        batch_format="pyarrow",
    )

    def _decode_redo(t: pa.Table) -> pa.Table:
        """Marker rows carry x in ``d2`` and y's float64 bits in
        ``rnk`` (see ``_emit``'s byte-diet note) — decode bit-exactly."""
        import pyarrow.compute as pc

        t = t.filter(pc.invert(t.column("complete")))
        return pa.table({
            key: t.column(key),
            "x": t.column("d2"),
            "y": pa.array(t.column("rnk").to_numpy(
                zero_copy_only=False).view(np.float64)),
        })

    redo = merged.map_batches(_decode_redo, batch_format="pyarrow")

    # The marker stream is ~0.1% of docs scattered over every merged
    # block, and the actor-pool stage below schedules a task per block
    # REGARDLESS of emptiness — the round-5 profile showed 214 tasks /
    # ~9 s of pure empty-block ceremony re-probing ZERO rows.  merged
    # is already materialized, so counting the markers is one cheap
    # vectorized pass over its lineage: skip the stage outright when
    # nothing needs re-probing, else compact the stragglers into a few
    # dense blocks first.
    n_redo = redo.count()
    if n_redo == 0:
        return done
    redo = redo.repartition(max(1, -(-n_redo // 8192)))

    # exact ring-expansion re-probe of the remainder STAYS distributed:
    # a KnnJoinActor stage over the redo Dataset (fixes the round-1
    # driver-side GridKnn probe, VERDICT.md "What's wrong" #2)
    from .spatial import KnnJoinActor

    # ``prebuilt_ref`` (a ray.put GridKnn, e.g. bench's untimed
    # prebuild) skips the per-actor bounds-list construction in the
    # re-probe pool — at 20k zones that build is ~10 s PER ACTOR while
    # the redo stream itself is ~0.1% of docs
    build_ref = prebuilt_ref if prebuilt_ref is not None \
        else ray.put(zones_broadcast_payload)
    extra = redo.map_batches(
        KnnJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"build_ref": build_ref, "kind": "box",
                               "res": res, "k": k, "carry": (key,),
                               "id_out": "zone_id"},
        concurrency=actor_pool(), batch_size=8192,
    ).select_columns([key, "zone_id", "d2", "rnk"])
    return done.union(extra)


def within_distance_pairs(ds, radius: float, id_col: str = "doc_id",
                          x_col: str = "x", y_col: str = "y",
                          carry_col: str | None = None,
                          num_partitions: int | None = None):
    """All unordered point pairs within CLOSED Euclidean ``radius``:
    ``(id_a, id_b, d2)`` with ``id_a < id_b`` and ``d2 <= radius**2``.

    The distance-threshold self-join (spatial blocking for geo-dedup /
    co-location mining) — the pair-emitting sibling of the kNN self-
    join.  Shuffle shape, one exchange: bin points into cells of side
    ``radius`` so qualifying pairs span at most ADJACENT cells, emit
    each point once as RESIDENT of its home cell plus one VISITOR copy
    into the four forward neighbors (E, NE, N, NW); every unordered
    adjacent-cell pair then meets in exactly one group (the reverse
    directions are not emitted) and same-cell pairs meet in the
    resident set, so no dedup pass is needed.  Per group, ONE
    vectorized distance matrix scores resident x (resident + visitor)
    and the id order is normalized after the fact ((a-b)**2 is
    bit-identical to (b-a)**2, so d2 does not depend on orientation).

    Skew: group compute is O(m^2) in the cell population — radius
    should be chosen so cells hold O(k) points (it plays the role the
    kNN engines' density-adaptive bucket res plays); a degenerate
    all-points-one-spot corpus needs the hot-cell sub-bucketing of
    grid_index before this operator, same caveat as documented there.
    Pairs themselves are the OUTPUT, so output volume is inherent.

    ``carry_col`` (optional) rides the shuffle as ONE extra scalar
    column and is emitted per pair as ``va``/``vb`` (aligned with
    ``id_a``/``id_b``) — the simhash lesson: carrying a scalar through
    the existing exchange beats joining it back afterwards.
    """
    from ..config import WORLD_MIN_X, WORLD_MIN_Y, num_partitions_for

    r2 = radius * radius
    if num_partitions is None:
        # metadata-only for the fresh reads every call site passes
        num_partitions = num_partitions_for(ds.count(),
                                            rows_per_partition=100_000)
    n_groups = num_partitions * GROUP_FAN  # load-balance, see GROUP_FAN

    def explode(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cx = np.floor((x - WORLD_MIN_X) / radius).astype(np.int64)
        cy = np.floor((y - WORLD_MIN_Y) / radius).astype(np.int64)
        # forward half-neighborhood: E, NE, N, NW
        dxs = np.array([0, 1, 1, 0, -1], dtype=np.int64)
        dys = np.array([0, 0, 1, 1, 1], dtype=np.int64)
        n = len(ids)
        rep = np.repeat(np.arange(n, dtype=np.int64), len(dxs))
        gx = cx[rep] + np.tile(dxs, n)
        gy = cy[rep] + np.tile(dys, n)
        res = np.tile(np.array([True, False, False, False, False]), n)
        cell = gx * np.int64(1 << 31) + gy
        cols = {
            "gkey": pa.array(_gkey_of(cell, n_groups)),
            "cell": pa.array(cell),
            id_col: pa.array(ids[rep]),
            x_col: pa.array(x[rep]),
            y_col: pa.array(y[rep]),
            "is_res": pa.array(res),
        }
        if carry_col is not None:
            cols[carry_col] = batch.column(carry_col).take(pa.array(rep))
        return pa.table(cols)

    def pairs_of_group(batch: pa.Table) -> pa.Table:
        """One group = MANY cells (hashed gkey; the one-group-per-cell
        shape fired this function once per occupied radius-cell and
        the per-call overhead dominated).  Residents pair with every
        same-cell row via the CSR gather; distances and the pair
        dedup run on the flat pair arrays (dx*dx+dy*dy per pair is
        bit-identical to the old per-cell matrix entries)."""
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        res = batch.column("is_res").to_numpy(zero_copy_only=False)
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        ri = np.nonzero(res)[0]
        empty_cols = {"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "d2": pa.array([], type=pa.float64())}
        if carry_col is not None:
            t = batch.schema.field(carry_col).type
            empty_cols["va"] = pa.array([], type=t)
            empty_cols["vb"] = pa.array([], type=t)
        empty = pa.table(empty_cols)
        if len(ri) == 0:
            return empty
        di_, zi_, pd_, pz = _csr_pairs(cell, ri, np.arange(len(ids),
                                                           dtype=np.int64))
        if not len(pd_):
            return empty
        a_row = di_[pd_]        # resident row per pair
        b_row = zi_[pz]         # same-cell member row per pair
        dx = x[a_row] - x[b_row]
        dy = y[a_row] - y[b_row]
        d2 = dx * dx + dy * dy
        # residents vs residents: keep each unordered same-cell pair
        # once (strict order on the residents' global positions, which
        # is consistent within any one cell and excludes self-pairs);
        # residents vs visitors: all
        pos_r = np.full(len(ids), -1, dtype=np.int64)
        pos_r[ri] = np.arange(len(ri))
        keep = (d2 <= r2) & ((pos_r[b_row] < 0) | (pos_r[b_row] > pos_r[a_row]))
        a_row, b_row, d2 = a_row[keep], b_row[keep], d2[keep]
        ia, ib = ids[a_row], ids[b_row]
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        cols = {"id_a": pa.array(lo), "id_b": pa.array(hi),
                "d2": pa.array(d2)}
        if carry_col is not None:
            v = batch.column(carry_col).to_numpy(zero_copy_only=False)
            swap = ia > ib  # align carried values with the (lo, hi) order
            cols["va"] = pa.array(np.where(swap, v[b_row], v[a_row]))
            cols["vb"] = pa.array(np.where(swap, v[a_row], v[b_row]))
        return pa.table(cols)

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)
    return exploded.groupby("gkey").map_groups(
        pairs_of_group, batch_format="pyarrow")


def _cell_floor_fns(res: int):
    from ..config import WORLD_H, WORLD_MIN_X, WORLD_MIN_Y, WORLD_W

    axis = 1 << res

    def fx(v: np.ndarray) -> np.ndarray:
        return np.clip(np.floor((v - WORLD_MIN_X) / WORLD_W * axis), 0,
                       axis - 1).astype(np.int64)

    def fy(v: np.ndarray) -> np.ndarray:
        return np.clip(np.floor((v - WORLD_MIN_Y) / WORLD_H * axis), 0,
                       axis - 1).astype(np.int64)

    return axis, fx, fy


def _bbox_cover_explode(ids, mnx, mxx, mny, mxy, res: int):
    """(cell, source_row) explode of each bbox's world-clamped cell
    cover at ``res`` — the shared candidate-generation step of the
    pair-join family (box_overlap_pairs' scheme, factored)."""
    axis, fx, fy = _cell_floor_fns(res)
    if not len(ids):
        # empty block (filtered upstreams emit them): the ([0], …)
        # starts below would be 1-long against 0-long counts
        e = np.empty(0, dtype=np.int64)
        return e, e
    cx_lo, cx_hi = fx(mnx), fx(mxx)
    cy_lo, cy_hi = fy(mny), fy(mxy)
    nx = cx_hi - cx_lo + 1
    ny = cy_hi - cy_lo + 1
    counts = nx * ny
    total = int(counts.sum())
    rep = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    ny_r = np.repeat(ny, counts)
    gx = np.repeat(cx_lo, counts) + local // ny_r
    gy = np.repeat(cy_lo, counts) + local % ny_r
    return gx * axis + gy, rep


def segment_intersection_pairs(ds, res: int = 6, id_col: str = "segment_id",
                               large_cover_cells: int = 64,
                               num_partitions: int | None = None):
    """All unordered INTERSECTING segment pairs (closed — touching
    counts, the zero-distance case of P7): ``(id_a, id_b)`` with
    ``id_a < id_b``.  The segment-overlay / crossing-detection join.

    Same one-exchange shape as :func:`box_overlap_pairs`: each segment
    explodes to its BBOX cell cover; intersecting segments have
    overlapping bboxes, so both covers include every cell of the bbox
    intersection — the min-corner rule emits the pair only in the cell
    holding that intersection's (xlo, ylo) corner.  Per group one
    vectorized m x m orientation-test matrix
    (kernels.segments_intersect) — exact float predicate, no distance
    computation, no dedup shuffle.

    Skew (IMPLEMENTED): a segment's bbox cover is its length in cells
    squared-ish (diagonal segments cover the full bbox, not just
    pierced cells) — ``res`` should keep typical covers O(10) cells,
    and segments whose cover exceeds ``large_cover_cells`` ride a
    BROADCAST side (big x normal scored block-locally — each normal
    segment lives in ONE input block, so no dedup; big x big
    driver-side over the tiny set), contain_join_partitioned's hybrid
    rule.
    """
    import pyarrow.compute as pc
    import ray as _ray
    import ray.data as rd

    from ..kernels import segments_intersect

    axis, fx, fy = _cell_floor_fns(res)

    def _scols(batch: pa.Table):
        return (batch.column(id_col).to_numpy(zero_copy_only=False),
                batch.column("start_x").to_numpy(zero_copy_only=False),
                batch.column("start_y").to_numpy(zero_copy_only=False),
                batch.column("end_x").to_numpy(zero_copy_only=False),
                batch.column("end_y").to_numpy(zero_copy_only=False))

    def tag_cover(batch: pa.Table) -> pa.Table:
        _, sx, sy, ex, ey = _scols(batch)
        nx = fx(np.maximum(sx, ex)) - fx(np.minimum(sx, ex)) + 1
        ny = fy(np.maximum(sy, ey)) - fy(np.minimum(sy, ey)) + 1
        return batch.append_column(
            "big", pa.array((nx * ny) > large_cover_cells))

    # materialize ONCE: the big-side drain, the normal-side stream and
    # the vs_big branch would otherwise each re-run tag_cover over the
    # input (~3x scans per join — ADVICE r3 #3)
    tagged = ds.map_batches(tag_cover, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    big_chunks = [c for c in tagged.map_batches(
        lambda t: t.filter(t.column("big")).drop_columns(["big"]),
        batch_format="pyarrow",
    ).iter_batches(batch_size=None, batch_format="pyarrow") if len(c)]
    ds = tagged.map_batches(
        lambda t: t.filter(pc.invert(t.column("big"))).drop_columns(["big"]),
        batch_format="pyarrow")

    branches = []
    if big_chunks:
        bt = pa.concat_tables(big_chunks)
        bid, bsx, bsy, bex, bey = _scols(bt)
        m = len(bid)
        hit = segments_intersect(
            bsx[:, None], bsy[:, None], bex[:, None], bey[:, None],
            bsx[None, :], bsy[None, :], bex[None, :], bey[None, :],
        ) & (np.arange(m)[:, None] < np.arange(m)[None, :])
        a, b = np.nonzero(hit)
        branches.append(rd.from_arrow(pa.table({
            "id_a": pa.array(np.minimum(bid[a], bid[b])),
            "id_b": pa.array(np.maximum(bid[a], bid[b]))})))
        big_ref = _ray.put((bid, bsx, bsy, bex, bey))

        def vs_big(batch: pa.Table) -> pa.Table:
            gid, sx, sy, ex, ey = _scols(batch)
            rbid, rsx, rsy, rex, rey = _ray.get(big_ref)
            hit = segments_intersect(
                sx[:, None], sy[:, None], ex[:, None], ey[:, None],
                rsx[None, :], rsy[None, :], rex[None, :], rey[None, :])
            n_, b_ = np.nonzero(hit)
            return pa.table({
                "id_a": pa.array(np.minimum(gid[n_], rbid[b_])),
                "id_b": pa.array(np.maximum(gid[n_], rbid[b_]))})

        branches.append(ds.map_batches(vs_big, batch_format="pyarrow",
                                       zero_copy_batch=True))

    from ..config import num_partitions_for

    # post-materialize count is metadata-cheap; covers multiply rows,
    # but rows_per_partition already budgets for O(10)-cell covers.
    # A derived (non-fresh-read) input should pass num_partitions to
    # avoid the count() executing its lineage once extra (ADVICE r4 #2)
    n_groups = GROUP_FAN * (  # load-balance, see GROUP_FAN
        num_partitions if num_partitions is not None else
        num_partitions_for(tagged.count(), rows_per_partition=100_000))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sx = batch.column("start_x").to_numpy(zero_copy_only=False)
        sy = batch.column("start_y").to_numpy(zero_copy_only=False)
        ex = batch.column("end_x").to_numpy(zero_copy_only=False)
        ey = batch.column("end_y").to_numpy(zero_copy_only=False)
        cell, rep = _bbox_cover_explode(
            ids, np.minimum(sx, ex), np.maximum(sx, ex),
            np.minimum(sy, ey), np.maximum(sy, ey), res)
        return pa.table({
            "gkey": pa.array(_gkey_of(cell, n_groups)),
            "cell": pa.array(cell),
            id_col: pa.array(ids[rep]),
            "start_x": pa.array(sx[rep]), "start_y": pa.array(sy[rep]),
            "end_x": pa.array(ex[rep]), "end_y": pa.array(ey[rep]),
        })

    def pairs_of_group(batch: pa.Table) -> pa.Table:
        """One group = MANY cells (hashed gkey — one group per cell
        fired this once per occupied cover-cell).  Same-cell candidate
        pairs via the CSR gather, the a<b half only (the per-cell
        matrix evaluated the full m x m); min-corner dedup per pair
        against the pair's own cell."""
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sx = batch.column("start_x").to_numpy(zero_copy_only=False)
        sy = batch.column("start_y").to_numpy(zero_copy_only=False)
        ex = batch.column("end_x").to_numpy(zero_copy_only=False)
        ey = batch.column("end_y").to_numpy(zero_copy_only=False)
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        n = len(ids)
        rows = np.arange(n, dtype=np.int64)
        di_, zi_, pd_, pz = _csr_pairs(cell, rows, rows)
        a = di_[pd_]
        b = zi_[pz]
        half = a < b  # one orientation per unordered pair, no self-pairs
        a, b = a[half], b[half]
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())})
        if not len(a):
            return empty
        hit = segments_intersect(sx[a], sy[a], ex[a], ey[a],
                                 sx[b], sy[b], ex[b], ey[b])
        a, b = a[hit], b[hit]
        # min-corner dedup over the bbox intersection's low corner
        xlo = np.maximum(np.minimum(sx[a], ex[a]), np.minimum(sx[b], ex[b]))
        ylo = np.maximum(np.minimum(sy[a], ey[a]), np.minimum(sy[b], ey[b]))
        keep = (fx(xlo) * axis + fy(ylo)) == cell[a]
        ia, ib = ids[a[keep]], ids[b[keep]]
        return pa.table({"id_a": pa.array(np.minimum(ia, ib)),
                         "id_b": pa.array(np.maximum(ia, ib))})

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = exploded.groupby("gkey").map_groups(
        pairs_of_group, batch_format="pyarrow")
    for br in branches:
        out = out.union(br)
    return out


def box_segment_overlap_join(zones, segments, res: int = 6,
                             zone_id: str = "zone_id",
                             seg_id: str = "segment_id",
                             large_cover_cells: int = 64,
                             num_partitions: int | None = None):
    """Bipartite box-segment intersection join (closed — the
    ``box_segment_squared_distance == 0`` case of P8): one row
    ``(zone_id, segment_id)`` per zone box the segment touches or
    enters.  The vector-overlay sibling of the containment join for
    line geometry (roads x districts).

    One exchange: both sides explode to their bbox cell covers at
    ``res`` into a SHARED schema (``c0..c3`` are box corners for
    zones, endpoints for segments — decoded per side inside the
    group); a qualifying pair's bbox intersection is covered by both
    sides, so the min-corner rule emits it exactly once.  Per group
    one vectorized zones x segments predicate matrix
    (kernels.box_segment_intersects — pure orientation/containment
    comparisons, trivially SQL-mirrorable).

    Skew (IMPLEMENTED): zones whose cover exceeds
    ``large_cover_cells`` ride a broadcast side scored block-locally
    against the streaming segments (each segment lives in exactly ONE
    input block — no dedup).  Segments are bounded-length by layer
    construction; an oversized-segment split would mirror this one.
    """
    import pyarrow.compute as pc
    import ray as _ray

    from ..kernels import box_segment_intersects

    axis, fx, fy = _cell_floor_fns(res)

    def tag_cover(batch: pa.Table) -> pa.Table:
        mnx = batch.column("min_x").to_numpy(zero_copy_only=False)
        mxx = batch.column("max_x").to_numpy(zero_copy_only=False)
        mny = batch.column("min_y").to_numpy(zero_copy_only=False)
        mxy = batch.column("max_y").to_numpy(zero_copy_only=False)
        nx = fx(mxx) - fx(mnx) + 1
        ny = fy(mxy) - fy(mny) + 1
        return batch.append_column(
            "big", pa.array((nx * ny) > large_cover_cells))

    # materialize ONCE (ADVICE r3 #3 — see segment_intersection_pairs)
    tagged = zones.map_batches(tag_cover, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    big_chunks = [c for c in tagged.map_batches(
        lambda t: t.filter(t.column("big")).drop_columns(["big"]),
        batch_format="pyarrow",
    ).iter_batches(batch_size=None, batch_format="pyarrow") if len(c)]
    zones = tagged.map_batches(
        lambda t: t.filter(pc.invert(t.column("big"))).drop_columns(["big"]),
        batch_format="pyarrow")

    big_branch = None
    if big_chunks:
        bt = pa.concat_tables(big_chunks)
        big_ref = _ray.put((
            bt.column(zone_id).to_numpy(zero_copy_only=False),
            bt.column("min_x").to_numpy(zero_copy_only=False),
            bt.column("max_x").to_numpy(zero_copy_only=False),
            bt.column("min_y").to_numpy(zero_copy_only=False),
            bt.column("max_y").to_numpy(zero_copy_only=False)))

        def vs_big(batch: pa.Table) -> pa.Table:
            sid = batch.column(seg_id).to_numpy(zero_copy_only=False)
            sx = batch.column("start_x").to_numpy(zero_copy_only=False)
            sy = batch.column("start_y").to_numpy(zero_copy_only=False)
            ex = batch.column("end_x").to_numpy(zero_copy_only=False)
            ey = batch.column("end_y").to_numpy(zero_copy_only=False)
            bid, mnx, mxx, mny, mxy = _ray.get(big_ref)
            hit = box_segment_intersects(
                mnx[:, None], mxx[:, None], mny[:, None], mxy[:, None],
                sx[None, :], sy[None, :], ex[None, :], ey[None, :])
            z, s = np.nonzero(hit)
            return pa.table({zone_id: pa.array(bid[z]),
                             seg_id: pa.array(sid[s])})

        big_branch = segments.map_batches(vs_big, batch_format="pyarrow",
                                          zero_copy_batch=True)

    from ..config import num_partitions_for

    # derived inputs should pass num_partitions (ADVICE r4 #2)
    n_groups = GROUP_FAN * (  # load-balance, see GROUP_FAN
        num_partitions if num_partitions is not None else
        num_partitions_for(tagged.count(), rows_per_partition=100_000))

    def explode_zones(batch: pa.Table) -> pa.Table:
        ids = batch.column(zone_id).to_numpy(zero_copy_only=False)
        mnx = batch.column("min_x").to_numpy(zero_copy_only=False)
        mxx = batch.column("max_x").to_numpy(zero_copy_only=False)
        mny = batch.column("min_y").to_numpy(zero_copy_only=False)
        mxy = batch.column("max_y").to_numpy(zero_copy_only=False)
        cell, rep = _bbox_cover_explode(ids, mnx, mxx, mny, mxy, res)
        return pa.table({
            "gkey": pa.array(_gkey_of(cell, n_groups)),
            "cell": pa.array(cell), "gid": pa.array(ids[rep]),
            "c0": pa.array(mnx[rep]), "c1": pa.array(mxx[rep]),
            "c2": pa.array(mny[rep]), "c3": pa.array(mxy[rep]),
            "is_zone": pa.array(np.ones(len(rep), dtype=bool)),
        })

    def explode_segs(batch: pa.Table) -> pa.Table:
        ids = batch.column(seg_id).to_numpy(zero_copy_only=False)
        sx = batch.column("start_x").to_numpy(zero_copy_only=False)
        sy = batch.column("start_y").to_numpy(zero_copy_only=False)
        ex = batch.column("end_x").to_numpy(zero_copy_only=False)
        ey = batch.column("end_y").to_numpy(zero_copy_only=False)
        cell, rep = _bbox_cover_explode(
            ids, np.minimum(sx, ex), np.maximum(sx, ex),
            np.minimum(sy, ey), np.maximum(sy, ey), res)
        return pa.table({
            "gkey": pa.array(_gkey_of(cell, n_groups)),
            "cell": pa.array(cell), "gid": pa.array(ids[rep]),
            "c0": pa.array(sx[rep]), "c1": pa.array(sy[rep]),
            "c2": pa.array(ex[rep]), "c3": pa.array(ey[rep]),
            "is_zone": pa.array(np.zeros(len(rep), dtype=bool)),
        })

    def pairs_of_group(batch: pa.Table) -> pa.Table:
        """One group = MANY cells (hashed gkey); zone<->segment pairs
        form within exact cell via the CSR gather, the intersection
        predicate runs on the flat pair arrays, min-corner dedup per
        pair against the pair's own cell."""
        empty = pa.table({zone_id: pa.array([], type=pa.int64()),
                          seg_id: pa.array([], type=pa.int64())})
        is_zone = batch.column("is_zone").to_numpy(zero_copy_only=False)
        if is_zone.all() or not is_zone.any():
            return empty
        gid = batch.column("gid").to_numpy(zero_copy_only=False)
        c0 = batch.column("c0").to_numpy(zero_copy_only=False)
        c1 = batch.column("c1").to_numpy(zero_copy_only=False)
        c2 = batch.column("c2").to_numpy(zero_copy_only=False)
        c3 = batch.column("c3").to_numpy(zero_copy_only=False)
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        # probe side = segments, build side = zones
        si_, zi_, pd_, pz = _cell_pairs(cell, is_zone)
        if not len(pd_):
            return empty
        s = si_[pd_]
        z = zi_[pz]
        hit = box_segment_intersects(c0[z], c1[z], c2[z], c3[z],
                                     c0[s], c1[s], c2[s], c3[s])
        z, s = z[hit], s[hit]
        xlo = np.maximum(c0[z], np.minimum(c0[s], c2[s]))
        ylo = np.maximum(c2[z], np.minimum(c1[s], c3[s]))
        keep = (fx(xlo) * axis + fy(ylo)) == cell[z]
        return pa.table({zone_id: pa.array(gid[z[keep]]),
                         seg_id: pa.array(gid[s[keep]])})

    exploded = zones.map_batches(
        explode_zones, batch_format="pyarrow", zero_copy_batch=True
    ).union(segments.map_batches(
        explode_segs, batch_format="pyarrow", zero_copy_batch=True))
    out = exploded.groupby("gkey").map_groups(
        pairs_of_group, batch_format="pyarrow")
    if big_branch is not None:
        out = out.union(big_branch)
    return out


def point_segment_within_join(docs, segments, radius: float, res: int = 6,
                              doc_id: str = "doc_id",
                              seg_id: str = "segment_id",
                              num_partitions: int | None = None):
    """Bipartite buffer join on LINES: every (doc, segment) pair with
    point-to-segment squared distance (P6) <= radius**2 (closed),
    with d2 emitted — "docs within r of a road".

    One exchange, union + groupby (the join-free attach idiom —
    CLAUDE.md join hazards): each segment explodes to the cell cover
    of its r-INFLATED bbox, each doc lands in its ONE home cell, so a
    qualifying pair meets in exactly one group and needs no dedup (a
    doc within r of the segment is inside the inflated bbox, whose
    cover contains the doc's home cell at ANY resolution).  Per group
    one vectorized P6 matrix."""
    from ..kernels import segment_point_squared_distance

    from ..config import num_partitions_for

    axis, fx, fy = _cell_floor_fns(res)
    r2 = radius * radius
    # metadata-only for fresh reads; derived inputs should pass
    # num_partitions to avoid re-executing lineage (ADVICE r4 #2)
    n_groups = GROUP_FAN * (  # load-balance, see GROUP_FAN
        num_partitions if num_partitions is not None else
        num_partitions_for(docs.count(), rows_per_partition=100_000))

    def explode_docs(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        n = len(x)
        cell = fx(x) * axis + fy(y)
        return pa.table({
            "gkey": pa.array(_gkey_of(cell, n_groups)),
            "cell": pa.array(cell),
            "gid": batch.column(doc_id),
            "c0": pa.array(x), "c1": pa.array(y),
            "c2": pa.array(np.zeros(n)), "c3": pa.array(np.zeros(n)),
            "is_seg": pa.array(np.zeros(n, dtype=bool)),
        })

    def explode_segs(batch: pa.Table) -> pa.Table:
        ids = batch.column(seg_id).to_numpy(zero_copy_only=False)
        sx = batch.column("start_x").to_numpy(zero_copy_only=False)
        sy = batch.column("start_y").to_numpy(zero_copy_only=False)
        ex = batch.column("end_x").to_numpy(zero_copy_only=False)
        ey = batch.column("end_y").to_numpy(zero_copy_only=False)
        cell, rep = _bbox_cover_explode(
            ids, np.minimum(sx, ex) - radius, np.maximum(sx, ex) + radius,
            np.minimum(sy, ey) - radius, np.maximum(sy, ey) + radius, res)
        return pa.table({
            "gkey": pa.array(_gkey_of(cell, n_groups)),
            "cell": pa.array(cell), "gid": pa.array(ids[rep]),
            "c0": pa.array(sx[rep]), "c1": pa.array(sy[rep]),
            "c2": pa.array(ex[rep]), "c3": pa.array(ey[rep]),
            "is_seg": pa.array(np.ones(len(rep), dtype=bool)),
        })

    def pairs_of_group(batch: pa.Table) -> pa.Table:
        """One group = MANY cells (hashed gkey); doc<->segment pairs
        form within exact cell via the CSR gather, the P6 kernel runs
        on the flat pair arrays."""
        empty = pa.table({doc_id: pa.array([], type=pa.int64()),
                          seg_id: pa.array([], type=pa.int64()),
                          "d2": pa.array([], type=pa.float64())})
        is_seg = batch.column("is_seg").to_numpy(zero_copy_only=False)
        if is_seg.all() or not is_seg.any():
            return empty
        gid = batch.column("gid").to_numpy(zero_copy_only=False)
        c0 = batch.column("c0").to_numpy(zero_copy_only=False)
        c1 = batch.column("c1").to_numpy(zero_copy_only=False)
        c2 = batch.column("c2").to_numpy(zero_copy_only=False)
        c3 = batch.column("c3").to_numpy(zero_copy_only=False)
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        di_, si_, pd_, pz = _cell_pairs(cell, is_seg)
        if not len(pd_):
            return empty
        d = di_[pd_]
        s = si_[pz]
        d2 = segment_point_squared_distance(c0[s], c1[s], c2[s], c3[s],
                                            c0[d], c1[d])
        hit = d2 <= r2
        return pa.table({doc_id: pa.array(gid[d[hit]]),
                         seg_id: pa.array(gid[s[hit]]),
                         "d2": pa.array(d2[hit])})

    exploded = docs.map_batches(
        explode_docs, batch_format="pyarrow", zero_copy_batch=True
    ).union(segments.map_batches(
        explode_segs, batch_format="pyarrow", zero_copy_batch=True))
    return exploded.groupby("gkey").map_groups(
        pairs_of_group, batch_format="pyarrow")


def box_overlap_pairs(ds, res: int = 6, id_col: str = "zone_id",
                      large_cover_cells: int = 64,
                      num_partitions: int | None = None):
    """All unordered STRICTLY-overlapping box pairs (interiors
    intersect — kernels.overlaps / P2 semantics): ``(id_a, id_b)``
    with ``id_a < id_b``.  The box-box spatial join (the reference's
    tree-vs-tree analog of R4, distributed).

    Shuffle shape, one exchange: each box explodes to its cell cover
    at ``res``; overlapping boxes share every cell their intersection
    covers, so the pair is found in any of them — the classic
    MIN-CORNER dedup rule emits it only in the ONE cell holding the
    intersection rectangle's (xlo, ylo) corner (both boxes cover that
    cell by construction, and the world-clamp applied to the corner is
    the same clamp the cover uses, so clipped geometry still lands the
    pair exactly once).  Per group, one vectorized m x m strict-
    overlap matrix — no dedup shuffle, no global sort.

    Skew (IMPLEMENTED, contain_join_partitioned's hybrid rule): boxes
    whose cover exceeds ``large_cover_cells`` would explode the
    shuffle, so they ride a BROADCAST side instead — tiny by
    construction, collected once.  Three disjoint pair classes:
    normal x normal through the cell-cover exchange (min-corner
    dedup), big x normal scored block-locally against the streaming
    normal side (each normal box lives in exactly ONE input block, so
    no dedup pass), and big x big resolved driver-side (a |B|^2
    matrix over the tiny broadcast set).
    """
    import pyarrow.compute as pc
    import ray as _ray
    import ray.data as rd

    from ..config import WORLD_H, WORLD_MIN_X, WORLD_MIN_Y, WORLD_W

    axis = 1 << res

    def cell_floor(v: np.ndarray, lo: float, span: float) -> np.ndarray:
        return np.clip(np.floor((v - lo) / span * axis), 0, axis - 1
                       ).astype(np.int64)

    def _cols(batch: pa.Table):
        return (batch.column(id_col).to_numpy(zero_copy_only=False),
                batch.column("min_x").to_numpy(zero_copy_only=False),
                batch.column("max_x").to_numpy(zero_copy_only=False),
                batch.column("min_y").to_numpy(zero_copy_only=False),
                batch.column("max_y").to_numpy(zero_copy_only=False))

    def tag_cover(batch: pa.Table) -> pa.Table:
        _, mnx, mxx, mny, mxy = _cols(batch)
        nx = (cell_floor(mxx, WORLD_MIN_X, WORLD_W)
              - cell_floor(mnx, WORLD_MIN_X, WORLD_W) + 1)
        ny = (cell_floor(mxy, WORLD_MIN_Y, WORLD_H)
              - cell_floor(mny, WORLD_MIN_Y, WORLD_H) + 1)
        return batch.append_column(
            "big", pa.array((nx * ny) > large_cover_cells))

    # materialize ONCE: the big-side drain, the normal-side stream and
    # the vs_big branch would otherwise each re-run tag_cover over the
    # input (~3x scans per join — ADVICE r3 #3)
    tagged = ds.map_batches(tag_cover, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    big_chunks = [c for c in tagged.map_batches(
        lambda t: t.filter(t.column("big")).drop_columns(["big"]),
        batch_format="pyarrow",
    ).iter_batches(batch_size=None, batch_format="pyarrow") if len(c)]
    small = tagged.map_batches(
        lambda t: t.filter(pc.invert(t.column("big"))).drop_columns(["big"]),
        batch_format="pyarrow")

    def _strict(amnx, amxx, amny, amxy, bmnx, bmxx, bmny, bmxy):
        return ((amnx[:, None] < bmxx[None, :]) & (bmnx[None, :] < amxx[:, None])
                & (amny[:, None] < bmxy[None, :]) & (bmny[None, :] < amxy[:, None]))

    branches = []
    if big_chunks:
        bt = pa.concat_tables(big_chunks)
        bid, bmnx, bmxx, bmny, bmxy = _cols(bt)
        # big x big: driver-side upper triangle over the tiny set
        hit = _strict(bmnx, bmxx, bmny, bmxy, bmnx, bmxx, bmny, bmxy) & (
            np.arange(len(bid))[:, None] < np.arange(len(bid))[None, :])
        a, b = np.nonzero(hit)
        branches.append(rd.from_arrow(pa.table({
            "id_a": pa.array(np.minimum(bid[a], bid[b])),
            "id_b": pa.array(np.maximum(bid[a], bid[b]))})))
        # big x normal: block-local against the broadcast big side
        big_ref = _ray.put((bid, bmnx, bmxx, bmny, bmxy))

        def vs_big(batch: pa.Table) -> pa.Table:
            gid, mnx, mxx, mny, mxy = _cols(batch)
            rbid, rmnx, rmxx, rmny, rmxy = _ray.get(big_ref)
            hit = _strict(mnx, mxx, mny, mxy, rmnx, rmxx, rmny, rmxy)
            n_, b_ = np.nonzero(hit)
            return pa.table({
                "id_a": pa.array(np.minimum(gid[n_], rbid[b_])),
                "id_b": pa.array(np.maximum(gid[n_], rbid[b_]))})

        branches.append(small.map_batches(vs_big, batch_format="pyarrow",
                                          zero_copy_batch=True))

    from ..config import num_partitions_for

    # derived inputs should pass num_partitions (ADVICE r4 #2)
    n_groups = GROUP_FAN * (  # load-balance, see GROUP_FAN
        num_partitions if num_partitions is not None else
        num_partitions_for(tagged.count(), rows_per_partition=100_000))

    def explode(batch: pa.Table) -> pa.Table:
        # shared cover-explode (same clip-floor as the local
        # cell_floor) — keeping one copy means one place to patch
        ids, mnx, mxx, mny, mxy = _cols(batch)
        cell, rep = _bbox_cover_explode(ids, mnx, mxx, mny, mxy, res)
        return pa.table({
            "gkey": pa.array(_gkey_of(cell, n_groups)),
            "cell": pa.array(cell),
            id_col: pa.array(ids[rep]),
            "min_x": pa.array(mnx[rep]), "max_x": pa.array(mxx[rep]),
            "min_y": pa.array(mny[rep]), "max_y": pa.array(mxy[rep]),
        })

    def pairs_of_group(batch: pa.Table) -> pa.Table:
        """One group = MANY cells (hashed gkey); same-cell candidate
        pairs via the CSR gather, a<b half only, strict-overlap
        predicate on the flat pair arrays, min-corner dedup per pair
        against the pair's own cell."""
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mnx = batch.column("min_x").to_numpy(zero_copy_only=False)
        mxx = batch.column("max_x").to_numpy(zero_copy_only=False)
        mny = batch.column("min_y").to_numpy(zero_copy_only=False)
        mxy = batch.column("max_y").to_numpy(zero_copy_only=False)
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        rows = np.arange(len(ids), dtype=np.int64)
        di_, zi_, pd_, pz = _csr_pairs(cell, rows, rows)
        a = di_[pd_]
        b = zi_[pz]
        half = a < b
        a, b = a[half], b[half]
        if not len(a):
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64())})
        # strict interior overlap on the flat pair arrays
        hit = ((mnx[a] < mxx[b]) & (mnx[b] < mxx[a])
               & (mny[a] < mxy[b]) & (mny[b] < mxy[a]))
        a, b = a[hit], b[hit]
        # min-corner dedup: keep the pair iff the intersection's low
        # corner falls in the pair's own cell (same clamp as the cover)
        xlo = np.maximum(mnx[a], mnx[b])
        ylo = np.maximum(mny[a], mny[b])
        home = (cell_floor(xlo, WORLD_MIN_X, WORLD_W) * axis
                + cell_floor(ylo, WORLD_MIN_Y, WORLD_H))
        keep = home == cell[a]
        ia, ib = ids[a[keep]], ids[b[keep]]
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi)})

    exploded = small.map_batches(explode, batch_format="pyarrow",
                                 zero_copy_batch=True)
    out = exploded.groupby("gkey").map_groups(
        pairs_of_group, batch_format="pyarrow")
    for br in branches:
        out = out.union(br)
    return out
