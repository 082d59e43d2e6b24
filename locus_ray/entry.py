"""Driver contract implementation: entry(), queries(), oracle_sql().

Each ``queries()`` entry is a Ray Data pipeline over the sf_dir parquet
tables; each ``oracle_sql()`` entry is the equivalent DuckDB SQL over
the same tables.  Geo layers are derived deterministically on both
sides (:mod:`locus_ray.derive` — bit-identical float64), query
workloads are shared constants (:mod:`locus_ray.workload`), and every
computed column is named identically in both places.

Ray is initialised by the DRIVER before this module is imported — no
``ray.init``/``ray.shutdown`` anywhere in the library.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import derive, workload
from .config import (DEFAULT_CELL_RES, SQUARE_SIZE, WORLD_MIN_X, WORLD_MIN_Y,
                     actor_pool, num_partitions_for)

RES = DEFAULT_CELL_RES  # 8 -> 256x256 cells; shift = 16 - 8
_SHIFT_DIV = 1 << (16 - RES)
_AXIS = 1 << RES


# ---------------------------------------------------------------------------
# SQL fragments
# ---------------------------------------------------------------------------

def _sql_grid() -> str:
    """docs_geo + integer grid coords (bit-identical to cells.grid_coords)."""
    F = derive.F
    return f"""
    SELECT doc_id, x, y,
      LEAST(GREATEST(CAST(FLOOR(((x - ({F(WORLD_MIN_X)})) / 360.0e0) * {F(SQUARE_SIZE)}) AS BIGINT), 0), 65535) AS ix,
      LEAST(GREATEST(CAST(FLOOR(((y - ({F(WORLD_MIN_Y)})) / 180.0e0) * {F(SQUARE_SIZE)}) AS BIGINT), 0), 65535) AS iy
    FROM ({derive.sql_docs_geo()})
    """


_BOX_D2 = (
    "GREATEST(z.min_x - d.x, d.x - z.max_x, 0.0) * GREATEST(z.min_x - d.x, d.x - z.max_x, 0.0)"
    " + GREATEST(z.min_y - d.y, d.y - z.max_y, 0.0) * GREATEST(z.min_y - d.y, d.y - z.max_y, 0.0)"
)


def _seg_point_d2(px: str, py: str) -> str:
    """SQL for segment_point_squared_distance (same op order as numpy)."""
    return f"""(
      ({px} - (s.start_x + LEAST(GREATEST(((({px} - s.start_x) * (s.end_x - s.start_x) + ({py} - s.start_y) * (s.end_y - s.start_y)) / ((s.end_x - s.start_x) * (s.end_x - s.start_x) + (s.end_y - s.start_y) * (s.end_y - s.start_y))), 0.0), 1.0) * (s.end_x - s.start_x)))
      * ({px} - (s.start_x + LEAST(GREATEST(((({px} - s.start_x) * (s.end_x - s.start_x) + ({py} - s.start_y) * (s.end_y - s.start_y)) / ((s.end_x - s.start_x) * (s.end_x - s.start_x) + (s.end_y - s.start_y) * (s.end_y - s.start_y))), 0.0), 1.0) * (s.end_x - s.start_x)))
      + ({py} - (s.start_y + LEAST(GREATEST(((({px} - s.start_x) * (s.end_x - s.start_x) + ({py} - s.start_y) * (s.end_y - s.start_y)) / ((s.end_x - s.start_x) * (s.end_x - s.start_x) + (s.end_y - s.start_y) * (s.end_y - s.start_y))), 0.0), 1.0) * (s.end_y - s.start_y)))
      * ({py} - (s.start_y + LEAST(GREATEST(((({px} - s.start_x) * (s.end_x - s.start_x) + ({py} - s.start_y) * (s.end_y - s.start_y)) / ((s.end_x - s.start_x) * (s.end_x - s.start_x) + (s.end_y - s.start_y) * (s.end_y - s.start_y))), 0.0), 1.0) * (s.end_y - s.start_y)))
    )"""


def _p2s(px: str, py: str, sx: str, sy: str, ex: str, ey: str) -> str:
    """Generic SQL point-to-segment squared distance (same op order as
    kernels.segment_point_squared_distance)."""
    dx = f"({ex} - {sx})"
    dy = f"({ey} - {sy})"
    len2 = f"({dx} * {dx} + {dy} * {dy})"
    t = f"LEAST(GREATEST(((({px} - {sx}) * {dx} + ({py} - {sy}) * {dy}) / {len2}), 0.0), 1.0)"
    cx = f"({sx} + {t} * {dx})"
    cy = f"({sy} + {t} * {dy})"
    return f"(({px} - {cx}) * ({px} - {cx}) + ({py} - {cy}) * ({py} - {cy}))"


def _sql_cross(ox, oy, ax, ay, bx, by) -> str:
    return f"(({ax} - {ox}) * ({by} - {oy}) - ({ay} - {oy}) * ({bx} - {ox}))"


def _segseg_d2(a: str, b: str) -> str:
    """SQL segment-to-segment squared distance between rows aliased
    ``a`` and ``b`` (columns start_x..end_y) — mirrors
    kernels.segments_squared_distance: 0 when intersecting (closed),
    else min of the four endpoint-to-segment distances."""
    asx, asy, aex, aey = f"{a}.start_x", f"{a}.start_y", f"{a}.end_x", f"{a}.end_y"
    bsx, bsy, bex, bey = f"{b}.start_x", f"{b}.start_y", f"{b}.end_x", f"{b}.end_y"
    d1 = _sql_cross(bsx, bsy, bex, bey, asx, asy)
    d2 = _sql_cross(bsx, bsy, bex, bey, aex, aey)
    d3 = _sql_cross(asx, asy, aex, aey, bsx, bsy)
    d4 = _sql_cross(asx, asy, aex, aey, bex, bey)

    def on_seg(sx, sy, ex, ey, px, py):
        return (f"(LEAST({sx}, {ex}) <= {px} AND {px} <= GREATEST({sx}, {ex})"
                f" AND LEAST({sy}, {ey}) <= {py} AND {py} <= GREATEST({sy}, {ey}))")

    proper = (f"((({d1}) > 0 AND ({d2}) < 0) OR (({d1}) < 0 AND ({d2}) > 0))"
              f" AND ((({d3}) > 0 AND ({d4}) < 0) OR (({d3}) < 0 AND ({d4}) > 0))")
    touch = (
        f"(({d1}) = 0 AND {on_seg(bsx, bsy, bex, bey, asx, asy)})"
        f" OR (({d2}) = 0 AND {on_seg(bsx, bsy, bex, bey, aex, aey)})"
        f" OR (({d3}) = 0 AND {on_seg(asx, asy, aex, aey, bsx, bsy)})"
        f" OR (({d4}) = 0 AND {on_seg(asx, asy, aex, aey, bex, bey)})"
    )
    dmin = (f"LEAST({_p2s(asx, asy, bsx, bsy, bex, bey)},"
            f" {_p2s(aex, aey, bsx, bsy, bex, bey)},"
            f" {_p2s(bsx, bsy, asx, asy, aex, aey)},"
            f" {_p2s(bex, bey, asx, asy, aex, aey)})")
    return f"CASE WHEN ({proper}) OR ({touch}) THEN 0.0 ELSE {dmin} END"


def _sql_seg_intersects(asx, asy, aex, aey, bsx, bsy, bex, bey) -> str:
    """Generic SQL closed segment-intersection predicate over
    coordinate EXPRESSIONS — mirrors kernels.segments_intersect
    (same cross products, same comparisons) so the boolean is
    bit-exact by construction."""
    d1 = _sql_cross(bsx, bsy, bex, bey, asx, asy)
    d2 = _sql_cross(bsx, bsy, bex, bey, aex, aey)
    d3 = _sql_cross(asx, asy, aex, aey, bsx, bsy)
    d4 = _sql_cross(asx, asy, aex, aey, bex, bey)

    def on_seg(sx, sy, ex, ey, px, py):
        return (f"(LEAST({sx}, {ex}) <= {px} AND {px} <= GREATEST({sx}, {ex})"
                f" AND LEAST({sy}, {ey}) <= {py} AND {py} <= GREATEST({sy}, {ey}))")

    proper = (f"(((({d1}) > 0 AND ({d2}) < 0) OR (({d1}) < 0 AND ({d2}) > 0))"
              f" AND ((({d3}) > 0 AND ({d4}) < 0) OR (({d3}) < 0 AND ({d4}) > 0)))")
    touch = (
        f"((({d1}) = 0 AND {on_seg(bsx, bsy, bex, bey, asx, asy)})"
        f" OR (({d2}) = 0 AND {on_seg(bsx, bsy, bex, bey, aex, aey)})"
        f" OR (({d3}) = 0 AND {on_seg(asx, asy, aex, aey, bsx, bsy)})"
        f" OR (({d4}) = 0 AND {on_seg(asx, asy, aex, aey, bex, bey)}))"
    )
    return f"({proper} OR {touch})"


def _sql_segseg_d2_generic(a, b) -> str:
    """Generic SQL segment-segment squared distance over two
    coordinate-expression 4-tuples ``a = (sx, sy, ex, ey)`` and ``b``
    — mirrors kernels.segments_squared_distance (0 when intersecting,
    closed; else LEAST of the four endpoint-to-segment distances,
    min is order-exact)."""
    asx, asy, aex, aey = a
    bsx, bsy, bex, bey = b
    inter = _sql_seg_intersects(asx, asy, aex, aey, bsx, bsy, bex, bey)
    dmin = (f"LEAST({_p2s(asx, asy, bsx, bsy, bex, bey)},"
            f" {_p2s(aex, aey, bsx, bsy, bex, bey)},"
            f" {_p2s(bsx, bsy, asx, asy, aex, aey)},"
            f" {_p2s(bex, bey, asx, asy, aex, aey)})")
    return f"CASE WHEN {inter} THEN 0.0 ELSE {dmin} END"


def _sql_box_seg_d2(z: str, s: str) -> str:
    """SQL P8 box-segment squared distance between rows aliased ``z``
    (min_x..max_y) and ``s`` (start_x..end_y) — mirrors
    kernels.box_segment_squared_distance: 0 if an endpoint is in the
    closed box, else LEAST of the four edge-to-segment distances."""
    seg = (f"{s}.start_x", f"{s}.start_y", f"{s}.end_x", f"{s}.end_y")
    inside = (
        f"(({s}.start_x >= {z}.min_x AND {s}.start_x <= {z}.max_x"
        f" AND {s}.start_y >= {z}.min_y AND {s}.start_y <= {z}.max_y)"
        f" OR ({s}.end_x >= {z}.min_x AND {s}.end_x <= {z}.max_x"
        f" AND {s}.end_y >= {z}.min_y AND {s}.end_y <= {z}.max_y))"
    )
    edges = (
        (f"{z}.min_x", f"{z}.min_y", f"{z}.max_x", f"{z}.min_y"),
        (f"{z}.max_x", f"{z}.min_y", f"{z}.max_x", f"{z}.max_y"),
        (f"{z}.max_x", f"{z}.max_y", f"{z}.min_x", f"{z}.max_y"),
        (f"{z}.min_x", f"{z}.max_y", f"{z}.min_x", f"{z}.min_y"),
    )
    dmin = "LEAST(" + ", ".join(
        f"({_sql_segseg_d2_generic(e, seg)})" for e in edges) + ")"
    return f"CASE WHEN {inside} THEN 0.0 ELSE {dmin} END"


def _sql_box_seg_intersects(z: str, s: str) -> str:
    """SQL closed box-segment intersection predicate between rows
    aliased ``z`` (min_x..max_y) and ``s`` (start_x..end_y) — mirrors
    kernels.box_segment_intersects (endpoint in closed box, or the
    segment meets one of the four box edges)."""
    seg = (f"{s}.start_x", f"{s}.start_y", f"{s}.end_x", f"{s}.end_y")
    inside = (
        f"(({s}.start_x >= {z}.min_x AND {s}.start_x <= {z}.max_x"
        f" AND {s}.start_y >= {z}.min_y AND {s}.start_y <= {z}.max_y)"
        f" OR ({s}.end_x >= {z}.min_x AND {s}.end_x <= {z}.max_x"
        f" AND {s}.end_y >= {z}.min_y AND {s}.end_y <= {z}.max_y))"
    )
    edges = (
        (f"{z}.min_x", f"{z}.min_y", f"{z}.max_x", f"{z}.min_y"),
        (f"{z}.max_x", f"{z}.min_y", f"{z}.max_x", f"{z}.max_y"),
        (f"{z}.max_x", f"{z}.max_y", f"{z}.min_x", f"{z}.max_y"),
        (f"{z}.min_x", f"{z}.max_y", f"{z}.min_x", f"{z}.min_y"),
    )
    hits = " OR ".join(
        _sql_seg_intersects(e1x, e1y, e2x, e2y, *seg)
        for (e1x, e1y, e2x, e2y) in edges)
    return f"({inside} OR {hits})"


# ---------------------------------------------------------------------------
# Ray query callables
# ---------------------------------------------------------------------------

def _q_tile_assign(sf_dir: str):
    from .sources import tables
    from .stages import spatial

    return spatial.assign_tiles(tables.docs_geo(sf_dir), res=RES).select_columns(
        ["doc_id", "x", "y", "ix", "iy", "cell_id"]
    )


def _q_hilbert_rank(sf_dir: str):
    from .sources import tables
    from .stages import spatial

    return spatial.assign_tiles(tables.docs_geo(sf_dir), res=RES).select_columns(
        ["doc_id", "hilbert_key"]
    )


def _q_hilbert_order(sf_dir: str):
    """Global Hilbert-order sort (the distributed analog of the
    reference's Hilbert leaf sort, locus/_core/r.py:134): the first
    100 docs by (hilbert_key, doc_id) via the Dataset's range-
    partitioned ``sort`` + ``limit`` — the locality-preserving layout
    step a tiling write would consume."""
    from .sources import tables
    from .stages import spatial

    return (spatial.assign_tiles(tables.docs_geo(sf_dir), res=RES)
            .select_columns(["doc_id", "hilbert_key"])
            .sort(["hilbert_key", "doc_id"])
            .limit(100))


def _q_morton_rank(sf_dir: str):
    """Morton / Z-order rank (the reference's ``interleave`` as a
    user-visible SFC next to Hilbert, locus/_core/hilbert.py:38-42):
    x bits land in the ODD positions, y in the even — one stateless
    vectorized stage on the same grid coords."""
    from .cells import grid_coords
    from .hilbert import _interleave
    from .sources import tables

    def encode(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        ix, iy = grid_coords(x, y)
        mk = ((_interleave(ix.astype(np.uint32)).astype(np.uint64) << np.uint64(1))
              | _interleave(iy.astype(np.uint32)).astype(np.uint64))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "morton_key": pa.array(mk.astype(np.int64))})

    return tables.docs_geo(sf_dir).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True)


def _q_tile_counts(sf_dir: str):
    from ray.data.aggregate import Sum

    from .sources import tables
    from .stages import spatial

    tiled = spatial.assign_tiles(tables.docs_geo(sf_dir), res=RES)

    def partial(batch: pa.Table) -> pa.Table:
        cid, cnt = np.unique(
            batch.column("cell_id").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"cell_id": pa.array(cid), "n": pa.array(cnt.astype(np.int64))})

    return (
        tiled.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell_id")
        .aggregate(Sum("n", alias_name="n_docs"))
    )


PYRAMID_LEVELS = (4, 6, 8)  # tile-pyramid resolutions (map-tile zooms)
TOP_LANG_RES = 4            # per-tile mode aggregate resolution


def _q_tile_pyramid(sf_dir: str):
    """Multi-resolution tile histogram (the map-tile pyramid): per-doc
    grid coords scatter to ALL PYRAMID_LEVELS in one pass — per-batch
    (level, cell) partial counts, one groupby Sum over aggregated
    cells.  One corpus read builds every zoom level; the exchange
    carries counts, never docs."""
    from ray.data.aggregate import Sum

    from .cells import grid_coords
    from .sources import tables

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        ix, iy = grid_coords(x, y)
        keys = []
        for lvl in PYRAMID_LEVELS:
            shift = 16 - lvl
            cell = (ix >> shift).astype(np.int64) * (1 << lvl) + (iy >> shift)
            keys.append(np.int64(lvl) << np.int64(32) | cell)
        k, cnt = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table({"k": pa.array(k), "n": pa.array(cnt.astype(np.int64))})

    agg = (tables.docs_geo(sf_dir)
           .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("k").aggregate(Sum("n", alias_name="n_docs")))

    def decode(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy(zero_copy_only=False)
        return pa.table({
            "level": pa.array(k >> np.int64(32)),
            "cell_id": pa.array(k & np.int64(0xFFFFFFFF)),
            "n_docs": batch.column("n_docs"),
        })

    return agg.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def _q_tile_top_lang(sf_dir: str):
    """Per-tile dominant language (the distributed MODE aggregate):
    per-batch (cell, lang) partial counts -> multi-key groupby Sum ->
    per-cell argmax with the deterministic (count DESC, lang ASC)
    tie-break.  The argmax pass groups the AGGREGATED rows (bounded by
    cells x distinct langs, not docs), so the per-group pandas cost is
    nominal at any corpus size."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .cells import cell_id as cell_of
    from .sources import tables

    docs = tables.docs_geo(sf_dir, extra_columns=("lang",))

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        cell = cell_of(x, y, TOP_LANG_RES)
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        # factorize lang per batch, combine into one integer key
        lang_u, lang_code = np.unique(lang, return_inverse=True)
        key = cell * np.int64(len(lang_u)) + lang_code
        _, idx, cnt = np.unique(key, return_index=True, return_counts=True)
        return pa.table({
            "cell_id": pa.array(cell[idx]),
            "lang": pa.array(lang[idx]),
            "n": pa.array(cnt.astype(np.int64)),
        })

    counts = (docs.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
              .groupby(["cell_id", "lang"]).aggregate(Sum("n", alias_name="n")))

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "lang"], ascending=[False, True])
        r = df.iloc[:1]
        return pd.DataFrame({"cell_id": r["cell_id"].to_numpy(),
                             "top_lang": r["lang"].to_numpy(),
                             "n_docs": r["n"].to_numpy()})

    return counts.groupby("cell_id").map_groups(top1, batch_format="pandas")


def _q_zone_contains_doc(sf_dir: str):
    import ray

    from .sources import tables
    from .stages import spatial

    ref = ray.put(tables.zones_payload(sf_dir))
    return tables.docs_geo(sf_dir).map_batches(
        spatial.ContainJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"zones_ref": ref, "res": RES},
        concurrency=actor_pool(), batch_size=4096,
    )


def _q_zone_contains_doc_shuffle(sf_dir: str):
    from .sources import tables
    from .stages import partitioned

    return partitioned.contain_join_partitioned(
        tables.docs_geo(sf_dir), tables.zones_ds(sf_dir), res=RES,
        num_partitions=num_partitions_for(
            tables.table_rows(sf_dir, "documents"), rows_per_partition=100_000),
        hot_threshold=2000,
    )


def _q_docs_outside_zones(sf_dir: str):
    """Spatial ANTI-join: docs contained by NO zone (block-local NOT
    EXISTS against the broadcast zone index — the emit side of the
    contain lookup inverts, no extra shuffle)."""
    import ray

    from .sources import tables
    from .stages import spatial

    ref = ray.put(tables.zones_payload(sf_dir))
    return tables.docs_geo(sf_dir).map_batches(
        spatial.ContainJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"zones_ref": ref, "res": RES, "anti": True},
        concurrency=actor_pool(), batch_size=4096,
    )


def _q_zone_overlap_pairs(sf_dir: str):
    """Box-box spatial join: all strictly-overlapping zone pairs
    (P2 semantics) via cell-cover explode + min-corner dedup
    (stages/partitioned.box_overlap_pairs)."""
    from .sources import tables
    from .stages.partitioned import box_overlap_pairs

    return box_overlap_pairs(tables.zones_ds(sf_dir), res=6)


def _q_docs_near_zones(sf_dir: str):
    """Buffered containment ("zones within NEAR_ZONE_RADIUS of the
    doc", closed P5 <= r^2): the vector buffer-join.  Candidates from
    a broadcast cover index over the r-INFLATED boxes, exact distance
    refine on the originals (stages/spatial.ContainJoinActor with
    radius>0) — same zero-shuffle shape as the containment join."""
    import ray

    from .sources import tables
    from .stages import spatial

    ref = ray.put(tables.zones_payload(sf_dir))
    return tables.docs_geo(sf_dir).map_batches(
        spatial.ContainJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"zones_ref": ref, "res": RES,
                               "radius": workload.NEAR_ZONE_RADIUS},
        concurrency=actor_pool(), batch_size=4096,
    )


NEAR_SEG_RADIUS = 0.5  # doc-near-segment buffer join radius


def _q_docs_near_segments(sf_dir: str):
    """Bipartite buffer join on LINES (P6 <= r^2, closed): docs within
    NEAR_SEG_RADIUS of each segment, with d2
    (stages/partitioned.point_segment_within_join)."""
    from .sources import tables
    from .stages.partitioned import point_segment_within_join

    return point_segment_within_join(
        tables.docs_geo(sf_dir), tables.segments_ds(sf_dir),
        radius=NEAR_SEG_RADIUS, res=6)


def _q_seg_intersections(sf_dir: str):
    """Segment-overlay self-join: all intersecting segment pairs
    (closed, P7 zero-distance case) via bbox cell-cover explode +
    min-corner dedup (stages/partitioned.segment_intersection_pairs)."""
    from .sources import tables
    from .stages.partitioned import segment_intersection_pairs

    return segment_intersection_pairs(tables.segments_ds(sf_dir), res=6)


def _q_zone_seg_overlap(sf_dir: str):
    """Bipartite box x segment intersection join (P8 zero-distance
    case): one row per (zone, segment) the segment touches or enters
    (stages/partitioned.box_segment_overlap_join)."""
    from .sources import tables
    from .stages.partitioned import box_segment_overlap_join

    return box_segment_overlap_join(
        tables.zones_ds(sf_dir), tables.segments_ds(sf_dir), res=6)


K_BOX_SEGMENTS = 3  # box -> segment kNN gate


def _q_zone_knn_segments(sf_dir: str):
    """Box -> segment kNN by P8 distance (the reference's segmental
    n_nearest vs a box query, distributed): k nearest streaming
    segments per broadcast query box, (d2, id) tie-break."""
    from .sources import tables
    from .stages import spatial

    return spatial.knn_segments_to_boxes(
        tables.segments_ds(sf_dir), workload.QUERY_BOXES, k=K_BOX_SEGMENTS)


def _q_reverse_knn(sf_dir: str):
    """Reverse kNN (influence sets): for each TARGET doc (ids
    divisible by RKNN_TARGET_MOD), every doc whose 3-NN list contains
    it.  Pure block-local filter + rename of the kNN self-join stream
    — the flipped edges need no extra shuffle because the influence
    test is per-edge."""

    def flip(batch: pa.Table) -> pa.Table:
        nid = batch.column("neighbor_id").to_numpy(zero_copy_only=False)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ((nid % workload.RKNN_TARGET_MOD) == 0) & (nid != did)
        rows = pa.array(np.nonzero(keep)[0])
        return pa.table({
            "target_id": batch.column("neighbor_id").take(rows),
            "doc_id": batch.column("doc_id").take(rows),
            "rnk": batch.column("rnk").take(rows),
            "d2": batch.column("d2").take(rows),
        })

    return _q_knn_docs_self(sf_dir).map_batches(
        flip, batch_format="pyarrow", zero_copy_batch=True)


def _q_find_box_docs(sf_dir: str):
    from .sources import tables
    from .stages import spatial

    return spatial.find_in_boxes(tables.docs_geo(sf_dir), workload.QUERY_BOXES)


def _q_zone_subsets(sf_dir: str):
    from .sources import tables
    from .stages import spatial

    return spatial.subset_join(tables.zones_ds(sf_dir), workload.QUERY_BOXES)


def _q_zone_supersets(sf_dir: str):
    from .sources import tables
    from .stages import spatial

    return spatial.superset_join(tables.zones_ds(sf_dir), workload.QUERY_BOXES)


def _knn(sf_dir: str, kind: str, payload_fn, k: int, id_out: str,
         with_rank: bool = True):
    import ray

    from .sources import tables
    from .stages import spatial

    ref = ray.put(payload_fn(sf_dir))
    out = tables.docs_geo(sf_dir).map_batches(
        spatial.KnnJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"build_ref": ref, "kind": kind, "res": RES, "k": k,
                               "id_out": id_out},
        concurrency=actor_pool(), batch_size=4096,
    )
    if not with_rank:
        out = out.drop_columns(["rnk"])
    return out


def _q_knn_zones(sf_dir: str):
    from .sources import tables

    return _knn(sf_dir, "box", tables.zones_payload, workload.K_ZONES, "zone_id")


def _q_nearest_zone(sf_dir: str):
    from .sources import tables

    return _knn(sf_dir, "box", tables.zones_payload, 1, "zone_id", with_rank=False)


def _q_snap_to_segment(sf_dir: str):
    from .sources import tables

    return _knn(sf_dir, "segment", tables.segments_payload, 1, "segment_id",
                with_rank=False)


def _q_knn_zones_shuffle(sf_dir: str):
    from .sources import tables
    from .stages import partitioned

    return partitioned.knn_join_partitioned(
        tables.docs_geo(sf_dir), tables.zones_ds(sf_dir),
        tables.zones_payload(sf_dir), k=workload.K_ZONES, res=RES,
        pad_rings=1,
        num_partitions=num_partitions_for(
            tables.table_rows(sf_dir, "documents"), rows_per_partition=50_000),
    )


def _query_points_ds():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "query_id": pa.array(workload.QUERY_POINTS["query_id"]),
        "x": pa.array(workload.QUERY_POINTS["x"]),
        "y": pa.array(workload.QUERY_POINTS["y"]),
    }))


def _knn_from_points(sf_dir: str, kind: str, payload_fn, k: int, id_out: str,
                     with_rank: bool = True):
    import ray

    from .stages import spatial

    ref = ray.put(payload_fn(sf_dir))
    out = _query_points_ds().map_batches(
        spatial.KnnJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"build_ref": ref, "kind": kind, "res": RES, "k": k,
                               "carry": ("query_id",), "id_out": id_out},
        concurrency=1, batch_size=64,
    )
    if not with_rank:
        out = out.drop_columns(["rnk"])
    return out


def _q_knn_docs(sf_dir: str):
    from .sources import tables

    return _knn_from_points(sf_dir, "point", tables.docs_payload, workload.K_DOCS,
                            "doc_id")


def _q_nearest_doc(sf_dir: str):
    from .sources import tables

    return _knn_from_points(sf_dir, "point", tables.docs_payload, 1, "doc_id",
                            with_rank=False)


def _q_knn_segments_to_point(sf_dir: str):
    from .sources import tables

    return _knn_from_points(sf_dir, "segment", tables.segments_payload,
                            workload.K_SEGMENTS, "segment_id")


def _q_zone_bounds(sf_dir: str):
    import pandas as pd
    from ray.data.aggregate import Max, Min

    from .sources import tables

    row = tables.zones_ds(sf_dir).aggregate(
        Min("min_x", alias_name="min_x"), Max("max_x", alias_name="max_x"),
        Min("min_y", alias_name="min_y"), Max("max_y", alias_name="max_y"),
    )
    return pd.DataFrame([row])


def _q_pip_docs(sf_dir: str):
    import ray

    from .sources import tables
    from .stages import pip

    keys = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                         columns=["n_nationkey"]).column("n_nationkey").to_numpy()
    ref = ray.put(pip.PipIndex(pip.polygon_payload(keys.astype(np.int64)), res=RES))
    return tables.docs_geo(sf_dir).map_batches(
        pip.PipJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"poly_ref": ref, "res": RES},
        concurrency=actor_pool(), batch_size=4096,
    )


def _q_zonal_stats(sf_dir: str):
    """Raster<->vector zonal statistics: per polygon, the doc count and
    total n_chars of contained docs — the north rule's "rasterize ->
    join via groupby-aggregate over cell keys" composition.  Pair
    emission reuses the PIP raster+refine actor; aggregates are
    pre-combined inside map_batches so the groupby ships one row per
    (block, polygon), not one per contained doc."""
    import ray
    from ray.data.aggregate import Sum

    from .sources import tables
    from .stages import pip

    keys = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                         columns=["n_nationkey"]).column("n_nationkey").to_numpy()
    ref = ray.put(pip.PipIndex(pip.polygon_payload(keys.astype(np.int64)), res=RES))
    pairs = tables.docs_geo(sf_dir, extra_columns=("n_chars",)).map_batches(
        pip.PipJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"poly_ref": ref, "res": RES,
                               "carry": ("doc_id", "n_chars")},
        concurrency=actor_pool(), batch_size=4096,
    )

    def partial(batch: pa.Table) -> pa.Table:
        pid = batch.column("polygon_id").to_numpy()
        nch = batch.column("n_chars").to_numpy()
        uniq, inv = np.unique(pid, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        # n_chars are small ints: float64 bincount weights are exact
        # far beyond their range (< 2^53)
        tot = np.bincount(inv, weights=nch).astype(np.int64)
        return pa.table({"polygon_id": pa.array(uniq),
                         "n": pa.array(cnt), "chars": pa.array(tot)})

    return pairs.map_batches(partial, batch_format="pyarrow").groupby(
        "polygon_id").aggregate(Sum("n", alias_name="n_docs"),
                                Sum("chars", alias_name="sum_chars"))


def _q_token_count(sf_dir: str):
    from .sources import tables
    from .stages import text

    return text.token_count(tables.read_table(sf_dir, "documents",
                                              columns=["doc_id", "text"]))


def _q_token_count_bpe(sf_dir: str):
    from .sources import tables
    from .stages import text

    return text.token_count_bpe(tables.read_table(sf_dir, "documents",
                                                  columns=["doc_id", "text"]))


def _q_text_stats(sf_dir: str):
    from .sources import tables
    from .stages import text

    return text.text_stats(tables.read_table(sf_dir, "documents",
                                             columns=["doc_id", "text"]))


def _q_lang_id(sf_dir: str):
    from .sources import tables
    from .stages import text

    return tables.read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        text.LangIdActor, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=actor_pool(), batch_size=1024,
    )


def _q_top_tokens(sf_dir: str):
    """Global token frequency top-20 (the classic wordcount shape):
    vectorized per-batch token explode + partial counts (combiner) ->
    one small groupby Sum -> sort/limit."""
    from ray.data.aggregate import Sum

    from .sources import tables

    docs = tables.read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        vc = toks.value_counts()
        return pa.table({
            "token": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    counts = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token").aggregate(Sum("n", alias_name="n_occurrences"))
    )
    # distributed sort + limit: the full vocabulary never reaches the
    # driver (a web-scale vocab is billions of rows — VERDICT.md #5)
    return counts.sort(["n_occurrences", "token"],
                       descending=[True, False]).limit(20)


def _q_dedup_exact(sf_dir: str):
    from .sources import tables
    from .stages import dedup

    return dedup.dedup_exact(tables.read_table(sf_dir, "documents",
                                               columns=["doc_id", "text"]))


def _q_simhash(sf_dir: str):
    from .sources import tables
    from .stages import dedup

    return dedup.simhash(tables.read_table(sf_dir, "documents",
                                           columns=["doc_id", "text"]))


def _q_fingerprint(sf_dir: str):
    from .sources import tables
    from .stages import text

    return text.fingerprint(tables.read_table(sf_dir, "documents",
                                              columns=["doc_id", "text"]))


def _q_simhash_pairs(sf_dir: str):
    from .sources import tables
    from .stages import dedup

    return dedup.simhash_dup_pairs(tables.read_table(sf_dir, "documents",
                                                     columns=["doc_id", "text"]))


def _q_minhash_pairs(sf_dir: str):
    from .sources import tables
    from .stages import dedup

    return dedup.minhash_lsh_pairs(tables.read_table(sf_dir, "documents",
                                                     columns=["doc_id", "text"]))


def _q_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard verification of the LSH candidate pairs —
    the full near-dup funnel (shingle -> minhash -> LSH buckets ->
    exact set verify) as one gate.  The verify stage is the
    distributed two-exchange path (stages/dedup.ngram_jaccard_pairs);
    fresh reads on both legs so neither Dataset lineage re-executes."""
    from .sources import tables
    from .stages import dedup

    cand = dedup.minhash_lsh_pairs(tables.read_table(
        sf_dir, "documents", columns=["doc_id", "text"]))
    return dedup.ngram_jaccard_pairs(
        tables.read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        cand)


def _ann_queries(sf_dir: str) -> dict[str, np.ndarray]:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    vec_id = t.column("vec_id").to_numpy()
    mask = np.isin(vec_id, workload.ANN_QUERY_IDS)
    flat = t.column("embedding").combine_chunks().values.to_numpy(
        zero_copy_only=False).astype(np.float64)
    m = flat.reshape(len(vec_id), -1)
    return {"query_id": vec_id[mask].astype(np.int64), "matrix": m[mask]}


LABEL_QUERY_MOD = 20  # knn-classifier eval queries: vec_id % 20 == 0
LABEL_K = 5           # neighbors voting on the label


def _q_knn_label_accuracy(sf_dir: str):
    """kNN-classifier label evaluation (label-noise detection): for
    each query embedding, the majority label of its LABEL_K nearest
    non-self neighbors vs its true label.

    Scale shape: the corpus streams once through the CosineTopKActor
    pool with the label riding each candidate row (carry_cols — no
    label join-back); the actor keeps k+1 partial candidates so
    dropping the self row never starves the top-k; the vote groups
    Q x k candidate rows only.  (The query-side read materializes one
    driver-side slice, same pattern as _ann_queries.)"""
    import pandas as pd
    import ray

    from .sources import tables
    from .stages.ann import CosineTopKActor

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding", "label"])
    vec_id = t.column("vec_id").to_numpy()
    mask = (vec_id % LABEL_QUERY_MOD) == 0
    flat = t.column("embedding").combine_chunks().values.to_numpy(
        zero_copy_only=False).astype(np.float64)
    m = flat.reshape(len(vec_id), -1)
    queries = {"query_id": vec_id[mask].astype(np.int64), "matrix": m[mask]}
    true_label = dict(zip(vec_id[mask].astype(int),
                          t.column("label").to_numpy()[mask].astype(int)))

    ds = tables.read_table(sf_dir, "embeddings",
                           columns=["vec_id", "embedding", "label"])
    ref = ray.put(queries)
    partials = ds.map_batches(
        CosineTopKActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"queries_ref": ref, "k": LABEL_K + 1,
                               "carry_cols": ("label",)},
        concurrency=actor_pool(), batch_size=8192,
    )

    def non_self(batch: pa.Table) -> pa.Table:
        keep = (batch.column("vec_id").to_numpy()
                != batch.column("query_id").to_numpy())
        return batch.filter(pa.array(keep))

    cand = partials.map_batches(non_self, batch_format="pyarrow",
                                zero_copy_batch=True)

    def vote(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"],
                          ascending=[False, True]).head(LABEL_K)
        counts = (g.groupby("label").size().reset_index(name="n")
                  .sort_values(["n", "label"], ascending=[False, True]))
        pred = int(counts.iloc[0]["label"])
        qid = int(g["query_id"].iloc[0])
        tl = int(true_label[qid])
        return pd.DataFrame({"query_id": [qid], "true_label": [tl],
                             "pred_label": [pred],
                             "correct": [int(pred == tl)]})

    return cand.groupby("query_id").map_groups(vote, batch_format="pandas")


EMBED_DIM = 64  # fixture embedding width (ANN oracles share it)


def _q_label_centroids(sf_dir: str):
    """Per-label class prototypes (nearest-class-mean support):
    EXACT integer-quantized component sums + counts per (label, dim)
    in long format — the mean is a trivial post-division, and the
    quantized sums are order-independent BIGINTs so the distributed
    aggregate is bit-reproducible (same floor(e*2^20 + 0.5) quantizer
    as the IVF trainer).  One corpus pass; the exchange carries
    labels x dims aggregate rows, never vectors."""
    from ray.data.aggregate import Sum

    from .sources import tables
    from .stages.ann import IVF_SCALE, _as_matrix

    ds = tables.read_table(sf_dir, "embeddings",
                           columns=["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column("embedding"))
        q = np.floor(m * IVF_SCALE + 0.5).astype(np.int64)
        lab = batch.column("label").to_numpy(
            zero_copy_only=False).astype(np.int64)
        lab_u, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(lab_u), q.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(lab_u)).astype(np.int64)
        d = q.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(lab_u, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(lab_u))),
            "s": pa.array(sums.reshape(-1)),
            "c": pa.array(np.repeat(cnt, d)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["label", "dim"])
            .aggregate(Sum("s", alias_name="sum_q"),
                       Sum("c", alias_name="n")))


def _q_ann_cosine(sf_dir: str):
    from .sources import tables
    from .stages import ann

    return ann.cosine_topk(tables.read_table(sf_dir, "embeddings",
                                             columns=["vec_id", "embedding"]),
                           _ann_queries(sf_dir), k=workload.ANN_K)


def _q_ann_lsh(sf_dir: str):
    from .sources import tables
    from .stages import ann

    return ann.lsh_bucketed_topk(tables.read_table(sf_dir, "embeddings",
                                                   columns=["vec_id", "embedding"]),
                                 _ann_queries(sf_dir), k=workload.ANN_K)


def _q_events_hourly(sf_dir: str):
    from ray.data.aggregate import Sum

    from .sources import tables

    ev = tables.read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy()
        hour = us // 3_600_000_000
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        import pandas as pd

        g = pd.DataFrame({"event_type": et, "hour": hour}).groupby(
            ["event_type", "hour"], as_index=False
        ).size()
        return pa.table({
            "event_type": pa.array(g["event_type"]),
            "hour": pa.array(g["hour"].to_numpy()),
            "n": pa.array(g["size"].to_numpy().astype(np.int64)),
        })

    return (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n_events"))
    )


def _q_seg_seg_knn(sf_dir: str):
    """S1/S2 parity: each segment's 2 nearest other segments."""
    import ray

    from .sources import tables
    from .stages import spatial

    ref = ray.put(tables.segments_payload(sf_dir))
    return tables.segments_ds(sf_dir).map_batches(
        spatial.SegSegKnnActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"segs_ref": ref, "k": 2},
        concurrency=actor_pool(), batch_size=512,
    ).select_columns(["segment_id", "neighbor_id", "rnk", "d2"])


def _q_knn_docs_self(sf_dir: str):
    """doc -> doc kNN self-join (K2 shape at corpus scale)."""
    import ray

    from .sources import tables
    from .stages import spatial

    ref = ray.put(tables.docs_payload(sf_dir))
    return tables.docs_geo(sf_dir).map_batches(
        spatial.KnnJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"build_ref": ref, "kind": "point", "res": RES,
                               "k": 3, "id_out": "neighbor_id"},
        concurrency=actor_pool(), batch_size=4096,
    )


def _q_events_sessionize(sf_dir: str):
    """Gap-based session windows (30 min) per user over the events log.

    Stream-shaped workload: hash-PARTITION by user (not one Python
    call per user — VERDICT r2 "What's wrong" #4), then ONE vectorized
    pass per partition: lexsort by (user, ts), run-length session
    boundaries (new user OR gap > 30 min), per-session aggregates via
    reduceat.  Millions of users cost P partition calls, not millions
    of interpreter round-trips."""
    from .sources import tables

    ev = tables.read_table(sf_dir, "events", columns=["user_id", "ts"])
    # input-size-derived: a map_groups group materializes rows/parts
    # rows at once, so the count must grow with the log (VERDICT r3 #1)
    num_partitions = num_partitions_for(tables.table_rows(sf_dir, "events"),
                                        rows_per_partition=1_000_000)

    def add_pkey(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        return batch.append_column(
            "pkey", pa.array(((u % 1000003) * 2654435761 % num_partitions)
                             .astype(np.int64)))

    def sessionize_partition(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy()
        uid = batch.column("user_id").to_numpy()
        order = np.lexsort((us, uid))
        uid, us = uid[order], us[order]
        new_user = np.empty(len(us), dtype=bool)
        new_user[:1] = True
        new_user[1:] = uid[1:] != uid[:-1]
        brk = new_user.copy()
        brk[1:] |= (us[1:] - us[:-1]) > 1_800_000_000
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(us)))
        # per-user session index = global session ordinal - ordinal of
        # the user's first session + 1
        sess_ord = np.arange(len(starts), dtype=np.int64)
        user_first = sess_ord[new_user[starts]]
        sid = sess_ord - np.repeat(user_first, np.diff(
            np.append(np.flatnonzero(new_user[starts]), len(starts)))) + 1
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "session_id": pa.array(sid),
            "n_events": pa.array(counts.astype(np.int64)),
            "start_us": pa.array(us[starts]),
            "end_us": pa.array(us[starts + counts - 1]),
        })

    keyed = ev.map_batches(add_pkey, batch_format="pyarrow", zero_copy_batch=True)
    return keyed.groupby("pkey").map_groups(
        sessionize_partition, batch_format="pyarrow")


def _q_events_sliding(sf_dir: str):
    """Sliding windows (1 h window, 30 min slide) over the events log:
    each event lands in exactly two windows; implemented as a vectorized
    row-duplication map (no per-row Python) + pre-aggregated counts."""
    from ray.data.aggregate import Sum

    from .sources import tables

    ev = tables.read_table(sf_dir, "events", columns=["event_type", "ts"])
    W = 3_600_000_000  # 1 h in us
    S = 1_800_000_000  # 30 min slide

    def expand(batch: pa.Table) -> pa.Table:
        import pandas as pd

        us = batch.column("ts").cast(pa.int64()).to_numpy()
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        k = us // S  # event belongs to windows starting at (k-1)*S and k*S
        win = np.concatenate((k - 1, k))
        ets = np.concatenate((et, et))
        g = pd.DataFrame({"event_type": ets, "window_start": win * S}).groupby(
            ["event_type", "window_start"], as_index=False
        ).size()
        return pa.table({
            "event_type": pa.array(g["event_type"]),
            "window_start": pa.array(g["window_start"].to_numpy()),
            "n": pa.array(g["size"].to_numpy().astype(np.int64)),
        })

    return (
        ev.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n_events"))
    )


def _q_within_dist_pairs(sf_dir: str):
    """Distance-threshold self-join: all doc pairs within 0.5 world
    units (closed), ``id_a < id_b``.  One shuffle on radius-sized cell
    keys with the forward-half-neighborhood visitor scheme
    (stages/partitioned.within_distance_pairs)."""
    from .sources import tables
    from .stages.partitioned import within_distance_pairs

    return within_distance_pairs(tables.docs_geo(sf_dir), radius=0.5)


# eps for density clustering (world units) and the squared kth-NN
# distance above which a doc counts as a spatial outlier; shared
# verbatim with the SQL oracles below
CLUSTER_EPS = 0.5
OUTLIER_D2 = 9.0
IDW_SCALE = 1.0e6
IDW_VALUE_MOD = 1000


def _q_spatial_clusters(sf_dir: str):
    """Density clustering (DBSCAN-style single linkage at eps): docs
    within ``CLUSTER_EPS`` of each other are edges; clusters are the
    connected components (label = smallest doc id).  Isolated docs
    (no neighbor within eps) are noise and emit no row.

    Pure composition of two scale-shaped stages: the radius self-join
    (one shuffle on radius-sized cells, pairs only ever span adjacent
    cells) feeding distributed min-label propagation (one hash join +
    Min aggregate per round, driver sees a convergence scalar only)."""
    from .stages.dedup import connected_components

    return connected_components(
        _q_within_dist_pairs(sf_dir), a_col="id_a", b_col="id_b",
        id_out="doc_id", comp_out="cluster")


DBSCAN_MIN_PTS = 3  # core point: >= 3 neighbors (self excluded) within eps


def _q_dbscan(sf_dir: str):
    """Full DBSCAN (core / border / noise) at ``CLUSTER_EPS`` with
    ``DBSCAN_MIN_PTS`` — the min_pts upgrade of the single-linkage
    ``spatial_clusters``.

    Distributed composition over ONE radius self-join, entirely
    JOIN-FREE: every attach is the union + groupby(key) + map_groups
    idiom (one hash exchange each — same shape as a hash join, but
    immune to two Ray 2.49 hash-join hazards this pipeline hits: a
    left side of mostly-EMPTY blocks raises ArrowInvalid in the
    aggregator, and chained JoinOperators deadlock at small
    ``num_cpus`` because each reserves aggregator CPUs while upstream
    stages hold the rest).  Steps: (1) degrees by counting pair
    endpoints (groupby Sum); (2) degree attaches to each endpoint via
    two keyed union-group passes, classifying core-core vs border-core
    edges block-locally; (3) connected components over core-core edges
    plus core SELF-LOOPS (isolated cores still form singleton
    clusters); (4) border docs take the MIN component among their core
    neighbors (deterministic where classic DBSCAN is
    arrival-order-dependent).  Noise emits no row.  Group sizes are
    bounded by per-doc degree — the same skew envelope as the radius
    join itself."""
    from ray.data.aggregate import Min, Sum

    from .sources import tables
    from .stages.dedup import connected_components
    from .stages.partitioned import _gkey_of, within_distance_pairs

    pairs = within_distance_pairs(
        tables.docs_geo(sf_dir), radius=CLUSTER_EPS).materialize()
    # the three degree/label attaches below group on HASHED doc keys:
    # one group per doc id fired the attach once per doc (a 10^12-call
    # interpreter loop at corpus scale); hashed coarse groups + a
    # vectorized searchsorted lookup keep the one-exchange shape
    GK = num_partitions_for(tables.table_rows(sf_dir, "documents"),
                            rows_per_partition=250_000)

    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([
            batch.column("id_a").to_numpy(zero_copy_only=False),
            batch.column("id_b").to_numpy(zero_copy_only=False)])
        ids, cnt = np.unique(both, return_counts=True)
        return pa.table({"doc_id": pa.array(ids),
                         "n": pa.array(cnt.astype(np.int64))})

    deg = (pairs.map_batches(deg_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
           .groupby("doc_id").aggregate(Sum("n", alias_name="deg")))

    # degree attach, pass 1 (key = id_a): deg rows carry other = -1
    def pairs_keyed_a(batch: pa.Table) -> pa.Table:
        k = batch.column("id_a").to_numpy(zero_copy_only=False)
        return pa.table({"g": pa.array(_gkey_of(k, GK)),
                         "k": pa.array(k),
                         "other": batch.column("id_b"),
                         "deg": pa.array(np.full(len(batch), -1,
                                                 dtype=np.int64))})

    def deg_keyed(batch: pa.Table) -> pa.Table:
        k = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"g": pa.array(_gkey_of(k, GK)),
                         "k": pa.array(k),
                         "other": pa.array(np.full(len(batch), -1,
                                                   dtype=np.int64)),
                         "deg": batch.column("deg")})

    def attach_a(batch: pa.Table) -> pa.Table:
        """Multi-doc group: per-doc degree looked up vectorized (one
        deg row per doc by construction; a pair whose doc has no deg
        row in the group is dropped, exactly as the per-doc groups
        did)."""
        other = batch.column("other").to_numpy(zero_copy_only=False)
        dg = batch.column("deg").to_numpy(zero_copy_only=False)
        k = batch.column("k").to_numpy(zero_copy_only=False)
        is_deg = other < 0
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "deg_a": pa.array([], type=pa.int64())})
        if not is_deg.any() or is_deg.all():
            return empty
        kd = k[is_deg]
        dv = dg[is_deg]
        o = np.argsort(kd, kind="stable")
        kd, dv = kd[o], dv[o]
        pr = ~is_deg
        kp = k[pr]
        pos = np.minimum(np.searchsorted(kd, kp), len(kd) - 1)
        ok = kd[pos] == kp
        return pa.table({"id_a": pa.array(kp[ok]),
                         "id_b": pa.array(other[pr][ok]),
                         "deg_a": pa.array(dv[pos[ok]])})

    pa_pass = (pairs.map_batches(pairs_keyed_a, batch_format="pyarrow",
                                 zero_copy_batch=True)
               .union(deg.map_batches(deg_keyed, batch_format="pyarrow"))
               .groupby("g").map_groups(attach_a, batch_format="pyarrow"))

    # degree attach, pass 2 (key = id_b); deg rows carry deg_a = -1
    def pairs_keyed_b(batch: pa.Table) -> pa.Table:
        k = batch.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table({"g": pa.array(_gkey_of(k, GK)),
                         "k": pa.array(k),
                         "other": batch.column("id_a"),
                         "deg_a": batch.column("deg_a"),
                         "deg": pa.array(np.full(len(batch), -1,
                                                 dtype=np.int64))})

    def deg_keyed2(batch: pa.Table) -> pa.Table:
        n = len(batch)
        k = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"g": pa.array(_gkey_of(k, GK)),
                         "k": pa.array(k),
                         "other": pa.array(np.full(n, -1, dtype=np.int64)),
                         "deg_a": pa.array(np.full(n, -1, dtype=np.int64)),
                         "deg": batch.column("deg")})

    def attach_b(batch: pa.Table) -> pa.Table:
        other = batch.column("other").to_numpy(zero_copy_only=False)
        dg = batch.column("deg").to_numpy(zero_copy_only=False)
        da = batch.column("deg_a").to_numpy(zero_copy_only=False)
        k = batch.column("k").to_numpy(zero_copy_only=False)
        is_deg = other < 0
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "deg_a": pa.array([], type=pa.int64()),
                          "deg_b": pa.array([], type=pa.int64())})
        if not is_deg.any() or is_deg.all():
            return empty
        kd = k[is_deg]
        dv = dg[is_deg]
        o = np.argsort(kd, kind="stable")
        kd, dv = kd[o], dv[o]
        pr = ~is_deg
        kp = k[pr]
        pos = np.minimum(np.searchsorted(kd, kp), len(kd) - 1)
        ok = kd[pos] == kp
        return pa.table({"id_a": pa.array(other[pr][ok]),
                         "id_b": pa.array(kp[ok]),
                         "deg_a": pa.array(da[pr][ok]),
                         "deg_b": pa.array(dv[pos[ok]])})

    p2 = (pa_pass.map_batches(pairs_keyed_b, batch_format="pyarrow",
                              zero_copy_batch=True)
          .union(deg.map_batches(deg_keyed2, batch_format="pyarrow"))
          .groupby("g").map_groups(attach_b,
                                   batch_format="pyarrow")).materialize()

    def core_core(batch: pa.Table) -> pa.Table:
        da = batch.column("deg_a").to_numpy(zero_copy_only=False)
        db = batch.column("deg_b").to_numpy(zero_copy_only=False)
        keep = pa.array((da >= DBSCAN_MIN_PTS) & (db >= DBSCAN_MIN_PTS))
        f = batch.filter(keep)
        return pa.table({"doc_a": f.column("id_a"), "doc_b": f.column("id_b")})

    def border_core(batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        ca = batch.column("deg_a").to_numpy(zero_copy_only=False) >= DBSCAN_MIN_PTS
        cb = batch.column("deg_b").to_numpy(zero_copy_only=False) >= DBSCAN_MIN_PTS
        a_is_border = ~ca & cb
        b_is_border = ca & ~cb
        return pa.table({
            "doc_id": pa.array(np.concatenate([ia[a_is_border], ib[b_is_border]])),
            "core_id": pa.array(np.concatenate([ib[a_is_border], ia[b_is_border]])),
        })

    def self_loops(batch: pa.Table) -> pa.Table:
        keep = pa.array(batch.column("deg").to_numpy(zero_copy_only=False)
                        >= DBSCAN_MIN_PTS)
        f = batch.filter(keep)
        return pa.table({"doc_a": f.column("doc_id"),
                         "doc_b": f.column("doc_id")})

    cc_in = p2.map_batches(core_core, batch_format="pyarrow",
                           zero_copy_batch=True).union(
        deg.map_batches(self_loops, batch_format="pyarrow"))
    comp = connected_components(cc_in).materialize()

    # attach components to border edges WITHOUT Dataset.join: the
    # border stream is mostly EMPTY blocks (it's a narrow filter of
    # p2) and Ray 2.49's hash-shuffle join raises ArrowInvalid when a
    # left partition assembles only from empty blocks.  The union +
    # groupby(core_id) idiom has the same one-exchange shape and is
    # immune: each group is one labeled core row plus that core's
    # border edges.
    def comp_as_union(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cid = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array(_gkey_of(cid, GK)),
            "core_id": pa.array(cid),
            "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),  # sentinel
            "component": batch.column("component"),
        })

    def border_as_union(batch: pa.Table) -> pa.Table:
        t = border_core(batch)
        n = len(t)
        cid = t.column("core_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array(_gkey_of(cid, GK)),
            "core_id": pa.array(cid),
            "doc_id": t.column("doc_id"),
            "component": pa.array(np.full(n, -1, dtype=np.int64)),
        })

    def attach(batch: pa.Table) -> pa.Table:
        """Multi-core group: per-core component label looked up
        vectorized (one label row per core id)."""
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        cid = batch.column("core_id").to_numpy(zero_copy_only=False)
        cmp_ = batch.column("component").to_numpy(zero_copy_only=False)
        lab_rows = did < 0
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "component": pa.array([], type=pa.int64())})
        if not lab_rows.any() or lab_rows.all():
            return empty
        kl = cid[lab_rows]
        lv = cmp_[lab_rows]
        o = np.argsort(kl, kind="stable")
        kl, lv = kl[o], lv[o]
        br = ~lab_rows
        kb = cid[br]
        pos = np.minimum(np.searchsorted(kl, kb), len(kl) - 1)
        ok = kl[pos] == kb
        return pa.table({"doc_id": pa.array(did[br][ok]),
                         "component": pa.array(lv[pos[ok]])})

    border_lab = (comp.map_batches(comp_as_union, batch_format="pyarrow")
                  .union(p2.map_batches(border_as_union,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True))
                  .groupby("g").map_groups(attach,
                                           batch_format="pyarrow")
                  .groupby("doc_id")
                  .aggregate(Min("component", alias_name="cluster")))

    def as_role(role: int, cluster_col: str):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "cluster": batch.column(cluster_col),
                "role": pa.array(np.full(len(batch), role, dtype=np.int64)),
            })
        return f

    return comp.map_batches(as_role(0, "component"),
                            batch_format="pyarrow").union(
        border_lab.map_batches(as_role(1, "cluster"), batch_format="pyarrow"))


def _q_knn_outliers(sf_dir: str):
    """kNN-distance outlier scores: per doc, the squared distance to
    its rank-3 neighbor in the self-join (rank 1 is the doc itself),
    flagged when above ``OUTLIER_D2``.  No extra shuffle: the kth row
    is filtered out of the kNN stream block-locally (the self-join
    emits each doc's k rows inside one block)."""

    knn = _q_knn_docs_self(sf_dir)

    def kth(batch: pa.Table) -> pa.Table:
        rnk = batch.column("rnk").to_numpy(zero_copy_only=False)
        m = rnk == 3
        d2k = batch.column("d2").to_numpy(zero_copy_only=False)[m]
        return pa.table({
            "doc_id": pa.array(
                batch.column("doc_id").to_numpy(zero_copy_only=False)[m]),
            "d2_k": pa.array(d2k),
            "outlier": pa.array((d2k > OUTLIER_D2).astype(np.int64)),
        })

    return knn.map_batches(kth, batch_format="pyarrow", zero_copy_batch=True)


def _q_idw_interpolate(sf_dir: str):
    """Inverse-distance-weighted interpolation at the query points:
    value = sum(w_i * m_i) / sum(w_i) over the K_DOCS nearest docs,
    with m = doc_id % IDW_VALUE_MOD as the per-doc measurement.

    Float-parity discipline: weights are QUANTIZED to integers
    (floor(IDW_SCALE / (1 + d2) + 0.5)) so the aggregation is exact
    BIGINT sums — order-independent, immune to DuckDB's unspecified
    SUM order — and the single final division is the only float op."""
    from ray.data.aggregate import Sum

    knn = _q_knn_docs(sf_dir)  # query_id, doc_id, rnk, d2

    def weigh(batch: pa.Table) -> pa.Table:
        d2 = batch.column("d2").to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        w = np.floor(IDW_SCALE / (1.0 + d2) + 0.5).astype(np.int64)
        return pa.table({
            "query_id": batch.column("query_id"),
            "num": pa.array(w * (doc % IDW_VALUE_MOD)),
            "den": pa.array(w),
        })

    agg = (
        knn.map_batches(weigh, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("query_id")
        .aggregate(Sum("num", alias_name="num"), Sum("den", alias_name="den"))
    )

    def ratio(batch: pa.Table) -> pa.Table:
        num = batch.column("num").to_numpy(zero_copy_only=False)
        den = batch.column("den").to_numpy(zero_copy_only=False)
        return pa.table({
            "query_id": batch.column("query_id"),
            "idw_value": pa.array(num.astype(np.float64) / den.astype(np.float64)),
            "wsum": pa.array(den.astype(np.int64)),
        })

    return agg.map_batches(ratio, batch_format="pyarrow", zero_copy_batch=True)


def _q_tile_smooth(sf_dir: str):
    """3x3 box-filter smoothed tile density (raster convolution as
    scatter + groupby): every occupied cell scatters its count to the
    9 cells of its neighborhood (border-clipped), one Sum groupby
    re-collects.  Cells whose whole neighborhood is empty emit no row.

    Scale shape: the scatter is a 9x fan-out of the ALREADY-aggregated
    per-cell counts (tiny), not of the docs; the groupby moves at most
    9 * occupied_cells rows."""
    from ray.data.aggregate import Sum

    counts = _q_tile_counts(sf_dir)  # cell_id, n_docs
    axis = _AXIS

    def scatter(batch: pa.Table) -> pa.Table:
        cid = batch.column("cell_id").to_numpy(zero_copy_only=False)
        n = batch.column("n_docs").to_numpy(zero_copy_only=False)
        cx, cy = cid // axis, cid % axis
        out_c, out_n = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = cx + dx, cy + dy
                m = (nx >= 0) & (nx < axis) & (ny >= 0) & (ny < axis)
                out_c.append(nx[m] * axis + ny[m])
                out_n.append(n[m])
        return pa.table({
            "cell_id": pa.array(np.concatenate(out_c)),
            "n_smooth": pa.array(np.concatenate(out_n).astype(np.int64)),
        })

    return (
        counts.map_batches(scatter, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell_id")
        .aggregate(Sum("n_smooth", alias_name="n_smooth"))
    )


def _events_keyed(sf_dir: str, num_partitions: int | None = None):
    """Events log keyed by a user-hash partition column (the shared
    front end of the sessionize / as-of / range-join family)."""
    from .sources import tables

    if num_partitions is None:
        num_partitions = num_partitions_for(
            tables.table_rows(sf_dir, "events"), rows_per_partition=1_000_000)
    ev = tables.read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def add_pkey(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        return batch.append_column(
            "pkey", pa.array(((u % 1000003) * 2654435761 % num_partitions)
                             .astype(np.int64)))

    return ev.map_batches(add_pkey, batch_format="pyarrow",
                          zero_copy_batch=True)


def _q_events_asof(sf_dir: str):
    """As-of join: each purchase matched to the MOST RECENT prior click
    by the same user (strict (ts, event_id) order — deterministic at
    equal timestamps).  Hash-partition by user, one vectorized
    shifted-maximum.accumulate pass per partition
    (stages/events.asof_join_partition); no per-row/per-user Python."""
    from .stages.events import asof_join_partition

    def part(batch: pa.Table) -> pa.Table:
        return asof_join_partition(batch, probe_type="purchase",
                                   build_type="click")

    return _events_keyed(sf_dir).groupby("pkey").map_groups(
        part, batch_format="pyarrow")


def _q_events_range_join(sf_dir: str):
    """Range join: each purchase paired with EVERY view by the same
    user in the trailing hour (v.ts in [p.ts - 1h, p.ts)).  Same
    partition shape; windows resolve via union-lexsort binary search +
    vectorized multi-range gather (stages/events.range_join_partition)."""
    from .stages.events import range_join_partition

    def part(batch: pa.Table) -> pa.Table:
        return range_join_partition(batch, probe_type="purchase",
                                    build_type="view",
                                    window_us=3_600_000_000)

    return _events_keyed(sf_dir).groupby("pkey").map_groups(
        part, batch_format="pyarrow")


def _q_tile_index_stats(sf_dir: str):
    """Per-partition index build (C3 shape): zones group by home tile at
    a coarse resolution; each group builds a packed Hilbert R-tree in
    ``map_groups`` and emits its structural metrics — the per-partition
    build-once state + per-partition metrics of the north rule."""
    from .index import PackedRTree
    from .sources import tables

    res = 4  # coarse: enough zones per tile to build real trees

    def add_tile(batch: pa.Table) -> pa.Table:
        from .cells import cell_id

        cx = (batch.column("min_x").to_numpy(zero_copy_only=False)
              + batch.column("max_x").to_numpy(zero_copy_only=False))
        cy = (batch.column("min_y").to_numpy(zero_copy_only=False)
              + batch.column("max_y").to_numpy(zero_copy_only=False))
        tile = cell_id(cx / 2.0, cy / 2.0, res)
        return batch.append_column("tile", pa.array(tile))

    def build(group):
        import pandas as pd

        t = PackedRTree(
            group["min_x"].to_numpy(), group["max_x"].to_numpy(),
            group["min_y"].to_numpy(), group["max_y"].to_numpy(),
            ids=group["zone_id"].to_numpy(),
        )
        return pd.DataFrame({
            "tile": [int(group["tile"].iloc[0])],
            "n_zones": [int(t.size)],
            "height": [int(t.height)],
            "valid": [bool(t.is_valid())],
        })

    return (
        tables.zones_ds(sf_dir)
        .map_batches(add_tile, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tile")
        .map_groups(build, batch_format="pandas")
    )


def _q_customer_orders(sf_dir: str):
    """Broadcast dimension join: orders count per market segment."""
    import ray
    from ray.data.aggregate import Sum

    from .sources import tables

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust.column("c_custkey").to_numpy()
    seg_dict = cust.column("c_mktsegment").combine_chunks().dictionary_encode()
    order = np.argsort(keys, kind="stable")
    ref = ray.put({
        "keys": keys[order],
        "codes": seg_dict.indices.to_numpy(zero_copy_only=False)[order],
        "cats": seg_dict.dictionary.to_pylist(),
    })

    class SegmentJoin:
        """Broadcast dimension join: sorted-key searchsorted + bincount
        over dictionary codes — no per-row Python dict lookups
        (VERDICT.md "What's wrong" #6)."""

        def __init__(self):
            p = ray.get(ref)
            self.keys, self.codes, self.cats = p["keys"], p["codes"], p["cats"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch.column("o_custkey").to_numpy()
            loc = np.searchsorted(self.keys, k)
            loc = np.minimum(loc, len(self.keys) - 1)
            hit = self.keys[loc] == k
            counts = np.bincount(self.codes[loc[hit]], minlength=len(self.cats))
            nz = np.nonzero(counts)[0]
            return pa.table({
                "c_mktsegment": pa.array([self.cats[i] for i in nz],
                                         type=pa.string()),
                "n": pa.array(counts[nz].astype(np.int64)),
            })

    orders = tables.read_table(sf_dir, "orders", columns=["o_custkey"])
    return (
        orders.map_batches(SegmentJoin, batch_format="pyarrow", zero_copy_batch=True,
                           concurrency=actor_pool())
        .groupby("c_mktsegment").aggregate(Sum("n", alias_name="n_orders"))
    )


def _q_sample_docs(sf_dir: str):
    """Deterministic hash sampling (~10%): keep doc iff
    (doc_id * 2654435761) % 1000003 < 100000.  Stateless vectorized
    filter — the reproducible alternative to random_shuffle-based
    sampling for corpus subsetting (any shard resamples identically).

    The multiply is reduced mod 1000003 FIRST on both sides (ADVICE
    round 2 #5): the raw int64 product silently wraps for doc_id over
    ~3.5e9 while DuckDB's BIGINT multiply overflows instead, so the
    two sides would diverge exactly at corpus scale.  The mod-first
    form is wrap-free (product < 2^63) and algebraically identical."""
    from .sources import tables

    docs = tables.read_table(sf_dir, "documents", columns=["doc_id"])

    def f(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        keep = ((d % 1000003) * (2654435761 % 1000003)) % 1000003 < 100000
        return batch.filter(pa.array(keep))

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _q_source_stats(sf_dir: str):
    """Per-source corpus rollup (provenance accounting): doc count,
    exact integer char sum, and DISTINCT language count per source.
    Distinct-count is exact via the two-level aggregate (groupby
    (source, lang) first — the exchange carries one row per observed
    pair, never docs)."""
    from ray.data.aggregate import Count, Sum

    from .sources import tables

    docs = tables.read_table(sf_dir, "documents",
                             columns=["source", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        src = batch.column("source")
        lang = batch.column("lang")
        nch = batch.column("n_chars").to_numpy(zero_copy_only=False)
        key = pc.binary_join_element_wise(src, lang, "\x1f")
        k = key.to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(k, return_inverse=True,
                                   return_counts=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, nch)
        first = np.zeros(len(uniq), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(k) - 1, -1, -1)
        return pa.table({
            "source": src.take(pa.array(first)),
            "lang": lang.take(pa.array(first)),
            "n": pa.array(cnt.astype(np.int64)),
            "chars": pa.array(sums),
        })

    pair_agg = (docs.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
                .groupby(["source", "lang"])
                .aggregate(Sum("n", alias_name="n"),
                           Sum("chars", alias_name="chars")))

    return (pair_agg.groupby("source")
            .aggregate(Sum("n", alias_name="n_docs"),
                       Sum("chars", alias_name="sum_chars"),
                       Count(alias_name="n_langs")))


def _q_corpus_clean(sf_dir: str):
    """Composite training-data cleaning pipeline: exact-dedup survivors
    (hash -> Min keep_id -> hash join back) filtered by quality
    (n_tokens >= 5, distinct-token ratio >= 0.3) and language
    (stopword-vote == 'en').  The join key is the content hash — the
    corpus-scale dedup shape — and the quality/lang features are
    computed vectorized inside the filter stage."""
    from ray.data.aggregate import Min

    from .sources import tables
    from .stages import dedup

    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    hashed = dedup.content_hash(docs)
    keep = (
        dedup.content_hash(tables.read_table(sf_dir, "documents",
                                             columns=["doc_id", "text"]))
        .groupby("content_hash").aggregate(Min("doc_id", alias_name="keep_id"))
    )
    joined = hashed.join(keep.map_batches(
        lambda t: t.select(["content_hash", "keep_id"]), batch_format="pyarrow"),
        "inner",
        num_partitions_for(tables.table_rows(sf_dir, "documents"),
                           rows_per_partition=250_000),
        on=("content_hash",))

    def clean_filter(batch: pa.Table) -> pa.Table:
        # shared vectorized kernels — no per-row loops (VERDICT r2 #3)
        import pyarrow.compute as pc

        from .stages.text import distinct_token_counts, lang_id_votes

        t = batch.filter(pc.equal(batch.column("doc_id"),
                                  batch.column("keep_id")))
        text = t.column("text")
        n_tokens = pc.list_value_length(
            pc.split_pattern(text, " ")).cast(pa.int64()).to_numpy()
        n_distinct = distinct_token_counts(text)
        langs = lang_id_votes(text)
        ratio = n_distinct.astype(np.float64) / n_tokens.astype(np.float64)
        ok = (n_tokens >= 5) & (ratio >= 0.3) & (langs == "en")
        t = t.filter(pa.array(ok))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tokens[ok]),
            "lang_pred": pa.array(langs[ok].tolist(), type=pa.string()),
        })

    return joined.map_batches(clean_filter, batch_format="pyarrow",
                              zero_copy_batch=True)


def _q_lineitem_pricing(sf_dir: str):
    """TPC-H-Q1-shaped pricing summary over the largest table:
    vectorized per-batch partials (combiner) -> small groupby Sum.
    Money sums run in exact integer cents (floor(x*100 + 0.5), the
    same IEEE sequence as the SQL) so the result is bitwise
    order-independent — float SUM order varies across parallel plans."""
    from ray.data.aggregate import Sum

    from .sources import tables

    li = tables.read_table(sf_dir, "lineitem",
                           columns=["l_returnflag", "l_linestatus",
                                    "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        qty = np.floor(batch.column("l_quantity").to_numpy() * 100.0 + 0.5
                       ).astype(np.int64)
        price = np.floor(batch.column("l_extendedprice").to_numpy() * 100.0 + 0.5
                         ).astype(np.int64)
        df = pd.DataFrame({
            "l_returnflag": batch.column("l_returnflag").to_numpy(zero_copy_only=False),
            "l_linestatus": batch.column("l_linestatus").to_numpy(zero_copy_only=False),
            "qty_c": qty, "price_c": price,
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n=("qty_c", "size"), sum_qty_c=("qty_c", "sum"),
            sum_price_c=("price_c", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("n", alias_name="n_items"),
                   Sum("sum_qty_c", alias_name="sum_qty_c"),
                   Sum("sum_price_c", alias_name="sum_price_c"))
    )


def _q_priority_revenue(sf_dir: str):
    """orders |x| lineitem all-to-all relational join, combiner-first:
    lineitem pre-aggregates revenue cents per order key (the shuffle
    moves one row per order, not per lineitem), hash-joins the orders
    dimension on o_orderkey, then rolls up by priority."""
    from ray.data.aggregate import Sum

    from .sources import tables

    li = tables.read_table(sf_dir, "lineitem",
                           columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        rev = np.floor(
            batch.column("l_extendedprice").to_numpy()
            * (1.0 - batch.column("l_discount").to_numpy()) * 100.0 + 0.5
        ).astype(np.int64)
        key = batch.column("l_orderkey").to_numpy()
        uk, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table({"l_orderkey": pa.array(uk),
                         "rev_c": pa.array(sums),
                         "n_li": pa.array(cnt.astype(np.int64))})

    per_order = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("rev_c", alias_name="rev_c"), Sum("n_li", alias_name="n_li"))
    )
    orders = tables.read_table(sf_dir, "orders",
                               columns=["o_orderkey", "o_orderpriority"])
    joined = per_order.join(
        orders, "inner",
        num_partitions_for(tables.table_rows(sf_dir, "orders"),
                           rows_per_partition=250_000),
        on=("l_orderkey",), right_on=("o_orderkey",))
    return (
        joined.groupby("o_orderpriority")
        .aggregate(Sum("n_li", alias_name="n_lineitems"),
                   Sum("rev_c", alias_name="revenue_c"))
    )


def _q_embed_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (exact, broadcast full matrix).

    At this corpus size the exact all-pairs path is the right call;
    the LSH-bucketed variant (ann_lsh) is the scale path.  Threshold
    0.4 is chosen to FIRE on the fixture corpus (max off-diagonal
    cosine ~0.5; nearest sims sit >5e-4 away from the cut on both
    sides, so the float32 DuckDB cosine agrees exactly)."""
    import ray

    from .sources import tables

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    vec_id = t.column("vec_id").to_numpy().astype(np.int64)
    flat = t.column("embedding").combine_chunks().values.to_numpy(
        zero_copy_only=False).astype(np.float64)
    m = flat.reshape(len(vec_id), -1)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put({"ids": vec_id, "matrix": mn})

    class DupPairs:
        def __init__(self):
            p = ray.get(ref)
            self.ids = p["ids"]
            self.mn = p["matrix"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .stages.ann import _as_matrix

            mm = _as_matrix(batch.column("embedding"))
            mm = mm / np.linalg.norm(mm, axis=1, keepdims=True)
            bid = batch.column("vec_id").to_numpy().astype(np.int64)
            sims = mm @ self.mn.T
            r, c = np.nonzero((sims >= workload.EMBED_DUP_THRESHOLD)
                              & (bid[:, None] < self.ids[None, :]))
            return pa.table({
                "vec_a": pa.array(bid[r]),
                "vec_b": pa.array(self.ids[c]),
            })

    return tables.read_table(sf_dir, "embeddings",
                             columns=["vec_id", "embedding"]).map_batches(
        DupPairs, batch_format="pyarrow", zero_copy_batch=True, concurrency=actor_pool())


def _q_ann_ivf(sf_dir: str):
    """IVF coarse-quantizer ANN (see ann.ivf_topk); trains on the full
    (small) embedding table driver-side, probes 2 of 16 lists."""
    from .sources import tables
    from .stages import ann

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    vec_id = t.column("vec_id").to_numpy().astype(np.int64)
    flat = t.column("embedding").combine_chunks().values.to_numpy(
        zero_copy_only=False).astype(np.float64)
    train = {"ids": vec_id, "matrix": flat.reshape(len(vec_id), -1)}
    return ann.ivf_topk(
        tables.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        _ann_queries(sf_dir), train, k=workload.ANN_K,
    )


def _q_embed_dup_pairs_lsh(sf_dir: str):
    """Scale path for embedding dedup: corpus-vs-corpus LSH star pairs
    + exact cosine verify with join-back embedding attach (see
    ann.lsh_dup_pairs — no driver-side matrix read)."""
    from .sources import tables
    from .stages import ann

    return ann.lsh_dup_pairs(
        tables.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        threshold=workload.EMBED_DUP_THRESHOLD,
    )


def _q_embed_dup_components(sf_dir: str):
    """Duplicate-cluster verdicts: connected components (min-label
    propagation) over the exact embedding near-dup pairs."""
    from .stages.dedup import connected_components

    return connected_components(_q_embed_dup_pairs(sf_dir),
                                a_col="vec_a", b_col="vec_b",
                                id_out="vec_id", comp_out="component")


def _q_media_features(sf_dir: str):
    """Media features with the list<float> vector exploded to scalar
    f00..f15 columns so the driver's value-hash compare (which sorts
    scalar columns) can verify them against the SQL oracle."""
    from .sources import synth
    from .stages import multimodal

    out = multimodal.media_features(synth.interleaved_docs(500), decode="fake")

    def explode_feature(batch: pa.Table) -> pa.Table:
        feat = batch.column("feature")
        if isinstance(feat, pa.ChunkedArray):
            feat = feat.combine_chunks()
        m = feat.values.to_numpy(zero_copy_only=False).reshape(batch.num_rows, -1)
        t = batch.drop_columns(["feature"])
        for j in range(m.shape[1]):
            t = t.append_column(f"f{j:02d}", pa.array(m[:, j]))
        return t

    return out.map_batches(explode_feature, batch_format="pyarrow",
                           zero_copy_batch=True)


def _q_media_resize(sf_dir: str):
    """Resize plumbing over image spans (deterministic fake codec)."""
    from .sources import synth
    from .stages import multimodal

    return multimodal.media_transform(synth.interleaved_docs(500), op="resize")


def _q_media_frames(sf_dir: str):
    """Frame-sample plumbing over audio/table spans (fake codec:
    frame count derived from the sha256 first byte)."""
    from .sources import synth
    from .stages import multimodal

    return multimodal.media_transform(synth.interleaved_docs(500),
                                      op="frame_sample")


# docs in the synthetic interleaved corpus the span gates run over
# (mirrors flagship_spans' fixed n_docs — the corpus is derived from
# ids, not from sf_dir tables, so the gates are sf-invariant)
_SPAN_DOCS = 1000


def _q_span_stats(sf_dir: str):
    """Per-doc structure stats of the interleaved span sequences:
    span count, text-span count, total text chars.  ROW-LOCAL
    vectorized decode of the ``list<struct>`` column (ListArray
    offsets + flattened child fields + bincount) — no explode, no
    shuffle; the natural first stage of any span-aware corpus scan."""
    import pyarrow.compute as pc

    from .sources.synth import interleaved_docs

    def stats(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        n = len(batch)
        n_spans = spans.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = spans.flatten()
        parent = np.repeat(np.arange(n, dtype=np.int64), n_spans)
        is_text = pc.equal(flat.field("kind"), "text").to_numpy(zero_copy_only=False)
        tl = pc.utf8_length(flat.field("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_key": batch.column("doc_key"),
            "n_spans": pa.array(n_spans),
            "n_text": pa.array(np.bincount(
                parent, weights=is_text, minlength=n).astype(np.int64)),
            "text_chars": pa.array(np.bincount(
                parent, weights=tl, minlength=n).astype(np.int64)),
        })

    return interleaved_docs(_SPAN_DOCS).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True)


def _q_span_texts(sf_dir: str):
    """Interleaved -> flat TEXT-span stream with in-doc positions
    preserved (the explode side of the span-sequence invariant):
    one row per text span, ``span_pos`` = its index in the original
    sequence.  Vectorized: ListArray offsets give parent/position,
    Arrow filter does the projection — no Python over rows."""
    import pyarrow.compute as pc

    from .sources.synth import interleaved_docs

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        n = len(batch)
        n_spans = spans.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = spans.flatten()
        starts = np.concatenate(([0], np.cumsum(n_spans)[:-1]))
        parent = np.repeat(np.arange(n, dtype=np.int64), n_spans)
        local = np.arange(int(n_spans.sum()), dtype=np.int64) - np.repeat(starts, n_spans)
        is_text = pc.equal(flat.field("kind"), "text").to_numpy(zero_copy_only=False)
        keys = batch.column("doc_key").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_key": pa.array(keys[parent][is_text]),
            "span_pos": pa.array(local[is_text]),
            "text": flat.field("text").filter(pa.array(is_text)),
        })

    return interleaved_docs(_SPAN_DOCS).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)


def _q_span_dedup(sf_dir: str):
    """Exact dedup of the exploded TEXT-span stream (the span-level
    sibling of dedup_exact — boilerplate spans repeat across docs):
    one row per distinct span text with its smallest-(doc, pos) owner
    and copy count.  Per-batch combine (lexsort run-length min/count
    over the composite owner key) -> one groupby over DISTINCT span
    texts; the exchange carries (text, owner, n) partials, never the
    span stream."""
    from ray.data.aggregate import Min, Sum

    stream = _q_span_texts(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text").to_numpy(zero_copy_only=False)
        doc = batch.column("doc_key").to_numpy(zero_copy_only=False)
        pos = batch.column("span_pos").to_numpy(zero_copy_only=False)
        owner = doc * np.int64(1 << 20) + pos
        uniq, inv, cnt = np.unique(text, return_inverse=True,
                                   return_counts=True)
        omin = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(omin, inv, owner)
        return pa.table({"text": pa.array(uniq),
                         "o": pa.array(omin),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (stream.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("text").aggregate(Min("o", alias_name="o"),
                                      Sum("n", alias_name="n_copies")))

    def decode(batch: pa.Table) -> pa.Table:
        o = batch.column("o").to_numpy(zero_copy_only=False)
        return pa.table({
            "text": batch.column("text"),
            "owner_doc": pa.array(o >> np.int64(20)),
            "owner_pos": pa.array(o & np.int64((1 << 20) - 1)),
            "n_copies": batch.column("n_copies"),
        })

    return agg.map_batches(decode, batch_format="pyarrow",
                           zero_copy_batch=True)


_STRATUM_K = 2  # docs kept per tile by the stratified sampler


def _q_sample_per_tile(sf_dir: str):
    """Stratified sampling: the ``_STRATUM_K`` docs with the smallest
    (hash, doc_id) per tile — deterministic, resumable (pure function
    of ids), and balanced across space regardless of density skew.

    Scale shape: per-batch PARTIAL top-k per cell (lexsort + run-length
    rank — blocks emit at most k rows per touched cell), then one
    groupby merge re-running the same kernel on <= k * blocks rows per
    cell; the corpus itself never shuffles."""
    from .sources import tables
    from .stages import spatial

    tiled = spatial.assign_tiles(tables.docs_geo(sf_dir), res=RES)

    def topk(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell_id").to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = ((doc % 1000003) * (2654435761 % 1000003)) % 1000003
        order = np.lexsort((doc, h, cell))
        c_s, d_s, h_s = cell[order], doc[order], h[order]
        starts = np.flatnonzero(np.concatenate(([True], c_s[1:] != c_s[:-1])))
        counts = np.diff(np.append(starts, len(c_s)))
        rank = np.arange(len(c_s), dtype=np.int64) - np.repeat(starts, counts)
        keep = rank < _STRATUM_K
        return pa.table({"cell_id": pa.array(c_s[keep]),
                         "doc_id": pa.array(d_s[keep]),
                         "h": pa.array(h_s[keep])})

    partial = tiled.map_batches(topk, batch_format="pyarrow",
                                zero_copy_batch=True)
    merged = partial.groupby("cell_id").map_groups(
        topk, batch_format="pyarrow")
    return merged.drop_columns(["h"])


def _q_chars_quantiles(sf_dir: str):
    """Exact distributed quantiles of ``n_chars`` (median + p90) via
    the value-HISTOGRAM method: per-batch (value, count) combine, one
    small groupby Sum, then the driver resolves order statistics from
    the cumulative histogram — the corpus never sorts and never
    leaves the cluster; what reaches the driver is bounded by the
    number of DISTINCT values, not rows.  Median interpolation is one
    explicit float op sequence mirrored in the SQL (DuckDB's builtin
    ``median`` interpolates with an unspecified op order)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .sources import tables

    docs = tables.read_table(sf_dir, "documents", columns=["n_chars"])

    def combine(batch: pa.Table) -> pa.Table:
        v, c = np.unique(batch.column("n_chars").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"v": pa.array(v.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    hist = (docs.map_batches(combine, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("v").aggregate(Sum("c", alias_name="c")).to_pandas())
    hist = hist.sort_values("v").reset_index(drop=True)
    cum = hist["c"].cumsum().to_numpy()
    n = int(cum[-1])
    vals = hist["v"].to_numpy()

    def kth(k: int) -> int:
        return int(vals[np.searchsorted(cum, k)])

    lo, hi = kth((n + 1) // 2), kth((n + 2) // 2)
    median = (np.float64(lo) + np.float64(hi)) / np.float64(2.0)
    p90 = kth((9 * n + 9) // 10)
    return pd.DataFrame({"n": [n], "median_chars": [float(median)],
                         "p90_chars": [p90]})


MORAN_EPS = 1.0  # distance-band weight radius for Moran's I


def _q_morans_i(sf_dir: str):
    """Global Moran's I spatial autocorrelation of ``n_chars`` under
    binary distance-band weights (w_ij = 1 iff dist <= MORAN_EPS),
    the esda-style spatial statistic.

    INTEGER-EXACT distributed formulation: with S = sum(v), centered
    values scale to (N*v_i - S) (all BIGINT), so the pair numerator
    sum( (N*va - S)*(N*vb - S) ) and the denominator
    sum( (N*v - S)^2 ) are order-independent integer aggregates — the
    N^2 scale factors cancel in the ratio, and the ONLY float ops are
    the final mirrored casts/divide.  The pair stream comes from the
    radius self-join with the value riding the shuffle as one scalar
    column (carry_col — no join-back).  At gate scale the BIGINT
    partials are exact by range (n_chars <= ~600, N = 500); a
    10^12-doc corpus would overflow the centered products and switches
    to the float path without the bit-parity guarantee (documented
    tradeoff, same as IDW's integer quantization).

    Each unordered pair appears once in the stream; symmetric W
    double-counts cancel between W = 2P and num = 2*sum_pairs."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    from .sources import tables
    from .stages.partitioned import within_distance_pairs

    docs = tables.docs_geo(sf_dir, extra_columns=("n_chars",))
    st = docs.aggregate(Sum("n_chars", alias_name="s"), Count())
    n = int(st["count()"])
    s = int(st["s"])

    pairs = within_distance_pairs(docs, radius=MORAN_EPS,
                                  carry_col="n_chars")

    def num_partial(batch: pa.Table) -> pa.Table:
        va = batch.column("va").to_numpy(zero_copy_only=False).astype(np.int64)
        vb = batch.column("vb").to_numpy(zero_copy_only=False).astype(np.int64)
        da = n * va - s
        db = n * vb - s
        return pa.table({"num": pa.array([int((da * db).sum())]),
                         "n_pairs": pa.array([len(va)])})

    def den_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        d = n * v - s
        return pa.table({"den": pa.array([int((d * d).sum())])})

    num_agg = pairs.map_batches(num_partial, batch_format="pyarrow",
                                zero_copy_batch=True).aggregate(
        Sum("num", alias_name="num"), Sum("n_pairs", alias_name="n_pairs"))
    den_agg = docs.map_batches(den_partial, batch_format="pyarrow",
                               zero_copy_batch=True).aggregate(
        Sum("den", alias_name="den"))
    num = int(num_agg["num"])
    p = int(num_agg["n_pairs"])
    den = int(den_agg["den"])
    moran_i = (np.float64(n) * np.float64(num)) / (
        np.float64(p) * np.float64(den))
    return pd.DataFrame({"n": [n], "n_pairs": [p], "num": [num],
                         "den": [den], "moran_i": [float(moran_i)]})


def _q_hotspot_gi(sf_dir: str):
    """Getis-Ord Gi* hot-spot z-scores of ``n_chars`` under binary
    distance-band weights within ``MORAN_EPS`` (self INCLUDED — the
    star variant), the per-location sibling of Moran's I.

    All sums are exact integers: the corpus moments (N, S1, S2) come
    from one small aggregate, each doc's neighborhood (W_i, sum of
    neighbor values) accumulates pair contributions from the radius
    self-join (value rides the shuffle via carry_col) plus the self
    term.  Only the final z-score is float — ONE fixed IEEE op
    sequence mirrored verbatim in the SQL oracle (sqrt is
    correctly-rounded per IEEE-754, so parity holds through it)."""
    from ray.data.aggregate import Sum

    from .sources import tables
    from .stages.partitioned import within_distance_pairs

    docs = tables.docs_geo(sf_dir, extra_columns=("n_chars",))

    def moments(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array([len(v)]),
                         "s1": pa.array([int(v.sum())]),
                         "s2": pa.array([int((v * v).sum())])})

    m = (docs.map_batches(moments, batch_format="pyarrow",
                          zero_copy_batch=True)
         .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
                    Sum("s2", alias_name="s2")))
    n, s1, s2 = int(m["n"]), int(m["s1"]), int(m["s2"])

    pairs = within_distance_pairs(docs, radius=MORAN_EPS,
                                  carry_col="n_chars")

    def pair_contrib(batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        va = batch.column("va").to_numpy(zero_copy_only=False).astype(np.int64)
        vb = batch.column("vb").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.concatenate([ia, ib])),
            "v": pa.array(np.concatenate([vb, va])),
            "c": pa.array(np.ones(2 * len(ia), dtype=np.int64)),
        })

    def self_contrib(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "v": pa.array(v),
                         "c": pa.array(np.ones(len(v), dtype=np.int64))})

    w = (pairs.map_batches(pair_contrib, batch_format="pyarrow",
                           zero_copy_batch=True)
         .union(docs.map_batches(self_contrib, batch_format="pyarrow",
                                 zero_copy_batch=True))
         .groupby("doc_id").aggregate(Sum("c", alias_name="w_i"),
                                      Sum("v", alias_name="sumw")))

    n_f, s1_f, s2_f = np.float64(n), np.float64(s1), np.float64(s2)
    xbar = s1_f / n_f
    s_ = np.sqrt(s2_f / n_f - xbar * xbar)

    def zscore(batch: pa.Table) -> pa.Table:
        wi = batch.column("w_i").to_numpy(zero_copy_only=False)
        sw = batch.column("sumw").to_numpy(zero_copy_only=False)
        w_f = wi.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            denom = s_ * np.sqrt((n_f * w_f - w_f * w_f) / (n_f - 1.0))
            z = (sw.astype(np.float64) - xbar * w_f) / denom
        # degenerate inputs (all values equal -> s_=0; a neighborhood
        # covering the whole corpus -> n*w-w*w=0; n=1) make the z-score
        # undefined — numpy yields inf/nan where DuckDB yields NULL, so
        # such rows are SKIPPED on both sides via the identical float
        # denominator test (ADVICE r3 #2; SQL mirror: WHERE denom > 0)
        return batch.append_column("gi_z", pa.array(z)).filter(
            pa.array(denom > 0.0))

    return w.map_batches(zscore, batch_format="pyarrow",
                         zero_copy_batch=True)


RIPLEY_RADII = (0.25, 0.5, 1.0, 2.0)  # K-function radius ladder
WORLD_AREA = 64800.0  # 360 x 180 (the fixture's study window)


def _q_ripley_k(sf_dir: str):
    """Ripley's K point-pattern statistic at the RIPLEY_RADII ladder
    (no edge correction — the naive estimator, mirrored exactly):
    K(r) = A * (2 * pairs_within_r) / n^2.

    ONE radius self-join at max(r) feeds every rung: per-batch
    cumulative band counts over d2 (integers), one small Sum; the
    only floats are the final mirrored estimator ops."""
    from ray.data.aggregate import Sum

    from .sources import tables
    from .stages.partitioned import within_distance_pairs

    docs = tables.docs_geo(sf_dir)
    n = int(docs.count())
    pairs = within_distance_pairs(docs, radius=max(RIPLEY_RADII))
    r2s = [r * r for r in RIPLEY_RADII]

    def band_counts(batch: pa.Table) -> pa.Table:
        d2 = batch.column("d2").to_numpy(zero_copy_only=False)
        return pa.table({f"c{i}": pa.array([int((d2 <= t).sum())])
                         for i, t in enumerate(r2s)})

    agg = pairs.map_batches(band_counts, batch_format="pyarrow",
                            zero_copy_batch=True).aggregate(
        *[Sum(f"c{i}", alias_name=f"c{i}") for i in range(len(r2s))])

    import pandas as pd

    rows = []
    for i, r in enumerate(RIPLEY_RADII):
        p = int(agg[f"c{i}"])
        k = (np.float64(WORLD_AREA) * np.float64(2 * p)) / (
            np.float64(n) * np.float64(n))
        rows.append({"r": float(r), "n_pairs": p, "k_est": float(k)})
    return pd.DataFrame(rows)


def _q_skyline_docs(sf_dir: str):
    """Skyline query (pareto frontier, minimize x and y): docs
    dominated by NO other doc (b dominates a iff b.x <= a.x and
    b.y <= a.y and strictly smaller in one axis; exact duplicates are
    both skyline).  Distributive two-pass shape: a vectorized
    sort-based local skyline per block (the skyline of a union is a
    subset of the union of local skylines), then one merge pass over
    the tiny candidate set — the corpus itself never re-shuffles."""

    from .sources import tables

    def local_skyline(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        if len(x) == 0:
            return batch
        order = np.lexsort((y, x))
        xs, ys = x[order], y[order]
        new_x = np.empty(len(xs), dtype=bool)
        new_x[0] = True
        new_x[1:] = xs[1:] != xs[:-1]
        starts = np.nonzero(new_x)[0]
        pm = np.minimum.accumulate(ys)
        prev_min = np.full(len(starts), np.inf)
        prev_min[1:] = pm[starts[1:] - 1]
        gid = np.cumsum(new_x) - 1
        first_y = ys[starts][gid]
        keep_sorted = (ys < prev_min[gid]) & (ys == first_y)
        keep = np.zeros(len(x), dtype=bool)
        keep[order[keep_sorted]] = True
        return batch.filter(pa.array(keep))

    return (tables.docs_geo(sf_dir)
            .map_batches(local_skyline, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(local_skyline, batch_format="pyarrow",
                         zero_copy_batch=True))


def _q_tile_chars_median(sf_dir: str):
    """GROUPED exact quantiles: per-tile median of ``n_chars`` via the
    value-histogram method (the grouped sibling of chars_quantiles):
    per-batch (cell, value, count) combine -> groupby(cell, value)
    Sum -> per-cell order statistics over the AGGREGATED histogram
    rows (bounded by distinct values per cell, not docs).  Median
    interpolation is the same explicit float op pair the global gate
    mirrors in SQL."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .cells import cell_id as cell_of
    from .sources import tables

    docs = tables.docs_geo(sf_dir, extra_columns=("n_chars",))

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        cell = cell_of(x, y, TOP_LANG_RES)
        v = batch.column("n_chars").to_numpy(zero_copy_only=False)
        # 40-bit value lane: cell < 4**TOP_LANG_RES = 256, so the
        # packed key stays < 2**48.  A 20-bit lane silently bled
        # million-char documents into the NEXT cell's histogram; now
        # absurd inputs fail loudly instead of mis-aggregating.
        if len(v) and int(v.max()) >= 1 << 40:
            raise ValueError("n_chars >= 2**40 cannot be packed")
        key = cell * np.int64(1 << 40) + v
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cell_id": pa.array(uniq >> np.int64(40)),
            "v": pa.array(uniq & np.int64((1 << 40) - 1)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    hist = (docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby(["cell_id", "v"]).aggregate(Sum("c", alias_name="c")))

    def median_of_cell(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("v")
        cum = df["c"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = df["v"].to_numpy()

        def kth(k: int) -> int:
            return int(vals[np.searchsorted(cum, k)])

        lo, hi = kth((n + 1) // 2), kth((n + 2) // 2)
        med = (np.float64(lo) + np.float64(hi)) / np.float64(2.0)
        return pd.DataFrame({"cell_id": [int(df["cell_id"].iloc[0])],
                             "n_docs": [n], "median_chars": [float(med)]})

    return hist.groupby("cell_id").map_groups(median_of_cell,
                                              batch_format="pandas")


def _q_flagship_spans(sf_dir: str):
    from .pipelines import flagship

    out = flagship.flagship(sf_dir=sf_dir, n_docs=1000)
    return out.select_columns(
        ["doc_id", "cell_id", "zone_id", "rnk", "d2", "in_zone"])


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline on sf0.001 (driver smoke check)."""
    from .pipelines import flagship

    return flagship.flagship(sf_dir="/root/testdata/sf0.001", n_docs=2000)


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDERING CONTRACT (VERDICT r3 #3 / r4 #2): the driver's
    # correctness gate checks only the FIRST 50 entries.  Round-5
    # rotation: all 32 gates that had never had a driver row (tile
    # rollups, events windows, media stubs, shuffle twins, TPC-H
    # breadth) are promoted into the window; 18 representatives stay
    # (one per engine path plus every round-4 first-time promotion so
    # each keeps a fresh driver row; the new ngram_jaccard gate takes
    # tile_assign's slot — tile_assign is green since round 1 and its
    # engine path is covered by the in-window tile rollups).  The 33
    # demoted gates carry driver-green rows from rounds 1-4; ALL 83
    # still run in tools/check_correctness.py at both scales.
    return {
        # --- driver window (first 50): round-5 promotions ----------
        "tile_pyramid": _q_tile_pyramid,
        "tile_top_lang": _q_tile_top_lang,
        "tile_chars_median": _q_tile_chars_median,
        "morton_rank": _q_morton_rank,
        "hilbert_order": _q_hilbert_order,
        "zone_contains_doc_shuffle": _q_zone_contains_doc_shuffle,
        "knn_zones_shuffle": _q_knn_zones_shuffle,
        "token_count_bpe": _q_token_count_bpe,
        "source_stats": _q_source_stats,
        "sample_docs": _q_sample_docs,
        "knn_label_accuracy": _q_knn_label_accuracy,
        "label_centroids": _q_label_centroids,
        "embed_dup_pairs": _q_embed_dup_pairs,
        "media_features": _q_media_features,
        "media_resize": _q_media_resize,
        "media_frames": _q_media_frames,
        "knn_docs_self": _q_knn_docs_self,
        "span_stats": _q_span_stats,
        "span_texts": _q_span_texts,
        "sample_per_tile": _q_sample_per_tile,
        "chars_quantiles": _q_chars_quantiles,
        "spatial_clusters": _q_spatial_clusters,
        "knn_outliers": _q_knn_outliers,
        "idw_interpolate": _q_idw_interpolate,
        "tile_smooth": _q_tile_smooth,
        "events_hourly": _q_events_hourly,
        "events_sessionize": _q_events_sessionize,
        "events_sliding": _q_events_sliding,
        "customer_orders": _q_customer_orders,
        "lineitem_pricing": _q_lineitem_pricing,
        "priority_revenue": _q_priority_revenue,
        "tile_index_stats": _q_tile_index_stats,
        # --- driver window: retained engine-path representatives ---
        "knn_zones": _q_knn_zones,
        "pip_docs": _q_pip_docs,
        "flagship_spans": _q_flagship_spans,
        "dedup_exact": _q_dedup_exact,
        "simhash_pairs": _q_simhash_pairs,
        "minhash_pairs": _q_minhash_pairs,
        "ngram_jaccard": _q_ngram_jaccard,
        "ann_cosine": _q_ann_cosine,
        "dbscan": _q_dbscan,
        "embed_dup_components": _q_embed_dup_components,
        "embed_dup_pairs_lsh": _q_embed_dup_pairs_lsh,
        "ann_ivf": _q_ann_ivf,
        "ann_lsh": _q_ann_lsh,
        "span_dedup": _q_span_dedup,
        "events_asof": _q_events_asof,
        "events_range_join": _q_events_range_join,
        "zonal_stats": _q_zonal_stats,
        "within_dist_pairs": _q_within_dist_pairs,
        # ------- end of the driver's 50-entry window -------
        # driver-green rows on file from rounds 1-4:
        "tile_assign": _q_tile_assign,
        "tile_counts": _q_tile_counts,
        "hilbert_rank": _q_hilbert_rank,
        "zone_contains_doc": _q_zone_contains_doc,
        "docs_outside_zones": _q_docs_outside_zones,
        "docs_near_zones": _q_docs_near_zones,
        "docs_near_segments": _q_docs_near_segments,
        "zone_overlap_pairs": _q_zone_overlap_pairs,
        "seg_intersections": _q_seg_intersections,
        "zone_seg_overlap": _q_zone_seg_overlap,
        "reverse_knn": _q_reverse_knn,
        "zone_knn_segments": _q_zone_knn_segments,
        "morans_i": _q_morans_i,
        "hotspot_gi": _q_hotspot_gi,
        "ripley_k": _q_ripley_k,
        "skyline_docs": _q_skyline_docs,
        "find_box_docs": _q_find_box_docs,
        "zone_subsets": _q_zone_subsets,
        "zone_supersets": _q_zone_supersets,
        "nearest_zone": _q_nearest_zone,
        "knn_docs": _q_knn_docs,
        "nearest_doc": _q_nearest_doc,
        "snap_to_segment": _q_snap_to_segment,
        "knn_segments_to_point": _q_knn_segments_to_point,
        "seg_seg_knn": _q_seg_seg_knn,
        "zone_bounds": _q_zone_bounds,
        "token_count": _q_token_count,
        "top_tokens": _q_top_tokens,
        "text_stats": _q_text_stats,
        "lang_id": _q_lang_id,
        "corpus_clean": _q_corpus_clean,
        "simhash_docs": _q_simhash,
        "fingerprint_docs": _q_fingerprint,
    }


def _dedup_mod():
    from .stages import dedup

    return dedup


def oracle_sql() -> dict[str, str]:
    from . import oracles
    from .stages import pip as pip_mod
    from .stages.text import _LANG_PROFILES

    docs = derive.sql_docs_geo()
    zones = derive.sql_zones()
    segs = derive.sql_segments()
    qp = workload.sql_query_points()
    qb = workload.sql_query_boxes()
    polys = pip_mod.polygon_payload(np.arange(25, dtype=np.int64))["polygons"]

    knn_zones_sql = f"""
    WITH d AS ({docs}), z AS ({zones}),
    scored AS (SELECT d.doc_id, z.zone_id, {_BOX_D2} AS d2 FROM d CROSS JOIN z),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d2, zone_id) AS rnk
               FROM scored)
    SELECT doc_id, zone_id, rnk, d2 FROM ranked WHERE rnk <= {workload.K_ZONES}
    """

    contains_sql = f"""
    WITH d AS ({docs}), z AS ({zones})
    SELECT d.doc_id, z.zone_id FROM d JOIN z
    ON d.x >= z.min_x AND d.x <= z.max_x AND d.y >= z.min_y AND d.y <= z.max_y
    """

    return {
        "tile_assign": f"""
            WITH g AS ({_sql_grid()})
            SELECT doc_id, x, y, ix, iy, (ix // {_SHIFT_DIV}) * {_AXIS} + (iy // {_SHIFT_DIV}) AS cell_id
            FROM g
        """,
        "tile_counts": f"""
            WITH g AS ({_sql_grid()})
            SELECT (ix // {_SHIFT_DIV}) * {_AXIS} + (iy // {_SHIFT_DIV}) AS cell_id,
                   COUNT(*) AS n_docs
            FROM g GROUP BY 1
        """,
        "zone_contains_doc": contains_sql,
        "zone_contains_doc_shuffle": contains_sql,
        "docs_outside_zones": f"""
            WITH d AS ({docs}), z AS ({zones})
            SELECT d.doc_id FROM d WHERE NOT EXISTS (
              SELECT 1 FROM z
              WHERE d.x >= z.min_x AND d.x <= z.max_x
                AND d.y >= z.min_y AND d.y <= z.max_y)
        """,
        "zone_overlap_pairs": f"""
            WITH z AS ({zones})
            SELECT a.zone_id AS id_a, b.zone_id AS id_b
            FROM z a JOIN z b ON a.zone_id < b.zone_id
            WHERE a.min_x < b.max_x AND b.min_x < a.max_x
              AND a.min_y < b.max_y AND b.min_y < a.max_y
        """,
        "docs_near_zones": f"""
            WITH d AS ({docs}), z AS ({zones})
            SELECT d.doc_id, z.zone_id, {_BOX_D2} AS d2
            FROM d, z
            WHERE {_BOX_D2} <= {derive.F(workload.NEAR_ZONE_RADIUS ** 2)}
        """,
        "docs_near_segments": f"""
            WITH d AS ({docs}), s AS ({segs})
            SELECT d.doc_id, s.segment_id,
                   {_p2s('d.x', 'd.y', 's.start_x', 's.start_y',
                         's.end_x', 's.end_y')} AS d2
            FROM d, s
            WHERE {_p2s('d.x', 'd.y', 's.start_x', 's.start_y',
                        's.end_x', 's.end_y')}
                  <= {derive.F(NEAR_SEG_RADIUS ** 2)}
        """,
        "seg_intersections": f"""
            WITH s AS ({segs})
            SELECT a.segment_id AS id_a, b.segment_id AS id_b
            FROM s a JOIN s b ON a.segment_id < b.segment_id
            WHERE {_sql_seg_intersects(
                'a.start_x', 'a.start_y', 'a.end_x', 'a.end_y',
                'b.start_x', 'b.start_y', 'b.end_x', 'b.end_y')}
        """,
        "zone_seg_overlap": f"""
            WITH z AS ({zones}), s AS ({segs})
            SELECT z.zone_id, s.segment_id
            FROM z, s
            WHERE {_sql_box_seg_intersects('z', 's')}
        """,
        "zone_knn_segments": f"""
            WITH s AS ({segs}),
            scored AS (SELECT qb.query_id, s.segment_id,
                              {_sql_box_seg_d2('qb', 's').replace(
                                  'qb.min_x', 'qb.qmin_x').replace(
                                  'qb.max_x', 'qb.qmax_x').replace(
                                  'qb.min_y', 'qb.qmin_y').replace(
                                  'qb.max_y', 'qb.qmax_y')} AS d2
                       FROM {workload.sql_query_boxes()}, s),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                               ORDER BY d2, segment_id) AS rnk
                  FROM scored)
            SELECT query_id, segment_id, rnk, d2 FROM r
            WHERE rnk <= {K_BOX_SEGMENTS}
        """,
        "morans_i": f"""
            WITH g AS ({docs}),
            d AS (SELECT g.doc_id, g.x, g.y, doc.n_chars
                  FROM g JOIN documents doc USING (doc_id)),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(n_chars) AS BIGINT) AS sv FROM d),
            p AS (SELECT a.n_chars AS va, b.n_chars AS vb
                  FROM d a JOIN d b ON a.doc_id < b.doc_id
                  WHERE (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)
                        <= {derive.F(MORAN_EPS * MORAN_EPS)}),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                           CAST(SUM((s.n * va - s.sv) * (s.n * vb - s.sv)) AS BIGINT) AS num
                    FROM p, s),
            dn AS (SELECT CAST(SUM((s.n * n_chars - s.sv) * (s.n * n_chars - s.sv)) AS BIGINT) AS den
                   FROM d, s)
            SELECT s.n, agg.n_pairs, agg.num, dn.den,
                   (CAST(s.n AS DOUBLE) * CAST(agg.num AS DOUBLE))
                   / (CAST(agg.n_pairs AS DOUBLE) * CAST(dn.den AS DOUBLE)) AS moran_i
            FROM s, agg, dn
        """,
        "ripley_k": f"""
            WITH d AS ({docs}),
            p AS (SELECT (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) AS d2
                  FROM d a JOIN d b ON a.doc_id < b.doc_id),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
            r AS ({" UNION ALL ".join(
                f"SELECT {derive.F(r)} AS r, {derive.F(r * r)} AS r2"
                for r in RIPLEY_RADII)})
            SELECT r.r,
                   CAST(SUM(CASE WHEN p.d2 <= r.r2 THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
                   ({derive.F(WORLD_AREA)}
                    * CAST(2 * SUM(CASE WHEN p.d2 <= r.r2 THEN 1 ELSE 0 END) AS DOUBLE))
                   / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)) AS k_est
            FROM r CROSS JOIN p CROSS JOIN n
            GROUP BY r.r, n.n
        """,
        "hotspot_gi": f"""
            WITH g AS ({docs}),
            d AS (SELECT g.doc_id, g.x, g.y, doc.n_chars
                  FROM g JOIN documents doc USING (doc_id)),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(n_chars) AS BIGINT) AS s1,
                         CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2 FROM d),
            p AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                         a.n_chars AS va, b.n_chars AS vb
                  FROM d a JOIN d b ON a.doc_id < b.doc_id
                  WHERE (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)
                        <= {derive.F(MORAN_EPS * MORAN_EPS)}),
            contrib AS (SELECT ia AS doc_id, vb AS v FROM p
                        UNION ALL SELECT ib, va FROM p
                        UNION ALL SELECT doc_id, n_chars FROM d),
            w AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS w_i,
                         CAST(SUM(v) AS BIGINT) AS sumw
                  FROM contrib GROUP BY doc_id),
            z AS (SELECT doc_id, w_i, sumw,
                   (CAST(sumw AS DOUBLE)
                    - (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE)) * CAST(w_i AS DOUBLE))
                     AS num,
                   (sqrt(CAST(s.s2 AS DOUBLE) / CAST(s.n AS DOUBLE)
                           - (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                             * (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE)))
                      * sqrt((CAST(s.n AS DOUBLE) * CAST(w_i AS DOUBLE)
                              - CAST(w_i AS DOUBLE) * CAST(w_i AS DOUBLE))
                             / (CAST(s.n AS DOUBLE) - 1.0e0))) AS denom
                  FROM w, s)
            -- degenerate rows (denom 0/NULL) skipped, mirroring the
            -- engine's denom > 0 filter (ADVICE r3 #2)
            SELECT doc_id, w_i, sumw, num / denom AS gi_z
            FROM z WHERE denom > 0.0e0
        """,
        "skyline_docs": f"""
            WITH d AS ({docs})
            SELECT a.doc_id, a.x, a.y FROM d a
            WHERE NOT EXISTS (
              SELECT 1 FROM d b
              WHERE b.x <= a.x AND b.y <= a.y
                AND (b.x < a.x OR b.y < a.y))
        """,
        "reverse_knn": f"""
            WITH d AS ({docs}),
            scored AS (SELECT a.doc_id, b.doc_id AS neighbor_id,
                       (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) AS d2
                       FROM d a CROSS JOIN d b),
            ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d2, neighbor_id) AS rnk
                       FROM scored)
            SELECT neighbor_id AS target_id, doc_id, rnk, d2
            FROM ranked
            WHERE rnk <= 3 AND neighbor_id % {workload.RKNN_TARGET_MOD} = 0
              AND neighbor_id <> doc_id
        """,
        "tile_pyramid": f"""
            WITH g AS ({_sql_grid()})
            SELECT CAST(lvl AS BIGINT) AS level, cell_id,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM (
              {" UNION ALL ".join(
                  f"SELECT {lvl} AS lvl, (ix // {1 << (16 - lvl)}) * {1 << lvl}"
                  f" + (iy // {1 << (16 - lvl)}) AS cell_id FROM g"
                  for lvl in PYRAMID_LEVELS)}
            ) GROUP BY 1, 2
        """,
        "tile_top_lang": f"""
            WITH g AS ({_sql_grid()}),
            t AS (SELECT (g.ix // {1 << (16 - TOP_LANG_RES)}) * {1 << TOP_LANG_RES}
                         + (g.iy // {1 << (16 - TOP_LANG_RES)}) AS cell_id, doc.lang
                  FROM g JOIN documents doc USING (doc_id)),
            c AS (SELECT cell_id, lang, CAST(COUNT(*) AS BIGINT) AS n
                  FROM t GROUP BY 1, 2),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cell_id
                                               ORDER BY n DESC, lang) AS rk
                  FROM c)
            SELECT cell_id, lang AS top_lang, n AS n_docs FROM r WHERE rk = 1
        """,
        "tile_chars_median": f"""
            WITH g AS ({_sql_grid()}),
            t AS (SELECT (g.ix // {1 << (16 - TOP_LANG_RES)}) * {1 << TOP_LANG_RES}
                         + (g.iy // {1 << (16 - TOP_LANG_RES)}) AS cell_id,
                         doc.n_chars
                  FROM g JOIN documents doc USING (doc_id)),
            o AS (SELECT cell_id, n_chars,
                         ROW_NUMBER() OVER (PARTITION BY cell_id
                                            ORDER BY n_chars) AS rn,
                         COUNT(*) OVER (PARTITION BY cell_id) AS n
                  FROM t)
            SELECT cell_id, CAST(MAX(n) AS BIGINT) AS n_docs,
                   (CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS DOUBLE)
                    + CAST(MIN(CASE WHEN rn = (n + 2) // 2 THEN n_chars END) AS DOUBLE))
                   / 2.0e0 AS median_chars
            FROM o GROUP BY cell_id
        """,
        "hilbert_rank": oracles.hilbert_rank_sql(_sql_grid()),
        "hilbert_order": f"""
            SELECT doc_id, hilbert_key
            FROM ({oracles.hilbert_rank_sql(_sql_grid())})
            ORDER BY hilbert_key, doc_id LIMIT 100
        """,
        "morton_rank": f"""
            WITH g AS ({_sql_grid()})
            SELECT doc_id, CAST({" + ".join(
                f"(((ix >> {j}) & 1) * {1 << (2 * j + 1)})"
                f" + (((iy >> {j}) & 1) * {1 << (2 * j)})"
                for j in range(16))} AS BIGINT) AS morton_key
            FROM g
        """,
        "pip_docs": oracles.pip_docs_sql(docs, polys),
        "zonal_stats": f"""
            SELECT p.polygon_id, COUNT(*) AS n_docs,
                   CAST(SUM(doc.n_chars) AS BIGINT) AS sum_chars
            FROM ({oracles.pip_docs_sql(docs, polys)}) p
            JOIN documents doc ON p.doc_id = doc.doc_id
            GROUP BY p.polygon_id
        """,
        "lang_id": oracles.lang_id_sql(_LANG_PROFILES),
        "corpus_clean": oracles.corpus_clean_sql(_LANG_PROFILES),
        "sample_docs": """
            SELECT doc_id FROM documents
            WHERE ((doc_id % 1000003) * (2654435761 % 1000003)) % 1000003 < 100000
        """,
        "source_stats": """
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
            FROM documents GROUP BY source
        """,
        "flagship_spans": oracles.flagship_spans_sql(n_docs=1000, k=3),
        "span_stats": oracles.span_stats_sql(_SPAN_DOCS),
        "span_texts": oracles.span_texts_sql(_SPAN_DOCS),
        "span_dedup": oracles.span_dedup_sql(_SPAN_DOCS),
        "sample_per_tile": f"""
            WITH g AS ({_sql_grid()}),
            t AS (SELECT doc_id,
                         (ix // {_SHIFT_DIV}) * {_AXIS} + (iy // {_SHIFT_DIV}) AS cell_id,
                         ((doc_id % 1000003) * (2654435761 % 1000003)) % 1000003 AS h
                  FROM g),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cell_id ORDER BY h, doc_id) AS rnk
                  FROM t)
            SELECT cell_id, doc_id FROM r WHERE rnk <= {_STRATUM_K}
        """,
        "chars_quantiles": """
            WITH o AS (SELECT n_chars,
                              ROW_NUMBER() OVER (ORDER BY n_chars) AS rn,
                              COUNT(*) OVER () AS n
                       FROM documents)
            SELECT CAST(MAX(n) AS BIGINT) AS n,
                   (CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS DOUBLE)
                    + CAST(MIN(CASE WHEN rn = (n + 2) // 2 THEN n_chars END) AS DOUBLE))
                   / 2.0e0 AS median_chars,
                   CAST(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS BIGINT) AS p90_chars
            FROM o
        """,
        "tile_index_stats": oracles.tile_index_stats_sql(res=4, max_children=16),
        "embed_dup_pairs": oracles.embed_dup_pairs_sql(workload.EMBED_DUP_THRESHOLD),
        "embed_dup_pairs_lsh": oracles.embed_dup_pairs_lsh_sql(
            workload.EMBED_DUP_THRESHOLD),
        "embed_dup_components": oracles.embed_dup_components_sql(
            workload.EMBED_DUP_THRESHOLD),
        "media_features": oracles.media_features_sql(n_docs=500, dim=16),
        "media_resize": oracles.media_resize_sql(n_docs=500),
        "media_frames": oracles.media_frames_sql(n_docs=500),
        "simhash_docs": oracles.simhash_sql(),
        "simhash_pairs": oracles.simhash_dup_pairs_sql(max_hamming=3),
        "fingerprint_docs": oracles.fingerprint_sql(window=8),
        "minhash_pairs": oracles.minhash_pairs_sql(_dedup_mod()._MH_A,
                                                   _dedup_mod()._MH_B),
        "ngram_jaccard": oracles.ngram_jaccard_sql(_dedup_mod()._MH_A,
                                                   _dedup_mod()._MH_B),
        "ann_lsh": oracles.ann_lsh_sql(workload.ANN_QUERY_IDS, workload.ANN_K),
        "ann_ivf": oracles.ann_ivf_sql(workload.ANN_QUERY_IDS, workload.ANN_K),
        "within_dist_pairs": f"""
            WITH d AS ({docs})
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) AS d2
            FROM d a JOIN d b ON a.doc_id < b.doc_id
            WHERE (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)
                  <= {derive.F(0.25)}
        """,
        "spatial_clusters": f"""
            WITH RECURSIVE d AS ({docs}),
            p AS (
              SELECT a.doc_id AS va, b.doc_id AS vb
              FROM d a JOIN d b ON a.doc_id < b.doc_id
              WHERE (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)
                    <= {derive.F(CLUSTER_EPS * CLUSTER_EPS)}
            ),
            e AS (SELECT va AS a, vb AS b FROM p UNION ALL SELECT vb, va FROM p),
            cc(node, lab) AS (
              SELECT DISTINCT a, a FROM e
              UNION
              SELECT e.b, cc.lab FROM cc JOIN e ON e.a = cc.node
            )
            SELECT node AS doc_id, MIN(lab) AS cluster FROM cc GROUP BY node
        """,
        "dbscan": f"""
            WITH RECURSIVE d AS ({docs}),
            p AS (SELECT a.doc_id AS va, b.doc_id AS vb
                  FROM d a JOIN d b ON a.doc_id < b.doc_id
                  WHERE (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)
                        <= {derive.F(CLUSTER_EPS * CLUSTER_EPS)}),
            e AS (SELECT va AS a, vb AS b FROM p UNION ALL SELECT vb, va FROM p),
            deg AS (SELECT a AS doc_id, CAST(COUNT(*) AS BIGINT) AS n
                    FROM e GROUP BY a),
            core AS (SELECT doc_id FROM deg WHERE n >= {DBSCAN_MIN_PTS}),
            ce AS (SELECT e.a, e.b FROM e
                   JOIN core ca ON e.a = ca.doc_id
                   JOIN core cb ON e.b = cb.doc_id),
            cc(node, lab) AS (
              SELECT doc_id, doc_id FROM core
              UNION
              SELECT ce.b, cc.lab FROM cc JOIN ce ON ce.a = cc.node
            ),
            corelab AS (SELECT node AS doc_id, MIN(lab) AS cluster
                        FROM cc GROUP BY node),
            border AS (SELECT e.a AS doc_id, MIN(cl.cluster) AS cluster
                       FROM e JOIN corelab cl ON e.b = cl.doc_id
                       WHERE e.a NOT IN (SELECT doc_id FROM core)
                       GROUP BY e.a)
            SELECT doc_id, cluster, CAST(0 AS BIGINT) AS role FROM corelab
            UNION ALL
            SELECT doc_id, cluster, CAST(1 AS BIGINT) AS role FROM border
        """,
        "knn_outliers": f"""
            WITH d AS ({docs}),
            scored AS (SELECT a.doc_id, b.doc_id AS neighbor_id,
                       (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) AS d2
                       FROM d a CROSS JOIN d b),
            ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d2, neighbor_id) AS rnk
                       FROM scored)
            SELECT doc_id, d2 AS d2_k,
                   CAST(d2 > {derive.F(OUTLIER_D2)} AS BIGINT) AS outlier
            FROM ranked WHERE rnk = 3
        """,
        "idw_interpolate": f"""
            WITH d AS ({docs}),
            scored AS (SELECT qp.query_id, d.doc_id,
                       (d.x - qp.qx) * (d.x - qp.qx) + (d.y - qp.qy) * (d.y - qp.qy) AS d2
                       FROM d CROSS JOIN {qp}),
            ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, doc_id) AS rnk
                       FROM scored),
            w AS (SELECT query_id,
                         CAST(FLOOR({derive.F(IDW_SCALE)} / ({derive.F(1.0)} + d2) + {derive.F(0.5)}) AS BIGINT) AS wq,
                         doc_id % {IDW_VALUE_MOD} AS m
                  FROM ranked WHERE rnk <= {workload.K_DOCS})
            SELECT query_id,
                   CAST(SUM(wq * m) AS DOUBLE) / CAST(SUM(wq) AS DOUBLE) AS idw_value,
                   CAST(SUM(wq) AS BIGINT) AS wsum
            FROM w GROUP BY query_id
        """,
        "tile_smooth": f"""
            WITH g AS ({_sql_grid()}),
            t AS (SELECT (ix // {_SHIFT_DIV}) * {_AXIS} + (iy // {_SHIFT_DIV}) AS cell_id,
                         COUNT(*) AS n_docs
                  FROM g GROUP BY 1),
            c AS (SELECT cell_id // {_AXIS} AS cx, cell_id % {_AXIS} AS cy, n_docs FROM t),
            o AS (SELECT dx - 1 AS dx, dy - 1 AS dy
                  FROM range(3) r1(dx) CROSS JOIN range(3) r2(dy))
            SELECT (c.cx + o.dx) * {_AXIS} + (c.cy + o.dy) AS cell_id,
                   CAST(SUM(c.n_docs) AS BIGINT) AS n_smooth
            FROM c CROSS JOIN o
            WHERE c.cx + o.dx BETWEEN 0 AND {_AXIS - 1}
              AND c.cy + o.dy BETWEEN 0 AND {_AXIS - 1}
            GROUP BY 1
        """,
        "find_box_docs": f"""
            WITH d AS ({docs})
            SELECT qb.query_id, d.doc_id FROM d CROSS JOIN {qb}
            WHERE d.x >= qb.qmin_x AND d.x <= qb.qmax_x
              AND d.y >= qb.qmin_y AND d.y <= qb.qmax_y
        """,
        "zone_subsets": f"""
            WITH z AS ({zones})
            SELECT qb.query_id, z.zone_id FROM z CROSS JOIN {qb}
            WHERE z.min_x >= qb.qmin_x AND z.max_x <= qb.qmax_x
              AND z.min_y >= qb.qmin_y AND z.max_y <= qb.qmax_y
        """,
        "zone_supersets": f"""
            WITH z AS ({zones})
            SELECT qb.query_id, z.zone_id FROM z CROSS JOIN {qb}
            WHERE qb.qmin_x >= z.min_x AND qb.qmax_x <= z.max_x
              AND qb.qmin_y >= z.min_y AND qb.qmax_y <= z.max_y
        """,
        "knn_zones": knn_zones_sql,
        "knn_zones_shuffle": knn_zones_sql,
        "nearest_zone": f"""
            WITH d AS ({docs}), z AS ({zones}),
            scored AS (SELECT d.doc_id, z.zone_id, {_BOX_D2} AS d2 FROM d CROSS JOIN z),
            ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d2, zone_id) AS rnk
                       FROM scored)
            SELECT doc_id, zone_id, d2 FROM ranked WHERE rnk = 1
        """,
        "knn_docs": f"""
            WITH d AS ({docs}),
            scored AS (SELECT qp.query_id, d.doc_id,
                       (d.x - qp.qx) * (d.x - qp.qx) + (d.y - qp.qy) * (d.y - qp.qy) AS d2
                       FROM d CROSS JOIN {qp}),
            ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, doc_id) AS rnk
                       FROM scored)
            SELECT query_id, doc_id, rnk, d2 FROM ranked WHERE rnk <= {workload.K_DOCS}
        """,
        "nearest_doc": f"""
            WITH d AS ({docs}),
            scored AS (SELECT qp.query_id, d.doc_id,
                       (d.x - qp.qx) * (d.x - qp.qx) + (d.y - qp.qy) * (d.y - qp.qy) AS d2
                       FROM d CROSS JOIN {qp}),
            ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, doc_id) AS rnk
                       FROM scored)
            SELECT query_id, doc_id, d2 FROM ranked WHERE rnk = 1
        """,
        "snap_to_segment": f"""
            WITH d AS ({docs}), s AS ({segs}),
            scored AS (SELECT d.doc_id, s.segment_id, {_seg_point_d2('d.x', 'd.y')} AS d2
                       FROM d CROSS JOIN s),
            ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d2, segment_id) AS rnk
                       FROM scored)
            SELECT doc_id, segment_id, d2 FROM ranked WHERE rnk = 1
        """,
        "knn_segments_to_point": f"""
            WITH s AS ({segs}),
            scored AS (SELECT qp.query_id, s.segment_id, {_seg_point_d2('qp.qx', 'qp.qy')} AS d2
                       FROM s CROSS JOIN {qp}),
            ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, segment_id) AS rnk
                       FROM scored)
            SELECT query_id, segment_id, rnk, d2 FROM ranked WHERE rnk <= {workload.K_SEGMENTS}
        """,
        "seg_seg_knn": f"""
            WITH s0 AS ({segs}),
            scored AS (SELECT a.segment_id, b.segment_id AS neighbor_id,
                       {_segseg_d2('a', 'b')} AS d2
                       FROM s0 a CROSS JOIN s0 b
                       WHERE a.segment_id <> b.segment_id),
            ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY segment_id ORDER BY d2, neighbor_id) AS rnk
                       FROM scored)
            SELECT segment_id, neighbor_id, rnk, d2 FROM ranked WHERE rnk <= 2
        """,
        "zone_bounds": f"""
            WITH z AS ({zones})
            SELECT MIN(min_x) AS min_x, MAX(max_x) AS max_x,
                   MIN(min_y) AS min_y, MAX(max_y) AS max_y FROM z
        """,
        "token_count": """
            SELECT doc_id, LENGTH(string_split(text, ' ')) AS n_tokens FROM documents
        """,
        "token_count_bpe": r"""
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')) AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "top_tokens": """
            SELECT t.token, COUNT(*) AS n_occurrences
            FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents) t
            GROUP BY t.token
            ORDER BY n_occurrences DESC, t.token
            LIMIT 20
        """,
        "text_stats": """
            SELECT doc_id,
                   LENGTH(text) AS n_chars_calc,
                   LENGTH(string_split(text, ' ')) AS n_tokens,
                   CAST(LENGTH(text) - (LENGTH(string_split(text, ' ')) - 1) AS DOUBLE)
                     / CAST(LENGTH(string_split(text, ' ')) AS DOUBLE) AS mean_token_len,
                   LENGTH(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
            FROM documents
        """,
        # FNV content hash mirrored byte-for-byte (ASCII corpus:
        # codepoint == byte, same assumption as every sketch oracle)
        "dedup_exact": f"""
            WITH h AS (SELECT doc_id,
                              {oracles.u64_to_i64(oracles.fnv_sql('text'))}
                                AS content_hash
                       FROM documents)
            SELECT content_hash, MIN(doc_id) AS keep_id
            FROM h GROUP BY content_hash
        """,
        "ann_cosine": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                       WHERE vec_id IN ({', '.join(map(str, workload.ANN_QUERY_IDS))})),
            s AS (SELECT q.query_id, e.vec_id,
                  list_cosine_similarity(e.embedding, q.qe) AS c
                  FROM embeddings e CROSS JOIN q),
            r AS (SELECT query_id, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rnk
                  FROM s)
            SELECT query_id, vec_id, rnk FROM r WHERE rnk <= {workload.ANN_K}
        """,
        "label_centroids": f"""
            WITH eint AS (SELECT label,
                          list_transform(embedding, v ->
                            CAST(floor(CAST(v AS DOUBLE) * {float(1 << 20)}e0
                                       + 0.5e0) AS BIGINT)) AS ei
                          FROM embeddings),
            dims AS (SELECT CAST(unnest(range(1, {EMBED_DIM + 1})) AS INT) AS i)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dims.i AS BIGINT) AS dim,
                   CAST(SUM(ei[dims.i]) AS BIGINT) AS sum_q,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM eint CROSS JOIN dims GROUP BY 1, 2
        """,
        "knn_label_accuracy": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS tl
                       FROM embeddings WHERE vec_id % {LABEL_QUERY_MOD} = 0),
            s AS (SELECT q.query_id, q.tl, e.vec_id, e.label,
                         list_cosine_similarity(e.embedding, q.qe) AS c
                  FROM embeddings e CROSS JOIN q
                  WHERE e.vec_id <> q.query_id),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                               ORDER BY c DESC, vec_id) AS rnk
                  FROM s),
            v AS (SELECT query_id, tl, label, COUNT(*) AS n
                  FROM r WHERE rnk <= {LABEL_K} GROUP BY 1, 2, 3),
            w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                               ORDER BY n DESC, label) AS rk
                  FROM v)
            SELECT query_id, CAST(tl AS BIGINT) AS true_label,
                   CAST(label AS BIGINT) AS pred_label,
                   CAST(CASE WHEN label = tl THEN 1 ELSE 0 END AS BIGINT) AS correct
            FROM w WHERE rk = 1
        """,
        "events_hourly": """
            SELECT event_type, epoch_us(ts) // 3600000000 AS hour, COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "knn_docs_self": f"""
            WITH d AS ({docs}),
            scored AS (SELECT a.doc_id, b.doc_id AS neighbor_id,
                       (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) AS d2
                       FROM d a CROSS JOIN d b),
            ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d2, neighbor_id) AS rnk
                       FROM scored)
            SELECT doc_id, neighbor_id, rnk, d2 FROM ranked WHERE rnk <= 3
        """,
        "events_sessionize": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
            l AS (SELECT user_id, us,
                  CASE WHEN LAG(us) OVER w IS NULL
                         OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
            s AS (SELECT user_id, us,
                  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                  FROM l)
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   MIN(us) AS start_us, MAX(us) AS end_us
            FROM s GROUP BY user_id, session_id
        """,
        "customer_orders": """
            SELECT c.c_mktsegment, COUNT(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   COUNT(*) AS n_items,
                   CAST(SUM(CAST(FLOOR(l_quantity * 100.0e0 + 0.5e0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0e0 + 0.5e0) AS BIGINT)) AS BIGINT) AS sum_price_c
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "priority_revenue": """
            SELECT o.o_orderpriority,
                   COUNT(*) AS n_lineitems,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0e0 - l.l_discount) * 100.0e0 + 0.5e0) AS BIGINT)) AS BIGINT) AS revenue_c
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "events_asof": """
            WITH ordered AS (
                SELECT event_id, ts, event_type,
                       last_value(CASE WHEN event_type = 'click'
                                       THEN event_id END IGNORE NULLS)
                         OVER w AS matched_id,
                       last_value(CASE WHEN event_type = 'click'
                                       THEN epoch_us(ts) END IGNORE NULLS)
                         OVER w AS m_us
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING))
            SELECT event_id, matched_id,
                   CAST(epoch_us(ts) - m_us AS BIGINT) AS gap_us
            FROM ordered
            WHERE event_type = 'purchase' AND matched_id IS NOT NULL
        """,
        "events_range_join": """
            SELECT p.event_id AS probe_id, v.event_id AS build_id,
                   CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS delta_us
            FROM events p JOIN events v
              ON p.user_id = v.user_id
             AND p.event_type = 'purchase' AND v.event_type = 'view'
             AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
        """,
        "events_sliding": """
            WITH e AS (SELECT event_type, epoch_us(ts) // 1800000000 AS k FROM events),
            w AS (SELECT event_type, (k - 1) * 1800000000 AS window_start FROM e
                  UNION ALL
                  SELECT event_type, k * 1800000000 AS window_start FROM e)
            SELECT event_type, window_start, COUNT(*) AS n_events
            FROM w GROUP BY event_type, window_start
        """,
    }
