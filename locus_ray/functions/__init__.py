"""Scalar-function registry — the engine's "functions" surface.

One flat namespace re-exporting every scalar predicate/metric kernel
(P1–P11), the exact-arithmetic refinements, the stable hashing
primitives, and the grid encoders — the building blocks users compose
inside their own ``map_batches`` UDFs.  All are vectorized numpy/Arrow
functions with documented, SQL-reproducible semantics; see each
function's docstring for the reference citation.
"""

from ..cells import cell_id, cell_of_grid, cover_boxes, grid_coords
from ..context import Context, get_context, register_context
from ..exact import (
    orientation,
    points_in_polygon_exact,
    segments_intersect_exact,
    segments_squared_distance_exact,
)
from ..hilbert import hilbert_index
from ..kernels import (
    box_is_subset,
    box_point_squared_distance,
    box_segment_intersects,
    box_segment_squared_distance,
    boxes_overlap,
    contains_point,
    merge_boxes,
    points_in_polygon,
    points_squared_distance,
    segment_point_squared_distance,
    segments_intersect,
    segments_squared_distance,
)
from ..stages.text import fnv1a_hashes, flat_token_hashes, hash_token

__all__ = [
    "Context", "get_context", "register_context",
    "contains_point", "boxes_overlap", "box_is_subset",
    "points_squared_distance", "box_point_squared_distance",
    "segment_point_squared_distance", "segments_squared_distance",
    "box_segment_squared_distance", "box_segment_intersects",
    "segments_intersect",
    "points_in_polygon", "merge_boxes",
    "orientation", "points_in_polygon_exact", "segments_intersect_exact",
    "segments_squared_distance_exact",
    "hilbert_index", "grid_coords", "cell_of_grid", "cell_id", "cover_boxes",
    "hash_token", "fnv1a_hashes", "flat_token_hashes",
]
