"""Engine-wide constants.

The grid mirrors the reference's Hilbert resolution: a 2^16 x 2^16
integer grid (locus/_core/hilbert.py:3-4 — SQUARE_SIZE = 2**16).
Coordinates are planar float64 (locus is planar/exact, not spherical);
the world box is fixed so tile ids are stable across runs and stages.
"""

from __future__ import annotations

GRID_BITS = 16
SQUARE_SIZE = 1 << GRID_BITS  # 65536
MAX_COORDINATE = SQUARE_SIZE - 1  # 65535

# Fixed planar world box for the document corpus (geotag domain).
WORLD_MIN_X = -180.0
WORLD_MAX_X = 180.0
WORLD_MIN_Y = -90.0
WORLD_MAX_Y = 90.0
WORLD_W = WORLD_MAX_X - WORLD_MIN_X  # 360.0
WORLD_H = WORLD_MAX_Y - WORLD_MIN_Y  # 180.0

# Default tiling resolution: cells per axis = 2**CELL_RES.  At res 8
# there are 65 536 cells over the world box; P95 cell stays well under
# a Ray block at bench scale, and a 10^12-doc corpus would bump this to
# 12-14 (the resolution is a per-pipeline knob, not a constant burned
# into data).
DEFAULT_CELL_RES = 8

# Packed R-tree fan-out; reference default is 16 (locus/r.py:37).
DEFAULT_MAX_CHILDREN = 16


def num_partitions_for(n_rows: int, rows_per_partition: int = 200_000,
                       min_partitions: int = 16,
                       max_partitions: int = 1 << 16) -> int:
    """Input-size-derived shuffle partition count (VERDICT r3 #1).

    A hard-coded partition count is a silent OOM at 100x scale: a
    ``groupby(pkey).map_groups`` group (or a hash-join partition)
    materializes rows/partitions rows at once, so the count must GROW
    with the input.  Rules, in priority order:

    - at least ``ceil(n_rows / rows_per_partition)`` so per-partition
      group / join-block materialization stays bounded at ANY corpus
      size (``rows_per_partition`` is the per-operator memory knob —
      kNN joins with candidate fan-out pass a smaller value than flat
      event streams);
    - at least the cluster CPU count (every core gets a partition);
    - at least ``min_partitions`` (=16, the former hard-coded default,
      so sandbox-scale gate plans are unchanged);
    - capped at ``max_partitions`` (shuffle-metadata sanity bound).

    Callers that already know the row count (parquet metadata —
    :func:`locus_ray.sources.tables.table_rows`) should pass it; the
    library stages fall back to ``ds.count()``, which is metadata-only
    for fresh reads but EXECUTES lineage for derived datasets — pass
    ``num_partitions`` explicitly in that case.
    """
    import ray

    cpus = 0
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 0))
    need = -(-int(n_rows) // rows_per_partition) if n_rows > 0 else 1
    return max(min_partitions, cpus, min(max_partitions, need))


def actor_pool() -> tuple[int, int]:
    """Autoscaling actor-pool bounds for the gate/library pipelines.

    Defaults to (1, 4) — sized for the sf0.01 oracle runs, where larger
    fixed pools starve the fused read stage.  On a real cluster set
    ``LOCUS_RAY_POOL_MAX`` (e.g. to cores-2 per node); bench.py sizes
    its own pools explicitly.
    """
    import os

    return (1, int(os.environ.get("LOCUS_RAY_POOL_MAX", "4")))
