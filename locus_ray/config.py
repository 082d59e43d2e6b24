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


def actor_pool() -> tuple[int, int]:
    """Autoscaling actor-pool bounds for the gate/library pipelines.

    Defaults to (1, 4) — sized for the sf0.01 oracle runs, where larger
    fixed pools starve the fused read stage.  On a real cluster set
    ``LOCUS_RAY_POOL_MAX`` (e.g. to cores-2 per node); bench.py sizes
    its own pools explicitly.
    """
    import os

    return (1, int(os.environ.get("LOCUS_RAY_POOL_MAX", "4")))
