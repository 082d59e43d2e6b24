"""Per-partition spatial index structures (numpy-backed).

These mirror the reference's three trees (locus/kd.py, locus/r.py,
locus/segmental.py) as build-once/query-many state held inside Ray
actor-pool stages.  The batched join paths mostly refine candidates
with vectorized kernels; the trees give the single-query API parity
(nearest / n_nearest / find_box / find_subsets / find_supersets) and
sub-linear probes when a partition is large.
"""

from .kdtree import KDTree
from .rtree import PackedRTree
from .segtree import SegmentTree

__all__ = ["KDTree", "PackedRTree", "SegmentTree"]
