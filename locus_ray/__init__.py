"""locus_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch distributed re-expression of the query semantics of
``lycantropos/locus`` (reference at /root/reference, studied for
behavior only): kd-tree / R-tree / segmental-tree nearest, n_nearest,
box range, subset/superset containment queries — implemented as
``ray.data.Dataset`` pipelines (``map_batches`` over zero-copy Arrow,
actor pools for stateful per-partition indexes, hash/sort shuffles by
spatial cell id), plus the training-data operators a 100 TB pipeline
needs (dedup, ANN, text analysis, multimodal plumbing).

Nothing here ports the reference's pointer-based execution; the
reference is cited ``file:line`` in docstrings purely so semantics can
be checked for parity.
"""

__version__ = "0.1.0"
