"""Flagship pipeline: tile-assign + spatial joins over interleaved docs.

The end-to-end shape of the north star: a deterministic interleaved
text+media corpus (``doc_id: string``, ``spans: list<struct>``, geotag)
streams through

  cell-encode (``assign_tiles``) ->
  kNN join to the zone layer (broadcast GridKnn actor pool)
  with the containment refine FUSED into the kNN emit (``in_zone`` =
  closed containment of the doc in each ranked zone, derived from the
  box-point gap inside the same actor — no second join, zero extra
  shuffle bytes)

with ``spans`` carried untouched through every stage (the span-sequence
equality invariant; verified by tests/test_pipeline.py against
:func:`locus_ray.sources.synth.span_signature`).
"""

from __future__ import annotations

import numpy as np
import ray

from ..config import DEFAULT_CELL_RES
from ..sources import synth, tables
from ..stages import spatial


def flagship(sf_dir: str | None = None, n_docs: int = 2000, res: int = DEFAULT_CELL_RES,
             k: int = 3, concurrency=(1, 4), batch_size: int = 4096,
             docs=None):
    """Returns the flagship result Dataset:
    (doc_id, spans, cell_id, hilbert_key, zone_id, rnk, d2, in_zone) —
    one row per (doc, rank<=k) nearest zone with the fused containment
    flag, spans carried untouched."""
    if docs is None:
        docs = synth.interleaved_docs(n_docs)
    if sf_dir is not None:
        zones = tables.zones_payload(sf_dir)
    else:
        from .. import derive

        ids = np.arange(max(64, n_docs // 100), dtype=np.int64)
        mnx, mxx, mny, mxy = derive.zone_box(ids)
        zones = {"ids": ids, "min_x": mnx, "max_x": mxx, "min_y": mny, "max_y": mxy}
    ref = ray.put(zones)

    tiled = spatial.assign_tiles(docs, res=res)
    knn = tiled.map_batches(
        spatial.KnnJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={
            "build_ref": ref, "kind": "box", "res": res, "k": k,
            "carry": ("doc_id", "spans", "cell_id", "hilbert_key"),
            "id_out": "zone_id", "contains_out": "in_zone",
        },
        concurrency=concurrency, batch_size=batch_size,
    )
    return knn
