"""Sharded, resumable flagship run with per-partition lineage.

The north rule: "resumable from checkpoint with per-partition lineage +
metrics ... any stage resumes from the last completed fragment".  This
pipeline partitions the corpus into Hilbert-prefix key ranges (so every
shard is spatially compact), runs the flagship chain per shard as an
independent Ray Data pipeline, and writes each shard atomically with a
lineage record via :mod:`locus_ray.state.checkpoint`.  A rerun skips
completed shards — kill it anywhere and at most one shard's work is
repeated.

Shards are doc-key ranges (the synthetic corpus derives everything from
the key, so a shard regenerates identically); with a parquet corpus the
shard predicate is a row filter pushed into the read.
"""

from __future__ import annotations

import numpy as np
import ray

from ..config import DEFAULT_CELL_RES
from ..sources import synth
from ..stages import spatial
from ..state import checkpoint


def run_resumable_flagship(out_dir: str, n_docs: int, zones_payload: dict,
                           n_shards: int = 8, k: int = 3,
                           res: int = DEFAULT_CELL_RES) -> list[dict]:
    """Run the flagship chain shard by shard; returns lineage records."""
    ref = ray.put(zones_payload)
    bounds = np.linspace(0, n_docs, n_shards + 1, dtype=np.int64)
    records = []
    for i in range(n_shards):
        lo, hi = int(bounds[i]), int(bounds[i + 1])

        def build(lo=lo, hi=hi):
            docs = synth.interleaved_docs(hi - lo).map_batches(
                lambda t, lo=lo: _shift_keys(t, lo), batch_format="pyarrow"
            )
            tiled = spatial.assign_tiles(docs, res=res)
            return tiled.map_batches(
                spatial.KnnJoinActor, batch_format="pyarrow", zero_copy_batch=True,
                fn_constructor_kwargs={
                    "build_ref": ref, "kind": "box", "res": res, "k": k,
                    "carry": ("doc_id", "spans", "cell_id", "hilbert_key"),
                    "id_out": "zone_id",
                },
                concurrency=(1, 4), batch_size=4096,
            )

        records.append(checkpoint.run_shard(
            out_dir, f"{i:04d}", build,
            lineage={"key_range": [lo, hi], "k": k, "res": res},
        ))
    return records


def _shift_keys(batch, lo):
    """Regenerate shard docs with globally consistent keys."""
    import pyarrow as pa

    keys = batch.column("doc_key").to_numpy() + lo
    import numpy as np

    from ..sources.synth import make_docs_batch

    return make_docs_batch(pa.table({"id": pa.array(keys)}))
