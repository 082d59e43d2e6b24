"""Print Ray Data per-stage stats for the headline pipelines.

The perf feedback loop: run a pipeline, read `ds.stats()` (wall/cpu/
output-size per operator), confirm the wall time is dominated by the
useful compute stage rather than reads/serialization.

Usage: python tools/stage_stats.py [n_docs] [ncpus] [zones|self]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_docs: int, ncpus: int, stage: str = "zones") -> None:
    import time

    import ray

    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import ray.data as rd

    from bench import ensure_corpus
    from locus_ray.sources import tables
    from locus_ray.stages import spatial

    corpus = ensure_corpus(n_docs)
    t0 = time.time()
    if stage == "zones":
        ref = ray.put(spatial.prebuilt_knn_index(
            tables.zones_payload(
                os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")),
            "box", 8))
        kind = "box"
        id_out = "zone_id"
    elif stage == "self":
        from locus_ray import derive

        keys = np.arange(min(n_docs, 1_000_000), dtype=np.int64)
        xx, yy = derive.doc_xy(keys)
        ref = ray.put(spatial.prebuilt_knn_index(
            {"ids": keys, "x": xx, "y": yy}, "point", 8))
        kind = "point"
        id_out = "neighbor_id"
    else:
        raise SystemExit(f"unknown stage {stage!r} (zones | self)")
    print(f"[driver] prebuild+put ({kind}): {time.time() - t0:.2f}s "
          "(one-time, amortizes over the corpus; untimed in bench)")
    docs = rd.read_parquet(corpus, columns=["doc_key", "x", "y"])
    if stage == "self":
        docs = docs.limit(1_000_000)
    out = docs.map_batches(
        spatial.KnnJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"build_ref": ref, "kind": kind, "res": 8,
                               "k": 3, "id_out": id_out, "carry": ("doc_key",)},
        concurrency=max(2, ncpus - 2), batch_size=2048 if kind == "box" else 4096,
    )
    mat = out.materialize()
    print(mat.stats())
    ray.shutdown()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    s = sys.argv[3] if len(sys.argv) > 3 else "zones"
    main(n, c, s)
