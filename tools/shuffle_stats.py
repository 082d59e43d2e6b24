"""Print Ray Data per-stage stats for the SHUFFLE joins.

Like tools/stage_stats.py but for the grouped-exchange paths
(contain_join_shuffle / knn_join_partitioned): the goal is to read
the exchange's output bytes and wall share so byte-diet work targets
the measured bottleneck, not a guess.

Usage: python tools/shuffle_stats.py [n_docs] [ncpus] [contain|knn]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_docs: int, ncpus: int, stage: str = "contain") -> None:
    import time

    import ray

    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from bench import ensure_corpus
    from locus_ray.sources import tables
    from locus_ray.stages import partitioned

    corpus = ensure_corpus(n_docs)
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # defaults MATCH the bench rungs (contain salts at 200k, kNN at
    # 25k — bench.py q5/q6): profiling a threshold the bench no longer
    # runs aims straggler work at the wrong bottleneck
    hot_contain = int(os.environ.get("HOT_THRESHOLD", "200000"))
    hot_knn = int(os.environ.get("HOT_THRESHOLD", "25000"))
    docs = rd.read_parquet(corpus, columns=["doc_key", "x", "y"])
    zones = tables.zones_ds(sf_dir)
    if stage == "knn":
        # prebuild UNTIMED like bench does — the broadcast GridKnn is
        # built once for the life of the corpus
        from locus_ray.stages import spatial

        payload = tables.zones_payload(sf_dir)
        t_b = time.time()
        ref = ray.put(spatial.prebuilt_knn_index(payload, "box", 8))
        print(f"[driver] prebuild+put: {time.time() - t_b:.2f}s (untimed)")
    t0 = time.time()
    if stage == "contain":
        out = partitioned.contain_join_partitioned(
            docs, zones, res=8, num_partitions=max(16, ncpus),
            hot_threshold=hot_knn, carry=("doc_key",))
    elif stage == "knn":
        out = partitioned.knn_join_partitioned(
            docs, zones, payload, k=3, res=8,
            num_partitions=max(16, ncpus), hot_threshold=hot_contain,
            carry=("doc_key",), prebuilt_ref=ref)
    else:
        raise SystemExit(f"unknown stage {stage!r} (contain | knn)")
    mat = out.materialize()
    print(f"[driver] wall: {time.time() - t0:.2f}s rows: {mat.count()}")
    print(mat.stats())
    ray.shutdown()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    s = sys.argv[3] if len(sys.argv) > 3 else "contain"
    main(n, c, s)
