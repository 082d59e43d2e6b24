"""Driver-RSS smoke for the sharded verify paths (VERDICT r2 #1 done
criterion): run minhash LSH dedup over a ~1M-doc synthetic text corpus
and assert the DRIVER's resident set stays flat — the signature table
(~0.5 KB/doc, ~0.5 GB at 1M docs as a Python dict) must never be
concatenated on the driver or broadcast whole.

Usage: python tools/rss_smoke.py [n_docs] [num_cpus]
Prints one JSON line {"n_docs", "pairs", "rss_before_mb",
"rss_after_mb", "rss_growth_mb", "flat"}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # deterministic text corpus with planted near-dup clusters: every
    # 100th doc is a light mutation of its cluster head
    WORDS = ["alpha", "bravo", "carbon", "delta", "ember", "falcon",
             "granite", "harbor", "iris", "jolt", "krypton", "lattice",
             "meadow", "nimbus", "onyx", "prism"]

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        cl = ids // 100
        uniq, inv = np.unique(cl, return_inverse=True)
        # one 40-word base text per cluster (bounded: ~batch/100 + 2
        # texts per batch), then a vectorized per-doc suffix keeps
        # in-cluster Jaccard high while making every doc distinct
        bases = np.asarray([
            " ".join(np.random.default_rng(int(c)).choice(WORDS, 40))
            for c in uniq
        ], dtype=object)
        tails = np.asarray([" " + w for w in WORDS], dtype=object)
        texts = np.char.add(bases[inv].astype(str),
                            tails[ids % len(WORDS)].astype(str))
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "text": pa.array(texts)})

    docs = rd.range(n_docs, override_num_blocks=max(16, n_docs // 50_000)
                    ).map_batches(gen, batch_format="pyarrow")

    from locus_ray.stages.dedup import minhash_lsh_pairs

    # "Flat" means the driver RETAINS nothing O(corpus).  The round-2
    # pre-fix path held the whole signature table as a Python dict on
    # the driver permanently (~0.5 KB/doc raw + >=3x dict overhead).
    # Two checks separate that from benign allocator high-water marks
    # (Ray's per-execution transients measure ~0.45 KB/doc peak but
    # free completely — repeated same-size runs hold RSS constant):
    #   1. retention: re-running the SAME size must not grow RSS
    #      (primary signal — the pre-fix dict was retained forever);
    #   2. scaling: going 4x in size must grow RSS by less than
    #      1 KB/doc.  The pre-fix retention footprint is >=2 KB/doc
    #      (0.5 KB raw signatures x >=3x Python dict overhead); the
    #      measured post-fix transient high-water is ~0.5 KB/doc
    #      (Ray-internal per-block buffers, fully freed), so 1 KB/doc
    #      separates the two regimes with margin on both sides.
    def corpus(n):
        return rd.range(n, override_num_blocks=max(16, n // 50_000)
                        ).map_batches(gen, batch_format="pyarrow")

    import gc

    n_small = max(10_000, n_docs // 4)
    pairs_small = minhash_lsh_pairs(corpus(n_small), num_partitions=32).count()
    gc.collect()
    rss_small_1 = rss_mb()
    minhash_lsh_pairs(corpus(n_small), num_partitions=32).count()
    gc.collect()
    rss_small_2 = rss_mb()
    pairs = minhash_lsh_pairs(corpus(n_docs), num_partitions=32).count()
    gc.collect()
    rss_large = rss_mb()
    retained = rss_small_2 - rss_small_1
    growth = rss_large - rss_small_2
    growth_bound_mb = (n_docs - n_small) * 1024 / (1024 * 1024)
    flat = retained < 48.0 and growth < growth_bound_mb
    print(json.dumps({
        "n_docs": n_docs, "n_small": n_small,
        "pairs": int(pairs), "pairs_small": int(pairs_small),
        "rss_small_run1_mb": round(rss_small_1, 1),
        "rss_small_run2_mb": round(rss_small_2, 1),
        "retained_same_size_mb": round(retained, 1),
        "rss_after_large_mb": round(rss_large, 1),
        "rss_growth_mb": round(growth, 1),
        "growth_bound_mb": round(growth_bound_mb, 1), "flat": bool(flat),
    }))
    ray.shutdown()
    if not flat:
        sys.exit(1)


if __name__ == "__main__":
    main()
