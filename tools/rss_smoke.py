"""Driver-RSS smoke for the sharded verify paths (VERDICT r2 #1 done
criterion): run minhash LSH dedup over a ~1M-doc synthetic text corpus
and assert the DRIVER's resident set stays flat — the signature table
(~0.5 KB/doc, ~0.5 GB at 1M docs as a Python dict) must never be
concatenated on the driver or broadcast whole.

Usage: python tools/rss_smoke.py [n_docs] [num_cpus]
       python tools/rss_smoke.py --ngram [n_pairs] [num_cpus]
Prints one JSON line {"n_docs", "pairs", "rss_before_mb",
"rss_after_mb", "rss_growth_mb", "flat"}.

``--ngram`` (VERDICT r4 #3 done criterion): runs the distributed
``ngram_jaccard_pairs`` verify at two candidate volumes and asserts
the driver retains only the candidate ID arrays — no shingle data.
The pre-fix path held a dict of Python shingle SETS (~5-10 KB per
candidate doc); the bound here is 1 KB/pair, well under that and well
above the ids-only footprint (~16 B/pair + allocator slack).
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


def main_ngram() -> None:
    args = [a for a in sys.argv[1:] if a != "--ngram"]
    n_pairs = int(args[0]) if args else 20_000
    ncpus = int(args[1]) if len(args) > 1 else 16

    import gc

    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from locus_ray.stages.dedup import ngram_jaccard_pairs

    n_docs = 2 * n_pairs + 1

    def corpus():
        WORDS = np.array(["alpha", "bravo", "carbon", "delta", "ember",
                          "falcon", "granite", "harbor", "iris", "jolt"])

        def gen(batch):
            import pyarrow as pa
            ids = batch.column("id").to_numpy()
            # ~40-token docs, deterministic, near-dup with id+1
            idx = (ids[:, None] * 37 + np.arange(40)[None, :] * 11) % len(WORDS)
            texts = np.array([" ".join(WORDS[r]) for r in idx], dtype=object)
            return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                             "text": pa.array(texts.astype(str))})

        return rd.range(n_docs, override_num_blocks=max(8, n_docs // 50_000)
                        ).map_batches(gen, batch_format="pyarrow")

    def cands(m):
        a = np.arange(m, dtype=np.int64) * 2
        return pd.DataFrame({"doc_a": a, "doc_b": a + 1})

    n_small = max(500, n_pairs // 4)
    rows_small = ngram_jaccard_pairs(corpus(), cands(n_small)).count()
    gc.collect()
    rss_1 = rss_mb()
    ngram_jaccard_pairs(corpus(), cands(n_small)).count()
    gc.collect()
    rss_2 = rss_mb()
    rows = ngram_jaccard_pairs(corpus(), cands(n_pairs)).count()
    gc.collect()
    rss_3 = rss_mb()
    retained = rss_2 - rss_1
    growth = rss_3 - rss_2
    growth_bound_mb = max(8.0, (n_pairs - n_small) * 1024 / (1024 * 1024))  # floor: tiny runs made the bound negative and flagged leak-free runs
    flat = retained < 48.0 and growth < growth_bound_mb
    print(json.dumps({
        "mode": "ngram", "n_pairs": n_pairs, "n_small": n_small,
        "rows": int(rows), "rows_small": int(rows_small),
        "rss_small_run1_mb": round(rss_1, 1),
        "rss_small_run2_mb": round(rss_2, 1),
        "retained_same_size_mb": round(retained, 1),
        "rss_after_large_mb": round(rss_3, 1),
        "rss_growth_mb": round(growth, 1),
        "growth_bound_mb": round(growth_bound_mb, 1), "flat": bool(flat),
    }))
    ray.shutdown()
    if not flat:
        sys.exit(1)


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
    growth_bound_mb = max(8.0, (n_docs - n_small) * 1024 / (1024 * 1024))  # floored, see main_ngram
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
    if "--ngram" in sys.argv:
        main_ngram()
    else:
        main()
