"""Approximate/exact nearest-neighbor search over embedding columns.

* :class:`CosineTopKActor` — brute-force cosine top-k per batch against
  a broadcast query matrix (one numpy matmul per batch; the exact
  baseline).
* :func:`lsh_bucketed_topk` — random-hyperplane LSH variant: both sides
  are bucketed by sign-pattern; only same-bucket (+ optionally
  neighboring Hamming-1 buckets) pairs are scored.  The scale path:
  the shuffle key is the bucket id, and each bucket's matmul is tiny.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..config import actor_pool


def _as_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy flat)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(flat) // len(col)
    return flat.reshape(len(col), d)


class CosineTopKActor:
    """Per batch: cosine top-k of each broadcast query vector against
    the streaming embedding rows -> partial candidate rows; a final
    small ``groupby(query_id)`` merge picks the global top-k.

    The query matrix is normalized ONCE in ``__init__``.
    """

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qid = np.asarray(q["query_id"], dtype=np.int64)
        qm = np.asarray(q["matrix"], dtype=np.float64)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(self.vec_col))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self.qm.T  # (n, q)
        ids = batch.column(self.id_col).to_numpy()
        k = min(self.k, sims.shape[0])
        # per-query partial top-k within this batch (fully vectorized)
        part = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, q)
        top_s = np.take_along_axis(sims, part, axis=0)  # (k, q)
        return pa.table({
            "query_id": pa.array(np.repeat(self.qid, k)),
            self.id_col: pa.array(ids[part.T.ravel()]),
            "cosine": pa.array(top_s.T.ravel()),
        })


def cosine_topk(ds, queries: dict[str, np.ndarray], k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                concurrency=None, batch_size: int = 8192):
    """Exact distributed cosine top-k: per-batch partial top-k (actor
    pool) -> groupby(query_id) final merge.  Returns
    (query_id, vec_id, rnk) ordered by (-cosine, vec_id)."""
    ref = ray.put(queries)
    partials = ds.map_batches(
        CosineTopKActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"queries_ref": ref, "k": k,
                               "id_col": id_col, "vec_col": vec_col},
        concurrency=concurrency or actor_pool(), batch_size=batch_size,
    )

    def merge(group):
        import pandas as pd

        g = group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", id_col, "rnk"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


IVF_SCALE = 1 << 20
IVF_OFFSET = 1 << 21  # |e| < 2 -> scaled values positive (exact int k-means)


def train_ivf_centroids(train_matrix: dict[str, np.ndarray], n_list: int,
                        iters: int) -> np.ndarray:
    """Deterministic INTEGER k-means coarse quantizer.

    Embeddings quantize to ``floor(e*2^20 + 0.5) + 2^21`` (positive
    int64), init centroids are the vectors of the ``n_list`` smallest
    ids, assignment is exact integer argmin (ties -> smallest centroid
    id), and the centroid update is the truncating integer mean — every
    step is exact integer arithmetic, so the SQL oracle replicates the
    training bit-for-bit (float k-means means would diverge in summation
    order).  Train on the full small corpus at gate scale; on a
    driver-side deterministic sample at corpus scale."""
    ids_t = np.asarray(train_matrix["ids"], dtype=np.int64)
    m = np.asarray(train_matrix["matrix"], dtype=np.float64)
    eint = (np.floor(m * IVF_SCALE + 0.5).astype(np.int64) + IVF_OFFSET)
    order = np.argsort(ids_t, kind="stable")
    cent = eint[order[:n_list]].copy()
    for _ in range(iters):
        d = ((eint[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)  # first minimum = smallest centroid id
        newc = cent.copy()
        for c in range(len(cent)):
            mask = a == c
            if mask.any():
                newc[c] = eint[mask].sum(axis=0) // int(mask.sum())
        cent = newc
    return cent


def ivf_topk(ds, queries: dict[str, np.ndarray],
             train_matrix: dict[str, np.ndarray], k: int,
             n_list: int = 16, n_probe: int = 2, iters: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             concurrency=None, batch_size: int = 8192):
    """IVF (inverted-file) ANN — the k-means-bucketed scale path next to
    the hyperplane-LSH one: corpus rows assign to their nearest coarse
    centroid inside ``map_batches`` (no shuffle; the 'inverted list' is
    implicit in the per-batch mask), each query probes its ``n_probe``
    nearest lists, and only member rows are cosine-scored."""
    cent = train_ivf_centroids(train_matrix, n_list, iters)
    qm = np.asarray(queries["matrix"], dtype=np.float64)
    qint = np.floor(qm * IVF_SCALE + 0.5).astype(np.int64) + IVF_OFFSET
    qd = ((qint[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1, kind="stable")[:, :n_probe]
    payload = {"query_id": np.asarray(queries["query_id"], dtype=np.int64),
               "matrix": qm, "cent": cent, "probes": probes}
    ref = ray.put(payload)

    class IvfScore:
        def __init__(self):
            p = ray.get(ref)
            self.qid = p["query_id"]
            self.qm = p["matrix"] / np.linalg.norm(p["matrix"], axis=1,
                                                   keepdims=True)
            self.cent = p["cent"]
            self.probes = p["probes"]
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _as_matrix(batch.column(vec_col))
            eint = np.floor(m * IVF_SCALE + 0.5).astype(np.int64) + IVF_OFFSET
            d = ((eint[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            member = (assign[:, None, None] == self.probes[None, :, :]).any(axis=2)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (m / norms) @ self.qm.T
            sims = np.where(member, sims, -2.0)
            ids = batch.column(id_col).to_numpy()
            kk = min(self.k, sims.shape[0])
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            top_s = np.take_along_axis(sims, part, axis=0)
            qcol = np.repeat(self.qid, kk)
            icol = ids[part.T.ravel()]
            scol = top_s.T.ravel()
            keep = scol > -1.5  # drop non-member padding
            return pa.table({
                "query_id": pa.array(qcol[keep]),
                id_col: pa.array(icol[keep]),
                "cosine": pa.array(scol[keep]),
            })

    partials = ds.map_batches(IvfScore, batch_format="pyarrow",
                              zero_copy_batch=True,
                              concurrency=concurrency or actor_pool(),
                              batch_size=batch_size)

    def merge(group):
        g = group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", id_col, "rnk"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def lsh_dup_pairs(ds, matrix_payload: dict[str, np.ndarray],
                  threshold: float = 0.4, n_tables: int = 4,
                  n_planes: int = 8, seed: int = 29,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  num_partitions: int = 16):
    """Corpus-vs-corpus embedding near-dup pairs — the 100 TB scale
    path (``embed_dup_pairs``' exact variant broadcast-scores the full
    matrix and is for dimension-scale corpora only).

    Multi-table random-hyperplane LSH with STAR LINKING (the same
    aggregate-only shape as dedup.minhash_lsh_pairs): one compact
    (vec_id, table, bucket) row per table -> per-(table, bucket)
    representative via a Min aggregate -> distinct (rep, member)
    candidate pairs via a Count aggregate -> exact cosine verification
    against a broadcast id-sorted matrix (key-range-aligned shards at
    corpus scale).  A bucket of b members emits b-1 pairs, never
    O(b^2); recall is tuned by (n_tables, n_planes) for genuinely-near
    duplicates (cos >= 0.9: ~75% at 4x8; the fixture threshold is
    lower only so the gate produces rows).
    """
    from ray.data.aggregate import Count, Min

    ids_all = np.asarray(matrix_payload["ids"], dtype=np.int64)
    m_all = np.asarray(matrix_payload["matrix"], dtype=np.float64)
    dim = m_all.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_tables * n_planes))
    planes_ref = ray.put(planes)
    order = np.argsort(ids_all, kind="stable")
    mn = m_all / np.linalg.norm(m_all, axis=1, keepdims=True)
    emb_ref = ray.put({"keys": ids_all[order], "matrix": mn[order]})

    class Bucketize:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _as_matrix(batch.column(vec_col))
            bits = (m @ self.planes > 0).astype(np.int64)
            vid = batch.column(id_col).to_numpy()
            out_id, out_t, out_b = [], [], []
            for t in range(n_tables):
                seg = bits[:, t * n_planes:(t + 1) * n_planes]
                bkt = (seg << np.arange(n_planes, dtype=np.int64)[None, :]).sum(axis=1)
                out_id.append(vid)
                out_t.append(np.full(len(vid), t, dtype=np.int64))
                out_b.append(bkt)
            return pa.table({
                id_col: pa.array(np.concatenate(out_id)),
                "tbl": pa.array(np.concatenate(out_t)),
                "bkt": pa.array(np.concatenate(out_b)),
            })

    exploded = ds.map_batches(Bucketize, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=actor_pool())
    reps = exploded.groupby(["tbl", "bkt"]).aggregate(
        Min(id_col, alias_name="vec_a"))
    joined = exploded.join(reps, "inner", num_partitions, on=("tbl", "bkt"))

    def to_pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.greater(batch.column(id_col), batch.column("vec_a")))
        return pa.table({"vec_a": t.column("vec_a"),
                         "vec_b": t.column(id_col)})

    distinct = (
        joined.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["vec_a", "vec_b"]).aggregate(Count(alias_name="n_tables_hit"))
    )

    class CosVerify:
        def __init__(self):
            p = ray.get(emb_ref)
            self.keys, self.mat = p["keys"], p["matrix"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = np.searchsorted(self.keys, batch.column("vec_a").to_numpy())
            b = np.searchsorted(self.keys, batch.column("vec_b").to_numpy())
            cos = (self.mat[a] * self.mat[b]).sum(axis=1)
            keep = cos >= threshold
            return pa.table({
                "vec_a": pa.array(batch.column("vec_a").to_numpy()[keep]),
                "vec_b": pa.array(batch.column("vec_b").to_numpy()[keep]),
            })

    return distinct.map_batches(CosVerify, batch_format="pyarrow",
                                zero_copy_batch=True, concurrency=actor_pool())


def lsh_bucketed_topk(ds, queries: dict[str, np.ndarray], k: int,
                      n_planes: int = 8, seed: int = 17,
                      id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate variant: random-hyperplane bucket prefilter.

    Each row is scored only against queries sharing its sign-pattern
    bucket or differing in one bit (Hamming-1 multiprobe) — at scale
    this replaces the full matmul with ~(2^-n_planes · (n_planes+1))
    of the work while keeping recall high for near neighbors.
    """
    rng = np.random.default_rng(seed)
    qm = np.asarray(queries["matrix"], dtype=np.float64)
    planes = rng.standard_normal((qm.shape[1], n_planes))
    qsig = (qm @ planes > 0).astype(np.uint32)
    qbits = (qsig << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
    # multiprobe: query bucket + Hamming-1 neighbors
    probe = {int(b) for b in qbits}
    for b in list(probe):
        for i in range(n_planes):
            probe.add(b ^ (1 << i))
    payload = {"query_id": np.asarray(queries["query_id"], dtype=np.int64),
               "matrix": qm, "planes": planes, "qbits": qbits,
               "probe": np.asarray(sorted(probe), dtype=np.int64)}
    ref = ray.put(payload)

    class BucketScore:
        def __init__(self):
            p = ray.get(ref)
            self.qid = p["query_id"]
            self.qm = p["matrix"] / np.linalg.norm(p["matrix"], axis=1, keepdims=True)
            self.planes = p["planes"]
            self.qbits = p["qbits"]
            self.probe = set(int(x) for x in p["probe"])
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _as_matrix(batch.column(vec_col))
            bits = ((m @ self.planes > 0).astype(np.uint32)
                    << np.arange(self.planes.shape[1], dtype=np.uint32)).sum(axis=1)
            mask = np.isin(bits, np.asarray(list(self.probe), dtype=bits.dtype))
            if not mask.any():
                return pa.table({"query_id": pa.array([], type=pa.int64()),
                                 id_col: pa.array([], type=pa.int64()),
                                 "cosine": pa.array([], type=pa.float64())})
            m = m[mask]
            ids = batch.column(id_col).to_numpy()[mask]
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (m / norms) @ self.qm.T
            kk = min(self.k, sims.shape[0])
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            top_s = np.take_along_axis(sims, part, axis=0)
            return pa.table({
                "query_id": pa.array(np.repeat(self.qid, kk)),
                id_col: pa.array(ids[part.T.ravel()]),
                "cosine": pa.array(top_s.T.ravel()),
            })

    partials = ds.map_batches(BucketScore, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=actor_pool())

    def merge(group):
        g = group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", id_col, "rnk"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
