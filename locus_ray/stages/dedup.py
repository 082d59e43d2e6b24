"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All follow the scale pattern from the task spec: vectorized per-batch
sketching inside ``map_batches`` (partial work), then ONE small shuffle
(``groupby`` on a hash/band key) over compact sketch rows — never over
the full documents.  Candidate pairs are verified exactly before being
reported.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .text import hash_token

# 64 independent 64-bit universal-hash parameter pairs for MinHash,
# generated once from a fixed seed (shared by every actor).
_MH_RNG = np.random.default_rng(0xC0FFEE)
_MH_A = (_MH_RNG.integers(1, 2**61 - 1, size=64, dtype=np.int64)).astype(np.uint64)
_MH_B = (_MH_RNG.integers(0, 2**61 - 1, size=64, dtype=np.int64)).astype(np.uint64)
_MERSENNE = np.uint64(2**61 - 1)


def content_hash(ds, text_col: str = "text"):
    """Add an md5 content hash (hex string — matches DuckDB ``md5``)."""

    def f(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
              for t in batch.column(text_col).to_pylist()]
        return batch.append_column("content_hash", pa.array(hs, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: keep the smallest id per content hash.

    Shape: per-batch partial min (combiner) -> groupby(hash).min — the
    shuffle moves one compact row per distinct (batch, hash), not the
    documents themselves.
    """
    hashed = content_hash(ds, text_col)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = pa.table({
            "content_hash": batch.column("content_hash"),
            id_col: batch.column(id_col),
        }).group_by("content_hash").aggregate([(id_col, "min")])
        return g.rename_columns(["content_hash", "keep_id"])

    partials = hashed.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Min

    return partials.groupby("content_hash").aggregate(Min("keep_id", alias_name="keep_id"))


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = (text or "").split(" ")
    if len(toks) < k:
        return np.asarray([hash_token(" ".join(toks))], dtype=np.uint64)
    hs = np.fromiter((hash_token(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)),
                     dtype=np.uint64, count=len(toks) - k + 1)
    return hs


def minhash_signatures(ds, text_col: str = "text", num_perm: int = 64, shingle_k: int = 3):
    """doc_id + MinHash signature (fixed-size list<uint64-as-int64>)."""

    def f(batch: pa.Table) -> pa.Table:
        sigs = np.empty((batch.num_rows, num_perm), dtype=np.uint64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            sh = _shingle_hashes(t, shingle_k)
            # (a * x + b) mod p, min over shingles, vectorized over perms
            v = (sh[:, None] * _MH_A[None, :num_perm] + _MH_B[None, :num_perm]) % _MERSENNE
            sigs[i] = v.min(axis=0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "minhash": pa.array(list(sigs.astype(np.int64))),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_pairs(ds, text_col: str = "text", num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      jaccard_threshold: float = 0.5):
    """Near-dup pairs via banded LSH: shingle -> minhash -> explode one
    row per band -> groupby(band_id, band_hash) -> pairs within small
    buckets -> exact signature-Jaccard verification.

    The shuffle key is (band_id, band_hash); the shuffled payload is
    (doc_id, signature) — compact sketch rows.  Emitted pairs are
    (doc_a < doc_b, est_jaccard >= threshold).
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, text_col, num_perm, shingle_k)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = np.stack([np.asarray(s, dtype=np.int64) for s in batch.column("minhash").to_pylist()])
        doc = batch.column("doc_id").to_numpy()
        out_doc, out_band, out_bh, out_sig = [], [], [], []
        for b in range(bands):
            seg = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            bh = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                bh = bh * np.uint64(1099511628211) + seg[:, c].astype(np.uint64)
            out_doc.append(doc)
            out_band.append(np.full(n, b, dtype=np.int64))
            out_bh.append(bh.astype(np.int64))
            out_sig.append(sig)
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_doc)),
            "band_id": pa.array(np.concatenate(out_band)),
            "band_hash": pa.array(np.concatenate(out_bh)),
            "minhash": pa.array(list(np.concatenate(out_sig))),
        })

    exploded = sigs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group):
        import pandas as pd

        docs = group["doc_id"].to_numpy()
        if len(docs) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        sig = np.stack([np.asarray(s, dtype=np.int64) for s in group["minhash"]])
        order = np.argsort(docs)
        docs, sig = docs[order], sig[order]
        ii, jj = np.triu_indices(len(docs), k=1)
        est = (sig[ii] == sig[jj]).mean(axis=1)
        keep = est >= jaccard_threshold
        return pd.DataFrame({
            "doc_a": docs[ii][keep].astype(np.int64),
            "doc_b": docs[jj][keep].astype(np.int64),
            "est_jaccard": est[keep],
        })

    pairs = exploded.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # a pair can surface from several bands -> dedup
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def simhash(ds, text_col: str = "text"):
    """64-bit SimHash over token hashes (vectorized bit-vote)."""

    def f(batch: pa.Table) -> pa.Table:
        out = np.empty(batch.num_rows, dtype=np.int64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = (t or "").split(" ")
            hs = np.fromiter((hash_token(w) for w in toks), dtype=np.uint64, count=len(toks))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
            votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(hs)
            val = (np.uint64(votes > 0) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
            out[i] = np.int64(val.astype(np.int64))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(out),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_pairs(ds, candidate_pairs, text_col: str = "text", k: int = 3):
    """Exact n-gram Jaccard for verified pair reporting.

    ``candidate_pairs`` is a small Dataset/DataFrame of (doc_a, doc_b);
    texts are looked up from a broadcast id->shingle-set map built from
    ``ds`` (the candidate set is assumed small — it comes out of LSH)."""
    import pandas as pd
    import ray

    texts = ds.select_columns(["doc_id", text_col]).to_pandas()
    shingles = {
        int(r["doc_id"]): set(map(int, _shingle_hashes(r[text_col], k)))
        for _, r in texts.iterrows()
    }
    ref = ray.put(shingles)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sh = ray.get(ref)
        ja = []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            sa, sb = sh.get(int(a), set()), sh.get(int(b), set())
            ja.append(len(sa & sb) / max(1, len(sa | sb)))
        batch = batch.copy()
        batch["jaccard"] = ja
        return batch

    if isinstance(candidate_pairs, pd.DataFrame):
        import ray.data as rd

        candidate_pairs = rd.from_pandas(candidate_pairs)
    return candidate_pairs.map_batches(verify, batch_format="pandas")
