"""Deterministic synthetic interleaved-document corpus.

Generates the ``input_hint`` shape (BASELINE.json): ``doc_id: string``,
``spans: list<struct<kind, text, media_ref, offset>>`` plus derived
float64 geotags — fully vectorized (flat span arrays + Arrow
ListArray offsets, no per-row Python), distributed via
``ray.data.range(n).map_batches`` so a bench-scale corpus is produced
in parallel and written as partitioned parquet.

Every value is a pure function of the integer doc id (no RNG state),
so any shard can be (re)generated independently — the property that
makes the corpus usable for resume tests and for the two-parallelism
scaling runs on identical input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .. import derive

_KINDS = np.array(["text", "image", "audio", "table"])
_VOCAB = np.array(
    "the quick spatial index tile shard merge stream corpus span media "
    "query nearest join cell hilbert range batch arrow vector".split()
)


def _pad10(ids: np.ndarray) -> np.ndarray:
    """Zero-pad int64 ids to >= 10 digits without truncation (see the
    doc_id note in make_docs_batch)."""
    s = ids.astype("U20")
    return np.where(np.char.str_len(s) >= 10, s, np.char.zfill(s, 10))


def spans_for(ids: np.ndarray) -> pa.ListArray:
    """Vectorized spans column for int64 doc ids (1-8 spans each)."""
    ids = np.asarray(ids, dtype=np.int64)
    # mod-first (mirrored in oracles.sql span CTEs): the raw id * A
    # form wraps int64 above ~3.5e9 ids while DuckDB errors; reducing
    # the id mod 8 first is value-identical at every scale
    n_spans = 1 + (ids % 8) * 2654435761 % 8
    parent = np.repeat(ids, n_spans)
    # zeros+cumsum keeps the empty-ids block safe (([0], cumsum[:-1])
    # is 1-long against 0-long n_spans)
    starts = np.zeros(len(n_spans), dtype=np.int64)
    np.cumsum(n_spans[:-1], out=starts[1:])
    local = np.arange(int(n_spans.sum()), dtype=np.int64) - np.repeat(starts, n_spans)

    kind_code = (parent * 7 + local * 3) % 4
    kind = _KINDS[kind_code]
    w1 = _VOCAB[(parent * 13 + local * 5) % len(_VOCAB)]
    w2 = _VOCAB[(parent * 17 + local * 11) % len(_VOCAB)]
    text = np.where(kind_code == 0, np.char.add(np.char.add(w1, " "), w2), "")
    media = np.where(
        kind_code != 0,
        np.char.add(
            np.char.add(np.char.add("media://", kind), "/"),
            (parent * 31 + local).astype("U20"),
        ),
        "",
    )
    offset = (local * 16).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [pa.array(kind), pa.array(text), pa.array(media), pa.array(offset)],
        names=["kind", "text", "media_ref", "offset"],
    )
    offsets = pa.array(np.concatenate(([0], np.cumsum(n_spans))).astype(np.int32))
    return pa.ListArray.from_arrays(offsets, struct)


def make_docs_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    x, y = derive.doc_xy(ids)
    return pa.table({
        # pad to 10 digits WITHOUT truncating longer ids: both
        # np.char.zfill(_, 10) (dtype U10!) and DuckDB's lpad(_,10,_)
        # silently truncate an 11+-digit id to its first 10 chars —
        # consistently on both sides, but colliding doc_id strings
        # corrupt every dedup built on them beyond 1e10 docs.  The
        # oracle mirrors this exact CASE (oracles.sql _DOC_ID_SQL).
        "doc_id": pa.array(np.char.add("doc-", _pad10(ids))),
        "doc_key": pa.array(ids),
        "spans": spans_for(ids),
        "x": pa.array(x),
        "y": pa.array(y),
    })


def interleaved_docs(n: int, override_num_blocks: int | None = None):
    """Distributed deterministic corpus of ``n`` interleaved documents."""
    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(make_docs_batch, batch_format="pyarrow", zero_copy_batch=True)


def span_signature(spans: pa.ListArray | pa.ChunkedArray) -> np.ndarray:
    """Per-row stable signature of the span sequence (kind, text,
    media_ref, order) — the invariant every surviving output row must
    preserve (BASELINE.json input_hint).  Offsets are included too:
    stricter than required, never weaker."""
    import hashlib

    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    out = np.empty(len(spans), dtype="U32")
    pylist = spans.to_pylist()
    for i, row in enumerate(pylist):
        h = hashlib.md5()
        for s in row or ():
            h.update(repr((s["kind"], s["text"], s["media_ref"], s["offset"])).encode())
        out[i] = h.hexdigest()
    return out
