"""Multimodal span processing — real Ray plumbing, stubbed codecs.

Media payloads ride in the interleaved ``spans`` column as opaque refs
(``media_ref``) or inline ``binary``; decode / resize / frame-sample
run as actor-pool ``map_batches`` stages with small batches (large
binary rows) and per-actor codec state.  The image/audio codec
libraries are not available in this container, so the decode kernel is
STUBBED: ``decode="fake"`` produces a deterministic feature vector
from the ref bytes (so the full pipeline — schema, batch sizing, actor
signature, output layout — is testable end to end), and
``decode="real"`` raises ``NotImplementedError`` at the exact seam
where PIL / torchaudio / pyav would plug in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class MediaFeatureActor:
    """Extract per-media-span features from interleaved docs.

    Output: one row per media span — (doc_id, span_idx, kind,
    media_ref, feature: list<float>[dim]).
    """

    def __init__(self, decode: str = "fake", dim: int = 16):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.decode = decode
        self.dim = dim

    def _decode_one(self, media_ref: str) -> np.ndarray:
        if self.decode == "real":
            # Plug point: load bytes from media_ref, decode with the
            # codec lib, pool to a feature vector.
            raise NotImplementedError(
                "real media decoding requires codec libraries not present "
                "in this environment; use decode='fake'"
            )
        h = hashlib.sha256(media_ref.encode()).digest()
        raw = np.frombuffer((h * ((self.dim * 8) // len(h) + 1))[: self.dim * 8], dtype=np.uint64)
        return (raw >> np.uint64(11)).astype(np.float64) / 2**53

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        doc_ids = batch.column("doc_id").to_pylist()
        out_doc, out_idx, out_kind, out_ref, out_feat = [], [], [], [], []
        for row_i, row in enumerate(spans.to_pylist()):
            for s_i, s in enumerate(row or ()):
                if s["kind"] == "text":
                    continue
                out_doc.append(doc_ids[row_i])
                out_idx.append(s_i)
                out_kind.append(s["kind"])
                out_ref.append(s["media_ref"])
                out_feat.append(self._decode_one(s["media_ref"]))
        return pa.table({
            "doc_id": pa.array(out_doc),
            "span_idx": pa.array(out_idx, type=pa.int32()),
            "kind": pa.array(out_kind, type=pa.string()),
            "media_ref": pa.array(out_ref, type=pa.string()),
            "feature": pa.array([list(f) for f in out_feat],
                                type=pa.list_(pa.float64())),
        })


def media_features(docs, decode: str = "fake", dim: int = 16,
                   concurrency=(1, 4), batch_size: int = 512):
    """Actor-pool media feature extraction over interleaved docs.

    Small ``batch_size`` on purpose: media rows are wide; a batch x
    concurrency must fit each worker's heap (task-spec memory rule).
    """
    return docs.map_batches(
        MediaFeatureActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"decode": decode, "dim": dim},
        concurrency=concurrency, batch_size=batch_size,
    )
