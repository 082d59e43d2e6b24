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

from ..config import actor_pool


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
                   concurrency=None, batch_size: int = 512):
    """Actor-pool media feature extraction over interleaved docs.

    Small ``batch_size`` on purpose: media rows are wide; a batch x
    concurrency must fit each worker's heap (task-spec memory rule).
    """
    return docs.map_batches(
        MediaFeatureActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"decode": decode, "dim": dim},
        concurrency=concurrency or actor_pool(), batch_size=batch_size,
    )


class MediaTransformActor:
    """Resize / frame-sample plumbing for media spans.

    Same stub discipline as :class:`MediaFeatureActor`: the pipeline
    mechanics (schema, per-span explode, actor state, deterministic
    outputs, small batches) are real; the codec kernel is a
    deterministic fake unless ``decode="real"`` (which raises at the
    exact plug point).

    op="resize":       emits (doc_id, span_idx, media_ref, width,
                       height, payload_hash) for image spans
    op="frame_sample": emits one row per sampled frame index for
                       audio/video-like spans (every ``stride``-th of a
                       fake duration derived from the ref)
    """

    def __init__(self, op: str = "resize", decode: str = "fake",
                 width: int = 224, height: int = 224, stride: int = 10):
        if op not in ("resize", "frame_sample"):
            raise ValueError(op)
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.op, self.decode = op, decode
        self.width, self.height, self.stride = width, height, stride

    def _kernel(self, media_ref: str):
        if self.decode == "real":
            raise NotImplementedError(
                "real codecs unavailable in this environment; use decode='fake'"
            )
        h = hashlib.sha256(media_ref.encode()).digest()
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        doc_ids = batch.column("doc_id").to_pylist()
        rows = {k: [] for k in ("doc_id", "span_idx", "media_ref")}
        extra = {}
        if self.op == "resize":
            extra = {"width": [], "height": [], "payload_hash": []}
            want = {"image"}
        else:
            extra = {"frame_idx": []}
            want = {"audio", "table"}
        for row_i, row in enumerate(spans.to_pylist()):
            for s_i, s in enumerate(row or ()):
                if s["kind"] not in want:
                    continue
                digest = self._kernel(s["media_ref"])
                if self.op == "resize":
                    rows["doc_id"].append(doc_ids[row_i])
                    rows["span_idx"].append(s_i)
                    rows["media_ref"].append(s["media_ref"])
                    extra["width"].append(self.width)
                    extra["height"].append(self.height)
                    extra["payload_hash"].append(digest[:8].hex())
                else:
                    n_frames = 1 + digest[0] % 64
                    for f in range(0, n_frames, self.stride):
                        rows["doc_id"].append(doc_ids[row_i])
                        rows["span_idx"].append(s_i)
                        rows["media_ref"].append(s["media_ref"])
                        extra["frame_idx"].append(f)
        cols = {
            "doc_id": pa.array(rows["doc_id"], type=pa.string()),
            "span_idx": pa.array(rows["span_idx"], type=pa.int32()),
            "media_ref": pa.array(rows["media_ref"], type=pa.string()),
        }
        for k, v in extra.items():
            cols[k] = pa.array(v)
        return pa.table(cols)


def media_transform(docs, op: str = "resize", decode: str = "fake",
                    concurrency=None, batch_size: int = 512, **kw):
    return docs.map_batches(
        MediaTransformActor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"op": op, "decode": decode, **kw},
        concurrency=concurrency or actor_pool(), batch_size=batch_size,
    )
