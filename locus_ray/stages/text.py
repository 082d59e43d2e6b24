"""Text-analysis stages for the documents table.

Training-data operators (task spec: language-ID, quality scoring, token
counting, fingerprinting) as vectorized ``map_batches`` stages.  The
regex/stopword state is compiled once per actor in ``__init__`` — the
build-once/query-many discipline the reference's Tree objects embody
(locus/kd.py:46) transplanted to actor pools.

SQL-parity notes: ``token_count`` and ``text_stats`` mirror exactly
what the DuckDB oracle computes (whitespace split on single spaces —
the testdata text is single-space joined); ``lang_id`` and
``fingerprint`` have no SQL equivalent and are covered by pytest
oracles instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"},
    "de": {"der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "une"},
    "zh": set(),  # non-space-delimited fallback bucket
}


def token_count(ds, text_col: str = "text"):
    """doc_id + n_tokens (single-space split, matches the SQL oracle)."""

    def f(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch.column(text_col), " "))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": n.cast(pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def text_stats(ds, text_col: str = "text"):
    """Quality-scoring features: length, token count, mean token length,
    distinct-token ratio (all deterministic, SQL-reproducible)."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        n_chars = pc.utf8_length(text).cast(pa.int64())
        toks = pc.split_pattern(text, " ")
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        # mean token length = (chars - spaces) / tokens, one float division
        spaces = pc.subtract(n_tokens, 1)
        mean_tok = pc.divide(
            pc.cast(pc.subtract(n_chars, spaces), pa.float64()),
            pc.cast(n_tokens, pa.float64()),
        )
        uniq = pa.array(
            [len(set(t)) for t in toks.to_pylist()], type=pa.int64()
        )  # small per-batch python; acceptable: bounded by batch size, not corpus
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars_calc": n_chars,
            "n_tokens": n_tokens,
            "mean_token_len": mean_tok,
            "n_distinct_tokens": uniq,
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class LangIdActor:
    """Heuristic language ID: stopword-profile vote over lowercased
    tokens.  Zero stopword hits -> 'unknown'; equal top counts resolve
    to the alphabetically-first language (deterministic, mirrored by
    the SQL oracle's CASE chain).  Profiles compiled once per actor."""

    def __init__(self):
        import re

        self.word = re.compile(r"[^\W\d_]+", re.U)
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items() if v}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = []
        for t in texts:
            toks = [w.lower() for w in self.word.findall(t or "")]
            best, best_n = "unknown", 0
            for lang, prof in sorted(self.profiles.items()):
                n = sum(1 for w in toks if w in prof)
                if n > best_n:
                    best, best_n = lang, n
            out.append(best)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(out, type=pa.string()),
        })


def fingerprint(ds, text_col: str = "text", window: int = 8):
    """Winnowing-style document fingerprint: min rolling hash over
    ``window``-grams of the token stream (vectorized polynomial hash).

    Deterministic; used for cheap near-dup candidate blocking.
    """

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        fps = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split(" ")
            hs = np.fromiter(
                (hash_token(w) for w in toks), dtype=np.uint64, count=len(toks)
            )
            if len(hs) < window:
                acc = np.uint64(1469598103934665603)
                for h in hs:
                    acc = np.uint64((int(acc) * 1099511628211 + int(h)) & 0xFFFFFFFFFFFFFFFF)
                fps[i] = np.int64(acc.astype(np.int64))
                continue
            # rolling window min of k-gram hashes, vectorized
            m = np.lib.stride_tricks.sliding_window_view(hs, window)
            gram = m.astype(np.uint64).sum(axis=1)  # order-insensitive-in-window sum
            fps[i] = np.int64(gram.min().astype(np.int64))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def hash_token(w: str) -> int:
    """Stable 64-bit FNV-1a (process-independent, unlike ``hash``)."""
    acc = 1469598103934665603
    for b in w.encode("utf-8"):
        acc = ((acc ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return acc
