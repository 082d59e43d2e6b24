"""Lance / Parquet source + sink gating.

The north rule targets Lance tables; this container ships pyarrow +
parquet but not the ``lance`` package, so the Lance paths are gated
behind an import-try: with ``pylance`` installed,
``read_docs``/``write_docs`` transparently use
``ray.data.read_lance``/``Dataset.write_lance``; without it they fall
back to parquet with the same schema and directory layout.  Pipelines
are format-agnostic — they only see a Dataset.
"""

from __future__ import annotations

import ray.data as rd


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_docs(path: str, columns: list[str] | None = None):
    """Read an interleaved-docs table from a Lance dataset or a parquet
    directory/file, whichever the path holds and the env supports."""
    if path.endswith(".lance") and lance_available():
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def write_docs(ds, path: str):
    if path.endswith(".lance") and lance_available():
        return ds.write_lance(path)
    return ds.write_parquet(path)
