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
    """Read an interleaved-docs table from a Lance dataset (``.lance``
    path) or a parquet directory/file.

    A ``.lance`` path WITHOUT pylance raises instead of silently
    reading the directory as parquet: the silent fallback fed real
    Lance data to read_parquet (garbage/ArrowInvalid) and, worse, let
    write_docs publish parquet bytes under a .lance name that a
    pylance-enabled box then failed to read."""
    if path.endswith(".lance"):
        if not lance_available():
            raise RuntimeError(
                "pylance is not installed in this environment; cannot "
                f"read the Lance dataset {path!r} (use a parquet path, "
                "or install pylance)")
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def write_docs(ds, path: str):
    if path.endswith(".lance"):
        if not lance_available():
            raise RuntimeError(
                "pylance is not installed in this environment; refusing "
                f"to write parquet bytes under the Lance name {path!r}")
        return ds.write_lance(path)
    return ds.write_parquet(path)
