"""Driver contract for the graft builder (Ray Data target).

Thin shim over :mod:`locus_ray.entry` — see that module for the query
pipelines and DuckDB oracle SQL.  Ray is initialised by the driver
before this module is imported; nothing here (or in the library) calls
``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from locus_ray.entry import entry, oracle_sql, queries

__all__ = ["entry", "queries", "oracle_sql"]
