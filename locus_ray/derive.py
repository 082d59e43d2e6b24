"""Deterministic derivation of spatial layers from the testdata tables.

The sandbox's parquet tables (TESTDATA.md) have no geo columns, and the
correctness gate compares the Ray pipelines against DuckDB SQL oracles
over those same tables.  So the spatial layers (document geotags, zone
boxes, segments, polygons) are *derived deterministically* from stable
integer keys — with every arithmetic step chosen so that the numpy
version here and the SQL version (:mod:`locus_ray.sql`) execute the
same sequence of exact int64 ops + IEEE-754 double ops and therefore
produce bit-identical values.  Do not reorder operations in either
place without changing both.

Domain properties mirror FIXTURES.md: coordinates over the world box,
~20% of documents concentrated in a hot cluster (exercises skew
salting), zone boxes from tiny to huge (every 50th is 20x — hits the
root-subset fast path analog of locus/r.py:355-362), segments with
varied orientation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# hash moduli / multipliers (int64-exact at every testdata scale)
_M1 = 1000003
_DOC_A1, _DOC_A2, _DOC_B2 = 2654435761, 40503, 12345
_ZONE_A1, _ZONE_A2, _ZONE_B2 = 48271, 69621, 7
_ZONE_A3, _ZONE_M3 = 16807, 997
_ZONE_A4, _ZONE_B4 = 7919, 3
_SEG_A1, _SEG_A2, _SEG_B2 = 31337, 271, 11
_SEG_A3, _SEG_M3 = 1299721, 2003
_SEG_A4, _SEG_B4 = 104729, 5

HOT_X, HOT_Y = 10.0, 50.0  # hot-cluster center (skew fixture)


def F(v: float) -> str:
    """Format a float64 as a SQL literal DuckDB lexes directly as
    DOUBLE.  Plain decimal literals become DECIMAL, and DuckDB's
    DECIMAL->DOUBLE cast is not correctly rounded (off by ~1 ulp for
    16-digit literals — measured on v1.0.0), which breaks bit-parity
    with numpy.  An exponent marker forces the DOUBLE lexer path
    (strtod, correctly rounded)."""
    s = repr(float(v))
    return s if ("e" in s or "E" in s or "inf" in s or "nan" in s) else s + "e0"


def doc_xy(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Geotag for each document id (80% uniform, 20% hot cluster).

    MOD-FIRST multiply (mirrored in every SQL builder below): the raw
    ``id * A`` form silently wraps numpy int64 for ids above ~3.5e9
    (while DuckDB errors on BIGINT overflow) — reducing the id mod M
    first is mathematically identical and keeps every intermediate
    under M * A < 2**63 at any corpus scale.  The ``% 5`` hot test
    stays on the RAW id (M1 is not a multiple of 5)."""
    d = np.asarray(doc_id, dtype=np.int64)
    dm = d % _M1
    h1 = (dm * _DOC_A1) % _M1
    h2 = (dm * _DOC_A2 + _DOC_B2) % _M1
    u1 = h1 / float(_M1)
    u2 = h2 / float(_M1)
    hot = (d % 5) == 0
    x = np.where(hot, HOT_X + (u1 * 4.0 - 2.0), u1 * 360.0 - 180.0)
    y = np.where(hot, HOT_Y + (u2 * 2.0 - 1.0), u2 * 180.0 - 90.0)
    return x, y


def zone_box(zone_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Zone box (min_x, max_x, min_y, max_y) for each zone id
    (derived from part.p_partkey)."""
    z = np.asarray(zone_id, dtype=np.int64)
    zm = z % _M1  # mod-first, see doc_xy (``% 50`` stays on the raw id)
    zm3 = z % _ZONE_M3
    h1 = (zm * _ZONE_A1) % _M1
    h2 = (zm * _ZONE_A2 + _ZONE_B2) % _M1
    h3 = (zm3 * _ZONE_A3) % _ZONE_M3
    h4 = (zm3 * _ZONE_A4 + _ZONE_B4) % _ZONE_M3
    cx = (h1 / float(_M1)) * 360.0 - 180.0
    cy = (h2 / float(_M1)) * 180.0 - 90.0
    hw = 0.05 + (h3 / float(_ZONE_M3)) * 5.0
    hh = 0.05 + (h4 / float(_ZONE_M3)) * 2.5
    big = (z % 50) == 0
    hw = np.where(big, hw * 20.0, hw)
    hh = np.where(big, hh * 20.0, hh)
    return cx - hw, cx + hw, cy - hh, cy + hh


def segment_coords(seg_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Segment (start_x, start_y, end_x, end_y) for each segment id
    (derived from customer.c_custkey)."""
    s = np.asarray(seg_id, dtype=np.int64)
    sm = s % _M1  # mod-first, see doc_xy
    sm3 = s % _SEG_M3
    h1 = (sm * _SEG_A1) % _M1
    h2 = (sm * _SEG_A2 + _SEG_B2) % _M1
    h3 = (sm3 * _SEG_A3) % _SEG_M3
    h4 = (sm3 * _SEG_A4 + _SEG_B4) % _SEG_M3
    sx = (h1 / float(_M1)) * 360.0 - 180.0
    sy = (h2 / float(_M1)) * 180.0 - 90.0
    ex = sx + ((h3 / float(_SEG_M3)) * 6.0 - 3.0) + 0.001
    ey = sy + ((h4 / float(_SEG_M3)) * 6.0 - 3.0) + 0.001
    return sx, sy, ex, ey


# ---------------------------------------------------------------------------
# SQL builders (DuckDB oracle side of the same derivations)
# ---------------------------------------------------------------------------

def sql_docs_geo() -> str:
    """CTE body: documents with derived (x, y) — bit-identical to
    doc_xy (mod-first multiply on both sides; raw ``% 5`` hot test)."""
    m = F(_M1)
    dm = f"(doc_id % {_M1})"
    return f"""
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0
                THEN {F(HOT_X)} + (((({dm} * {_DOC_A1}) % {_M1}) / {m}) * 4.0e0 - 2.0e0)
                ELSE ((({dm} * {_DOC_A1}) % {_M1}) / {m}) * 360.0e0 - 180.0e0 END AS x,
           CASE WHEN doc_id % 5 = 0
                THEN {F(HOT_Y)} + (((({dm} * {_DOC_A2} + {_DOC_B2}) % {_M1}) / {m}) * 2.0e0 - 1.0e0)
                ELSE ((({dm} * {_DOC_A2} + {_DOC_B2}) % {_M1}) / {m}) * 180.0e0 - 90.0e0 END AS y
    FROM documents
    """


def sql_zones() -> str:
    """CTE body: zones with derived boxes — bit-identical to zone_box."""
    m = F(_M1)
    m3 = F(_ZONE_M3)
    zm = f"(p_partkey % {_M1})"
    zm3 = f"(p_partkey % {_ZONE_M3})"
    return f"""
    SELECT p_partkey AS zone_id,
           cx - hw AS min_x, cx + hw AS max_x,
           cy - hh AS min_y, cy + hh AS max_y
    FROM (
      SELECT p_partkey,
             ((({zm} * {_ZONE_A1}) % {_M1}) / {m}) * 360.0e0 - 180.0e0 AS cx,
             ((({zm} * {_ZONE_A2} + {_ZONE_B2}) % {_M1}) / {m}) * 180.0e0 - 90.0e0 AS cy,
             CASE WHEN p_partkey % 50 = 0
                  THEN (5.0e-2 + ((({zm3} * {_ZONE_A3}) % {_ZONE_M3}) / {m3}) * 5.0e0) * 20.0e0
                  ELSE 5.0e-2 + ((({zm3} * {_ZONE_A3}) % {_ZONE_M3}) / {m3}) * 5.0e0 END AS hw,
             CASE WHEN p_partkey % 50 = 0
                  THEN (5.0e-2 + ((({zm3} * {_ZONE_A4} + {_ZONE_B4}) % {_ZONE_M3}) / {m3}) * 2.5e0) * 20.0e0
                  ELSE 5.0e-2 + ((({zm3} * {_ZONE_A4} + {_ZONE_B4}) % {_ZONE_M3}) / {m3}) * 2.5e0 END AS hh
      FROM part
    )
    """


def sql_segments() -> str:
    """CTE body: segments with derived endpoints — bit-identical to
    segment_coords."""
    m = F(_M1)
    ms = F(_SEG_M3)
    sm = f"(c_custkey % {_M1})"
    sm3 = f"(c_custkey % {_SEG_M3})"
    return f"""
    SELECT c_custkey AS segment_id,
           sx AS start_x, sy AS start_y,
           (sx + (((({sm3} * {_SEG_A3}) % {_SEG_M3}) / {ms}) * 6.0e0 - 3.0e0)) + 1.0e-3 AS end_x,
           (sy + (((({sm3} * {_SEG_A4} + {_SEG_B4}) % {_SEG_M3}) / {ms}) * 6.0e0 - 3.0e0)) + 1.0e-3 AS end_y
    FROM (
      SELECT c_custkey,
             ((({sm} * {_SEG_A1}) % {_M1}) / {m}) * 360.0e0 - 180.0e0 AS sx,
             ((({sm} * {_SEG_A2} + {_SEG_B2}) % {_M1}) / {m}) * 180.0e0 - 90.0e0 AS sy
      FROM customer
    )
    """


# ---------------------------------------------------------------------------
# Arrow batch attachers (map_batches bodies)
# ---------------------------------------------------------------------------

def attach_doc_xy(batch: pa.Table) -> pa.Table:
    x, y = doc_xy(batch.column("doc_id").to_numpy())
    return batch.append_column("x", pa.array(x)).append_column("y", pa.array(y))


def attach_zone_box(batch: pa.Table) -> pa.Table:
    min_x, max_x, min_y, max_y = zone_box(batch.column("p_partkey").to_numpy())
    t = batch.append_column("zone_id", batch.column("p_partkey"))
    for name, arr in (("min_x", min_x), ("max_x", max_x), ("min_y", min_y), ("max_y", max_y)):
        t = t.append_column(name, pa.array(arr))
    return t


def attach_segment(batch: pa.Table) -> pa.Table:
    sx, sy, ex, ey = segment_coords(batch.column("c_custkey").to_numpy())
    t = batch.append_column("segment_id", batch.column("c_custkey"))
    for name, arr in (("start_x", sx), ("start_y", sy), ("end_x", ex), ("end_y", ey)):
        t = t.append_column(name, pa.array(arr))
    return t
