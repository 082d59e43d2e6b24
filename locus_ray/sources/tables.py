"""Loaders over the driver-generated parquet tables (TESTDATA.md).

Ray side: ``ray.data.read_parquet`` with column pruning; geo layers are
derived deterministically (:mod:`locus_ray.derive`).  Broadcast-side
payloads (zones, segments — the small dimension layers) are read
driver-side with pyarrow and turned into numpy dicts ready for
``ray.put``; the streaming side is never materialized.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from .. import derive


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def table_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet footer metadata — no data read.  The
    input-size signal for :func:`locus_ray.config.num_partitions_for`
    at plan-build time (a ``Dataset.count()`` on a derived dataset
    would execute its lineage)."""
    return pq.ParquetFile(
        os.path.join(sf_dir, f"{name}.parquet")).metadata.num_rows


def docs_geo(sf_dir: str, extra_columns: tuple[str, ...] = ()):
    """documents with derived (x, y) geotags — the probe side."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", *extra_columns])
    return ds.map_batches(derive.attach_doc_xy, batch_format="pyarrow", zero_copy_batch=True)


def zones_ds(sf_dir: str):
    """zones (derived boxes) as a Dataset — for shuffle-join variants."""
    ds = read_table(sf_dir, "part", columns=["p_partkey"])
    return ds.map_batches(derive.attach_zone_box, batch_format="pyarrow",
                          zero_copy_batch=True).drop_columns(["p_partkey"])


def segments_ds(sf_dir: str):
    ds = read_table(sf_dir, "customer", columns=["c_custkey"])
    return ds.map_batches(derive.attach_segment, batch_format="pyarrow",
                          zero_copy_batch=True).drop_columns(["c_custkey"])


def zones_payload(sf_dir: str) -> dict[str, np.ndarray]:
    """Broadcast payload for the zones layer (driver-side small read)."""
    keys = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"]
    ).column("p_partkey").to_numpy()
    min_x, max_x, min_y, max_y = derive.zone_box(keys)
    return {"ids": keys.astype(np.int64), "min_x": min_x, "max_x": max_x,
            "min_y": min_y, "max_y": max_y}


def segments_payload(sf_dir: str) -> dict[str, np.ndarray]:
    keys = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).column("c_custkey").to_numpy()
    sx, sy, ex, ey = derive.segment_coords(keys)
    return {"ids": keys.astype(np.int64), "start_x": sx, "start_y": sy,
            "end_x": ex, "end_y": ey}


def docs_payload(sf_dir: str) -> dict[str, np.ndarray]:
    """documents as a kNN build side (doc->doc joins, query-point kNN)."""
    keys = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).column("doc_id").to_numpy()
    x, y = derive.doc_xy(keys)
    return {"ids": keys.astype(np.int64), "x": x, "y": y}
