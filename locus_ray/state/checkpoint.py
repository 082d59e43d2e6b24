"""Resumable partitioned output with per-partition lineage manifests.

The north rule requires "per-partition lineage and metrics checkpointed
so any stage resumes from the last completed fragment".  Batch engines
get this from the output layout, not from operator state:

* the corpus is partitioned into key ranges (Hilbert-prefix shards);
* each shard writes to its own directory ATOMICALLY (write to
  ``_tmp-<shard>``, fsync, rename) plus a ``done/<shard>.json``
  lineage record (input fragment, row count, stage metrics, wall time);
* on restart, :func:`completed_shards` lists the done records and the
  driver simply skips those shards — work resumes from the last
  completed fragment with no partial output visible to readers.

Shards are processed as independent Ray Data pipelines over disjoint
inputs, so a failure loses at most one shard's work.  This module is
deliberately tiny and filesystem-portable (object stores offer the
same rename-or-marker idiom).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Callable


def shard_dir(out_dir: str, shard: str) -> str:
    return os.path.join(out_dir, f"shard={shard}")


def completed_shards(out_dir: str) -> set[str]:
    done = os.path.join(out_dir, "done")
    if not os.path.isdir(done):
        return set()
    return {f[:-5] for f in os.listdir(done) if f.endswith(".json")}


def run_shard(out_dir: str, shard: str, build: Callable[[], "object"],
              lineage: dict | None = None) -> dict:
    """Execute one shard pipeline resumably.

    ``build()`` returns the shard's Dataset; it is written to the shard
    directory atomically and a lineage record is dropped in ``done/``.
    Returns the lineage record (existing one if already complete).
    """
    os.makedirs(os.path.join(out_dir, "done"), exist_ok=True)
    marker = os.path.join(out_dir, "done", f"{shard}.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)

    # RUN-UNIQUE tmp path: a shared _tmp-<shard> let two concurrent
    # resumers (a hung-but-alive driver plus its restarted
    # replacement) rmtree each other's in-flight files and publish an
    # interleaved mix as complete.  Each run writes its own dir; the
    # losing run's debris is cleaned by the final-rename winner below.
    tmp = os.path.join(out_dir, f"_tmp-{shard}-{os.getpid():x}-{uuid.uuid4().hex[:8]}")
    final = shard_dir(out_dir, shard)
    # sweep stale tmp dirs whose writer pid is DEAD (crash debris);
    # a live concurrent resumer's dir is left untouched
    for name in os.listdir(out_dir):
        if not name.startswith(f"_tmp-{shard}-"):
            continue
        try:
            pid = int(name[len(f"_tmp-{shard}-"):].split("-")[0], 16)
            os.kill(pid, 0)  # raises if the pid is gone
        except (ValueError, ProcessLookupError):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid — leave it
    t0 = time.time()
    ds = build()
    ds.write_parquet(tmp)
    n_rows = sum(
        _parquet_rows(os.path.join(tmp, f)) for f in os.listdir(tmp)
        if f.endswith(".parquet")
    )
    _fsync_tree(tmp)
    if os.path.exists(marker):
        # another resumer finished while we built: keep ITS published
        # shard (ours is equivalent but must not clobber a directory
        # readers may already be scanning) and discard our tmp
        shutil.rmtree(tmp, ignore_errors=True)
        with open(marker) as f:
            return json.load(f)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    _fsync_dir(out_dir)
    record = {
        "shard": shard,
        "rows": int(n_rows),
        "wall_sec": time.time() - t0,
        "completed_at": time.time(),
        **(lineage or {}),
    }
    tmp_marker = marker + ".tmp"
    with open(tmp_marker, "w") as f:
        json.dump(record, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp_marker, marker)
    _fsync_dir(os.path.dirname(marker))
    return record


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_tree(path: str) -> None:
    """fsync every file under ``path`` plus the directory itself, so the
    subsequent rename exposes only fully-flushed data (crash after the
    rename can otherwise surface a 'complete' shard with lost pages)."""
    for name in os.listdir(path):
        fp = os.path.join(path, name)
        if os.path.isfile(fp):
            fd = os.open(fp, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
    _fsync_dir(path)


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows
