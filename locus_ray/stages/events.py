"""Ordered joins over keyed event logs: as-of join and range join.

Two operators Ray Data has no native analog for, expressed with the
same scale shape as ``events_sessionize``: hash-PARTITION the log by
its key (user), then ONE fully-vectorized pass per partition — no
per-row and no per-key Python.  Millions of users cost P partition
calls, and partitions are independent, so the stage streams and
scales with the shuffle like every other keyed operator here.

* :func:`asof_join_partition` — point-in-time lookup: each *probe*
  event is matched to the MOST RECENT prior *build* event by the same
  user, "prior" meaning strictly earlier in the per-user
  ``(ts, event_id)`` total order (deterministic at equal timestamps,
  per the repo-wide tie-break invariant).
* :func:`range_join_partition` — interval join: each probe event is
  paired with EVERY build event by the same user inside a trailing
  window ``[probe.ts - window, probe.ts)``.

Both kernels are pure ``pyarrow.Table -> pyarrow.Table`` functions so
they unit-test without a Ray session.

Multi-key binary search is done WITHOUT composite integer keys (a
``uid << 51 | us`` pack would cap the user-id domain at 4096 and is
exactly the kind of silent-overflow scale bug ADVICE r2 flagged in
``sample_docs``): :func:`_union_searchsorted` lexsorts the union of
data and query tuples with a side flag, which is overflow-free for any
int64 key pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _union_searchsorted(duid: np.ndarray, dus: np.ndarray,
                        quid: np.ndarray, qus: np.ndarray,
                        side: str) -> np.ndarray:
    """Insertion positions of query tuples ``(quid, qus)`` into the
    lexicographically sorted data tuples ``(duid, dus)`` — the two-key
    generalization of ``np.searchsorted`` via one lexsort of the union.

    ``side='left'`` counts data rows strictly below the query tuple;
    ``side='right'`` counts rows <= it.
    """
    n_d, n_q = len(duid), len(quid)
    flag_q = np.int8(-1) if side == "left" else np.int8(1)
    uid_all = np.concatenate((duid, quid))
    us_all = np.concatenate((dus, qus))
    flags = np.concatenate((np.zeros(n_d, np.int8),
                            np.full(n_q, flag_q, np.int8)))
    order = np.lexsort((flags, us_all, uid_all))
    is_q = order >= n_d
    data_upto = np.cumsum(~is_q)          # data rows in positions 0..i
    ins = data_upto[np.flatnonzero(is_q)]  # per query, in sorted order
    out = np.empty(n_q, dtype=np.int64)
    out[order[is_q] - n_d] = ins
    return out


def asof_join_partition(batch: pa.Table, *, probe_type: str,
                        build_type: str) -> pa.Table:
    """One partition of the as-of join (see module docstring).

    Emits ``(event_id, matched_id, gap_us)`` for every probe event that
    has at least one prior build event by the same user.
    """
    us = batch.column("ts").cast(pa.int64()).to_numpy()
    uid = batch.column("user_id").to_numpy()
    eid = batch.column("event_id").to_numpy()
    et = batch.column("event_type").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, us, uid))
    uid, us, eid, et = uid[order], us[order], eid[order], et[order]
    n = len(us)
    idx = np.arange(n, dtype=np.int64)
    # index of the last build row at or before each position, then
    # shifted one row so "prior" is STRICT in the (ts, id) order
    build_idx = np.where(et == build_type, idx, np.int64(-1))
    prior = np.maximum.accumulate(
        np.concatenate(([np.int64(-1)], build_idx[:-1])))
    new_user = np.empty(n, dtype=bool)
    new_user[:1] = True
    new_user[1:] = uid[1:] != uid[:-1]
    seg_start = idx[new_user][np.cumsum(new_user) - 1]
    valid = (et == probe_type) & (prior >= seg_start)
    m = prior[valid]
    return pa.table({
        "event_id": pa.array(eid[valid]),
        "matched_id": pa.array(eid[m]),
        "gap_us": pa.array((us[valid] - us[m]).astype(np.int64)),
    })


def range_join_partition(batch: pa.Table, *, probe_type: str,
                         build_type: str, window_us: int) -> pa.Table:
    """One partition of the trailing-window range join (see module
    docstring).  Emits ``(probe_id, build_id, delta_us)`` with
    ``0 < delta_us <= window_us``.

    The build side is sorted once by ``(user, ts)``; every probe
    resolves its window with two union-lexsort binary searches and the
    pairs are emitted by a vectorized multi-range gather.
    """
    us = batch.column("ts").cast(pa.int64()).to_numpy()
    uid = batch.column("user_id").to_numpy()
    eid = batch.column("event_id").to_numpy()
    et = batch.column("event_type").to_numpy(zero_copy_only=False)
    isb = et == build_type
    isp = et == probe_type
    buid, bus, beid = uid[isb], us[isb], eid[isb]
    puid, pus, peid = uid[isp], us[isp], eid[isp]
    empty = pa.table({
        "probe_id": pa.array([], type=pa.int64()),
        "build_id": pa.array([], type=pa.int64()),
        "delta_us": pa.array([], type=pa.int64()),
    })
    if len(beid) == 0 or len(peid) == 0:
        return empty
    border = np.lexsort((bus, buid))
    buid, bus, beid = buid[border], bus[border], beid[border]
    # window is [p.ts - window_us, p.ts): left insertion at both ends
    lo = _union_searchsorted(buid, bus, puid, pus - window_us, "left")
    hi = _union_searchsorted(buid, bus, puid, pus, "left")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return empty
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    flat = np.arange(total, dtype=np.int64)
    b_idx = np.repeat(lo, counts) + (flat - np.repeat(starts, counts))
    p_rep = np.repeat(np.arange(len(peid), dtype=np.int64), counts)
    return pa.table({
        "probe_id": pa.array(peid[p_rep]),
        "build_id": pa.array(beid[b_idx]),
        "delta_us": pa.array((pus[p_rep] - bus[b_idx]).astype(np.int64)),
    })
