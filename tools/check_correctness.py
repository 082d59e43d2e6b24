"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf and compares to
``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value hash (rows sorted, columns sorted by name).

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        df = obj.to_pandas()
        if len(df) == 0 and len(df.columns) == 0:
            # the streaming executor prunes all-empty blocks, so an
            # empty result loses its columns in to_pandas(); rebuild
            # the frame from the dataset schema (which survives)
            sch = obj.schema()
            empty = pa.table({n: pa.array([], type=t)
                              for n, t in zip(sch.names, sch.types)})
            return empty.to_pandas()
        return df
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.md5()
    for c in df.columns:
        col = df[c]
        # dtype is part of the hash: repr(tolist()) alone made int32
        # and int64 columns hash identically, masking exactly the
        # engine-vs-oracle type mismatches the real driver gate flags
        # (CLAUDE.md: integers from SQL must CAST to BIGINT)
        h.update(str(col.dtype).encode())
        if np.issubdtype(col.dtype, np.floating):
            h.update(col.to_numpy().tobytes())
        else:
            h.update(repr(col.tolist()).encode())
    return h.hexdigest()


def main(sf_dir: str, only: list[str]) -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    # a typo'd --only name or a queries()/oracle_sql() key drift must
    # FAIL, not silently check nothing (exit 0 looked like a pass)
    unknown = [n for n in only if n not in qs]
    if unknown:
        print(f"FAIL unknown query name(s): {unknown}")
        failures += 1
    if not only:
        stray = sorted(set(oracles) - set(qs))
        missing = sorted(set(qs) - set(oracles))
        if stray:
            print(f"FAIL oracle_sql() keys with no queries() entry: {stray}")
            failures += 1
        if missing:
            # rows-only gates are allowed but must be a visible choice
            print(f"note queries() entries without a SQL oracle "
                  f"(rows-only): {missing}")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} vs {len(exp)}")
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols {list(got.columns)} vs {list(exp.columns)}")
        elif len(got) == len(exp) and value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
            merged = got.merge(exp, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            problems.append(f"{len(diff)} differing rows, e.g.\n{diff.head(4)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(str(p) for p in problems))
            failures += 1
        else:
            print(f"ok   {name}: {len(got)} rows match ({dt:.1f}s)")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    raise SystemExit(main(sf, only))
