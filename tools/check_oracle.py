"""Local replica of the driver's correctness gate: run every queries() entry
against its oracle_sql() through DuckDB — row count + schema + order-
insensitive value hash.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda x: tuple(x) if isinstance(x, (list, np.ndarray)) else x)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(repr(df[c].tolist()).encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        if hasattr(res, "to_pandas"):
            got = res.to_pandas()
        else:
            got = pd.DataFrame(res)
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [no oracle]")
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle SQL raised {type(e).__name__}: {e}")
            continue
        g, w = normalize(got), normalize(want)
        ok_rows = len(g) == len(w)
        ok_schema = list(g.columns) == list(w.columns)
        ok_hash = ok_rows and ok_schema and value_hash(g) == value_hash(w)
        status = "ok   " if ok_hash else "FAIL "
        if not ok_hash:
            failures.append(name)
        print(f"{status} {name}: rows {len(g)}/{len(w)} schema={ok_schema} hash={ok_hash} ({dt:.1f}s)")
        if not ok_hash and len(g) < 40 and len(w) < 40:
            print("  got:\n", g.head(20).to_string())
            print("  want:\n", w.head(20).to_string())
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
