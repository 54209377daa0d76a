"""Full driver simulation: run every queries() entry vs its oracle_sql()
in DuckDB at a given SF dir, the way the grading driver does.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
Prints one line per query: name, ray rows, oracle rows, hash match.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa
import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=16, include_dashboard=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, sqls = E.queries(), E.oracle_sql()
    names = [n for n in qs if not only or n in only]
    results = {}
    n_green = n_noracle = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            got = to_pandas(qs[name](sf))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:40s} RAY-ERROR {type(exc).__name__}: {exc}")
            results[name] = {"status": "ray_error", "error": str(exc)[:200]}
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"{name:40s} rows={len(got):7d}  no_oracle   {dt:6.1f}s")
            results[name] = {"status": "no_oracle", "rows": len(got)}
            n_noracle += 1
            continue
        try:
            want = con.sql(sqls[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:40s} SQL-ERROR {exc}")
            results[name] = {"status": "sql_error", "error": str(exc)[:200]}
            n_fail += 1
            continue
        rows_ok = len(got) == len(want)
        cols_ok = sorted(got.columns) == sorted(want.columns)
        hash_ok = cols_ok and value_hash(got) == value_hash(want)
        ok = rows_ok and cols_ok and hash_ok
        status = "GREEN" if ok else "MISMATCH"
        if ok:
            n_green += 1
        else:
            n_fail += 1
        print(
            f"{name:40s} rows={len(got):7d}/{len(want):7d} "
            f"cols={'ok' if cols_ok else sorted(got.columns)} "
            f"hash={'ok' if hash_ok else 'BAD'}  {status}  {dt:6.1f}s"
        )
        results[name] = {
            "status": status.lower(), "rows": len(got),
            "oracle_rows": len(want),
        }
    print(
        f"\nTOTAL {len(names)}: {n_green} green, {n_noracle} no_oracle, "
        f"{n_fail} fail"
    )
    with open("/tmp/driver_sim_results.json", "w") as f:
        json.dump(results, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
