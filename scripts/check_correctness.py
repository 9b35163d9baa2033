"""Local stand-in for the driver's correctness gate.

Runs every ``__ray_entry__.queries()[name](sf_dir)`` and, where an
``oracle_sql()`` entry exists, the same-named SQL through DuckDB with
the testdata parquet tables registered as views, then compares
row-count, schema (column names) and an order-insensitive value hash
(columns sorted by name, rows sorted, floats rounded to 6 decimals) —
the same comparison shape the driver records in CORRECTNESS_r{N}.json.

Usage:  python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(f"unexpected result type {type(res)}")


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    rows = sorted(df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            ignore_reinit_error=True,
        )

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from simhash_ray.logging_filters import install_empty_schema_drift_filter

    install_empty_schema_drift_filter()
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_green = n_red = n_noracle = 0
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = _to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR      {name:28s} {type(ex).__name__}: {ex}")
            n_red += 1
            results[name] = {"err": repr(ex)}
            continue
        dt = time.time() - t0
        if name not in sqls:
            n_noracle += 1
            print(f"NO_ORACLE  {name:28s} rows={len(mine):<7d} {dt:5.1f}s")
            results[name] = {"rows": len(mine), "oracle": None}
            continue
        try:
            oracle = con.execute(sqls[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"SQL_ERR    {name:28s} {ex}")
            n_red += 1
            results[name] = {"err": f"sql: {ex}"}
            continue
        rows_ok = len(mine) == len(oracle)
        schema_ok = sorted(mine.columns) == sorted(oracle.columns)
        hash_ok = schema_ok and value_hash(mine) == value_hash(oracle)
        ok = rows_ok and schema_ok and hash_ok
        n_green += ok
        n_red += not ok
        flag = "GREEN" if ok else "RED"
        detail = "" if ok else (
            f" rows {len(mine)}/{len(oracle)}"
            f" schema={'ok' if schema_ok else sorted(set(mine.columns) ^ set(oracle.columns))}"
            f" hash={'ok' if hash_ok else 'MISMATCH'}"
        )
        print(f"{flag:10s} {name:28s} rows={len(mine):<7d} {dt:5.1f}s{detail}")
        results[name] = {
            "rows_match": rows_ok, "schema_match": schema_ok,
            "hash_match": hash_ok, "rows": len(mine),
            "sec": round(dt, 2),
        }

    slow = sorted(
        ((v.get("sec", 0.0), k) for k, v in results.items()), reverse=True
    )[:10]
    print("\nslowest:", ", ".join(f"{k}={s:.1f}s" for s, k in slow if s))
    print(f"{n_green} green, {n_red} red, {n_noracle} no-oracle")
    out = "/tmp/check_correctness.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    return 1 if n_red else 0


if __name__ == "__main__":
    raise SystemExit(main())
