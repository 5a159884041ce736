#!/usr/bin/env python
"""Driver-style side-by-side check: run every queries() entry at a given sf
and compare against oracle_sql() via DuckDB (row-count + schema-name +
order-insensitive value hash). Mirrors the graft driver's correctness gate.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            df[c] = col.round(9)
        elif pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype("int64")
    rows = sorted(tuple(r) for r in df.itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from hydro_raster_ray.runtime import tune_context

    tune_context()

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    sqls = E.oracle_sql()
    n_fail = 0
    results = []  # JSON artifact rows (GRAFT_ORACLE_JSON)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: ray query raised {type(ex).__name__}: {ex}")
            results.append({"name": name, "status": "fail",
                            "detail": f"ray raised {type(ex).__name__}"})
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(mine)} ({dt:.1f}s) [rows-only, no oracle]")
            results.append({"name": name, "status": "ok", "rows": len(mine),
                            "sec": round(dt, 1), "detail": "rows-only"})
            continue
        try:
            theirs = con.sql(sqls[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            results.append({"name": name, "status": "fail",
                            "detail": f"oracle raised {type(ex).__name__}"})
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(theirs):
            problems.append(f"rows {len(mine)} != {len(theirs)}")
        if sorted(mine.columns) != sorted(theirs.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(theirs.columns)}")
        elif value_hash(mine) != value_hash(theirs):
            problems.append("value-hash mismatch")
        if problems:
            n_fail += 1
            results.append({"name": name, "status": "fail",
                            "detail": "; ".join(problems), "sec": round(dt, 1)})
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            m = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)[:2])
            t = (
                theirs[sorted(theirs.columns)].sort_values(sorted(theirs.columns)[:2])
                if sorted(mine.columns) == sorted(theirs.columns)
                else theirs
            )
            print("  mine:\n", m.head(8).to_string(), sep="")
            print("  oracle:\n", t.head(8).to_string(), sep="")
        else:
            results.append({"name": name, "status": "ok", "rows": len(mine),
                            "sec": round(dt, 1),
                            "detail": "rows+schema+hash match"})
            print(f"ok   {name}: rows={len(mine)} hash match ({dt:.1f}s)")
    ray.shutdown()
    print("FAILURES:", n_fail)
    jpath = os.environ.get("GRAFT_ORACLE_JSON")
    if jpath:
        import json

        with open(jpath, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                    "n_queries": len(results),
                    "failures": n_fail,
                    "results": results,
                },
                f,
                indent=1,
            )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
