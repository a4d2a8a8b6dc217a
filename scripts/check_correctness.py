"""Driver-style correctness check: run each queries() entry and its
oracle_sql() twin on the same sf dir; compare row count, column names,
and order-insensitive values.  Usage:

    PYTHONPATH=/root/repo python scripts/check_correctness.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            # quantize so a ulp of float noise can't reorder tied rows
            df[c] = df[c].map(lambda v: v if pd.isna(v) else round(float(v), 9))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rows {len(got)} != {len(want)}")
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            gc, wc = g[c], w[c]
            if np.issubdtype(gc.dtype, np.floating) or np.issubdtype(
                wc.dtype, np.floating
            ):
                ok = np.allclose(
                    gc.astype(float), wc.astype(float), atol=1e-9, equal_nan=True
                )
            else:
                ok = gc.astype(str).tolist() == wc.astype(str).tolist()
            if not ok:
                bad = (gc.astype(str) != wc.astype(str)).idxmax() if len(gc) else 0
                problems.append(
                    f"col {c} differs, e.g. row {bad}: {gc.iloc[bad]!r} vs {wc.iloc[bad]!r}"
                )
    return problems


def main():
    # optional: --json PATH writes one record per query in the
    # driver's CORRECTNESS_r{N}.json shape (round-4 verdict #4 —
    # the full-registry sweep as a per-round artifact)
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("-"):
            sys.exit("usage: check_correctness.py [--json PATH] [sf_dir] [names...]")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    import __ray_entry__ as entrymod  # applies recommended DataContext

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            records[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}",
            }
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in sqls:
            print(f"ROWS-ONLY {name}: {len(got)} rows in {dt:.1f}s cols={list(got.columns)}")
            records[name] = {
                "rows_only": True, "spark_rows": int(len(got)),
                "oracle_rows": None, "err": None, "secs": round(dt, 2),
            }
            n_pass += 1
            continue
        want = con.execute(sqls[name]).df()
        problems = compare(name, got, want)
        records[name] = {
            "rows_match": not any(p.startswith("rows ") for p in problems),
            "schema_match": not any(p.startswith("columns ") for p in problems),
            "hash_match": not problems,
            "spark_rows": int(len(got)),
            "oracle_rows": int(len(want)),
            "err": "; ".join(problems) or None,
            "secs": round(dt, 2),
        }
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows in {dt:.1f}s")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(records)} records)")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
