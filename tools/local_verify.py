#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not shipped).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, executes the matching
oracle_sql.json entry in DuckDB against the same sf tables and compares
(schema column names, row count, and value hash with columns sorted by
name). Usage:  python3 tools/local_verify.py <sfDir> <outDir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for hashing parity
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, only: set = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # mirror SPARK_GRAFT_VERIFY_ONLY partial dumps
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    # a query that crashed in Verify produces no result dir — that must
    # FAIL the gate, not silently vanish from the comparison
    produced = {os.path.basename(d.rstrip("/"))
                for d in glob.glob(f"{out_dir}/*/")}
    for missing in sorted(set(oracle) - produced):
        failures += 1
        print(f"  {missing:32s} FAIL  NO RESULT (query crashed in Verify?)")
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        got = pd.read_parquet(qdir)
        if name not in oracle:
            print(f"  {name:32s} rows-only: {len(got)} rows")
            continue
        exp = con.execute(oracle[name]).fetchdf()
        g, e = norm(got), norm(exp)
        status = []
        if list(g.columns) != list(e.columns):
            status.append(f"SCHEMA got={list(g.columns)} exp={list(e.columns)}")
        elif len(g) != len(e):
            status.append(f"ROWS got={len(g)} exp={len(e)}")
        else:
            gh = pd.util.hash_pandas_object(g, index=False).sum()
            eh = pd.util.hash_pandas_object(e, index=False).sum()
            if gh != eh:
                status.append("HASH mismatch")
                neq = (g != e) & ~(g.isna() & e.isna())
                bad = neq.any(axis=0)
                for c in g.columns[bad][:3]:
                    i = neq[c].idxmax()
                    status.append(f"  col {c} row {i}: got={g[c][i]!r} exp={e[c][i]!r}")
        if status:
            failures += 1
            print(f"  {name:32s} FAIL  " + "; ".join(status[:1]))
            for s in status[1:]:
                print(f"     {s}")
        else:
            print(f"  {name:32s} OK    {len(g)} rows")
    print(f"{'FAIL' if failures else 'PASS'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
