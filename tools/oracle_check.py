#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify.scala output.

Mimics the driver's t2 gate: run each oracle SQL in DuckDB over the sf
tables, load the corresponding Spark parquet dump, sort columns by name and
rows by all columns, and compare exactly (with a float diff report instead
of a silent hash mismatch).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
        # decimals → float for comparison parity
        if df[c].dtype.name.startswith("decimal") or str(df[c].dtype) == "object":
            pass
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duck={list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(w)}")
            failures += 1
            continue
        bad = []
        for c in g.columns:
            gs, ws = g[c], w[c]
            try:
                if str(gs.dtype).startswith("float") or str(ws.dtype).startswith("float"):
                    import numpy as np
                    ga, wa = gs.to_numpy(dtype=float), ws.to_numpy(dtype=float)
                    mask = ~((ga == wa) | (pd.isna(ga) & pd.isna(wa)))
                    if mask.any():
                        d = float(abs(ga[mask] - wa[mask]).max())
                        bad.append(f"{c}: {int(mask.sum())} diffs, max abs {d:.3e}")
                else:
                    if not gs.astype(str).equals(ws.astype(str)):
                        n = int((gs.astype(str) != ws.astype(str)).sum())
                        i = (gs.astype(str) != ws.astype(str)).idxmax()
                        bad.append(f"{c}: {n} diffs, first at row {i}: "
                                   f"spark={gs[i]!r} duck={ws[i]!r}")
            except Exception as e:  # noqa: BLE001
                bad.append(f"{c}: compare error {e}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows, {len(g.columns)} cols)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle-matched")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
