#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against DuckDB executions of oracle_sql.json over the same tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), na_position="first")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_bad += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_bad += 1
                continue
            # value compare with tiny float tolerance
            bad_cols = []
            for c in g.columns:
                a, b = g[c], w[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np
                    af = a.astype(float).to_numpy()
                    bf = b.astype(float).to_numpy()
                    eq = np.isclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True)
                    if not eq.all():
                        bad_cols.append(c)
                else:
                    if not a.astype(str).equals(b.astype(str)):
                        bad_cols.append(c)
            if bad_cols:
                print(f"FAIL {name}: value mismatch in {bad_cols}")
                for c in bad_cols[:2]:
                    mask = g[c].astype(str) != w[c].astype(str)
                    print("  got :", g[mask].head(3).to_dict("records"))
                    print("  want:", w[mask].head(3).to_dict("records"))
                n_bad += 1
            else:
                print(f"OK   {name} ({len(g)} rows)")
                n_ok += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed, "
          f"{len(oracle)} with oracle")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
