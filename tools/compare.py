#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark result), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
sfDir parquet tables, sorts columns by name and rows by all columns, and
reports exact / approx match per query.
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize date/datetime-ish to strings for stable compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime") or df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.sql(sql).df()
            s, d = canon(spark_df), canon(duck_df)
            if list(s.columns) != list(d.columns):
                print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
                failures += 1
                continue
            if len(s) != len(d):
                print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
                failures += 1
                continue
            exact = s.equals(d)
            if exact:
                print(f"OK   {name}: {len(s)} rows exact")
                continue
            # where do they differ?
            diffs = []
            for c in s.columns:
                a, b = s[c], d[c]
                if a.equals(b):
                    continue
                try:
                    af = a.astype(float)
                    bf = b.astype(float)
                    if np.allclose(af, bf, rtol=1e-9, atol=1e-12, equal_nan=True):
                        diffs.append((c, "approx", float(np.nanmax(np.abs(af - bf)))))
                        continue
                except (ValueError, TypeError):
                    pass
                mism = (a != b)
                i = int(np.argmax(mism.values))
                diffs.append((c, "MISMATCH", f"row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"))
            hard = [x for x in diffs if x[1] == "MISMATCH"]
            tag = "FAIL" if hard else "WARN(approx-only)"
            if hard:
                failures += 1
            print(f"{tag} {name}: {diffs[:6]}")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
