#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/localverify.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the sf_dir tables,
then compares row count, schema (column names), and a value hash with
columns sorted by name and rows sorted by all columns. Floats are rounded
to 9 significant-ish decimals before hashing, mirroring a tolerant compare.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(canon(r[i]) for i in order) for r in rows
    )
    return out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results = {}
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [d[0] for d in spark.description]
            s_rows = spark.fetchall()
            oracle = con.execute(sql)
            o_cols = [d[0] for d in oracle.description]
            o_rows = oracle.fetchall()
        except Exception as e:
            results[name] = f"ERR {e}"
            continue
        schema_ok = sorted(s_cols) == sorted(o_cols)
        rows_ok = len(s_rows) == len(o_rows)
        s_key = frame_key(s_rows, s_cols)
        o_key = frame_key(o_rows, o_cols)
        hash_ok = s_key == o_key
        if schema_ok and rows_ok and hash_ok:
            results[name] = f"PASS ({len(s_rows)} rows)"
        else:
            results[name] = (f"FAIL schema={schema_ok} rows={rows_ok}"
                             f" ({len(s_rows)} vs {len(o_rows)}) hash={hash_ok}")
            for i, (a, b) in enumerate(zip(s_key, o_key)):
                if a != b:
                    print(f"  {name} first diff row {i}:\n    spark : {a}\n    oracle: {b}")
                    break
    width = max(len(k) for k in results)
    fails = 0
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
        if not v.startswith("PASS"):
            fails += 1
    print(f"== {len(results) - fails}/{len(results)} pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
