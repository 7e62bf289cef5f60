#!/usr/bin/env python3
"""Driver-comparator hazard sweep.

The driver compares Spark vs DuckDB-oracle output through pandas:
  - a Spark/oracle column that is an ARRAY (or map/struct) makes pandas
    sort_values throw (unhashable numpy.ndarray)  -> harness err
  - a DuckDB HUGEINT output column (uncast sum over BIGINT) converts to
    float64 in pandas while Spark emits int64    -> hash mismatch

Usage: python3 tools/driverhazards.py <verify_out_dir> <sf_dir>
Exit 1 if any hazard found.
"""
import json
import sys
import glob

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def spark_hazards(out_dir, name):
    bad = []
    for f in glob.glob(f"{out_dir}/{name}/*.parquet"):
        s = pq.read_schema(f)
        for fld in s:
            t = str(fld.type)
            if t.startswith(("list", "map", "struct", "large_list")):
                bad.append((fld.name, t))
        break
    return bad


def oracle_hazards(con, sql):
    rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ)
        if t in ("HUGEINT", "UHUGEINT") or t.endswith("[]") or \
                t.startswith(("STRUCT", "MAP", "LIST")):
            bad.append((col, t))
    return bad


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = 0
    for name in sorted(oracles):
        sh = spark_hazards(out_dir, name)
        try:
            oh = oracle_hazards(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            oh = [("<oracle error>", str(e).splitlines()[0][:120])]
        if sh or oh:
            n_bad += 1
            print(f"{name}:")
            for c, t in sh:
                print(f"  spark  {c}: {t}")
            for c, t in oh:
                print(f"  oracle {c}: {t}")
    # also spark outputs with no oracle (rows-only): arrays still crash
    for name in sorted(set(glob.glob(f"{out_dir}/*/")) ):
        pass
    print(f"hazard queries: {n_bad}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
