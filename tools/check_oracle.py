#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: for each query name
given (default: all in oracle_sql.json), read the Spark result parquet from
the verify dump, run the oracle SQL in DuckDB over the same sf tables, sort
columns by name and rows by value, and compare shapes and values."""
import json, sys, glob, math
import duckdb

VERIFY_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_r7"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
names = sys.argv[3:]

oracle = json.load(open(f"{VERIFY_DIR}/oracle_sql.json"))
if not names:
    names = sorted(oracle.keys())

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

def canon(df):
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False):
        out = []
        for v in row:
            if isinstance(v, float):
                out.append(round(v, 6))
            else:
                out.append(v)
        rows.append(tuple(str(x) for x in out))
    return cols, sorted(rows)

fails = 0
for name in names:
    if name not in oracle:
        print(f"{name}: NO ORACLE")
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM parquet_scan('{VERIFY_DIR}/{name}/*.parquet')").df()
        ora_df = con.execute(oracle[name]).df()
        sc, sr = canon(spark_df)
        oc, orows = canon(ora_df)
        ok = sc == oc and sr == orows
        status = "OK" if ok else "MISMATCH"
        if not ok:
            fails += 1
            print(f"{name}: {status} spark_rows={len(sr)} oracle_rows={len(orows)} "
                  f"cols {sc} vs {oc}")
            for a, b in list(zip(sr, orows))[:5]:
                if a != b:
                    print(f"  spark={a}\n  oracle={b}")
            if len(sr) != len(orows):
                only_s = set(sr) - set(orows)
                only_o = set(orows) - set(sr)
                print(f"  only_spark={list(only_s)[:3]} only_oracle={list(only_o)[:3]}")
        else:
            print(f"{name}: OK rows={len(sr)}")
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
sys.exit(1 if fails else 0)
