#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate: for each query dumped
by graft.Verify, run its oracle SQL in DuckDB over the same parquet tables
and compare rows / column names / value hashes (columns sorted by name,
rows sorted by all columns). Usage: local_verify.py <sfDir> <verifyOutDir> [q...]"""
import sys, json, glob, os
import duckdb, pandas as pd, hashlib

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pdir = os.path.join(out, name)
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    spark_df = canon(con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf())
    try:
        ora_df = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
    ok_rows = len(spark_df) == len(ora_df)
    ok_cols = list(spark_df.columns) == list(ora_df.columns)
    def h(df):
        return hashlib.md5(df.to_csv(index=False, float_format="%.9g")
                           .encode()).hexdigest()
    ok_hash = ok_rows and ok_cols and h(spark_df) == h(ora_df)
    status = "OK" if ok_hash else "MISMATCH"
    print(f"{name}: {status} rows={len(spark_df)}/{len(ora_df)} cols_ok={ok_cols}")
    if not ok_hash:
        fails += 1
        if ok_cols and ok_rows:
            cmp = spark_df.compare(ora_df) if spark_df.shape == ora_df.shape else None
            if cmp is not None and not cmp.empty:
                print(cmp.head(5))
sys.exit(1 if fails else 0)
