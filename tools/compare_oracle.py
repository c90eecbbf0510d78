#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle check (driver-side tools only;
not part of the Scala library). Usage:

    python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
views of <sfDir>/*.parquet, read the Spark result parquet, sort columns by
name, sort rows, compare values exactly.
"""
import json, sys, math

import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
            s = duckdb.connect()
            sres = s.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [c[0] for c in sres.description]
            s_rows = sres.fetchall()
            dc, dr = canon(d_rows, d_cols)
            sc, sr = canon(s_rows, s_cols)
            if dc != sc:
                print(f"FAIL {name}: columns differ duck={dc} spark={sc}")
                n_fail += 1
            elif dr != sr:
                diff = [(a, b) for a, b in zip(dr, sr) if a != b]
                print(f"FAIL {name}: {len(dr)} vs {len(sr)} rows; first diffs:")
                for a, b in diff[:3]:
                    print(f"   duck : {a}\n   spark: {b}")
                if len(dr) != len(sr):
                    only_d = set(dr) - set(sr)
                    only_s = set(sr) - set(dr)
                    print(f"   only-duck: {list(only_d)[:2]}  only-spark: {list(only_s)[:2]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(sr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
