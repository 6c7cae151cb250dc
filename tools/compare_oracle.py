#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet, sort
columns by name + rows by value, and diff. Usage:
    python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value hash tolerance: normalize float repr
        return f"{v:.6g}"
    return str(v)

def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            cur = con.sql(oracle[name])
            ocols, orows = cur.columns, cur.fetchall()
        except Exception as e:
            print(f"ORACLE_ERR {name}: {e}")
            failures += 1
            continue
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            cur2 = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols, srows = cur2.columns, cur2.fetchall()
        except Exception as e:
            print(f"SPARK_READ_ERR {name}: {e}")
            failures += 1
            continue
        oc, orw = frame_to_rows(ocols, orows)
        sc, srw = frame_to_rows(scols, srows)
        if oc != sc:
            print(f"SCHEMA_MISMATCH {name}: oracle={oc} spark={sc}")
            failures += 1
            continue
        if len(orw) != len(srw):
            print(f"ROWCOUNT_MISMATCH {name}: oracle={len(orw)} spark={len(srw)}")
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(orw, srw) if a != b]
        if bad:
            print(f"VALUE_MISMATCH {name}: {len(bad)}/{len(orw)} rows, first: oracle={bad[0][0]} spark={bad[0][1]}")
            failures += 1
        else:
            print(f"OK {name} ({len(orw)} rows)")
    # rows-only checks for queries without oracle
    import os
    for d in sorted(os.listdir(outdir)):
        # skip oracle file, export manifest, and csv/json export variants
        if d in oracle or not os.path.isdir(os.path.join(outdir, d)) \
                or d.endswith(".csv") or d.endswith(".json"):
            continue
        files = glob.glob(f"{outdir}/{d}/*.parquet")
        if not files:
            print(f"NO_OUTPUT {d}")
            failures += 1
            continue
        n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        print(f"ROWS_ONLY {d} ({n} rows)")
    print(f"\nFAILURES: {failures}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
