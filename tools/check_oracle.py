#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against Verify output.

Mimics the driver's correctness gate: for each query with an oracle SQL,
run the SQL in DuckDB over the sf tables, load the Spark parquet result,
sort columns by name, sort rows, and compare values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    # sort columns by name, then rows by string repr
    df = df[sorted(df.columns)]
    rows = df.values.tolist()
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v): return "nan"
            return f"{v:.9g}"
        return str(v)
    return sorted([tuple(norm(v) for v in r) for r in rows])

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            # dtype-strict: the driver's value hash distinguishes 3.0 from 3
            # (DuckDB HUGEINT -> pandas float64 vs Spark int64 broke
            # dd_contamination in r02 while %.9g normalization masked it
            # here). Compare pandas dtype *kinds* per column so a numeric
            # class mismatch fails locally exactly like it fails upstream.
            kw = {c: want[c].dtype.kind for c in want.columns}
            kg = {c: got[c].dtype.kind for c in got.columns}
            if sorted(kw) == sorted(kg) and any(kw[c] != kg[c] for c in kw):
                bad = {c: (kw[c], kg[c]) for c in kw if kw[c] != kg[c]}
                print(f"FAIL {name}: dtype-kind mismatch (oracle, spark): {bad}")
                fail += 1
                continue
            cw, cg = canon(want), canon(got)
            if len(cw) != len(cg):
                print(f"FAIL {name}: rows want={len(cw)} got={len(cg)}")
                fail += 1
            elif cw != cg:
                bad = next(i for i, (a, b) in enumerate(zip(cw, cg)) if a != b)
                print(f"FAIL {name}: first diff at row {bad}:\n  want={cw[bad]}\n  got ={cg[bad]}")
                print(f"  cols want={sorted(want.columns)} got={sorted(got.columns)}")
                fail += 1
            else:
                print(f"OK   {name} ({len(cw)} rows)")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            fail += 1
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
