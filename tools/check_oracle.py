#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and compare exactly (columns sorted by name, rows
sorted, values compared cell-by-cell).

Usage: python3 tools/check_oracle.py [sfdir] [outdir] [query...]
(Expects Verify to have been run already: see tools/run_verify.sh)
"""
import json, math, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)

fails = 0
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        spark_df = canon(con.execute(
            f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetchdf())
        duck_df = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        fails += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
        fails += 1
        continue
    bad = []
    # The driver hashes stringified values, so an int64-vs-float64 dtype
    # split (e.g. Spark BIGINT vs DuckDB HUGEINT->float) is a hash FAIL
    # even when the numbers are equal. Flag dtype kind mismatches.
    dtype_bad = [
        (c, str(spark_df[c].dtype), str(duck_df[c].dtype))
        for c in spark_df.columns
        if {spark_df[c].dtype.kind, duck_df[c].dtype.kind} == {"f", "i"}
        or {spark_df[c].dtype.kind, duck_df[c].dtype.kind} == {"f", "u"}
    ]
    if dtype_bad:
        print(f"FAIL {name}: dtype mismatch {dtype_bad}")
        fails += 1
        continue
    for col in spark_df.columns:
        sa, da = spark_df[col].tolist(), duck_df[col].tolist()
        for i, (x, y) in enumerate(zip(sa, da)):
            if not cmp_cell(x, y):
                bad.append((col, i, x, y))
                if len(bad) > 3:
                    break
        if len(bad) > 3:
            break
    if bad:
        print(f"FAIL {name}: {len(bad)}+ cell diffs, e.g. {bad[:3]}")
        fails += 1
    else:
        print(f"PASS {name} ({len(spark_df)} rows)")

print(f"\n{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
