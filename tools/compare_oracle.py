#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (schema + exact values)
against the Spark result parquet dumped by graft.Verify.

Usage: python3 tools/compare_oracle.py [sfDir] [verifyOut]
"""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")

# Verify emits each oracle under both the bare query name and the
# ".parquet"-suffixed result name (driver lookup convention); normalize
# back to bare names here.
raw = json.load(open(f"{out}/oracle_sql.json"))
oracle = {}
for k, v in raw.items():
    oracle[k.removesuffix(".parquet")] = v
fails = []
for name in sorted(oracle):
    files = glob.glob(f"{out}/{name}.parquet/*.parquet")
    if not files:
        fails.append((name, "no spark result"))
        continue
    spark_t = pq.read_table(files[0])
    try:
        duck_t = con.sql(oracle[name]).arrow()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    sc = sorted(spark_t.column_names)
    dc = sorted(duck_t.column_names)
    if sc != dc:
        fails.append((name, f"columns differ: spark={sc} duck={dc}"))
        continue
    sp = spark_t.select(sc).to_pylist()
    du = duck_t.select(sc).to_pylist()
    if len(sp) != len(du):
        fails.append((name, f"row count: spark={len(sp)} duck={len(du)}"))
        continue
    # schema check (arrow types)
    stypes = {c: str(spark_t.schema.field(c).type) for c in sc}
    dtypes = {c: str(duck_t.schema.field(c).type) for c in dc}
    tmism = {c: (stypes[c], dtypes[c]) for c in sc if stypes[c] != dtypes[c]}
    bad = None
    for i, (r1, r2) in enumerate(zip(sp, du)):
        if r1 != r2:
            bad = (i, r1, r2)
            break
    if bad:
        fails.append((name, f"row {bad[0]} differs:\n  spark={bad[1]}\n  duck ={bad[2]}"))
    elif tmism:
        fails.append((name, f"type mismatch (values equal): {tmism}"))
    else:
        print(f"OK    {name} ({len(sp)} rows)")
for name, msg in fails:
    print(f"FAIL  {name}: {msg}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
no_oracle = [d.split('/')[-1].removesuffix('.parquet') for d in glob.glob(f"{out}/*.parquet")
             if d.split('/')[-1].removesuffix('.parquet') not in oracle]
print("rows-only (no oracle):", sorted(no_oracle))
sys.exit(1 if fails else 0)
