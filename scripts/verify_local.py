#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate.

Runs `sbt runMain graft.Verify <sfDir> <outDir>` (unless --skip-spark),
then executes each oracle_sql.json entry in DuckDB over the same parquet
tables and compares: row count, schema (column names), and values
(columns sorted by name, rows sorted, exact equality).

Usage: python3 scripts/verify_local.py [sfDir] [--skip-spark]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
OUT = Path("/tmp/graft_verify")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-spark" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line: print(line)

con = duckdb.connect()
for t in TABLES:
    # driver testdata ships single files; builder-synthesized SFs
    # (MakeSf1) are Spark-written directories -> glob the part files
    src = f"{SF_DIR}/{t}.parquet"
    if Path(src).is_dir():
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracles = json.loads((OUT / "oracle_sql.json").read_text())
failures = []

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, (list, tuple)): return tuple(norm(x) for x in v)
    return v

for name, sql in sorted(oracles.items()):
    pdir = OUT / name
    if not pdir.exists():
        failures.append((name, "spark output missing")); print(f"FAIL {name}: spark output missing"); continue
    try:
        spark_tbl = pq.read_table(str(pdir))
    except Exception as e:
        failures.append((name, f"parquet read: {e}")); print(f"FAIL {name}: parquet read {e}"); continue
    try:
        duck = con.execute(sql)
        duck_cols = [d[0] for d in duck.description]
        duck_rows = duck.fetchall()
    except Exception as e:
        failures.append((name, f"oracle error: {e}")); print(f"FAIL {name}: oracle error {e}"); continue

    s_cols = sorted(spark_tbl.column_names)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        failures.append((name, f"schema: spark={s_cols} duck={d_cols}"))
        print(f"FAIL {name}: schema spark={s_cols} duck={d_cols}"); continue

    # null-safe total order: plain tuple sort raises TypeError on
    # None-vs-value; any deterministic order works since both sides are
    # sorted with the SAME key before the equality check
    def row_key(t):
        return tuple((x is None, str(type(x)), str(x)) for x in t)
    s_data = spark_tbl.select(s_cols).to_pylist()
    s_rows = sorted((tuple(norm(r[c]) for c in s_cols) for r in s_data), key=row_key)
    idx = [duck_cols.index(c) for c in s_cols]
    d_rows = sorted((tuple(norm(r[i]) for i in idx) for r in duck_rows), key=row_key)
    if len(s_rows) != len(d_rows):
        failures.append((name, f"rows: spark={len(s_rows)} duck={len(d_rows)}"))
        print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}"); continue
    if s_rows != d_rows:
        bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
        failures.append((name, "value mismatch"))
        print(f"FAIL {name}: first diff at sorted row {bad}:\n  cols : {s_cols}\n  spark: {s_rows[bad]}\n  duck : {d_rows[bad]}")
        continue
    print(f"PASS {name} ({len(s_rows)} rows)")

print(f"\n{len(oracles) - len(failures)}/{len(oracles)} queries match")
sys.exit(1 if failures else 0)
