#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate.

Runs `sbt runMain graft.Verify <sfDir> <outDir>` (unless --skip-spark),
then executes each oracle_sql.json entry in DuckDB over the same parquet
tables and compares: row count, schema (column names), and values
(columns sorted by name, rows sorted, exact equality).

Two extra checks harden this against representation seams the plain
fetchall comparison is blind to (r14's q1 regression: values identical,
driver hash mismatched because DuckDB's pandas path coerces DECIMAL to
float64 while Spark's parquet keeps decimal128):
 1. schema lint — a graded query may not emit repr-fragile types
    (decimal, struct, map, ...) in its final schema; and
 2. coercing compare — both sides are ALSO pushed through their pandas
    coercion paths (pyarrow .to_pandas() vs duckdb .fetchdf()) and
    compared on canonical string forms, the closest local emulation of
    the driver's hasher.

Usage: python3 scripts/verify_local.py [sfDir] [--skip-spark]
"""
import json, math, os, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
# GRAFT_VERIFY_OUT lets two gates run concurrently (e.g. a long sf1
# pass in the background while sf0.001 pre-commit checks keep working)
OUT = Path(os.environ.get("GRAFT_VERIFY_OUT", "/tmp/graft_verify"))
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

# Types whose value repr differs between arrow/parquet and DuckDB's
# pandas coercion (decimal128 -> Decimal vs float64, nested -> ndarray
# vs list, ...). The driver hashes coerced forms, so a graded final
# schema containing one is a latent hash seam even when fetchall values
# match — lint them out entirely.
import pyarrow.types as pat
def fragile(t):
    return (pat.is_decimal(t) or pat.is_struct(t) or pat.is_map(t)
            or pat.is_union(t) or pat.is_dictionary(t)
            or pat.is_large_list(t) or pat.is_list(t)
            or pat.is_binary(t) or pat.is_large_binary(t))

def coerced(v):
    """Canonical string form after pandas-style coercion, emulating the
    driver's hasher: floats via repr, NaN unified, ndarray -> list."""
    if v is None: return "None"
    tn = type(v).__name__
    if tn == "ndarray": v = v.tolist(); tn = "list"
    if isinstance(v, float) and math.isnan(v): return "float:NaN"
    if hasattr(v, "isoformat"): return f"ts:{v.isoformat()}"
    return f"{tn}:{v!r}"

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

    bad_types = [(f.name, str(f.type)) for f in spark_tbl.schema if fragile(f.type)]
    if bad_types:
        failures.append((name, f"repr-fragile output types: {bad_types}"))
        print(f"FAIL {name}: repr-fragile output types {bad_types}"); continue

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

    # coercing path: spark via arrow->pandas, duck via fetchdf; compare
    # canonical string forms so a type-class drift (Decimal vs float64)
    # fails even when numeric equality holds
    try:
        s_pd = spark_tbl.select(s_cols).to_pandas()
        d_pd = con.execute(sql).fetchdf()[s_cols]
        sc_rows = sorted(tuple(coerced(v) for v in row) for row in s_pd.itertuples(index=False, name=None))
        dc_rows = sorted(tuple(coerced(v) for v in row) for row in d_pd.itertuples(index=False, name=None))
        if sc_rows != dc_rows:
            bad = next(i for i, (a, b) in enumerate(zip(sc_rows, dc_rows)) if a != b)
            failures.append((name, "coerced-form mismatch"))
            print(f"FAIL {name}: coerced-form diff at sorted row {bad}:\n  cols : {s_cols}\n  spark: {sc_rows[bad]}\n  duck : {dc_rows[bad]}")
            continue
    except Exception as e:
        failures.append((name, f"coercing compare error: {e}"))
        print(f"FAIL {name}: coercing compare error {e}"); continue
    print(f"PASS {name} ({len(s_rows)} rows)")

print(f"\n{len(oracles) - len(failures)}/{len(oracles)} queries match")
sys.exit(1 if failures else 0)
