#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
and compares: column names (sorted), row counts, and values (rows sorted).
Reports PASS/FAIL per query. This mimics (conservatively) the driver's
row/schema/hash compare, so local PASS is a strong signal.
"""
import sys, json, glob, os
import duckdb
import math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — we demand bit-identical doubles
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output files"); n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            print(f"[----] {name}: no oracle (rows={len(got)})"); n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        gc, ec = sorted(c.lower() for c in got.columns), sorted(c.lower() for c in exp.columns)
        if gc != ec:
            print(f"[FAIL] {name}: columns differ spark={gc} oracle={ec}")
            n_fail += 1
            continue
        got = got[sorted(got.columns, key=str.lower)]
        exp = exp[sorted(exp.columns, key=str.lower)]
        g = sorted(tuple(norm(v) for v in row) for row in got.itertuples(index=False, name=None))
        e = sorted(tuple(norm(v) for v in row) for row in exp.itertuples(index=False, name=None))
        if len(g) != len(e):
            print(f"[FAIL] {name}: rowcount spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, e) if a != b]
        if bad:
            print(f"[FAIL] {name}: {len(bad)}/{len(g)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(g)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
