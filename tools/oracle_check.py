#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with every
/root/testdata table registered as a view, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name and rows by all columns, and
hash-compares values.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    rows = sorted([tuple(str(v) for v in r) for r in df.itertuples(index=False)])
    return rows


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark result parquet")
            failures += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files])
            want = con.execute(sql).df()
        except Exception as e:
            print(f"[FAIL] {name}: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows spark={len(g)} duckdb={len(w)}")
            failures += 1
        elif g != w:
            bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
            print(f"[FAIL] {name}: first diff at row {bad}:\n  spark ={g[bad]}\n  duckdb={w[bad]}")
            failures += 1
        else:
            h = hashlib.sha256(str(g).encode()).hexdigest()[:12]
            print(f"[ OK ] {name}: {len(g)} rows, hash {h}")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
