#!/usr/bin/env python3
"""Driver-mimic: compare graft.Verify parquet dumps against DuckDB oracles.

Usage: python3 scripts/check_oracles.py <sfDir> <verifyOutDir> [query ...]

Mirrors the driver's CORRECTNESS check: for each query in oracle_sql.json,
run the SQL in DuckDB with each <sfDir>/*.parquet registered as a view named
by its stem, then compare (schema-insensitively: columns sorted by name,
rows sorted, values stringified) against <verifyOutDir>/<query>/ parquet.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: None if pd.isna(v) else str(v))
    df = df.sort_values(by=list(df.columns), na_position="first")
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    only = set(sys.argv[3:])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for p in sf_dir.glob("*.parquet"):
        con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")

    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            expected = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        try:
            actual = canon(pd.read_parquet(out_dir / name))
        except Exception as e:
            print(f"FAIL {name}: missing/unreadable spark dump: {e}")
            failed.append(name)
            continue
        if list(expected.columns) != list(actual.columns):
            print(f"FAIL {name}: columns {list(actual.columns)} != {list(expected.columns)}")
            failed.append(name)
        elif len(expected) != len(actual):
            print(f"FAIL {name}: rows {len(actual)} != {len(expected)}")
            failed.append(name)
        elif not expected.equals(actual):
            diff = (expected != actual) & ~(expected.isna() & actual.isna())
            cells = diff.to_numpy().nonzero()
            r, c = cells[0][0], cells[1][0]
            col = expected.columns[c]
            print(f"FAIL {name}: first diff row {r} col {col}: "
                  f"spark={actual.iloc[r][col]!r} oracle={expected.iloc[r][col]!r}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(actual)} rows)")
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
