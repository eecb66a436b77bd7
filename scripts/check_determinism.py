#!/usr/bin/env python3
"""Determinism guard: hash-compare two graft.Verify output directories.

Usage:
  sbt "runMain graft.Verify <sfDir> /tmp/det_a" "runMain graft.Verify <sfDir> /tmp/det_b"
  python3 scripts/check_determinism.py /tmp/det_a /tmp/det_b

A query whose two runs differ is nondeterministic (unstable tie-break,
order-dependent aggregate, uncontrolled randomness) — exactly the class of
bug a single oracle compare can miss when the oracle happens to agree with
one of the possible outcomes.
"""
import sys
import pathlib

import duckdb


def row_hash(con, d):
    cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{d}/*.parquet'").fetchall()]
    order = ", ".join(f'"{c}"' for c in sorted(cols))
    return con.sql(f"SELECT count(*), sum(hash(ROW({order}))) FROM '{d}/*.parquet'").fetchone()


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = pathlib.Path(sys.argv[1]), pathlib.Path(sys.argv[2])
    con = duckdb.connect()
    bad = []
    names = sorted(p.name for p in a.iterdir() if p.is_dir())
    for name in names:
        if not (b / name).is_dir():
            bad.append((name, "missing in second run"))
            continue
        ha, hb = row_hash(con, a / name), row_hash(con, b / name)
        status = "OK" if ha == hb else "DIFF"
        print(f"{status:4s} {name} ({ha[0]} rows)")
        if ha != hb:
            bad.append((name, f"{ha} != {hb}"))
    if bad:
        print(f"\n{len(bad)} nondeterministic queries: {[n for n, _ in bad]}")
        return 1
    print(f"\nall {len(names)} queries repeat identically")
    return 0


if __name__ == "__main__":
    sys.exit(main())
