#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify (Spark) on a given sf dir, then runs each oracle SQL in
DuckDB over the same parquet tables and compares: schema (column names),
row count, and values (exact + tolerant float compare), after sorting
columns by name and rows by all columns.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]
"""
import json
import math
import struct
import subprocess
import sys
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.01"
OUT = Path(ARGS[1] if len(ARGS) > 1 else "/tmp/verify_out")
SKIP = "--skip-verify" in sys.argv
# --only=q1,q2 limits both the Spark run and the compare (local iteration)
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = set(a[len("--only="):].split(","))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    extra = (" " + ",".join(sorted(ONLY))) if ONLY else ""
    cmd = ["sbt", f'runMain graft.Verify {SF_DIR} {OUT}{extra}']
    env = dict(**__import__("os").environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(cmd, cwd="/root/repo", env=env,
                       capture_output=True, text=True, timeout=1800)
    sys.stdout.write("\n".join(
        l for l in r.stdout.splitlines()
        if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-2000:])
        sys.exit(1)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "__len__") and not isinstance(v, (str, bytes))
                else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _is_float(v) -> bool:
    return isinstance(v, (float, np.floating))


def _is_int(v) -> bool:
    return isinstance(v, (int, np.integer)) and not isinstance(v, (bool, np.bool_))


def values_equal(a, b) -> bool:
    # The driver HASHES values, so the local gate must be bit-exact: no
    # float tolerance, and -0.0 != 0.0. (Round 9 shipped two queries this
    # tolerant compare called green that the driver's hash failed.)
    # Type-strict: an int on one side and a float on the other is a
    # MISMATCH even when numerically equal (123 == 123.0) — the driver
    # hashes int64 and float64 differently; this class hash-failed four
    # queries in rounds 11 and 12 (DuckDB sum() returns HUGEINT → float64
    # in pandas) while the old `==` fallback certified them green.
    if _is_float(a) != _is_float(b):
        return False
    if _is_float(a) and _is_float(b):
        a, b = float(a), float(b)
        if math.isnan(a) and math.isnan(b):
            return True
        return struct.pack("<d", a) == struct.pack("<d", b)
    # Symmetric int-strictness: bool-vs-int (True == 1) and
    # Decimal-vs-int (Decimal(1) == 1) would otherwise certify green
    # through plain `==` — the same class of blind spot as the
    # int-vs-float one above. Decimal-vs-Decimal still compares by ==.
    if _is_int(a) != _is_int(b):
        return False
    if isinstance(a, Decimal) != isinstance(b, Decimal):
        return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    if not SKIP:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if ONLY is not None and name not in ONLY:
            continue
        spark_dir = OUT / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(pd.read_parquet(spark_dir))
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        exact = True
        mismatch = None
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c], want[c])):
                if not values_equal(a, b):
                    exact = False
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if exact:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            c, i, a, b = mismatch
            print(f"FAIL {name}: value mismatch col={c} row={i}: {a!r} != {b!r}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
