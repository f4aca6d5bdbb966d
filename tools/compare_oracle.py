#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare Verify.scala's
parquet dumps against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [qName...]
(extra args = compare only those queries — targeted oracle re-timing)

Strict by design: results flow through pandas (like the driver's hash
compare), so type-lossy conversions such as DuckDB HUGEINT -> float64
(sum of BIGINTs) surface as int-vs-float FAILs here instead of passing
locally and hash-mismatching at the driver. Exact value equality (incl.
floats) in row order, columns sorted by name.
"""
import sys, json, glob, math, time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    only = set(sys.argv[3:])
    if only:
        # A typo'd name must not read as "0 pass, 0 fail == green".
        unknown = only - set(oracle)
        if unknown:
            print(f"ERROR: not in oracle_sql.json: {sorted(unknown)}")
            sys.exit(2)
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    t_start = time.monotonic()
    timings = {}  # name -> oracle+compare seconds (the trimmable side)
    for name in sorted(oracle):
        sql = oracle[name]
        t0 = time.monotonic()
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            gdf = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
            edf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got_cols = list(gdf.columns)
        exp_cols = list(edf.columns)
        got = list(gdf.itertuples(index=False, name=None))
        exp = list(edf.itertuples(index=False, name=None))
        ok, msg = compare(got, got_cols, exp, exp_cols)
        timings[name] = time.monotonic() - t0
        if ok:
            print(f"PASS {name} ({len(got)} rows) [{timings[name]:.2f}s]")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    wall = time.monotonic() - t_start
    # the feedback loop for the gate's wall-clock budget: the slow tail
    # is where oracle CTE MATERIALIZED hints / dump trims pay off
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print("slowest oracles: " +
          ", ".join(f"{k}={v:.1f}s" for k, v in slow))
    print(f"== {n_pass} pass, {n_fail} fail == ({wall:.1f}s wall)")
    sys.exit(1 if n_fail else 0)


def compare(got, got_cols, exp, exp_cols):
    if sorted(got_cols) != sorted(exp_cols):
        return False, f"columns differ: spark={sorted(got_cols)} duck={sorted(exp_cols)}"
    gi = [got_cols.index(c) for c in sorted(got_cols)]
    ei = [exp_cols.index(c) for c in sorted(exp_cols)]
    if len(got) != len(exp):
        return False, f"row count differs: spark={len(got)} duck={len(exp)}"
    for rn, (g, e) in enumerate(zip(got, exp)):
        for c, (a, b) in enumerate(zip([g[i] for i in gi], [e[i] for i in ei])):
            if not eq(a, b):
                return False, (f"row {rn} col {sorted(got_cols)[c]}: "
                               f"spark={a!r} ({type(a).__name__}) "
                               f"duck={b!r} ({type(b).__name__})")
    return True, ""


def is_null(x):
    if x is None:
        return True
    if isinstance(x, (float, np.floating)):
        return math.isnan(x)
    # pandas null timestamps arrive as NaT through .df(), not None
    if x is pd.NaT or isinstance(x, np.datetime64) and np.isnat(x):
        return True
    return False


def eq(a, b):
    if is_null(a) or is_null(b):
        return is_null(a) and is_null(b)
    a_b = isinstance(a, (bool, np.bool_))
    b_b = isinstance(b, (bool, np.bool_))
    if a_b != b_b:
        # bool-vs-int stringifies as "True" vs "1" at the driver: FAIL.
        return False
    a_f = isinstance(a, (float, np.floating))
    b_f = isinstance(b, (float, np.floating))
    a_i = isinstance(a, (int, np.integer)) and not a_b
    b_i = isinstance(b, (int, np.integer)) and not b_b
    if (a_f or a_i) and (b_f or b_i):
        # int-vs-float is the driver's "132" vs "132.0" hash mismatch: FAIL.
        if a_f != b_f:
            return False
        return a == b
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        a_l, b_l = list(a), list(b)
        return len(a_l) == len(b_l) and all(eq(x, y) for x, y in zip(a_l, b_l))
    return a == b


if __name__ == "__main__":
    main()
