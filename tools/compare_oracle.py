#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare Verify.scala's
parquet dumps against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Strict by design: exact value equality (incl. floats) in row order, columns
sorted by name — if this passes, the driver's hash compare should too.
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, got_cols, exp, exp_cols)
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
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
                               f"spark={a!r} duck={b!r}")
    return True, ""


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


if __name__ == "__main__":
    main()
