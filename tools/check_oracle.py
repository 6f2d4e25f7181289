#!/usr/bin/env python3
"""Local dev tool (NOT part of the library): emulate the driver's t2 check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the raw tables in <sfDir>,
and compares: column names (sorted), row count, and exact values in emitted
row order. Stricter than (or equal to) the driver's hash compare.
"""
import sys, json, math, re

import duckdb

# The driver's hasher canonicalizes decimals differently per engine
# (pyarrow decimal128 vs DuckDB's native decimal rendering), so a
# value-identical result can still hash-mismatch. r17 disproved the
# ">18 is the hazard" hypothesis: q_window_drawdown surfaced
# DECIMAL(18,4) — inside the old safe band — and still hash-failed,
# while all 180 green keys surface no decimal at all (decimal-exact
# accumulate, DOUBLE/BIGINT surface, per Det.scala). The empirical rule:
# NO surfaced DECIMAL column of any precision, on EITHER side.
MAX_SURFACED_DECIMAL_PRECISION = 0


def wide_decimal_cols(cols, types):
    bad = []
    for c, t in zip(cols, types):
        m = re.match(r"DECIMAL\((\d+),", str(t).upper())
        if m and int(m.group(1)) > MAX_SURFACED_DECIMAL_PRECISION:
            bad.append(f"{c}:{t}")
    return bad

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
            got_cols = got_rel.columns
            got = got_rel.fetchall()
            exp_rel = con.sql(oracle[name])
            exp_cols = exp_rel.columns
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        wide = (["spark " + s for s in wide_decimal_cols(got_cols, got_rel.types)]
                + ["oracle " + s for s in wide_decimal_cols(exp_cols, exp_rel.types)])
        if wide:
            print(f"FAIL {name}: surfaced decimal precision > "
                  f"{MAX_SURFACED_DECIMAL_PRECISION} (driver hash hazard): {wide}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = [tuple(norm_cell(r[i]) for i in gi) for r in got]
        e = [tuple(norm_cell(r[i]) for i in ei) for r in exp]
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first at {i}:")
            print(f"  spark:  {a}\n  duckdb: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'} / {len(oracle)} queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
