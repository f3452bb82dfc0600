#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_parity.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the sf_dir
tables, and compares the way the driver does: both sides fetched to
pandas, columns sorted by name, values compared EXACTLY (no float
tolerance — the driver hashes stringified values, so a
HUGEINT->float64 coercion or a 1-ulp float difference is a real
failure here, by design). Dtype divergence is only a WARN: it is
fatal iff it changes the value token, which the exact value compare
catches. Rows are sorted by stringified content before the
element-wise compare so engine tie-order cannot cause spurious
failures; because of that sort, a broken ORDER BY would PASS the
fatal compare — a second, order-preserving pass prints a WARN when
the as-fetched row order diverges, so ordering regressions surface
locally without false-failing queries that have no ORDER BY.
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    """Canonical token for one cell — mirrors an exact stringify-hash."""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return repr(v)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: cols {gcols} != {ecols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # dtype divergence is only fatal when it changes the value token
        # (int64 vs int32 both .tolist() to int -> same hash at the driver;
        # HUGEINT -> float64 vs int64 does NOT -> caught by the value
        # compare below). Surface it as a warning so silent coercions are
        # visible without failing queries the driver passes.
        gdt = [str(got[c].dtype) for c in gcols]
        edt = [str(exp[c].dtype) for c in ecols]
        if gdt != edt:
            print(f"WARN {name}: dtypes {dict(zip(gcols, gdt))} != "
                  f"{dict(zip(ecols, edt))}")
        g = sorted([norm(v) for v in row] for row in got[gcols].values.tolist())
        e = sorted([norm(v) for v in row] for row in exp[ecols].values.tolist())
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            if gr != er:
                bad = (i, gr, er)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: got {bad[1]} exp {bad[2]}")
            n_fail += 1
        else:
            # order-preserving pass: WARN only (no ORDER BY -> both
            # engines may legitimately emit different physical orders)
            gu = [[norm(v) for v in row] for row in got[gcols].values.tolist()]
            eu = [[norm(v) for v in row] for row in exp[ecols].values.tolist()]
            if gu != eu:
                print(f"WARN {name}: as-fetched row order differs from "
                      f"oracle (harmless without ORDER BY; check the "
                      f"query's ORDER BY if it has one)")
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
