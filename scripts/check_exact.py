#!/usr/bin/env python3
"""Strict mimic of the driver's hash compare: both sides go through
pandas (duckdb .df()), columns sorted by name, rows in order, cells
compared by repr INCLUDING dtype-driven formatting. This catches what
check.py's tolerant fetchall compare misses:
  - DuckDB HUGEINT (bare SUM of ints) -> pandas float64 ('3.0' vs '3')
  - Decimal vs double formatting
  - tz-aware vs naive timestamps

Usage: python3 scripts/check_exact.py <sfDir> <outDir> [name ...]
"""
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        # Positional row compare relies on DuckDB enumerating part files in
        # sorted filename order — which matches Spark's part-NNNNN write
        # order. (Queries here also end in an explicit ORDER BY, so a
        # re-sorted glob would still compare equal.)
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        exp = con.execute(oracle[name]).df()
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} vs {sorted(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_bad += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for rn, (g, e) in enumerate(zip(gv, ev)):
                if repr(g) != repr(e):
                    bad = (rn, c, g, e)
                    break
            if bad:
                break
        if bad:
            rn, c, g, e = bad
            print(f"FAIL {name}: row {rn} col {c}: "
                  f"spark={type(g).__name__}:{g!r} oracle={type(e).__name__}:{e!r} "
                  f"(dtypes {got[c].dtype} vs {exp[c].dtype})")
            n_bad += 1
        else:
            n_ok += 1
    print(f"{n_ok} exact, {n_bad} mismatched")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
