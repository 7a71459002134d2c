#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate (dev tooling only; the
engine itself is pure Scala/Spark).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 scripts/check.py <sfDir> <outDir>

Loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle_sql.json query in DuckDB over <sfDir>'s tables, sorts columns by
name, and compares shape + values (exact for non-floats, bit-exact first
then 1e-9 relative for floats, reported separately).
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_ok = n_bad = 0
    # Type lint over EVERY oracle, even when the dump is restricted: the
    # driver's hash is TYPE-sensitive while this script's Python == is not,
    # so a DuckDB-widened aggregate (count_if → HUGEINT in r4, windowed
    # SUM → HUGEINT in r5) leaking into an output column passes here and
    # fails the driver. Any HUGEINT/UHUGEINT output column is a hard FAIL.
    n_type_bad = 0
    oracle_types = {}  # name -> {col: type}; reused by the main loop
    for name in sorted(oracle):
        try:
            desc = con.execute("DESCRIBE " + oracle[name]).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle DESCRIBE: {e}")
            n_type_bad += 1
            continue
        oracle_types[name] = dict((c, t) for c, t, *_ in desc)
        wide = [(c, t) for c, t in oracle_types[name].items()
                if "HUGEINT" in t.upper()]
        if wide:
            print(f"FAIL {name}: oracle output widened (driver hash will "
                  f"mismatch) — CAST it: {wide}")
            n_type_bad += 1
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            spark_rel = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            got = con.execute(spark_rel).fetchall()
            got_cols = [d[0] for d in con.description]
            got_types = dict((c, t) for c, t, *_ in
                             con.execute("DESCRIBE " + spark_rel).fetchall())
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
            exp_types = oracle_types.get(name, {})
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        msg = compare(name, got, got_cols, exp, exp_cols)
        if msg is None and name not in oracle_types:
            # the lint pass's DESCRIBE errored for this query — without
            # oracle types a HUGEINT-class regression would print 'ok'
            msg = "oracle types unavailable (DESCRIBE failed above) — type check skipped, treating as FAIL"
        if msg is None:
            msg = type_mismatch(got_types, exp_types)
        if msg is None:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {n_type_bad} oracle-type lint fails, "
          f"{len(SPARK_ONLY(out_dir, oracle))} rows-only (no oracle)")
    sys.exit(1 if (n_bad or n_type_bad) else 0)


# DuckDB's read of Spark parquet vs the oracle's computed types, per
# column. Exact string compare after two normalizations that mirror the
# driver's observed hash behavior (it pulls both sides into a common
# in-memory representation before hashing):
#  - the ≤64-bit integer family is one type (r5's p3 hashed green with
#    Spark INTEGER vs oracle BIGINT) — but HUGEINT is NOT in the family:
#    int128 coerces to float64/object on fetch, which is exactly how
#    count_if (r4) and the windowed SUM (r5) failed the driver;
#  - the timestamp family is one type (Spark writes NANOS/MICROS
#    annotations which DuckDB surfaces as TIMESTAMP_NS/TIMESTAMP).
# Everything else (DOUBLE vs DECIMAL, VARCHAR vs numeric, DECIMAL
# scales) must match exactly.
def type_mismatch(got_types, exp_types):
    def norm(t):
        u = t.upper()
        if u.startswith("TIMESTAMP"):
            return "TIMESTAMP"
        if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
            return "INT64"
        return u
    bad = [(c, got_types[c], exp_types[c]) for c in sorted(got_types)
           if c in exp_types and norm(got_types[c]) != norm(exp_types[c])]
    if bad:
        return ("result TYPES differ (driver hash is type-sensitive): " +
                ", ".join(f"{c}: spark={g} oracle={e}" for c, g, e in bad))
    # compare() already equates the column SETS case-sensitively, but the
    # type maps can still diverge on case (DuckDB lowercases some DESCRIBE
    # output) — a column we couldn't type-check must not pass silently
    only_exp = sorted(set(exp_types) - set(got_types))
    if only_exp:
        return f"oracle columns missing from spark type map: {only_exp}"
    return None


def SPARK_ONLY(out_dir, oracle):
    dirs = {p.split('/')[-1] for p in glob.glob(f"{out_dir}/*") if '/' in p
            and not p.endswith('.json')}
    return sorted(dirs - set(oracle))


def compare(name, got, got_cols, exp, exp_cols):
    if sorted(got_cols) != sorted(exp_cols):
        return f"columns differ: spark={sorted(got_cols)} oracle={sorted(exp_cols)}"
    if len(got) != len(exp):
        return f"row count differs: spark={len(got)} oracle={len(exp)}"
    gi = [got_cols.index(c) for c in sorted(got_cols)]
    ei = [exp_cols.index(c) for c in sorted(exp_cols)]
    worst = 0.0
    for rn, (gr, er) in enumerate(zip(got, exp)):
        for k, (g, e) in enumerate(zip([gr[i] for i in gi], [er[i] for i in ei])):
            if g == e:
                continue
            if isinstance(g, float) and isinstance(e, float):
                if math.isnan(g) and math.isnan(e):
                    continue
                d = abs(g - e) / max(abs(g), abs(e), 1e-300)
                worst = max(worst, d)
                if d < 1e-9:
                    continue
            return (f"row {rn} col {sorted(got_cols)[k]}: "
                    f"spark={g!r} oracle={e!r}")
    if worst > 0:
        return f"float drift (rel {worst:.2e}) — NOT bit-exact, driver may fail"
    return None


if __name__ == "__main__":
    main()
