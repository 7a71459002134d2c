#!/usr/bin/env python3
"""Partition-count invariance sweep (committed form of the r13 one-off).

Runs the FULL registered query surface (graft.Verify) twice under two
different (local[N], spark.sql.shuffle.partitions=N) pairs and diffs
every query's result EXACTLY (row set equality over all columns, floats
bit-compared after ORDER BY ALL). A pass proves no aggregate, window,
or sketch in the surface depends on partition count, task scheduling,
or arrival order — the determinism property a 1000-executor cluster
needs from code tested on local[32].

Usage:
    python3 scripts/invariance.py [sfDir] [cpusA] [cpusB]
defaults: /root/testdata/sf0.01 4 32

Exit 0 = hash-exact across the pair; non-zero lists diverging queries.
"""
import os
import subprocess
import sys

import duckdb


def run_verify(sf: str, cpus: str, out: str) -> None:
    subprocess.run(["rm", "-rf", out], check=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf} {out}"],
        env=env, capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        raise SystemExit(f"Verify failed at cpus={cpus}")


def rows_of(out: str, name: str):
    con = duckdb.connect()
    cols = [c[0] for c in con.sql(
        f"describe select * from '{out}/{name}/*.parquet'").fetchall()]
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    return tuple(cols), con.sql(
        f"select {sel} from '{out}/{name}/*.parquet' order by all").fetchall()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    a = sys.argv[2] if len(sys.argv) > 2 else "4"
    b = sys.argv[3] if len(sys.argv) > 3 else "32"
    out_a, out_b = f"/tmp/graft_invar_{a}", f"/tmp/graft_invar_{b}"
    print(f"[invariance] running Verify at local[{a}]/{a} and local[{b}]/{b} on {sf}")
    run_verify(sf, a, out_a)
    run_verify(sf, b, out_b)
    names = sorted(d for d in os.listdir(out_a)
                   if os.path.isdir(os.path.join(out_a, d)))
    names_b = sorted(d for d in os.listdir(out_b)
                     if os.path.isdir(os.path.join(out_b, d)))
    bad = []
    if names != names_b:
        bad.append(f"query sets differ: only_a={set(names)-set(names_b)} "
                   f"only_b={set(names_b)-set(names)}")
        names = [n for n in names if n in set(names_b)]
    for n in names:
        ca, ra = rows_of(out_a, n)
        cb, rb = rows_of(out_b, n)
        if sorted(ca) != sorted(cb):
            bad.append(f"{n}: schema differs {ca} vs {cb}")
        elif ra != rb:
            diff = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
            bad.append(f"{n}: {diff} differing rows ({len(ra)} vs {len(rb)})")
    if bad:
        print(f"[invariance] FAILED — {len(bad)} divergence(s):")
        for m in bad:
            print("  " + m)
        return 1
    print(f"[invariance] OK — {len(names)} queries bit-identical at "
          f"local[{a}]/{a} vs local[{b}]/{b}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
