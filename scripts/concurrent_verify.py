#!/usr/bin/env python3
"""Two concurrent Verify processes on one host must both come out green.

r14 verdict item 7: the oracle rows that exercise persisted ANN roots
(`sim_ann_*`, `dedup_semantic_*`, `sim_ann_probe_serving`) build under
per-corpus names in java.io.tmpdir, so two Verify runs on one host (a
user's and the driver's) SHARE those roots. The engine's contracts are
supposed to make that safe — ensureIvfPqFor's adopt-or-rebuild swap is
idempotent across racing builders, and the mutating ingest/retrain
paths hold the per-root single-writer lease — and this harness proves
it end to end instead of leaving it prose: it launches two full
`graft.Verify` JVMs AT THE SAME TIME against the same sf dir (distinct
out dirs), waits for both, then runs the standard scripts/check.py
oracle compare on each output. Exit 0 iff both runs report "0 failed".

Run (after `sbt compile`; the classpath is the compiled classes plus
the Spark jars the build already uses unmanaged):

    python3 scripts/concurrent_verify.py [sfDir]

sbt itself can't host the race (one server lock per project dir), so
the JVMs are launched directly with build.sbt's fork options.
"""
import subprocess
import sys
import threading

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
CLASSES = "target/scala-2.13/classes"
SPARK_JARS = "/opt/spark/jars/*"

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def java_cmd(out_dir):
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += [
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-Dfile.encoding=UTF-8",
        "-Xmx8g",
        "-cp", f"{CLASSES}:{SPARK_JARS}",
        "graft.Verify", SF, out_dir,
    ]
    return cmd


def run(out_dir, results, key):
    proc = subprocess.run(java_cmd(out_dir), capture_output=True, text=True)
    results[key] = proc


def main():
    results = {}
    threads = [
        threading.Thread(target=run,
                         args=(f"/tmp/verify_concurrent_{i}", results, i))
        for i in (1, 2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    ok = True
    for i in (1, 2):
        proc = results[i]
        if proc.returncode != 0:
            ok = False
            print(f"[concurrent_verify] run {i}: Verify JVM FAILED "
                  f"(rc={proc.returncode})")
            print(proc.stderr[-3000:])
            continue
        chk = subprocess.run(
            [sys.executable, "scripts/check.py", SF,
             f"/tmp/verify_concurrent_{i}"],
            capture_output=True, text=True)
        tail = (chk.stdout.strip().splitlines() or ["<no output>"])[-1]
        print(f"[concurrent_verify] run {i}: {tail}")
        if chk.returncode != 0 or " 0 failed" not in tail:
            ok = False
    print("[concurrent_verify] " + ("BOTH GREEN" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
