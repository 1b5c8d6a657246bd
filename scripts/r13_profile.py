#!/usr/bin/env python
"""Round-13 per-query time attribution (guide §1 + §7.3): for each named
registry query, split the timed noop-sink wall into

  - driver_cpu: CPU seconds burned by the py4j execution thread (the
    thread that runs planning, AQE re-optimization and result handling;
    found once by matching the thread that accumulates CPU during a
    probe query),
  - exec_cpu:   CPU seconds burned by the rest of the JVM (executor task
    threads, shuffle, GC workers) plus all pyspark worker processes,
  - idle:       wall - (driver_cpu + exec_cpu)/1 — time nobody was on
    CPU for this query (I/O latency, scheduling gaps, stalls).

CPU is read from /proc/<pid>/task/<tid>/stat (utime+stime jiffies), so
the measurement itself costs nothing inside the JVM. Python worker CPU
is summed over /proc/<pid>/stat of every pyspark daemon/worker process.

Usage: python scripts/r13_profile.py name1 name2 ... [--sf-dir DIR]
Prints one JSON line per query and a RESULT summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ram_datapipeline_spark import queries as Q  # noqa: E402
from ram_datapipeline_spark.session import get_spark  # noqa: E402

HZ = os.sysconf("SC_CLK_TCK")


def _jvm_pid() -> int:
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read()
        except OSError:
            continue
        if b"SparkSubmit" in cmd and b"java" in cmd and int(pid) != me:
            return int(pid)
    raise RuntimeError("driver JVM not found")


def _thread_cpus(pid: int) -> dict[int, float]:
    out: dict[int, float] = {}
    try:
        tids = os.listdir(f"/proc/{pid}/task")
    except OSError:
        return out
    for tid in tids:
        try:
            with open(f"/proc/{pid}/task/{tid}/stat") as fh:
                parts = fh.read().rsplit(") ", 1)[1].split()
            out[int(tid)] = (int(parts[11]) + int(parts[12])) / HZ
        except (OSError, IndexError, ValueError):
            continue
    return out


def _proc_cpu(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/stat") as fh:
            parts = fh.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / HZ
    except (OSError, IndexError, ValueError):
        return 0.0


def _pyworker_cpu() -> float:
    total = 0.0
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read()
        except OSError:
            continue
        if b"pyspark.daemon" in cmd or b"pyspark.worker" in cmd:
            total += _proc_cpu(int(pid))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="r13-profile")
    spark.sparkContext.setLogLevel("ERROR")
    jpid = _jvm_pid()

    # Identify the py4j execution thread: run a tiny query and take the
    # thread whose CPU grew the most (planning happens on that thread).
    before = _thread_cpus(jpid)
    spark.range(1000).selectExpr("sum(id % 7)").write.format(
        "noop").mode("overwrite").save()
    after = _thread_cpus(jpid)
    exec_tid = max(after, key=lambda t: after[t] - before.get(t, 0.0))

    out: dict[str, dict] = {}
    for name in args.names:
        b = Q.REGISTRY[name].builder
        spark.sparkContext.setJobDescription(f"r13 profile warmup: {name}")
        b(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

        spark.sparkContext.setJobDescription(f"r13 profile timed: {name}")
        th0 = _thread_cpus(jpid)
        py0 = _pyworker_cpu()
        jv0 = _proc_cpu(jpid)
        t0 = time.perf_counter()
        b(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        th1 = _thread_cpus(jpid)
        py1 = _pyworker_cpu()
        jv1 = _proc_cpu(jpid)
        spark.catalog.clearCache()

        drv = th1.get(exec_tid, 0.0) - th0.get(exec_tid, 0.0)
        jvm = jv1 - jv0
        pyc = py1 - py0
        rec = {
            "wall": round(wall, 3),
            "driver_cpu": round(drv, 3),
            "jvm_other_cpu": round(jvm - drv, 3),
            "pyworker_cpu": round(pyc, 3),
            "cpu_total": round(jvm + pyc, 3),
        }
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
