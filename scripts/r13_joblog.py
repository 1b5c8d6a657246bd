#!/usr/bin/env python
"""Round-13 job-level time attribution (guide §1.5/§7): run one registry
query with the Spark event log enabled, then decompose its wall time into
per-job intervals (with callsites) and inter-job driver gaps.

A query like eta_routed_osm_planet_auto runs DOZENS of sequential driver
jobs (checkpoints, bounded collects, closure builds); wall = Σ job spans +
Σ gaps between jobs (pure driver work: planning, numpy kernels, py4j).
This script shows exactly which jobs and which gaps carry the cost —
the view the Spark UI would give, reconstructed from the event log.

Usage: python scripts/r13_joblog.py <query> [--sf-dir DIR] [--reps 1]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-r13"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()

    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from ram_datapipeline_spark import queries as Q
    from ram_datapipeline_spark.session import get_spark

    spark = get_spark(
        app_name="r13-joblog",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    b = Q.REGISTRY[args.name].builder
    for _ in range(args.warmup):
        b(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    t0 = time.time() * 1000.0
    w0 = time.perf_counter()
    b(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - w0
    t1 = time.time() * 1000.0
    spark.stop()

    logs = []
    for entry in glob.glob(EVDIR + "/*"):
        if os.path.isdir(entry):
            logs.extend(
                p for p in glob.glob(entry + "/*")
                if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
            )
        else:
            logs.append(entry)
    def _open(path):
        if path.endswith(".zstd"):
            import io

            import zstandard

            return io.TextIOWrapper(
                zstandard.ZstdDecompressor().stream_reader(
                    open(path, "rb"), read_across_frames=True
                )
            )
        return open(path)

    jobs = {}
    stages = {}
    for path in logs:
        with _open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "callsite": props.get("callSite.short", ""),
                        "desc": props.get("spark.job.description", ""),
                        "n_stages": len(ev.get("Stage Infos", [])),
                    }
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si.get("Stage Name", ""),
                        "ms": si.get("Completion Time", 0)
                        - si.get("Submission Time", 0),
                        "tasks": si.get("Number of Tasks", 0),
                    }

    timed = [
        (jid, j) for jid, j in sorted(jobs.items())
        if "end" in j and j["start"] >= t0 - 50 and j["end"] <= t1 + 50
    ]
    print(f"\nTIMED RUN wall={wall:.2f}s  jobs={len(timed)}")
    prev_end = t0
    gap_total = 0.0
    job_total = 0.0
    rows = []
    for jid, j in timed:
        gap = (j["start"] - prev_end) / 1000.0
        span = (j["end"] - j["start"]) / 1000.0
        gap_total += max(gap, 0.0)
        job_total += span
        rows.append((gap, span, jid, j))
        prev_end = max(prev_end, j["end"])
    tail = (t1 - prev_end) / 1000.0
    for gap, span, jid, j in rows:
        label = j["desc"] or j["callsite"]
        print(f"  gap {gap:6.2f}s | job {jid:4d} {span:7.2f}s "
              f"({j['n_stages']} st) {label[:90]}")
    print(f"  tail gap {tail:.2f}s")
    print(f"SUMMARY wall={wall:.2f}s job_spans={job_total:.2f}s "
          f"driver_gaps={gap_total + max(tail, 0):.2f}s")
    by_site: dict[str, list[float]] = {}
    for gap, span, jid, j in rows:
        key = j["desc"] or j["callsite"]
        by_site.setdefault(key, []).append(span)
    print("\nPer-callsite job totals (timed run):")
    for key, spans in sorted(by_site.items(), key=lambda kv: -sum(kv[1])):
        print(f"  {sum(spans):7.2f}s over {len(spans):3d} jobs  {key[:80]}")
    big = sorted(stages.items(), key=lambda kv: -kv[1]["ms"])[:15]
    print("\nTop stages (whole session incl. warmup):")
    for sid, s in big:
        print(f"  stage {sid:4d} {s['ms']/1000.0:7.2f}s "
              f"{s['tasks']:4d} tasks  {s['name'][:80]}")


if __name__ == "__main__":
    main()
