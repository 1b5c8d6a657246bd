#!/usr/bin/env python
"""Round-14 job attribution: like r13_joblog but prints each timed job's
stage names + task counts, and groups timed-run stages by name, so the
unlabeled AQE/broadcast job tail can be attributed to plan regions.

Usage: python scripts/r14_joblog.py <query> [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-r14"


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
        app_name="r14-joblog",
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

    jobs = {}
    stages = {}
    for path in logs:
        with open(path) as fh:
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
                        "stage_ids": [
                            si["Stage ID"] for si in ev.get("Stage Infos", [])
                        ],
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
    for jid, j in timed:
        gap = (j["start"] - prev_end) / 1000.0
        span = (j["end"] - j["start"]) / 1000.0
        prev_end = max(prev_end, j["end"])
        sdesc = []
        for sid in j["stage_ids"]:
            s = stages.get(sid)
            if s is None:
                continue
            nm = s["name"].split(" at ")[0]
            sdesc.append(f"{nm}[{s['tasks']}t {s['ms']/1000.0:.2f}s]")
        label = j["desc"] or j["callsite"]
        print(f"  gap {gap:6.2f}s | job {jid:4d} {span:6.2f}s "
              f"{label[:40]:40s} {' '.join(sdesc)[:120]}")
    # group timed-run stages by name
    timed_sids = set()
    for _, j in timed:
        timed_sids.update(j["stage_ids"])
    agg: dict[str, list[float]] = {}
    for sid in timed_sids:
        s = stages.get(sid)
        if s is None:
            continue
        nm = s["name"].split(" at ")[0]
        agg.setdefault(nm, []).append(s["ms"] / 1000.0)
    print("\nTimed-run stage-name totals:")
    for nm, spans in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
        print(f"  {sum(spans):7.2f}s over {len(spans):3d} stages  {nm[:80]}")


if __name__ == "__main__":
    main()
