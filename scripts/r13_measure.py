#!/usr/bin/env python
"""Round-13 isolated query measurement (guide §1): time named registry
queries with the noop sink in one session — one untimed warmup, N timed
reps with cache-clear + GC between, per-rep seconds to stdout as JSON.

Usage:
  python scripts/r13_measure.py name1 name2 ... [--reps 2] [--sf-dir DIR]
         [--plans-out plans/r13 --plans-suffix _before]

With --plans-out, also dumps .explain("formatted") for each query.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ram_datapipeline_spark import queries as Q  # noqa: E402
from ram_datapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-out", default="")
    ap.add_argument("--plans-suffix", default="")
    args = ap.parse_args()

    spark = get_spark(app_name="r13-measure")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, list[float]] = {}
    for name in args.names:
        b = Q.REGISTRY[name].builder
        if args.plans_out:
            os.makedirs(args.plans_out, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                b(spark, args.sf_dir).explain("formatted")
            p = os.path.join(
                args.plans_out, f"{name}{args.plans_suffix}.txt")
            with open(p, "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"r13 warmup: {name}")
        b(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        reps = []
        for i in range(args.reps):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"r13 timed {i}: {name}")
            t0 = time.perf_counter()
            b(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = reps
        print(json.dumps({name: reps}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
