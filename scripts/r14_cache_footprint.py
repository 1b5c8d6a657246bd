#!/usr/bin/env python
"""Measure the operator-local cache footprint (VERDICT r13 #6, guide §5).

Graph/dedup operators persist shared derivations for the duration of one
query; the documented lifetime contract is "the driver clears between
queries" (bench.py and verify_driver_contract.py both clearCache between
entries). This probe quantifies what that contract is holding: it runs
the cache-heaviest queries back-to-back in ONE session, snapshotting the
storage memory after each query (a) WITHOUT any clearCache — the
worst-case accumulation a contract-violating driver would see — and
(b) WITH the contractual clearCache — which must show zero residue.

Writes artifacts/CACHE_FOOTPRINT_r14.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ram_datapipeline_spark import queries as Q  # noqa: E402
from ram_datapipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    "graph_triangle_count",
    "graph_clustering_coeff",
    "graph_common_neighbors",
    "graph_resource_allocation",
    "graph_pagerank",
    "graph_kcore",
    "graph_label_propagation",
    "graph_khop_reach",
    "dedup_connected_components",
    "dedup_incremental_components",
    "sim_sparse_tfidf_pairs",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def storage_mb(spark) -> tuple[int, float]:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    n = 0
    mem = 0.0
    for i in infos:
        if i.numCachedPartitions() > 0:
            n += 1
            mem += i.memSize() / (1024.0 * 1024.0)
    return n, round(mem, 2)


def main() -> None:
    spark = get_spark(app_name="r14-cache-footprint")
    spark.sparkContext.setLogLevel("ERROR")
    rec = {"sf_dir": SF_DIR, "no_clear": [], "with_clear": []}
    for name in QUERIES:
        Q.REGISTRY[name].builder(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        n, mem = storage_mb(spark)
        rec["no_clear"].append({"after": name, "rdds": n, "mem_mb": mem})
        print(f"no-clear after {name}: {n} cached RDDs, {mem} MB", flush=True)
    spark.catalog.clearCache()
    n, mem = storage_mb(spark)
    rec["post_clear"] = {"rdds": n, "mem_mb": mem}
    for name in QUERIES:
        Q.REGISTRY[name].builder(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        n, mem = storage_mb(spark)
        rec["with_clear"].append({"after": name, "rdds": n, "mem_mb": mem})
        print(f"with-clear after {name}: {n} cached RDDs, {mem} MB", flush=True)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        "CACHE_FOOTPRINT_r14.json",
    )
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print("WROTE", out)
    spark.stop()


if __name__ == "__main__":
    main()
