#!/usr/bin/env python
"""Candidate-pair probe for the tf-idf AllPairs prefix filter (r13 —
VERDICT r12 #6 'done' criterion): on the K×-scaled documents corpus,
force the POSTING path and count the DISTINCT candidate pairs entering
exact verification with and without the prefix filter, plus the posting
wall time both ways. The filter must shrink the candidate space (that is
its whole point) while the emitted pair set stays identical — identity
is separately pinned by tests/test_similarity.py at three thresholds.

Usage: python scripts/tfidf_prefix_probe.py [K] [threshold]
Reuses the scaled parquet scale_probe.py builds (same _SUCCESS sentinel).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ram_datapipeline_spark.operators.similarity import (  # noqa: E402
    sparse_tfidf_pairs,
    tfidf_postings,
    tfidf_prefix_index,
)
from ram_datapipeline_spark.session import get_spark  # noqa: E402
from scale_probe import build_scaled  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    out_dir = f"/tmp/spark_graft_scale_sf{k}"
    spark = get_spark(app_name="tfidf-prefix-probe")
    build_scaled(spark, k, out_dir)
    docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))

    _, _, w = tfidf_postings(docs)
    w = w.localCheckpoint(eager=True)

    n_postings = w.count()
    idx = tfidf_prefix_index(w, "doc_id", threshold)
    n_prefix_postings = idx.count()

    def cand_count(rel):
        a = rel.select(F.col("doc_id").alias("doc_a"), "term")
        b = rel.select(F.col("doc_id").alias("doc_b"), "term")
        return (
            a.join(b, "term")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
            .count()
        )

    cand_full = cand_count(w)
    cand_prefix = cand_count(idx)

    def timed(prefix_on: bool) -> float:
        t0 = time.perf_counter()
        sparse_tfidf_pairs(
            docs, threshold=threshold, dense_max_docs=0,
            prefix_filter=prefix_on,
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    t_off = timed(False)
    t_on = timed(True)
    print(json.dumps({
        "k": k,
        "threshold": threshold,
        "n_postings": n_postings,
        "n_prefix_postings": n_prefix_postings,
        "cand_pairs_full": cand_full,
        "cand_pairs_prefix": cand_prefix,
        "cand_drop_ratio": round(cand_full / max(1, cand_prefix), 2),
        "posting_wall_s_prefix_off": t_off,
        "posting_wall_s_prefix_on": t_on,
    }))


if __name__ == "__main__":
    main()
