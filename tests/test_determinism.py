"""Shuffle-order / partitioning invariance: the engine's oracle story
rests on every gated query being a pure function of the data — NOT of
the physical partitioning. These tests re-run representative queries
under a different shuffle-partition count and assert bit-identical
value hashes (same canonicalization the driver uses).

Representatives chosen for the risk they carry: float aggregation order
(eta min-reduce), iterative integer fixed point (pagerank), window
tie-breaks (domain quota), numpy Arrow kernels (PQ codes), and the
routed-OSM closure (driver-side numpy vs distributed equivalence is
separately asserted in test_graph_routing)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

import ram_datapipeline_spark.queries as Q
from tests.conftest import SF_DIR

REPRESENTATIVES = [
    "eta_nearest_poi",
    "graph_pagerank",
    "pipe_domain_quota",
    "vec_pq_codes",
    "eta_routed_osm",
    "dedup_minhash_lsh",
    # r12-born fold paths: collect_list order varies with partitioning —
    # sort_array + pinned left folds must neutralize it (two-level IVF
    # routing, maxsim candidate grain, Holt's 2-state array fold)
    "sim_incremental_ivf",
    "sim_maxsim_topk",
    "ts_holt_linear",
]


def _value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]

    def cell(v):
        if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
            return "\\N"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    rows = sorted(
        "\x1f".join(cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_invariant_under_shuffle_partitioning(spark, name):
    fn = Q.REGISTRY[name].builder
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", base)
        h_base = _value_hash(fn(spark, SF_DIR).toPandas())
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        h_alt = _value_hash(fn(spark, SF_DIR).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
        spark.catalog.clearCache()
    assert h_base == h_alt, f"{name} result depends on partitioning"
