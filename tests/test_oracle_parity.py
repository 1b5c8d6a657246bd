"""Driver-gate mirror: every oracle-backed query in the registry must match
its DuckDB oracle exactly (row count + column names + values) on the fixture
tables. Rows-only queries must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from ram_datapipeline_spark import queries as Q
from tests.conftest import SF_DIR, assert_frames_match

ALL = sorted(Q.REGISTRY)
WITH_ORACLE = [n for n in ALL if Q.REGISTRY[n].oracle is not None]
ROWS_ONLY = [n for n in ALL if Q.REGISTRY[n].oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    spec = Q.REGISTRY[name]
    got = spec.builder(spark, SF_DIR).toPandas()
    want = duck.execute(spec.oracle).df()
    assert_frames_match(got, want, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = Q.REGISTRY[name]
    df = spec.builder(spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    df.limit(5).collect()  # plan executes
