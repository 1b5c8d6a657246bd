"""Facade over the query registry: importing this module loads the whole
suite (``ram_datapipeline_spark.suite``) and re-exports the registry API
consumed by ``__spark_entry__.py``, tests, and bench."""

from __future__ import annotations

import ram_datapipeline_spark.suite  # noqa: F401  (registers all queries)
from ram_datapipeline_spark.registry import (  # noqa: F401
    REGISTRY,
    Builder,
    QuerySpec,
    builders,
    get,
    oracles,
    query,
)
