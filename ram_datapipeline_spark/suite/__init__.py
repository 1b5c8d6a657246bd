"""Query suite — importing this package registers every query.

Modules group the SURVEY §2 inventory by family; each module's import
populates ``ram_datapipeline_spark.registry.REGISTRY``.
"""

from ram_datapipeline_spark.suite import (  # noqa: F401
    analytic_queries,
    eta_queries,
    extended_queries,
    graph_queries,
    multimodal_queries,
    pipeline_queries,
    relational_queries,
    sink_queries,
    spatial_queries,
    streaming_queries,
    text_queries,
    timeseries_queries,
)
