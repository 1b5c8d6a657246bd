"""Composed end-to-end jobs (the reference's entry points as DataFrame DAGs)."""

from ram_datapipeline_spark.plans.ram_pipeline import run_ram_pipeline  # noqa: F401
from ram_datapipeline_spark.plans.corpus_pipeline import (  # noqa: F401
    assemble_corpus,
    run_corpus_pipeline,
)
from ram_datapipeline_spark.plans.media_pipeline import (  # noqa: F401
    media_features,
    media_near_dedup,
    run_media_pipeline,
)
