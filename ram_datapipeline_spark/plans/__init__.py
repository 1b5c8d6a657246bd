"""Composed end-to-end jobs (the reference's entry points as DataFrame DAGs)."""

from ram_datapipeline_spark.plans.ram_pipeline import run_ram_pipeline  # noqa: F401
