"""Medallion pipeline: bronze → silver → gold runnable stages.

The reference's Databricks-notebook pipeline (README.md:27-29) as
library code: each stage is a function of (spark, catalog, params)
returning a StageResult; pipeline/runner.py threads run_date through
the stage graph the way the Airflow DAG does (cleantech.py:12-79).
"""

from bc_proj3_spark.pipeline.runner import StageResult, run_pipeline  # noqa: F401
