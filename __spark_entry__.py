"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything here delegates to :mod:`bc_proj3_spark.registry`, the
engine's single query surface — each registered
:class:`~bc_proj3_spark.registry.QuerySpec` carries the Spark builder
and (when SQL-expressible) the DuckDB oracle string.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bc_proj3_spark import registry
from bc_proj3_spark.session import apply_runtime_conf

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "q1_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_conf(spark)
    specs = registry.all_queries()
    return specs[_FLAGSHIP].builder(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(builder: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_conf(spark)
            # Some builders return small persisted results (e.g. the
            # dedup pair lists — persisted so their eager-materialization
            # barrier survives the return). The driver collects each
            # query before building the next, so dropping ALL cache here
            # bounds the leak to one query's worth across a 68-query run.
            spark.catalog.clearCache()
            return builder(spark, sf_dir)

        return run

    return {name: _wrap(spec.builder) for name, spec in registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted for non-SQL-expressible ops
    (driver then records the weaker rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in registry.all_queries().items()
        if spec.oracle is not None
    }


if __name__ == "__main__":  # manual smoke: python __spark_entry__.py [sf_dir]
    import sys

    from bc_proj3_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else _SMOKE_SF_DIR
    spark = get_spark()
    df = entry(spark)
    df.show(5)
    print(f"queries registered: {len(queries())}")
    if registry.import_errors:
        print(f"import errors: {registry.import_errors}")
