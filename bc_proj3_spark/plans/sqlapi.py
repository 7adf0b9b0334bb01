"""The SQL entry path: raw Spark SQL over registered views.

The reference drives almost everything through ``spark.sql`` over temp
views (bronze_arxiv.py:74-89, silver_arxiv.py:82-97…); this engine is
DataFrame-first, but the SQL surface must work identically — same
Catalyst plans either way. One registered query runs PURE SQL text over
catalog-registered views to pin that path (SURVEY.md §2.1 S6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bc_proj3_spark.functions.numeric import sql_dec_sum
from bc_proj3_spark.plans.tables import table
from bc_proj3_spark.registry import register

#: Dialect-common SQL: the SAME statement text runs on Spark (over the
#: temp view) and on DuckDB (over the driver's view) modulo table name.
_SQL = f"""
SELECT
  o_orderpriority,
  COUNT(*) AS n_orders,
  {sql_dec_sum("o_totalprice", "total_price")}
FROM orders_v
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
"""

_SQL1_ORACLE = _SQL.replace("orders_v", "orders")


@register("sql1_priority_revenue", _SQL1_ORACLE)
def sql1_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw SQL text over a registered temp view — the notebook-style
    entry path (spark.sql + createOrReplaceTempView). Shares one source
    of truth with its oracle: identical SQL, different catalog."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(_SQL)
