"""Bucketed tables: co-located joins without a shuffle.

The 100 TB strategy SURVEY §0/§4 calls for: pre-bucket both fact tables
on the join key so repeated joins skip the exchange entirely. Parquet
path tables can't carry bucket metadata, so this goes through
``saveAsTable`` (session catalog); the assertion is on the physical
plan — a SortMergeJoin with NO shuffle exchange on either side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bc_proj3_spark.plans.tables import table

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def bucketed_tables(spark):
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    table(spark, SF, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    table(spark, SF, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    yield
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li = spark.table("b_lineitem")
    orders = spark.table("b_orders")
    # at sf0.01 AQE would broadcast the small side (also shuffle-free,
    # but that's not what's under test) — force the sort-merge path the
    # way a fact⨝fact join at real scale resolves
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
    # the join inputs come straight from the bucketed scans — no
    # "Exchange hashpartitioning" below the join
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in join_part
    # and it computes the right thing
    plain = (
        table(spark, SF, "lineitem")
        .join(table(spark, SF, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
