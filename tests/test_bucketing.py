"""Bucketed-table layout gates: co-located joins and aggregations must
run WITHOUT a shuffle exchange once both sides are bucketed on the key.

The zorder twin (test_zorder.py pins scan pruning; this pins join/agg
locality): at 100 TB, bucketing is the difference between re-shuffling
a fact table on every join and never shuffling it again after ingest.
Values are compared against the plain (unbucketed) join so the layout
is provably value-invisible.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bc_proj3_spark.operators.layout import write_bucketed

SF = "/root/testdata/sf0.01"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "bkt_orders", "o_custkey", N_BUCKETS,
    )
    write_bucketed(
        cust.select("c_custkey", "c_mktsegment", "c_acctbal"),
        "bkt_customer", "c_custkey", N_BUCKETS,
    )
    yield orders, cust
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange_and_same_values(spark, bucketed):
    orders, cust = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = spark.table("bkt_orders")
        bc = spark.table("bkt_customer")
        j = bo.join(
            bc, bo["o_custkey"] == bc["c_custkey"]
        ).groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
        plan = _executed(j)
        # the join itself reads both bucketed scans pre-partitioned:
        # the ONLY exchange allowed is the final tiny segment aggregate
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan, plan[:800]
        assert "Exchange" not in join_part, (
            "bucketed join still shuffles an input:\n" + join_part[:1200]
        )
        # value-invisibility vs the plain unbucketed join
        pj = orders.join(
            cust, orders["o_custkey"] == cust["c_custkey"]
        ).groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, pj.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_skips_exchange(spark, bucketed):
    """groupBy on the bucket key reuses the write-time partitioning —
    no Exchange anywhere in the plan."""
    bo = spark.table("bkt_orders")
    agg = bo.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    plan = _executed(agg)
    assert "Exchange" not in plan, plan[:1200]
    # and it still counts every order
    total = agg.agg(F.sum("n_orders")).collect()[0][0]
    assert total == bo.count()
