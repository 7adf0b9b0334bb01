"""Dynamic partition pruning: the scan-side defense that matters most
at 100 TB with date/source-partitioned fact tables.

When a partitioned fact joins a dimension whose filter selects few
partition values, Spark injects the dim's build-side keys as a runtime
partition filter on the fact scan (``dynamicpruning`` subquery), so the
fact reads only the matching directories — the query-time complement to
write-time layout (test_zorder.py) and static pruning (partition_merge).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bc_proj3_spark.plans.tables import table

SF = "/root/testdata/sf0.01"


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    fact_path = str(tmp_path / "events_by_type")
    ev = table(spark, SF, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(fact_path)

    dim = spark.createDataFrame(
        [("purchase", 1.0), ("signup", 2.0), ("view", 0.5),
         ("click", 0.1), ("error", 0.0)],
        ["event_type", "weight"],
    ).filter(F.col("weight") >= 1.0)  # selects 2 of 5 partitions

    fact = spark.read.parquet(fact_path)
    joined = fact.join(dim, "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w")
    )

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "fact scan carries no dynamic-pruning filter:\n" + plan[:2000]
    )

    # semantics unchanged: only the two selected types survive
    got = {r.event_type for r in joined.collect()}
    assert got == {"purchase", "signup"}

    # and the pruned scan reads only the 2 matching partitions
    # (input_file_name must be captured on the scan side, pre-join —
    # post-join the column context can be empty)
    files = {
        r.f.split("event_type=")[1].split("/")[0]
        for r in fact.withColumn("f", F.input_file_name())
        .join(dim, "event_type")
        .select("f")
        .distinct()
        .collect()
    }
    assert files == {"purchase", "signup"}
