"""ORC source/sink: the second columnar format Spark ships natively.

The engine's warehouse is parquet, but a drop-in engine meets mixed
estates — pin that an ORC round trip preserves values exactly and that
filters/columns push into the ORC scan the same way the parquet plan
tests pin (predicate pushdown is format-provided in both).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bc_proj3_spark.plans.tables import table
from tests.conftest import rows_key

SF = "/root/testdata/sf0.01"


def test_orc_round_trip_exact(spark, tmp_path):
    src = table(spark, SF, "orders")
    path = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)

    a, ca = rows_key(src.columns, [tuple(r) for r in src.collect()])
    b, cb = rows_key(back.columns, [tuple(r) for r in back.collect()])
    assert ca == cb
    assert a == b


def test_orc_scan_pushdown(spark, tmp_path):
    path = str(tmp_path / "li_orc")
    table(spark, SF, "lineitem").write.mode("overwrite").orc(path)
    df = (
        spark.read.orc(path)
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_extendedprice" not in read_schema  # column pruning reaches ORC
