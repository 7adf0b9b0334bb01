"""Round-7 hardening tests: adversarial-data and adversarial-scale
invariants for already-verified operator families (the r6 advisor +
judge brief). These do not add registry breadth — they pin behavior the
sf0.01/sf0.1 oracles cannot exercise: dirty parent keys, skewed hot
keys, and spill-pressure configurations.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


# ---------------------------------------------------------------------------
# dq2 under dirty (duplicated) parent keys — the advisor's fan-out finding
# ---------------------------------------------------------------------------


def test_dq2_duplicate_parent_keys_do_not_fan_out(spark, tmp_path):
    """A referential-integrity audit must stay correct on exactly the
    dirty data it exists to catch. Before the r7 fix, dq2's chained
    left joins assumed unique parent keys; a duplicated parent key
    fanned out the child rows and inflated both n_child and every
    orphan count sharing that child. The parents are now
    .distinct()-deduplicated, which preserves anti-join (NOT EXISTS)
    membership semantics regardless of parent data quality."""
    from bc_proj3_spark.operators.quality import dq2_referential_integrity

    sf = str(tmp_path)
    # customer: key 1 duplicated three times, key 2 once; 3 is absent
    spark.createDataFrame(
        [Row(c_custkey=1), Row(c_custkey=1), Row(c_custkey=1), Row(c_custkey=2)]
    ).write.parquet(f"{sf}/customer.parquet")
    # orders: two children hit the duplicated key, one orphan (3),
    # one NULL key (not an orphan by NOT-EXISTS semantics)
    spark.createDataFrame(
        [
            Row(o_orderkey=10, o_custkey=1),
            Row(o_orderkey=11, o_custkey=1),
            Row(o_orderkey=12, o_custkey=3),
            Row(o_orderkey=13, o_custkey=None),
        ]
    ).write.parquet(f"{sf}/orders.parquet")
    # lineitem: o_orderkey 10 duplicated parent-side is impossible
    # (orders is unique here) but lineitem's three FKs share one child
    # pass — keep them small and partially orphaned
    spark.createDataFrame(
        [
            Row(l_orderkey=10, l_partkey=100, l_suppkey=7),
            Row(l_orderkey=99, l_partkey=101, l_suppkey=8),
        ]
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [Row(p_partkey=100), Row(p_partkey=100)]  # duplicated part key
    ).write.parquet(f"{sf}/part.parquet")
    spark.createDataFrame([Row(s_suppkey=7)]).write.parquet(
        f"{sf}/supplier.parquet"
    )
    spark.createDataFrame(
        [Row(user_id=1), Row(user_id=5)]
    ).write.parquet(f"{sf}/events.parquet")

    got = {
        r["relationship"]: (r["n_child"], r["n_orphans"])
        for r in dq2_referential_integrity(spark, sf).collect()
    }
    assert got["orders.custkey->customer"] == (4, 1)  # only key 3
    assert got["lineitem.orderkey->orders"] == (2, 1)  # only key 99
    assert got["lineitem.partkey->part"] == (2, 1)  # dup part, no fan-out
    assert got["lineitem.suppkey->supplier"] == (2, 1)
    assert got["events.user_id->customer"] == (2, 1)  # only user 5
