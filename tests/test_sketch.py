"""Count-min sketch properties (operators/sketch.py).

Cross-engine value equality is covered by the oracle gate
(test_correctness.py); these pin the sketch's structural guarantees.
"""

from __future__ import annotations

from bc_proj3_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    sk1_countmin_sketch,
    sk2_cms_estimate,
)
from tests.conftest import SF_DIR


def test_sketch_bounded_and_conserves_mass(spark):
    cells = sk1_countmin_sketch(spark, SF_DIR).collect()
    assert len(cells) <= CMS_DEPTH * CMS_WIDTH  # fixed-width whatever the corpus
    assert {r["row_id"] for r in cells} == set(range(CMS_DEPTH))
    # every row of the sketch counts EVERY token occurrence exactly once
    per_row = {}
    for r in cells:
        per_row[r["row_id"]] = per_row.get(r["row_id"], 0) + r["cnt"]
    assert len(set(per_row.values())) == 1  # same total mass in each row


def test_estimates_never_undercount(spark):
    est = sk2_cms_estimate(spark, SF_DIR).collect()
    assert len(est) > 0
    for r in est:
        assert r["cms_est"] >= r["exact_cnt"], r["token"]


def test_hll_merge_equals_whole(spark):
    """Register files of disjoint shards merged by cell-wise MAX must
    equal the whole corpus's register file — the property that makes
    HLL a distributed/streaming counter."""
    from pyspark.sql import functions as F

    from bc_proj3_spark.operators.sketch import hll_registers_for
    from bc_proj3_spark.plans.tables import table

    ev = table(spark, SF_DIR, "events")
    a = hll_registers_for(ev.filter(F.col("event_id") % 2 == 0))
    b = hll_registers_for(ev.filter(F.col("event_id") % 2 == 1))
    merged = (
        a.unionAll(b)
        .groupBy("event_type", "register_id")
        .agg(F.max("max_rho").cast("int").alias("max_rho"))
    )
    whole = hll_registers_for(ev)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_estimate_within_error_bound(spark):
    """HLL stderr at m=512 is ~4.6%; assert a loose 3-sigma bound."""
    from bc_proj3_spark.operators.sketch import sk4_hll_estimate

    for r in sk4_hll_estimate(spark, SF_DIR).collect():
        rel = abs(r["hll_est"] - r["exact_distinct"]) / r["exact_distinct"]
        assert rel < 0.15, (r["event_type"], r["hll_est"], r["exact_distinct"])
