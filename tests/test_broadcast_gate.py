"""The shared measured-count broadcast gate (functions/joins.py).

Both sides of the threshold are pinned: under it the join plan carries
the broadcast hint; over it the hint is absent (shuffle join — AQE may
still convert at runtime, which is the desired degradation). Plus an
end-to-end equivalence check on a real consumer (t10): the gate must
change plans, never values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bc_proj3_spark.functions.joins import gated_broadcast


def _logical(df) -> str:
    return df._jdf.queryExecution().logical().toString()


def test_gate_hints_below_threshold(spark):
    dim = spark.range(100).select(F.col("id"), F.lit("x").alias("v"))
    fact = spark.range(1000).select(F.col("id"))
    joined = fact.join(gated_broadcast(dim, max_rows=1000), "id")
    assert "hint" in _logical(joined).lower()


def test_gate_degrades_above_threshold(spark):
    dim = spark.range(100).select(F.col("id"), F.lit("x").alias("v"))
    fact = spark.range(1000).select(F.col("id"))
    joined = fact.join(gated_broadcast(dim, max_rows=10), "id")
    assert "hint" not in _logical(joined).lower()


def test_gate_values_identical_both_paths(spark):
    dim = spark.range(50).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    fact = spark.range(500).select((F.col("id") % 50).alias("id"))
    a = sorted(
        fact.join(gated_broadcast(dim, max_rows=1000), "id").collect()
    )
    b = sorted(fact.join(gated_broadcast(dim, max_rows=0), "id").collect())
    assert a == b


def test_t10_equal_with_gate_forced_off(spark, monkeypatch):
    """End-to-end: forcing every gated vocab broadcast to the shuffle
    path must not change t10's values (plan-only gate)."""
    import bc_proj3_spark.functions.joins as J
    from bc_proj3_spark.operators.ranking import t10_unigram_logprob
    from tests.conftest import SF_DIR, rows_key

    sf = SF_DIR.replace("sf0.01", "sf0.001")
    base = t10_unigram_logprob(spark, sf)
    bcols, brows = list(base.columns), [tuple(r) for r in base.collect()]
    spark.catalog.clearCache()

    monkeypatch.setattr(J, "BROADCAST_MAX_ROWS", 0)
    off = t10_unigram_logprob(spark, sf)
    ocols, orows = list(off.columns), [tuple(r) for r in off.collect()]
    spark.catalog.clearCache()

    assert rows_key(bcols, brows) == rows_key(ocols, orows)
