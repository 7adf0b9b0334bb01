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
