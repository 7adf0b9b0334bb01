"""Shingle document-frequency cap (operators/dedup.py).

A shingle appearing in more than shingle_df_cap(n_docs) documents is
boilerplate: it contributes ~no Jaccard discrimination but drives the
quadratic fan-out of the inverted-index self-join. These tests pin that
the cap drops exactly the hot shingles, that sizes are computed AFTER
the cap (Jaccard denominators must agree with the oracle, which applies
the identical filter in SQL), and the cap formula itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bc_proj3_spark.operators.dedup import (
    SHINGLE_DF_CAP_MIN,
    _shingle_pairs,
    shingle_df_cap,
)


def test_cap_formula():
    assert shingle_df_cap(0) == SHINGLE_DF_CAP_MIN
    assert shingle_df_cap(1999) == SHINGLE_DF_CAP_MIN  # floor(19.99) < MIN
    assert shingle_df_cap(5000) == 50
    assert shingle_df_cap(5099) == 50  # floor division, both engines


def test_hot_shingle_dropped_sizes_post_cap(spark):
    n = SHINGLE_DF_CAP_MIN + 5  # 25 docs → cap = max(25//100, 20) = 20
    rows = [(i, f"aa bb cc u{i}x u{i}y") for i in range(n)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh, sizes = _shingle_pairs(docs, n_docs=n)
    # each doc has 3 shingles; 'aa bb cc' is shared by all 25 (> cap=20)
    # and must be dropped, leaving the 2 doc-unique shingles per doc
    got = {r["doc_id"]: r["n"] for r in sizes.collect()}
    assert got == {i: 2 for i in range(n)}
    # the dropped shingle's key appears nowhere in the capped index
    assert sh.groupBy("k").count().filter(F.col("count") > 1).count() == 0
    sh.unpersist()


def test_under_cap_shingles_survive(spark):
    n = 5  # cap = 20; a shingle in all 5 docs is under it → kept
    rows = [(i, f"aa bb cc u{i}x u{i}y") for i in range(n)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    _sh, sizes = _shingle_pairs(docs, n_docs=n)
    got = {r["doc_id"]: r["n"] for r in sizes.collect()}
    assert got == {i: 3 for i in range(n)}
    _sh.unpersist()
