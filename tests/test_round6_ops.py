"""Semantic properties of the round-6 operators that oracle equality
cannot pin: the DuckDB oracle replays the same construction, so a bug
present in BOTH formulations would still hash-match. These tests assert
the operator's defining invariant independently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_sp9_no_cluster_straddles_splits(spark):
    """The leakage-safety property itself: every near-dup component is
    assigned to exactly ONE split (the entire reason sp9 exists)."""
    from bc_proj3_spark.operators.graph import cc1_dedup_components
    from bc_proj3_spark.operators.sampling import _seeded, _split_of
    from bc_proj3_spark.functions.hashing import hash60

    assign = cc1_dedup_components(spark, SF_DIR)
    sb = hash60(_seeded("split", F.col("component_id").cast("string"))) % 100
    per_cluster = (
        assign.select("component_id", _split_of(sb).alias("split"))
        .groupBy("component_id")
        .agg(F.countDistinct("split").alias("n_splits"))
    )
    assert per_cluster.agg(F.max("n_splits")).first()[0] == 1


def test_sp9_singletons_keep_sp1_assignment(spark):
    """Docs in no duplicate cluster (component == own id) must get
    exactly sp1's split — corpus growth may move dup-cluster members
    only, never reshuffle the clean majority."""
    from bc_proj3_spark.operators.graph import cc1_dedup_components
    from bc_proj3_spark.operators.sampling import (
        _seeded,
        _split_of,
        sp1_split_assign,
    )
    from bc_proj3_spark.functions.hashing import hash60

    assign = cc1_dedup_components(spark, SF_DIR)
    singles = assign.filter(F.col("doc_id") == F.col("component_id"))
    sb = hash60(_seeded("split", F.col("component_id").cast("string"))) % 100
    safe = singles.select("doc_id", _split_of(sb).alias("safe_split"))
    naive = sp1_split_assign(spark, SF_DIR).select("doc_id", "split")
    diff = safe.join(naive, "doc_id").filter(
        F.col("safe_split") != F.col("split")
    )
    assert diff.count() == 0


def test_sk10_estimates_bounded_and_close(spark):
    """KMV sanity independent of the oracle: Jaccard estimate in [0,1],
    union estimate never below the sketch size, and the intersection
    estimate lands within the coarse error a K=64 sketch guarantees
    (relative standard error ~1/sqrt(K) ≈ 12.5%; assert 4 sigma)."""
    from bc_proj3_spark.operators.sketch import sk10_kmv_intersection

    rows = sk10_kmv_intersection(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.est_union >= r.k_used
        if r.exact_intersection >= 20:
            rel = abs(r.est_intersection - r.exact_intersection) / max(
                r.exact_intersection, 1
            )
            assert rel < 0.5, (r, rel)


def test_stat2_df_within_welch_bounds(spark):
    """Welch–Satterthwaite df is bounded by min(n)-1 below and
    n_a+n_b-2 above; a formula transposition breaks these instantly."""
    from bc_proj3_spark.plans.aggfuncs import stat2_welch_ttest

    for r in stat2_welch_ttest(spark, SF_DIR).collect():
        assert min(r.n_a, r.n_b) - 1 <= r.df_welch <= r.n_a + r.n_b - 2, r


def test_sp11_reshards_decorrelate(spark):
    """Each epoch re-shards ≈ (S-1)/S of the corpus; a seed that fails
    to vary by epoch would show moved_from_prev == 0."""
    from bc_proj3_spark.operators.sampling import (
        EPOCH_SHARDS,
        sp11_epoch_shuffle,
    )

    rows = {r.epoch: r for r in sp11_epoch_shuffle(spark, SF_DIR).collect()}
    assert rows[0].moved_from_prev is None
    for e in (1, 2):
        frac = rows[e].moved_from_prev / rows[e].n_docs
        expected = (EPOCH_SHARDS - 1) / EPOCH_SHARDS
        assert abs(frac - expected) < 0.1, (e, frac)


def test_d12_removed_have_close_lower_neighbor(spark):
    """Every d12 removal count must be consistent with s3-style direct
    cosine verification inside the cluster: recompute one cluster's
    removals from first principles and compare."""
    from bc_proj3_spark.operators.similarity import (
        SEMDEDUP_THRESHOLD,
        _corpus,
        d12_semdedup,
        s5_kmeans_assign,
        _dot,
    )

    report = {r.centroid_id: r for r in d12_semdedup(spark, SF_DIR).collect()}
    assigned = s5_kmeans_assign(spark, SF_DIR).select("vec_id", "centroid_id")
    memb = assigned.join(_corpus(spark, SF_DIR), "vec_id")
    # pick the cluster with the most removals for the replay
    target = max(report.values(), key=lambda r: r.n_removed).centroid_id
    rows = memb.filter(F.col("centroid_id") == target).collect()

    def cos(a, b):
        num = 0.0
        for x, y in zip(a.v, b.v):
            num += x * y
        return num / (a.nrm * b.nrm)

    removed = set()
    rows.sort(key=lambda r: r.vec_id)
    for i, q in enumerate(rows):
        for p in rows[:i]:
            if cos(p, q) >= SEMDEDUP_THRESHOLD:
                removed.add(q.vec_id)
                break
    assert len(removed) == report[target].n_removed
    assert len(rows) == report[target].n_members
