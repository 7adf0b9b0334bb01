"""Connected-components propagation on synthetic graphs.

The registered cc1 query is oracle-checked in test_correctness; here the
propagation kernel itself is pinned on shapes the corpus data may not
exercise: chains (worst-case diameter), multiple components, and the
non-convergence safeguard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bc_proj3_spark.operators import graph


def _components(spark, pairs):
    df = spark.createDataFrame(pairs, "src: long, dst: long")
    edges = df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = graph.min_label_components(edges)
    out = {r["doc_id"]: r["label"] for r in labels.collect()}
    labels.unpersist()
    return out


def test_chain_collapses_to_min(spark):
    # 1-2-3-4 chain: diameter 3, all should label 1; {7,8} separate.
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (7, 8)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7}


def test_triangle_and_isolated_pair(spark):
    got = _components(spark, [(10, 11), (11, 12), (10, 12), (5, 6)])
    assert got == {10: 10, 11: 10, 12: 10, 5: 5, 6: 5}


def test_bridge_merges_two_clusters(spark):
    # two dense pairs bridged by one edge -> single component labeled 1
    got = _components(spark, [(1, 2), (3, 4), (2, 3)])
    assert set(got.values()) == {1}


def test_nonconvergence_raises(spark, monkeypatch):
    monkeypatch.setattr(graph, "MAX_CC_ITERS", 1)
    with pytest.raises(RuntimeError, match="did not converge"):
        # chain of diameter 3 cannot finish in 1 round
        _components(spark, [(1, 2), (2, 3), (3, 4)])


# ---------------------------------------------------------------------------
# star_components (cc2 kernel) — must agree with min-label on every shape
# ---------------------------------------------------------------------------


def _star(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src: long, dst: long")
    edges = df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return {r["doc_id"]: r["label"] for r in graph.star_components(edges, **kw).collect()}


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (3, 4), (7, 8)],          # chain + pair
        [(10, 11), (11, 12), (10, 12), (5, 6)],    # triangle + pair
        [(1, 2), (3, 4), (2, 3)],                  # bridge
        [(i, i + 1) for i in range(1, 20)],        # diameter-18 chain
        [(100, 1), (100, 2), (100, 3)],            # star centered off-min
    ],
    ids=["chain+pair", "triangle+pair", "bridge", "long-chain", "off-min-star"],
)
def test_star_matches_min_label(spark, pairs):
    assert _star(spark, pairs) == _components(spark, pairs)


def test_star_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _star(spark, [(i, i + 1) for i in range(1, 30)], max_iters=1)


# ---------------------------------------------------------------------------
# BFS kernel (cc4's iteration) on shapes the corpus may not exercise
# ---------------------------------------------------------------------------


def _bfs(spark, pairs, seed_ids):
    df = spark.createDataFrame(pairs, "src: long, dst: long")
    edges = df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "doc_id: long")
    return {r["doc_id"]: r["dist"] for r in graph.bfs_distances(edges, seeds).collect()}


def test_bfs_chain_distances(spark):
    # 1-2-3-4-5 chain seeded at 1: dist = hops; 9 isolated seed -> 0.
    got = _bfs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1, 9])
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 9: 0}


def test_bfs_min_over_multiple_seeds(spark):
    # two seeds at both chain ends: every node takes the closer one
    got = _bfs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1, 5])
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


def test_bfs_depth_bound(spark):
    # chain longer than BFS_MAX_DEPTH: nodes beyond the bound unreached
    n = graph.BFS_MAX_DEPTH + 3
    chain = [(i, i + 1) for i in range(1, n + 1)]
    got = _bfs(spark, chain, [1])
    assert max(got.values()) == graph.BFS_MAX_DEPTH
    assert n + 1 not in got


def test_bfs_unreached_absent(spark):
    got = _bfs(spark, [(1, 2), (7, 8)], [1])
    assert got == {1: 0, 2: 1}
