"""Kernel unit tests for the round-5 additions: triangle census
orientation-invariance, chunk boundary semantics, fuzzy-linkage shape.

The registry oracle test (test_correctness.py) already value-checks
er1/er2/ch1/ch2/tc1 against DuckDB at sf0.01; these tests pin the
kernel-level properties on crafted inputs where the expected values are
hand-computable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bc_proj3_spark.operators.chunking import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    chunk_documents,
)
from bc_proj3_spark.operators.graph import triangle_census
from bc_proj3_spark.operators.linkage import er2_canonical_assignment


def test_triangle_census_known_graph(spark):
    # K4 (4 triangles, 12 wedges) + square-with-diagonal (2 triangles,
    # 8 wedges) + isolated edge (0, 0). Global: 6 triangles, 20 wedges.
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    square_diag = [(5, 6), (6, 7), (7, 8), (5, 8), (5, 7)]
    lone = [(9, 10)]
    edges = spark.createDataFrame(k4 + square_diag + lone, ["pa", "pb"])
    row = triangle_census(edges).collect()[0]
    assert row.n_nodes == 10
    assert row.n_edges == 12
    assert row.n_wedges == 20
    assert row.n_triangles == 6
    assert row.global_clustering == 0.9


def test_triangle_census_matches_naive_on_path_and_star(spark):
    # Degree-ordered orientation must count identically to the naive
    # definition on triangle-free graphs (0) regardless of hubs.
    star = [(1, k) for k in range(2, 12)]  # hub of degree 10, 0 triangles
    path = [(20, 21), (21, 22), (22, 23)]
    edges = spark.createDataFrame(star + path, ["pa", "pb"])
    row = triangle_census(edges).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 45 + 2  # C(10,2) hub wedges + 2 path wedges


def test_chunk_boundaries(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", " ".join(f"w{i}" for i in range(100))),
            (2, "en", " ".join(f"w{i}" for i in range(CHUNK_TOKENS))),
            (3, "en", "solo"),
        ],
        ["doc_id", "lang", "text"],
    )
    out = chunk_documents(docs)
    rows = {
        (r.doc_id, r.chunk_id): r
        for r in out.collect()
    }
    # 100 tokens → starts 0, 48, 96 → lengths 64, 52, 4.
    assert [rows[(1, i)].n_chunk_tokens for i in range(3)] == [64, 52, 4]
    assert (1, 3) not in rows
    # Exactly one window of tokens still emits a second (overlap) chunk
    # at start=CHUNK_STRIDE with the remaining 16 tokens.
    assert rows[(2, 0)].n_chunk_tokens == CHUNK_TOKENS
    assert rows[(2, 1)].n_chunk_tokens == CHUNK_TOKENS - CHUNK_STRIDE
    # Single-token doc → one 1-token chunk.
    assert rows[(3, 0)].n_chunk_tokens == 1
    assert rows[(3, 0)].chunk_text == "solo"
    # Chunk text round-trips the original span verbatim (doc 1 has 100
    # tokens, so the start-48 chunk is clipped to w48..w99).
    assert rows[(1, 1)].chunk_text.split(" ") == [
        f"w{i}" for i in range(CHUNK_STRIDE, 100)
    ]


def test_er2_variant_resolved_once(spark):
    # Every variant maps to exactly one canonical partner.
    out = er2_canonical_assignment(spark, "/root/testdata/sf0.001")
    dups = (
        out.groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dups == 0
