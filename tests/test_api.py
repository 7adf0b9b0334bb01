"""The curated api facade: every exported name imports and is callable."""

from __future__ import annotations


def test_api_surface_imports_and_is_complete():
    from bc_proj3_spark import api

    for name in api.__all__:
        obj = getattr(api, name)
        assert callable(obj), f"api.{name} is not callable"


def test_api_compose_smoke(spark, tmp_path):
    """A user-style composition: tokenize -> fingerprint -> components
    -> z-order write, using only facade names."""
    from pyspark.sql import functions as F

    from bc_proj3_spark import api

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "delta")],
        ["doc_id", "text"],
    )
    fp = df.select("doc_id", api.fingerprint(F.col("text")).alias("fp"))
    groups = fp.groupBy("fp").count().filter(F.col("count") > 1)
    assert groups.count() == 1  # 1 and 2 are permutations -> same fp

    pairs = spark.createDataFrame([(1, 2)], ["src", "dst"])
    edges = pairs.unionAll(pairs.selectExpr("dst as src", "src as dst"))
    labels = {r.doc_id: r.label for r in api.min_label_components(edges).collect()}
    assert labels == {1: 1, 2: 1}

    out = str(tmp_path / "z")
    api.zorder_layout(
        spark.range(100).select(
            F.col("id").alias("a"), (F.col("id") * 7 % 100).alias("b")
        ),
        ["a", "b"],
        4,
    ).write.mode("overwrite").parquet(out)
    assert spark.read.parquet(out).count() == 100


def test_rotation_maps_reference_real_queries():
    """_VERIFIED_ROUND / _SHOWCASE_FIRST drive the driver's bounded
    verification prefix; a typo'd or stale name silently mis-orders the
    rotation (the entry no-ops and the query drops to round 0 or never
    gets its priority)."""
    from bc_proj3_spark.registry import (
        _SHOWCASE_FIRST,
        _VERIFIED_ROUND,
        all_queries,
    )

    names = set(all_queries())
    assert set(_VERIFIED_ROUND) <= names, sorted(set(_VERIFIED_ROUND) - names)
    assert set(_SHOWCASE_FIRST) <= names, sorted(set(_SHOWCASE_FIRST) - names)


def test_showcase_list_contains_only_unverified_queries():
    """_SHOWCASE_FIRST only orders the round-0 (never-driver-verified)
    block — a name that has since earned a _VERIFIED_ROUND pin is stale
    there and signals the list wasn't trimmed during rotation. Keeping
    the two disjoint is what guarantees the prefix arithmetic (pins +
    round-0 block) stays exact and no rotation slot is displaced."""
    from bc_proj3_spark.registry import _SHOWCASE_FIRST, _VERIFIED_ROUND

    stale = sorted(set(_SHOWCASE_FIRST) & set(_VERIFIED_ROUND))
    assert not stale, f"verified queries still in _SHOWCASE_FIRST: {stale}"
