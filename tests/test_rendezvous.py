"""sp7 rendezvous hashing: the minimal-movement resize invariant."""

from __future__ import annotations

from bc_proj3_spark import registry

SF = "/root/testdata/sf0.01"


def test_resize_moves_about_one_ninth(spark):
    """Growing 8 → 9 shards must relocate ≈ 1/9 of documents (the HRW
    property; modulo hashing would move ~8/9). Bounded at 2× the ideal
    fraction to stay robust at small corpus sizes."""
    spec = registry.all_queries()["sp7_rendezvous_assign"]
    rows = spec.builder(spark, SF).collect()
    moved = sum(1 for r in rows if r["moved"])
    frac = moved / len(rows)
    assert frac <= 2 / 9, f"moved {frac:.3f} — not minimal movement"
    assert frac > 0, "a resize that moves nothing is not rebalancing"
    # every moved doc must have moved TO the new shard (8), never
    # between old shards — the defining HRW relocation pattern
    for r in rows:
        if r["moved"]:
            assert r["shard9"] == 8, r
