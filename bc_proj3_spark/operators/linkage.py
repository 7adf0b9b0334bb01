"""Entity resolution / record linkage: blocked fuzzy matching.

The reference pipeline joins records only on exact keys (surrogate-key
equality, silver_nyt_archive.py:102-120). A real data-curation pipeline
also needs FUZZY identity — "are these two catalog entries the same
thing spelled differently?" — which is an edit-distance join. The naive
form is an O(n²) cross product with a per-pair Levenshtein; the
scalable form (implemented here) is the standard two-stage ER shape:

1. **Collapse to the distinct-value vocabulary.** Identical strings are
   grouped first (one exact hash-groupBy), carrying a representative
   key and a multiplicity. The fuzzy stage then runs over DISTINCT
   names only — bounded by vocabulary size, not corpus size. At 100 TB
   the corpus may hold 10^11 rows but only 10^6 distinct names; the
   expensive comparison never touches the raw table.
2. **Block, then verify.** Candidate pairs come from an equi-join on a
   cheap blocking key (here: the head noun of the name — in production,
   q-gram or phonetic keys, possibly several in union). Levenshtein
   runs ONLY inside blocks; `a.name < b.name` keeps each unordered pair
   once. Blocking turns the quadratic candidate space into
   sum-of-block-squares — the same inverted-index trick as the shingle
   dedup family (operators/dedup.py), applied to short strings.

Both stages are pure JVM codegen (split + groupBy + equi-join +
levenshtein); no Python, no UDF. The DuckDB oracle replays the
identical algebra (DuckDB ships the same classic Levenshtein), so the
driver value-hashes the whole fuzzy-match surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.plans.tables import table
from bc_proj3_spark.registry import register

#: maximum edit distance for a candidate pair to count as a fuzzy match.
#: Part names are "<adjective> <noun>"; 4 admits adjective swaps within
#: a noun block ("red gear" ~ "hot gear") while rejecting unrelated
#: names.
MAX_EDIT_DIST = 4


_ER1_ORACLE = f"""
WITH names AS (
  SELECT p_name,
         MIN(p_partkey) AS rep_key,
         COUNT(*) AS n_parts
  FROM part
  GROUP BY p_name
),
cand AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b,
         a.rep_key AS rep_a, b.rep_key AS rep_b,
         a.n_parts AS n_a, b.n_parts AS n_b,
         levenshtein(a.p_name, b.p_name) AS edit_dist
  FROM names a
  JOIN names b
    ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
   AND a.p_name < b.p_name
)
SELECT name_a, name_b, rep_a, rep_b, n_a, n_b, edit_dist
FROM cand
WHERE edit_dist <= {MAX_EDIT_DIST}
"""


@register("er1_fuzzy_name_pairs", _ER1_ORACLE)
def er1_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match pairs of distinct part names within a blocking key.

    Plan: exact groupBy to the distinct-name vocabulary → self-equi-join
    on the head-noun block → Levenshtein verify inside blocks only.
    The raw ``part`` table is scanned once; everything quadratic runs on
    the distinct vocabulary (broadcastable when small, shuffled on the
    block key when not)."""
    names = (
        table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.min("p_partkey").alias("rep_key"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .withColumn("block", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn("edit_dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name")))
        .filter(F.col("edit_dist") <= MAX_EDIT_DIST)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.rep_key").alias("rep_a"),
            F.col("b.rep_key").alias("rep_b"),
            F.col("a.n_parts").alias("n_a"),
            F.col("b.n_parts").alias("n_b"),
            "edit_dist",
        )
    )


_ER2_ORACLE = f"""
WITH names AS (
  SELECT p_name, MIN(p_partkey) AS rep_key, COUNT(*) AS n_parts
  FROM part GROUP BY p_name
),
cand AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b,
         levenshtein(a.p_name, b.p_name) AS edit_dist,
         a.n_parts + b.n_parts AS n_linked
  FROM names a
  JOIN names b
    ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
   AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= {MAX_EDIT_DIST}
)
SELECT name_a AS canonical, name_b AS variant, edit_dist, n_linked
FROM (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY name_b ORDER BY edit_dist, name_a
         ) AS rn
  FROM cand
)
WHERE rn = 1
"""


@register("er2_canonical_assignment", _ER2_ORACLE)
def er2_canonical_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve each fuzzy-matched name to ONE canonical partner: among a
    variant's candidates, pick the closest (smallest edit distance,
    name as tiebreak) — the deterministic 'merge into canonical record'
    decision that follows pair generation. One window over the pair
    list (bounded by matches, not corpus)."""
    from pyspark.sql.window import Window

    pairs = er1_fuzzy_name_pairs(spark, sf_dir)
    w = Window.partitionBy("variant").orderBy("edit_dist", "canonical")
    return (
        pairs.select(
            F.col("name_a").alias("canonical"),
            F.col("name_b").alias("variant"),
            "edit_dist",
            (F.col("n_a") + F.col("n_b")).alias("n_linked"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# er3 — recursive canonical-root resolution (Spark recursive CTE)
# ---------------------------------------------------------------------------

_ER3_RECURSIVE = """
WITH RECURSIVE res(variant, root, depth) AS (
  SELECT variant, canonical, 1 FROM {assign}
  UNION ALL
  SELECT r.variant, a.canonical, r.depth + 1
  FROM res r JOIN {assign} a ON a.variant = r.root
)
SELECT variant, root, CAST(depth AS INTEGER) AS depth
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY variant ORDER BY depth DESC) AS rn
  FROM res
)
WHERE rn = 1
"""

_ER3_ORACLE = f"""
WITH RECURSIVE assign AS (
{_ER2_ORACLE}
),
{_ER3_RECURSIVE.split("WITH RECURSIVE ", 1)[1].format(assign="assign")}
"""


@register("er3_canonical_roots", _ER3_ORACLE)
def er3_canonical_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain resolution over er2's variant → canonical assignment: a
    variant's canonical may itself be someone's variant, so merges must
    follow the chain to the ULTIMATE root. The assignment graph is
    acyclic by construction (canonical < variant lexicographically, so
    every hop strictly decreases), which makes this expressible as a
    Spark 4 RECURSIVE CTE with UNION ALL — the engine's iterate-until-
    empty-increment machinery instead of a hand-rolled driver loop
    (contrast cc1/cc2, where cycles force the driver-side iteration).
    The DuckDB oracle runs the structurally identical recursive query.

    Scale: each recursion step is one equi-join of the open frontier
    against the assignment table (match-bounded, ≪ corpus); depth is
    bounded by the longest merge chain, not table size."""
    import uuid

    view = f"er3_assign_{uuid.uuid4().hex[:8]}"
    # Materialize the assignment BEFORE the recursion: the recursive
    # CTE re-evaluates the anchor/step relation each iteration, and an
    # unmaterialized view would re-run er1's blocked Levenshtein pair
    # generation once per recursion depth. The checkpoint makes every
    # step a join against the match-bounded materialized table.
    er2_canonical_assignment(spark, sf_dir).localCheckpoint(
        eager=True
    ).createOrReplaceTempView(view)
    try:
        return spark.sql(_ER3_RECURSIVE.format(assign=view))
    finally:
        # the returned DataFrame's plan is already resolved against the
        # view; dropping it keeps the catalog clean for the next call.
        spark.catalog.dropTempView(view)
