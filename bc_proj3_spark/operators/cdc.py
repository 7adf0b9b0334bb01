"""Snapshot diff — change-data-capture between two table versions.

What an incremental pipeline needs to AUDIT its merges: given two
keyed snapshots of a table, classify every key as insert / delete /
update (any value column changed). The reference's merge
(silver_arxiv.py:130-152) applies changes; this operator recovers them
after the fact — the diff of two Catalog/time-travel versions is
exactly this query over ``read_version(v1)`` × ``read_version(v2)``.

The two snapshots here are derived deterministically from ``orders`` so
the DuckDB oracle replays them exactly: v1 drops keys % 97 == 0 (those
appear only in v2 → inserts), v2 drops keys % 89 == 0 (→ deletes) and
rewrites o_orderpriority for keys % 7 == 0 (→ updates).

Scale shape: ONE full-outer shuffle join on the key — the minimal plan
for a diff (every key must meet its counterpart). Value comparison is
null-safe column-by-column (`<=>` / IS NOT DISTINCT FROM), never a
string-concat row hash: double→string formatting differs across
engines, and a concat hash would also miss NULL/empty ambiguities.
With both snapshots bucketed by the key (Catalog tables partitioned on
their merge key) the join is co-located and shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.plans.tables import table
from bc_proj3_spark.registry import register

#: Deterministic snapshot-derivation moduli (shared with the oracle).
INSERT_MOD = 97  # keys missing from v1 -> inserts in v2
DELETE_MOD = 89  # keys missing from v2 -> deletes vs v1
UPDATE_MOD = 7  # keys with a rewritten value column -> updates

_VALUE_COLS = (
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

_SQL_SNAPSHOTS = f"""
v1 AS (
  SELECT * FROM orders WHERE o_orderkey % {INSERT_MOD} <> 0
),
v2 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         CASE WHEN o_orderkey % {UPDATE_MOD} = 0
              THEN o_orderpriority || '+r2' ELSE o_orderpriority END
           AS o_orderpriority
  FROM orders WHERE o_orderkey % {DELETE_MOD} <> 0
)
"""

_CDC1_ORACLE = f"""
WITH {_SQL_SNAPSHOTS}
SELECT
  COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
  CASE
    WHEN a.o_orderkey IS NULL THEN 'insert'
    WHEN b.o_orderkey IS NULL THEN 'delete'
    ELSE 'update'
  END AS change_type
FROM v1 a FULL JOIN v2 b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR NOT (
  {' AND '.join(f'a.{c} IS NOT DISTINCT FROM b.{c}' for c in _VALUE_COLS)}
)
"""


def snapshot_diff(v1: DataFrame, v2: DataFrame, key: str, value_cols) -> DataFrame:
    """(key, change_type) for every key that differs between snapshots."""
    a, b = v1.alias("a"), v2.alias("b")
    ka, kb = F.col(f"a.{key}"), F.col(f"b.{key}")
    same: Column = F.lit(True)
    for c in value_cols:
        same = same & F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    return (
        a.join(b, ka == kb, "full")
        .select(
            F.coalesce(ka, kb).alias(key),
            F.when(ka.isNull(), F.lit("insert"))
            .when(kb.isNull(), F.lit("delete"))
            .when(~same, F.lit("update"))
            .alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )


@register("cdc1_snapshot_diff", _CDC1_ORACLE)
def cdc1_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff of the two derived orders snapshots; see module docstring."""
    o = table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % INSERT_MOD != 0)
    v2 = o.filter(F.col("o_orderkey") % DELETE_MOD != 0).withColumn(
        "o_orderpriority",
        F.when(
            F.col("o_orderkey") % UPDATE_MOD == 0,
            F.concat(F.col("o_orderpriority"), F.lit("+r2")),
        ).otherwise(F.col("o_orderpriority")),
    )
    return snapshot_diff(v1, v2, "o_orderkey", _VALUE_COLS)
