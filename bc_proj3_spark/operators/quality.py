"""Data-quality operators: expectations and statistical outliers.

The run-every-load checks of a production pipeline (Delta Live Tables
calls them expectations; the reference's only guard is its row-count
validation, silver_arxiv.py:155-160 — these generalize it):

- dq1: declarative rule → violation-count matrix over a table. Each
  rule is a Column predicate; the whole rule set evaluates in ONE scan
  as conditional sums (no per-rule pass, no shuffle beyond the final
  1-row aggregate).
- o5: z-score outliers per group with DETERMINISTIC variance — stddev
  is a float-sum reduction whose result depends on accumulation order,
  so both moments accumulate in exact decimal (Σx, Σx²) and the
  variance/threshold math runs on the exact sums in double. The flag
  boundary is rounded three orders coarser than any residual cast
  divergence (the ranking.py discipline).

Scale shape: both are single-scan map-side-combinable aggregates; o5's
second pass (join stats back, filter) broadcasts the per-group stats
row set — outlier detection never shuffles the fact table twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.plans.tables import table
from bc_proj3_spark.registry import register

# ---------------------------------------------------------------------------
# dq1 — expectations: rule violation counts in one scan
# ---------------------------------------------------------------------------

#: (rule_name, SQL predicate over orders) — the DuckDB oracle embeds the
#: same predicate text; the Spark side parses it with F.expr, so both
#: engines evaluate ONE shared rule source.
DQ_RULES: tuple[tuple[str, str], ...] = (
    ("totalprice_positive", "o_totalprice > 0"),
    ("orderdate_in_range", "o_orderdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31'"),
    ("priority_known", "o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')"),
    ("custkey_present", "o_custkey IS NOT NULL"),
    ("status_known", "o_orderstatus IN ('O','F','P')"),
)


def _dq1_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS rule, "
        f"SUM(CASE WHEN NOT ({pred}) THEN 1 ELSE 0 END) AS n_violations, "
        f"COUNT(*) AS n_rows FROM orders"
        for name, pred in DQ_RULES
    )
    return rows


@register("dq1_expectations", _dq1_oracle())
def dq1_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation counts for the declared rule set, ONE scan: every rule
    becomes a conditional sum in a single 1-row aggregate, then the row
    unpivots to (rule, n_violations, n_rows). A gate step drops or
    quarantines rows where any rule fails; this operator is the
    monitoring half (the oracle's UNION ALL per rule is the readable
    SQL twin — Spark's plan is the one-scan version)."""
    o = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in DQ_RULES:
        aggs.append(
            F.sum(
                F.when(~F.expr(pred), F.lit(1)).otherwise(F.lit(0))
            ).alias(name)
        )
    one = o.agg(*aggs)
    stack = ", ".join(f"'{name}', {name}" for name, _ in DQ_RULES)
    return one.selectExpr(
        f"stack({len(DQ_RULES)}, {stack}) AS (rule, n_violations)", "n_rows"
    ).select("rule", "n_violations", "n_rows")


# ---------------------------------------------------------------------------
# o5 — z-score outliers with deterministic variance
# ---------------------------------------------------------------------------

Z_THRESHOLD = 3.0

_O5_ORACLE = f"""
WITH stats AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(28,10)) * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
),
bounds AS (
  SELECT event_type,
         s1 / n AS mean_v,
         sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd
  FROM stats WHERE n > 1
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - b.mean_v) / b.sd, 6) AS zscore
FROM events e JOIN bounds b USING (event_type)
WHERE abs((e.value - b.mean_v) / b.sd) > {Z_THRESHOLD}
"""


@register("o5_value_outliers", _O5_ORACLE)
def o5_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value sits more than {Z} standard deviations from
    their type's mean. Variance comes from exact-decimal Σx and Σx²
    (``stddev_samp`` is an order-dependent float reduction — useless
    against a value-hash oracle) via the textbook
    (Σx² − (Σx)²/n)/(n−1); after the exact sums, both engines run the
    identical double expression tree. One scan builds the per-type
    moments (map-side combinable); the tiny stats table broadcasts back
    for the flagging pass."""
    ev = table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(28,10)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    bounds = stats.filter(F.col("n") > 1).select(
        "event_type",
        (F.col("s1") / F.col("n")).alias("mean_v"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("sd")
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .filter(F.abs(z) > Z_THRESHOLD)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("zscore"),
        )
    )


# ---------------------------------------------------------------------------
# dq3 — Benford first-digit distribution check
# ---------------------------------------------------------------------------

_DQ3_ORACLE = """
WITH digits AS (
  SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
           AS digit
  FROM orders
  WHERE o_totalprice >= 1
),
counts AS (
  SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
),
total AS (SELECT SUM(n) AS t FROM counts)
SELECT digit,
       n,
       ROUND(n / (SELECT t FROM total), 9) AS obs_share,
       ROUND(LOG10(1.0 + 1.0 / CAST(digit AS INTEGER)), 9) AS benford_share,
       ROUND(ABS(ROUND(n / (SELECT t FROM total), 9)
                 - ROUND(LOG10(1.0 + 1.0 / CAST(digit AS INTEGER)), 9)), 9)
         AS deviation
FROM counts
"""


@register("dq3_benford_digits", _DQ3_ORACLE)
def dq3_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs the
    Benford expectation log10(1 + 1/d) — the classic anomaly screen
    for fabricated or unit-mangled numeric columns (a synthetic uniform
    price column FAILS Benford, which is itself information about the
    generator). One scan + a 9-row aggregate; the 1-row total
    broadcasts back into the share projection.

    Determinism: the first digit comes from FLOOR → BIGINT → string
    (floor is exact in both engines; a direct double→int cast would
    TRUNCATE in Spark but ROUND in DuckDB, flipping 99.6 between '9'
    and '1'); shares divide identical bigints (exact in double) and
    log10-derived terms round to 9 before the comparison arithmetic."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).alias("digit")
    counts = o.select(digit).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("t"))
    obs = F.round(F.col("n") / F.col("t"), 9)
    benford = F.round(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("int")), 9
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            obs.alias("obs_share"),
            benford.alias("benford_share"),
            F.round(F.abs(obs - benford), 9).alias("deviation"),
        )
    )
