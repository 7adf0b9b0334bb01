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

from bc_proj3_spark.functions import text as T
from bc_proj3_spark.functions.hashing import sql_hash60
from bc_proj3_spark.functions.joins import gated_broadcast
from bc_proj3_spark.operators.sampling import _sql_seeded
from bc_proj3_spark.plans.tables import fanout, table
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
        f"CAST(SUM(CASE WHEN NOT ({pred}) THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_violations, "
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


# ---------------------------------------------------------------------------
# dq2 — referential-integrity audit: orphan counts per FK relationship
# ---------------------------------------------------------------------------

#: (relationship label, child table, child key, parent table, parent key).
#: The TPC-H FKs are clean by construction — their zero rows prove the
#: check doesn't false-positive; events.user_id→customer is the dirty
#: one (event users outnumber customers at every SF), proving it counts.
DQ2_RELATIONSHIPS: tuple[tuple[str, str, str, str, str], ...] = (
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
)


def _dq2_oracle() -> str:
    parts = []
    for label, child, ck, parent, pk in DQ2_RELATIONSHIPS:
        parts.append(
            f"SELECT '{label}' AS relationship, "
            f"(SELECT COUNT(*) FROM {child}) AS n_child, "
            f"(SELECT COUNT(*) FROM {child} c "
            f" WHERE c.{ck} IS NOT NULL AND NOT EXISTS "
            f" (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS n_orphans"
        )
    return " UNION ALL ".join(parts)


@register("dq2_referential_integrity", _dq2_oracle())
def dq2_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphaned-foreign-key counts for the declared relationship set —
    the join-integrity half of the expectations suite (dq1 checks rows
    in isolation; this checks rows against their parents, the class of
    breakage that silently drops revenue in an inner join downstream).

    All relationships sharing a child table are audited in ONE pass
    over that child: each parent's DISTINCT key column left-joins in
    (deduplicated, so the left join cannot fan out even when a parent
    key is dirty-duplicated — exactly the breakage an integrity audit
    exists to catch; a null parent key is then exactly an anti-join
    miss, preserving NOT EXISTS membership semantics). The naive
    one-anti-join-per-relationship shape scans lineitem six times
    (count + anti join × three FKs); this scans every child exactly
    once. Small parents broadcast under AQE; the per-key exchanges for
    the chained joins are the irreducible cost. The per-relationship
    rows then union from the 1-row per-child aggregates."""
    by_child: dict[str, list[tuple[int, str, str, str, str]]] = {}
    for i, (label, child, ck, parent, pk) in enumerate(DQ2_RELATIONSHIPS):
        by_child.setdefault(child, []).append((i, label, ck, parent, pk))
    out = None
    for child, rels in by_child.items():
        joined = table(spark, sf_dir, child)
        for i, _label, ck, parent, pk in rels:
            p = (
                table(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"__pk_{i}"))
                .distinct()
            )
            joined = joined.join(
                p, F.col(ck) == F.col(f"__pk_{i}"), "left"
            )
        agg = joined.agg(
            F.count(F.lit(1)).alias("n_child"),
            *[
                F.sum(
                    (
                        F.col(ck).isNotNull()
                        & F.col(f"__pk_{i}").isNull()
                    ).cast("long")
                ).alias(f"__orph_{i}")
                for i, _label, ck, _parent, _pk in rels
            ],
        )
        # one row per child table, referenced once per relationship —
        # the barrier keeps the child pass from re-running per row
        agg = agg.localCheckpoint(eager=True)
        for i, label, _ck, _parent, _pk in rels:
            row = agg.select(
                F.lit(label).alias("relationship"),
                "n_child",
                F.col(f"__orph_{i}").alias("n_orphans"),
            )
            out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# o6 — Pareto frontier (skyline): undominated suppliers
# ---------------------------------------------------------------------------

_O6_ORACLE = """
WITH m AS (
  SELECT l_suppkey AS suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
         CAST(SUM(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE)
           / COUNT(*) AS avg_discount
  FROM lineitem GROUP BY l_suppkey
)
SELECT suppkey, ROUND(revenue, 6) AS revenue, ROUND(avg_discount, 6) AS avg_discount
FROM m
WHERE NOT EXISTS (
  SELECT 1 FROM m o
  WHERE o.revenue >= m.revenue AND o.avg_discount <= m.avg_discount
    AND (o.revenue > m.revenue OR o.avg_discount < m.avg_discount)
)
"""


@register("o6_pareto_frontier", _O6_ORACLE)
def o6_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: suppliers not dominated on (revenue max, average
    discount min) — the two-criteria shortlist (``BETTER in one
    dimension, no worse in the other``: revenue earned without giving margin away) that a quadratic NOT-EXISTS
    self-join expresses and a sort-based plan computes in O(n log n).

    The oracle IS the quadratic definition; the Spark plan is the
    sort-based rewrite, exact under ties: a row is dominated iff
    (a) the minimum discount among STRICTLY higher-revenue rows is <= its
    discount, or (b) some equal-revenue row has strictly smaller discount.
    (a) needs a running min over distinct revenue levels — the per-level
    min-discount table is a reduction of the supplier aggregate (<= one row
    per supplier), its running min is one tiny window, and it joins
    back broadcast. (b) is a min over the revenue-peer partition.

    100 TB shape: the expensive part is the lineitem groupBy (one
    exchange); everything after operates on per-supplier rows (1e4·SF),
    where the window sort is trivial. The naive NOT EXISTS would be a
    suppliers² nested loop — fine in DuckDB at sf0.01, not a plan."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )
    disc = F.col("l_discount").cast("decimal(28,10)")
    # m feeds BOTH the frontier join side and (via levels/strict) the
    # broadcast build: lazy persist so gated_broadcast's count job —
    # which computes strict's subtree and therefore m — fills m's cache
    # and the final job reads it instead of re-running the lineitem
    # aggregate a second time (r10 measure-first finding).
    m = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(rev).cast("double").alias("revenue"),
        (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_discount"),
    ).persist()
    # (b): best discount among revenue peers
    peer_min = F.min("avg_discount").over(Window.partitionBy("revenue"))
    # (a): running min of per-level best discount over strictly higher levels
    levels = m.groupBy("revenue").agg(F.min("avg_discount").alias("lvl_min"))
    w_lvl = (
        Window.orderBy(F.desc("revenue"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    strict = levels.select(
        "revenue", F.min("lvl_min").over(w_lvl).alias("strict_min")
    )
    # per-level table is supplier-sized worst case (1e4·SF) → gated
    joined = m.withColumn("peer_min", peer_min).join(
        gated_broadcast(strict), "revenue"
    )
    dominated = (
        F.col("strict_min").isNotNull() & (F.col("strict_min") <= F.col("avg_discount"))
    ) | (F.col("peer_min") < F.col("avg_discount"))
    return joined.filter(~dominated).select(
        "suppkey",
        F.round("revenue", 6).alias("revenue"),
        F.round("avg_discount", 6).alias("avg_discount"),
    )


# ---------------------------------------------------------------------------
# dq4 — ingest freshness: per-type staleness against the newest event
# ---------------------------------------------------------------------------

STALE_AFTER_S = 6 * 3600  # a type silent for 6h is flagged

_DQ4_ORACLE = f"""
WITH per_type AS (
  SELECT event_type, MAX(ts) AS last_ts, COUNT(*) AS n_events
  FROM events GROUP BY event_type
),
g AS (SELECT MAX(ts) AS mx FROM events)
SELECT
  event_type,
  last_ts,
  n_events,
  (epoch_us(g.mx) - epoch_us(last_ts)) // 1000000 AS lag_seconds,
  (epoch_us(g.mx) - epoch_us(last_ts)) // 1000000 > {STALE_AFTER_S}
    AS is_stale
FROM per_type, g
"""


@register("dq4_event_freshness", _DQ4_ORACLE)
def dq4_event_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-freshness monitor: each event type's last-seen timestamp
    and its lag behind the newest event anywhere in the table, flagged
    stale past a threshold — the check that catches one silently-dead
    upstream producer while the table as a whole keeps growing. Two
    map-side-combinable MAX aggregates (per-type, and a 1-row global)
    crossed together; lag arithmetic is integer microseconds floored to
    seconds, identical in both engines. At 100 TB this is the cheapest
    query in the suite — partial MAX absorbs everything at the scan."""
    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_events")
    )
    g = ev.agg(F.max("ts").alias("mx"))
    lag = (F.unix_micros(F.col("mx")) - F.unix_micros(F.col("last_ts"))) / F.lit(
        1_000_000
    )
    lag_s = F.floor(lag).cast("bigint")
    return per_type.crossJoin(F.broadcast(g)).select(
        "event_type",
        "last_ts",
        "n_events",
        lag_s.alias("lag_seconds"),
        (lag_s > STALE_AFTER_S).alias("is_stale"),
    )


# ---------------------------------------------------------------------------
# dq5 — k-anonymity audit over quasi-identifier combinations
# ---------------------------------------------------------------------------

K_ANON = 8

_DQ5_ORACLE = f"""
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS n,
       COUNT(*) >= {K_ANON} AS meets_k
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


@register("dq5_k_anonymity", _DQ5_ORACLE)
def dq5_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: the size of every quasi-identifier
    equivalence class (nation × market segment) with a meets-k flag —
    the data-governance check run before releasing or training on a
    table containing people (a class smaller than k re-identifies its
    members by attribute combination alone). Deliberately returns ALL
    classes, not just violators, so the result is non-degenerate at
    every scale factor and the auditor sees the margin, not only the
    failures. One combiner-absorbed groupBy on the quasi-identifier
    key; output cardinality is the QI-combination count (bounded by the
    attribute domain product, not the row count) at any data size."""
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) >= K_ANON).alias("meets_k"),
    )


# ---------------------------------------------------------------------------
# dq6 — population-stability drift (PSI) between time halves
# ---------------------------------------------------------------------------

PSI_BINS = 10

_DQ6_ORACLE = f"""
WITH rng AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi,
         (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid_us
  FROM events
),
binned AS (
  SELECT LEAST({PSI_BINS - 1},
               CAST(FLOOR((value - lo) / (hi - lo) * {PSI_BINS}) AS INTEGER))
           AS bin,
         CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END AS is_base
  FROM events, rng
),
counts AS (
  SELECT bin,
         SUM(is_base) AS n_base,
         SUM(1 - is_base) AS n_cur
  FROM binned GROUP BY bin
),
tot AS (SELECT SUM(n_base) AS t_base, SUM(n_cur) AS t_cur FROM counts)
SELECT bin,
       CAST(n_base AS BIGINT) AS n_base,
       CAST(n_cur AS BIGINT) AS n_cur,
       ROUND(
         ((n_cur + 1.0) / (t_cur + {PSI_BINS})
          - (n_base + 1.0) / (t_base + {PSI_BINS}))
         * LN(((n_cur + 1.0) / (t_cur + {PSI_BINS}))
              / ((n_base + 1.0) / (t_base + {PSI_BINS}))), 9) AS psi_contrib
FROM counts, tot
"""


@register("dq6_psi_drift", _DQ6_ORACLE)
def dq6_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second time
    halves of the value stream — the standard input-drift monitor for
    a model or pipeline fed by this table (PSI > 0.2 is the
    conventional retrain/alert line; Σ psi_contrib over these rows is
    the index). Bins are equal-width over the GLOBAL min-max (one
    1-row aggregate broadcast), membership add-one smoothed so empty
    bins stay finite, the time midpoint integer-µs exact — every
    choice replayed identically in the oracle. One scan + one bin
    aggregate; the report is PSI_BINS rows at any scale."""
    ev = table(spark, sf_dir, "events")
    rng = ev.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        (
            (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts")))
            / F.lit(2)
        ).cast("bigint").alias("mid_us"),
    )
    binned = ev.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.lit(PSI_BINS - 1),
            F.floor(
                (F.col("value") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * PSI_BINS
            ).cast("int"),
        ).alias("bin"),
        F.when(F.unix_micros("ts") < F.col("mid_us"), 1)
        .otherwise(0)
        .alias("is_base"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum("is_base").alias("n_base"),
        F.sum(F.lit(1) - F.col("is_base")).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_base").alias("t_base"), F.sum("n_cur").alias("t_cur")
    )
    p_cur = (F.col("n_cur") + 1.0) / (F.col("t_cur") + PSI_BINS)
    p_base = (F.col("n_base") + 1.0) / (F.col("t_base") + PSI_BINS)
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_base",
        "n_cur",
        F.round((p_cur - p_base) * F.log(p_cur / p_base), 9).alias(
            "psi_contrib"
        ),
    )


# ---------------------------------------------------------------------------
# dq7 — cross-table value reconciliation (order totals vs line items)
# ---------------------------------------------------------------------------

RECON_TOL = 0.01  # cents tolerance on the recomputed total

_DQ7_ORACLE = f"""
WITH recomputed AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS line_total
  FROM lineitem GROUP BY l_orderkey
),
joined AS (
  SELECT o.o_orderstatus,
         CASE
           WHEN r.l_orderkey IS NULL THEN 'no_lines'
           WHEN ABS(CAST(o.o_totalprice AS DECIMAL(18,2)) - r.line_total)
                <= {RECON_TOL} THEN 'reconciled'
           ELSE 'mismatch'
         END AS recon
  FROM orders o LEFT JOIN recomputed r ON r.l_orderkey = o.o_orderkey
)
SELECT o_orderstatus, recon, COUNT(*) AS n_orders
FROM joined GROUP BY o_orderstatus, recon
"""


@register("dq7_order_reconciliation", _DQ7_ORACLE)
def dq7_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table money reconciliation: every order's stored total
    versus the sum of its line items, bucketed reconciled / mismatch /
    no-lines per order status — the financial-close audit that catches
    partial loads and double-applied updates (dq2 checks that children
    HAVE parents; this checks the parents' VALUES against their
    children). Sums accumulate in DECIMAL(18,2), not doubles, so the
    comparison is exact cents in both engines and association order
    cannot leak in. One key shuffle for the per-order sum + one
    broadcast-or-shuffle join; the report is |status|×3 rows at any
    scale."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    recomputed = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
            "line_total"
        )
    )
    joined = orders.join(
        recomputed, orders.o_orderkey == recomputed.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        F.when(F.col("l_orderkey").isNull(), "no_lines")
        .when(
            F.abs(
                F.col("o_totalprice").cast("decimal(18,2)")
                - F.col("line_total")
            )
            <= RECON_TOL,
            "reconciled",
        )
        .otherwise("mismatch")
        .alias("recon"),
    )
    return joined.groupBy("o_orderstatus", "recon").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# o7 — grid-density outliers (the DBSCAN-flavored density screen)
# ---------------------------------------------------------------------------

GRID_VALUE_WIDTH = 50.0  # fixed bin width: no global-stats pass needed
GRID_SPARSE_MAX = 20  # a cell this thin is a sparse region

_O7_ORACLE = f"""
WITH cells AS (
  SELECT CAST(FLOOR(value / {GRID_VALUE_WIDTH}) AS BIGINT) AS value_bin,
         EXTRACT(HOUR FROM ts) AS hour,
         COUNT(*) AS n_events,
         SUM(CAST(user_id AS DECIMAL(18,0))) AS user_id_sum
  FROM events
  GROUP BY 1, 2
)
SELECT value_bin, hour, n_events,
       CAST(user_id_sum AS BIGINT) AS user_id_sum,
       n_events <= {GRID_SPARSE_MAX} AS is_sparse
FROM cells
"""


@register("o7_grid_density", _O7_ORACLE)
def o7_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-grid outlier screen: bucket every event into a fixed 2-D
    cell (value band × hour-of-day) and flag thin cells — points in
    sparse regions of feature space are the anomalies distance-based
    methods (o5's z-score) miss when the distribution is multimodal.
    This is the grid phase of grid-DBSCAN: at 100 TB you never compute
    point-to-point distances; you count cells (one combiner-absorbed
    aggregate, output bounded by the grid size) and only ever join
    points back to their own cell's label. FIXED bin widths mean no
    global min/max pre-pass — zero extra scans, zero 1-row broadcasts.
    The integer user_id checksum per cell pins membership, not just
    counts."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.floor(F.col("value") / GRID_VALUE_WIDTH)
            .cast("bigint")
            .alias("value_bin"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("user_id").cast("decimal(18,0)"))
            .cast("bigint")
            .alias("user_id_sum"),
        )
        .select(
            "value_bin",
            "hour",
            "n_events",
            "user_id_sum",
            (F.col("n_events") <= GRID_SPARSE_MAX).alias("is_sparse"),
        )
    )


# ---------------------------------------------------------------------------
# imp1 — median imputation of deterministically-masked values
# ---------------------------------------------------------------------------

IMPUTE_MASK_MOD = 10  # every 10th event plays the missing-value role

_IMP1_ORACLE = f"""
WITH masked AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % {IMPUTE_MASK_MOD} = 0 THEN NULL
              ELSE value END AS value
  FROM events
),
med AS (
  SELECT event_type,
         ROUND(quantile_cont(value, 0.5), 6) AS group_median
  FROM masked WHERE value IS NOT NULL GROUP BY event_type
)
SELECT m.event_id,
       m.value IS NULL AS was_missing,
       ROUND(COALESCE(m.value, d.group_median), 6) AS imputed_value
FROM masked m JOIN med d USING (event_type)
"""


@register("imp1_median_impute", _IMP1_ORACLE)
def imp1_median_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation — the ML-prep staple for filling missing
    numerics without letting outliers leak in (mean imputation's
    failure mode). The synthetic table has no NULLs, so missingness is
    injected deterministically (every 10th event id) IDENTICALLY in
    both engines; the operator under test is the fill: per-type exact
    median over the observed values (Spark ``percentile`` / DuckDB
    ``quantile_cont`` — same interpolation), broadcast back as a
    |types|-row table, COALESCE at scan speed. The was_missing flag
    keeps provenance in the output — the auditability rule every
    imputation pipeline should follow."""
    ev = table(spark, sf_dir, "events")
    masked = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % IMPUTE_MASK_MOD == 0, None)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    med = (
        masked.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.round(F.percentile("value", 0.5), 6).alias("group_median"))
    )
    return masked.join(F.broadcast(med), "event_type").select(
        "event_id",
        F.col("value").isNull().alias("was_missing"),
        F.round(F.coalesce("value", "group_median"), 6).alias(
            "imputed_value"
        ),
    )


# ---------------------------------------------------------------------------
# fe1 — feature-vector assembly (one-hot + scaled numerics, as SQL)
# ---------------------------------------------------------------------------

#: categorical domain pinned at plan time — the feature contract. A
#: drifted category shows up as an all-zero one-hot block, not a
#: silent schema change.
FE_TYPES = ("click", "error", "purchase", "signup", "view")
FE_VALUE_SCALE = 400.0  # value / scale ≈ [0, 1] at any SF
FE_DIM = len(FE_TYPES) + 2  # one-hot + scaled value + scaled hour


def _fe1_oracle() -> str:
    onehot = ", ".join(
        f"CASE WHEN event_type = '{t}' THEN 1.0 ELSE 0.0 END" for t in FE_TYPES
    )
    return f"""
WITH vec AS (
  SELECT event_id,
         [{onehot},
          ROUND(value / {FE_VALUE_SCALE}, 9),
          ROUND(EXTRACT(HOUR FROM ts) / 24.0, 9)] AS features
  FROM events
)
SELECT event_id, CAST(idx AS INTEGER) AS idx, features[idx] AS feature
FROM vec CROSS JOIN generate_series(1, {FE_DIM}) t(idx)
"""


@register("fe1_feature_vector", _fe1_oracle())
def fe1_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-vector assembly as pure relational expressions — the
    VectorAssembler/one-hot stage of an ML pipeline without MLlib's
    engine-private vector type (which no oracle could read): a
    plan-time-pinned category domain one-hot block plus two scaled
    numerics, packed into an array column and verified element-wise
    via posexplode. Zero shuffles — this runs at scan speed and writes
    straight to a training shard; the pinned FE_TYPES tuple is the
    feature CONTRACT, so category drift surfaces as an all-zero block
    in monitoring (dq-family) instead of silently renumbering
    downstream model inputs."""
    ev = table(spark, sf_dir, "events")
    onehot = [
        F.when(F.col("event_type") == t, 1.0).otherwise(0.0) for t in FE_TYPES
    ]
    features = F.array(
        *onehot,
        F.round(F.col("value") / FE_VALUE_SCALE, 9),
        F.round(F.hour("ts") / F.lit(24.0), 9),
    )
    vec = ev.select("event_id", features.alias("features"))
    return vec.select(
        "event_id",
        F.posexplode("features").alias("pos", "feature"),
    ).select(
        "event_id",
        (F.col("pos") + 1).cast("int").alias("idx"),
        "feature",
    )


# ---------------------------------------------------------------------------
# fe2 — leakage-safe standard scaling (train-split statistics only)
# ---------------------------------------------------------------------------

_FE2_ORACLE = f"""
WITH tagged AS (
  SELECT event_id, value,
         {sql_hash60(_sql_seeded('split', 'CAST(event_id AS VARCHAR)'))}
           % 100 < 90 AS is_train
  FROM events
),
mom AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(28,10))) AS s1,
         SUM(CAST(value AS DECIMAL(28,10)) * CAST(value AS DECIMAL(28,10)))
           AS s2
  FROM tagged WHERE is_train
),
stats AS (
  SELECT CAST(s1 AS DOUBLE) / n AS mu,
         SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
              / n) AS sigma
  FROM mom
)
SELECT event_id, is_train,
       ROUND((value - mu) / sigma, 9) AS value_scaled
FROM tagged, stats
"""


@register("fe2_train_scaled", _FE2_ORACLE)
def fe2_train_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard scaling with the LEAKAGE discipline: μ and σ come from
    the train split ONLY (sp1's content-addressed 90% hash split),
    then apply to every row — computing scaler statistics over data
    that includes the eval split is the most common silent
    train/test-contamination bug in feature pipelines, and this
    operator's shape makes it impossible (the moment aggregate is
    filtered BEFORE it exists). Moments accumulate in decimal
    (association-order-proof), the 1-row stats broadcast back, and
    the scaling is scan-side. The split flag rides along so an
    auditor can recompute either side."""
    from bc_proj3_spark.operators.sampling import _seeded

    ev = table(spark, sf_dir, "events")
    from bc_proj3_spark.functions.hashing import hash60

    is_train = (
        hash60(_seeded("split", F.col("event_id").cast("string"))) % 100 < 90
    )
    tagged = ev.select(
        "event_id", "value", is_train.alias("is_train")
    )
    dec = "decimal(28,10)"
    mom = tagged.filter("is_train").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(dec)).alias("s1"),
        F.sum(F.col("value").cast(dec) * F.col("value").cast(dec)).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    stats = mom.select(
        (s1d / F.col("n")).alias("mu"),
        F.sqrt(
            (s2d - s1d * s1d / F.col("n")) / F.col("n")
        ).alias("sigma"),
    )
    return tagged.crossJoin(F.broadcast(stats)).select(
        "event_id",
        "is_train",
        F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 9).alias(
            "value_scaled"
        ),
    )


# ---------------------------------------------------------------------------
# cal1 — calibration: does the quality score predict the weak label?
# ---------------------------------------------------------------------------

CAL_BINS = 10

_CAL1_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         0.4 * least(1.0, len(string_split_regex(trim(text), '\\s+')) / 60.0)
         + 0.3 * (1.0 - (length(text)
             - length(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g')))::DOUBLE
             / length(text))
         + 0.3 * (1.0 - (len(string_split_regex(trim(text), '\\s+'))
             - len({T.sql_tokenize('text')}))::DOUBLE
             / len(string_split_regex(trim(text), '\\s+'))) AS score
  FROM documents
),
labeled AS (
  SELECT s.doc_id, s.score,
         CASE WHEN d.text LIKE '%spark%' OR d.n_chars >= 400
              THEN 1 ELSE 0 END AS label
  FROM scored s JOIN documents d USING (doc_id)
),
binned AS (
  SELECT LEAST(9, CAST(FLOOR(score * 10) AS INTEGER)) AS bin, score, label
  FROM labeled
)
SELECT bin,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(ROUND(score, 9) AS DECIMAL(28,10))) AS DOUBLE)
             / COUNT(*), 6) AS mean_score,
       ROUND(CAST(SUM(label) AS DOUBLE) / COUNT(*), 6) AS positive_rate
FROM binned GROUP BY bin
"""


@register("cal1_reliability_bins", _CAL1_ORACLE)
def cal1_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram data: the t2 quality score binned into
    deciles against a weak positive signal (two of lab1's labeling
    functions), with mean score and observed positive rate per bin —
    the calibration check run before any score is used as a sampling
    weight or filter threshold (a score can RANK well and still be
    wildly miscalibrated; sp5-style temperature mixing consumes
    probabilities, not ranks). Reuses t2's exact scoring expressions
    and lab1's rules; fixed-width bins need no stats pre-pass; the
    whole audit is one scan and one 10-row aggregate."""
    from bc_proj3_spark.functions import text as T

    docs = table(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    n_chars = F.length(F.col("text"))
    n_clean = F.length(F.regexp_replace(lower, r"[^a-z0-9\s]", ""))
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_content = F.size(T.tokenize(F.col("text")))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_words.cast("double") / F.lit(60.0))
        + F.lit(0.3)
        * (F.lit(1.0) - (n_chars - n_clean).cast("double") / n_chars)
        + F.lit(0.3)
        * (F.lit(1.0) - (n_words - n_content).cast("double") / n_words)
    )
    label = (
        F.when(
            (F.col("text").contains("spark")) | (F.col("n_chars") >= 400), 1
        ).otherwise(0)
    )
    binned = docs.select(
        F.least(F.lit(9), F.floor(score * 10).cast("int")).alias("bin"),
        F.round(score, 9).cast("decimal(28,10)").alias("score_d"),
        label.alias("label"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum("score_d").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_score"),
        F.round(
            F.sum("label").cast("double") / F.count(F.lit(1)), 6
        ).alias("positive_rate"),
    )


# ---------------------------------------------------------------------------
# cal3 — expected calibration error over cal1's reliability bins
# ---------------------------------------------------------------------------

_CAL3_ORACLE = f"""
WITH bins AS (
{_CAL1_ORACLE}
)
SELECT CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(CAST(n_docs AS DECIMAL(18,0))
                * CAST(ROUND(ABS(mean_score - positive_rate), 9)
                       AS DECIMAL(11,10))) AS DOUBLE)
         / SUM(n_docs) AS ece,
       MAX(ABS(mean_score - positive_rate)) AS mce
FROM bins
"""


@register("cal3_expected_calibration_error", _CAL3_ORACLE)
def cal3_expected_calibration_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The calibration scorecard: collapse cal1's reliability bins to
    the two numbers a model card reports — ECE (the doc-weighted mean
    |confidence − accuracy| gap across bins) and MCE (the worst bin's
    gap). cal1 DIAGNOSES miscalibration bin by bin; cal3 is the
    regression metric a pipeline gates on before a quality score may
    be consumed as a probability (sp5 temperature mixing, cur1
    schedule thresholds).

    Exactness: composed on cal1's own output (the builder calls the
    registered operator; the oracle nests cal1's statement verbatim),
    whose per-bin means are already 6-dp ROUND values identical across
    engines. Each bin's gap re-enters exact arithmetic as a
    DECIMAL(11,10) lattice value (gaps live in [0,1], so the
    (18,0)x(11,10) product is precision 30 — nowhere near Spark's
    38-digit rescale cliff), the doc weights stay exact integers, and
    ECE is ONE terminal IEEE division; MCE is an order-free MAX of
    bit-identical doubles.

    Scale shape: cal1 is one corpus scan into a 10-row aggregate; cal3
    adds a 10-row reduction — nothing scales with the corpus."""
    gap = F.abs(F.col("mean_score") - F.col("positive_rate"))
    term = F.col("n_docs").cast("decimal(18,0)") * F.round(gap, 9).cast(
        "decimal(11,10)"
    )
    return cal1_reliability_bins(spark, sf_dir).agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        (F.sum(term).cast("double") / F.sum("n_docs")).alias("ece"),
        F.max(gap).alias("mce"),
    )


# ---------------------------------------------------------------------------
# ev4 — Brier score of the quality score against the weak label
# ---------------------------------------------------------------------------

#: cal1's scored+labeled CTEs, reused verbatim (split keeps cal1's own
#: statement byte-identical — it is driver-green and must not move)
_CAL_SCORED_CTES = _CAL1_ORACLE.split(",\nbinned AS", 1)[0]

_EV4_ORACLE = f"""{_CAL_SCORED_CTES}
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM((CAST(ROUND(score, 9) AS DECIMAL(11,10)) - label)
                * (CAST(ROUND(score, 9) AS DECIMAL(11,10)) - label))
            AS DOUBLE) / COUNT(*) AS brier,
       CAST(SUM(label) AS DOUBLE) / COUNT(*) AS base_rate
FROM labeled
"""


@register("ev4_brier_score", _EV4_ORACLE)
def ev4_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Brier score of the t2-style quality score against cal1's
    weak positive label — the single proper scoring rule that charges
    BOTH miscalibration and lack of resolution at once (cal3's ECE
    only sees the calibration half; a constant predictor at the base
    rate has perfect ECE and a terrible Brier). Published with the
    base rate because Brier is only meaningful against the trivial
    baseline base_rate*(1-base_rate). The third leg of the
    probability-quality stool: cal1 diagnoses, cal3 gates calibration,
    ev4 gates overall probabilistic skill.

    Exactness: the per-doc squared error enters exact arithmetic as
    (DECIMAL(11,10) - label)^2 — scores live in [0,1], so the square
    is precision 25, far from the 38-digit cliff — summed order-free
    in DECIMAL; Brier and base rate are each ONE terminal IEEE
    division. Reuses cal1's scoring/labeling expressions and its
    oracle's own CTE text verbatim.

    Scale shape: ONE corpus scan into a 1-row aggregate; nothing
    scales past the scan."""
    from bc_proj3_spark.functions import text as T

    docs = table(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    n_chars = F.length(F.col("text"))
    n_clean = F.length(F.regexp_replace(lower, r"[^a-z0-9\s]", ""))
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_content = F.size(T.tokenize(F.col("text")))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_words.cast("double") / F.lit(60.0))
        + F.lit(0.3)
        * (F.lit(1.0) - (n_chars - n_clean).cast("double") / n_chars)
        + F.lit(0.3)
        * (F.lit(1.0) - (n_words - n_content).cast("double") / n_words)
    )
    label = (
        F.when(
            (F.col("text").contains("spark")) | (F.col("n_chars") >= 400), 1
        ).otherwise(0)
    )
    err = F.round(score, 9).cast("decimal(11,10)") - label
    return docs.select(err.alias("e"), label.alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum(F.col("e") * F.col("e")).cast("double")
            / F.count(F.lit(1))
        ).alias("brier"),
        (F.sum("label").cast("double") / F.count(F.lit(1))).alias(
            "base_rate"
        ),
    )


# ---------------------------------------------------------------------------
# gdpr1 — right-to-erasure cascade footprint
# ---------------------------------------------------------------------------

#: deterministic erasure subject set: customers with custkey % MOD == 0
#: (scales with the corpus, non-empty at every SF).
ERASURE_SUBJECT_MOD = 97

_GDPR1_ORACLE = f"""
WITH subj AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {ERASURE_SUBJECT_MOD} = 0
),
aff_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM subj)
),
footprint AS (
  SELECT 'customer' AS table_name,
         (SELECT COUNT(*) FROM subj) AS n,
         (SELECT COUNT(*) FROM customer) AS total
  UNION ALL
  SELECT 'orders',
         (SELECT COUNT(*) FROM aff_orders),
         (SELECT COUNT(*) FROM orders)
  UNION ALL
  SELECT 'lineitem',
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM aff_orders)),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'events',
         (SELECT COUNT(*) FROM events
          WHERE user_id IN (SELECT c_custkey FROM subj)),
         (SELECT COUNT(*) FROM events)
)
SELECT table_name,
       CAST(n AS BIGINT) AS n_rows_to_erase,
       CAST(total AS BIGINT) AS n_rows_total,
       ROUND(CAST(n AS DOUBLE) / total, 9) AS erase_fraction
FROM footprint
"""


@register("gdpr1_erasure_footprint", _GDPR1_ORACLE)
def gdpr1_erasure_footprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact report: for a deterministic subject set
    (custkey % ERASURE_SUBJECT_MOD == 0 — a stand-in for the actual
    deletion-request list), how many rows each table would lose under
    referential cascade (customer → orders → lineitem; events by
    user id). This is the governance operator a data platform runs
    BEFORE executing a GDPR/CCPA deletion batch: the footprint audit
    that sizes the rewrite, catches an unexpectedly-hot subject (one
    user owning half of a fact table), and documents the cascade paths
    — the DELETE itself is catalog.delete_where (test_delete_where).

    Plan: each cascade level is one LEFT SEMI join keyed on the parent
    key (custkey, then orderkey) — never a row-by-row lookup; counts
    are 1-row aggregates crossJoined into the fixed 4-row report. At
    100 TB the subject list and the affected-order keys ride the
    measured-count broadcast gate; fact tables are never shuffled, only
    semi-join-probed."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")

    subj = cust.filter(
        F.col("c_custkey") % ERASURE_SUBJECT_MOD == 0
    ).select("c_custkey")
    aff_orders = orders.join(
        gated_broadcast(subj),
        orders["o_custkey"] == subj["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    aff_li = li.join(
        gated_broadcast(aff_orders),
        li["l_orderkey"] == aff_orders["o_orderkey"],
        "left_semi",
    )
    aff_ev = ev.join(
        gated_broadcast(subj, persist=False),
        ev["user_id"] == subj["c_custkey"],
        "left_semi",
    )

    def row(name: str, affected: DataFrame, full: DataFrame) -> DataFrame:
        return (
            affected.agg(F.count(F.lit(1)).alias("n_rows_to_erase"))
            .crossJoin(full.agg(F.count(F.lit(1)).alias("n_rows_total")))
            .select(
                F.lit(name).alias("table_name"),
                "n_rows_to_erase",
                "n_rows_total",
                F.round(
                    F.col("n_rows_to_erase").cast("double")
                    / F.col("n_rows_total"),
                    9,
                ).alias("erase_fraction"),
            )
        )

    return (
        row("customer", subj, cust)
        .unionAll(row("orders", aff_orders, orders))
        .unionAll(row("lineitem", aff_li, li))
        .unionAll(row("events", aff_ev, ev))
    )


# ---------------------------------------------------------------------------
# fe3 — leakage-safe (out-of-fold) target encoding
# ---------------------------------------------------------------------------

TENC_FOLDS = 5

_FE3_ORACLE = f"""
WITH base AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         {sql_hash60(_sql_seeded('tenc', 'CAST(o_orderkey AS VARCHAR)'))}
           % {TENC_FOLDS} AS fold
  FROM orders JOIN customer ON o_custkey = c_custkey
),
cf AS (
  SELECT seg, fold, COUNT(*) AS n_cf, CAST(SUM(cents) AS BIGINT) AS s_cf
  FROM base GROUP BY seg, fold
),
c AS (
  SELECT seg, CAST(SUM(n_cf) AS BIGINT) AS n_c,
         CAST(SUM(s_cf) AS BIGINT) AS s_c
  FROM cf GROUP BY seg
)
SELECT cf.seg, cf.fold, cf.n_cf AS n_rows,
       ROUND(CAST(c.s_c - cf.s_cf AS DOUBLE) / (c.n_c - cf.n_cf) / 100, 6)
         AS oof_mean_price
FROM cf JOIN c USING (seg)
"""


@register("fe3_target_encoding", _FE3_ORACLE)
def fe3_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding — the categorical feature that
    replaces a high-cardinality category with the target mean, built
    with the LEAKAGE discipline: each fold's encoding is the mean over
    every OTHER fold ((Σ_cat − Σ_fold)/(n_cat − n_fold)), so no row's
    own target ever contributes to its own feature (the classic silent
    overfit in tabular ML). Folds are content-addressed (sp8's
    pattern, independent seed), targets accumulate as exact integer
    cents (stat2's pattern — no double→DECIMAL grid-snap), and the
    leave-one-fold-out subtraction is pure integer algebra on the
    (category × fold) aggregate — the full table is never re-scanned
    per fold.

    Shape: one key-shuffle join (orders ⋈ customer), one
    (category, fold) aggregate — K·F rows however big the fact table —
    then category totals derived FROM it (a reduction of the
    aggregate, not a second scan) broadcast back."""
    from bc_proj3_spark.functions.hashing import hash60
    from bc_proj3_spark.operators.sampling import _seeded

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    fold = (
        hash60(_seeded("tenc", F.col("o_orderkey").cast("string")))
        % TENC_FOLDS
    )
    base = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("seg"),
        cents.alias("cents"),
        fold.alias("fold"),
    )
    cf = base.groupBy("seg", "fold").agg(
        F.count(F.lit(1)).alias("n_cf"),
        F.sum("cents").cast("bigint").alias("s_cf"),
    )
    # the K·F-row aggregate is both the join left side and the input
    # of the category totals; the barrier stops Spark recomputing the
    # orders⋈customer aggregate once per branch
    cf = cf.localCheckpoint(eager=True)
    c = cf.groupBy("seg").agg(
        F.sum("n_cf").cast("bigint").alias("n_c"),
        F.sum("s_cf").cast("bigint").alias("s_c"),
    )
    return cf.join(F.broadcast(c), "seg").select(
        "seg",
        "fold",
        F.col("n_cf").alias("n_rows"),
        F.round(
            (F.col("s_c") - F.col("s_cf")).cast("double")
            / (F.col("n_c") - F.col("n_cf"))
            / 100,
            6,
        ).alias("oof_mean_price"),
    )


# ---------------------------------------------------------------------------
# dq8 — l-diversity audit (dq5's sensitive-attribute companion)
# ---------------------------------------------------------------------------

#: required distinct sensitive values per quasi-identifier class.
L_DIVERSE = 3

#: account-balance band edges (cents avoided: c_acctbal is DECIMAL in
#: TPC-H but the BAND comparison is against integer literals, exact in
#: both engines).
_BAL_LOW = 0
_BAL_HIGH = 5000

_DQ8_ORACLE = f"""
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS n,
       CAST(COUNT(DISTINCT CASE
              WHEN c_acctbal < {_BAL_LOW} THEN 'debt'
              WHEN c_acctbal < {_BAL_HIGH} THEN 'low'
              ELSE 'high' END) AS BIGINT) AS n_sensitive,
       COUNT(DISTINCT CASE
              WHEN c_acctbal < {_BAL_LOW} THEN 'debt'
              WHEN c_acctbal < {_BAL_HIGH} THEN 'low'
              ELSE 'high' END) >= {L_DIVERSE} AS meets_l
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


@register("dq8_l_diversity", _DQ8_ORACLE)
def dq8_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: dq5 guards against re-identification by class
    SIZE, but a class where every member shares one sensitive value
    (here: the account-balance band) leaks that value to anyone who can
    place a person in the class — the homogeneity attack k-anonymity
    cannot see. Per quasi-identifier class (nation × market segment):
    size, distinct sensitive bands present, and a meets-l flag. All
    classes are returned (dq5's convention) so the auditor sees the
    margin. One combiner-absorbed groupBy; distinct-count state is
    bounded by the 3-value band domain, output by the QI domain
    product — both corpus-size-independent at any scale."""
    cust = table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < _BAL_LOW, F.lit("debt"))
        .when(F.col("c_acctbal") < _BAL_HIGH, F.lit("low"))
        .otherwise(F.lit("high"))
    )
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(band).alias("n_sensitive"),
        (F.countDistinct(band) >= L_DIVERSE).alias("meets_l"),
    )


# ---------------------------------------------------------------------------
# dp1 — differentially-private count release (binomial mechanism)
# ---------------------------------------------------------------------------

#: binomial-mechanism parameters: noise = bit_count(60-bit hash) - 30
#: ~ Binomial(60, 1/2) - 30, variance 15 (sigma ~ 3.87). For counting
#: queries (L2 sensitivity 1) that sigma gives (eps, delta)-DP with
#: eps ~ sqrt(2 ln(1.25/delta))/sigma ~ 1.4 at delta = 1e-6 — the
#: binomial mechanism of Dwork et al. 2006, the integer-exact
#: approximation of Gaussian noise used when engines must agree
#: bit-for-bit (no logs, no floats, no platform-dependent rounding).
DP_COINS = 60
DP_SHIFT = DP_COINS // 2


_DP1_ORACLE = f"""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*)
            + bit_count(({sql_hash60(_sql_seeded('dp1',
                'CAST(c_nationkey AS VARCHAR)', 'c_mktsegment'))}))
            - {DP_SHIFT} AS BIGINT) AS noisy_n
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


@register("dp1_dp_counts", _DP1_ORACLE)
def dp1_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of the dq5/dq8 quasi-identifier
    class counts: every (nation x market segment) cell is published
    with additive binomial noise instead of its true size — the
    release step that lets the governance family's audit tables leave
    the trust boundary. The noise draw is Binomial(60, 1/2) - 30 via
    the popcount of the cell's 60-bit keyed hash: pure integer
    arithmetic, so both engines produce the identical release (the
    draw is seeded/content-addressed here for reproducibility and
    verification; a production release swaps the public seed for a
    secret per-release one, which changes no plan shape).

    Scale shape: one combiner-absorbed groupBy on the QI key; the
    noise is a map-side expression over the group keys, added after
    aggregation — output bounded by the QI domain product at any
    corpus size, and nothing about the mechanism touches row data."""
    from bc_proj3_spark.functions.hashing import hash60
    from bc_proj3_spark.operators.sampling import _seeded

    cust = table(spark, sf_dir, "customer")
    noise = (
        F.bit_count(
            hash60(
                _seeded(
                    "dp1",
                    F.col("c_nationkey").cast("string"),
                    F.col("c_mktsegment"),
                )
            )
        )
        - DP_SHIFT
    )
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "c_nationkey",
        "c_mktsegment",
        (F.col("n") + noise).cast("bigint").alias("noisy_n"),
    )


# ---------------------------------------------------------------------------
# dq9 — t-closeness audit (ordered-EMD companion to dq5/dq8)
# ---------------------------------------------------------------------------

#: t-closeness threshold: a QI class passes when the earth-mover's
#: distance between its sensitive-band distribution and the global one
#: is at most T_CLOSE = T_CLOSE_NUM / T_CLOSE_DEN (0.2, the value used
#: throughout the t-closeness literature for 3-way ordinal attributes).
T_CLOSE_NUM = 1
T_CLOSE_DEN = 5

_DQ9_ORACLE = f"""
WITH cls AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS n_c,
         SUM(CASE WHEN c_acctbal < {_BAL_LOW} THEN 1 ELSE 0 END) AS cd,
         SUM(CASE WHEN c_acctbal >= {_BAL_LOW}
                   AND c_acctbal < {_BAL_HIGH} THEN 1 ELSE 0 END) AS cl
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
),
g AS (
  SELECT CAST(SUM(n_c) AS HUGEINT) AS n,
         CAST(SUM(cd) AS HUGEINT) AS gd,
         CAST(SUM(cl) AS HUGEINT) AS gl
  FROM cls
),
e AS (
  SELECT c_nationkey, c_mktsegment, n_c, n,
         ABS(n * cd - n_c * gd)
           + ABS(n * (cd + cl) - n_c * (gd + gl)) AS emd_num
  FROM cls, g
)
SELECT c_nationkey, c_mktsegment,
       CAST(n_c AS BIGINT) AS n,
       CAST(emd_num AS DOUBLE) / CAST(2 * n_c * n AS DOUBLE) AS emd,
       emd_num * {T_CLOSE_DEN} <= 2 * n_c * n * {T_CLOSE_NUM} AS meets_t
FROM e
"""


@register("dq9_t_closeness", _DQ9_ORACLE)
def dq9_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit completing the dq5 → dq8 privacy ladder:
    l-diversity counts distinct sensitive bands per quasi-identifier
    class but is satisfied by a 98/1/1 split that still leaks the
    dominant value (the skewness attack). t-closeness instead bounds
    the earth-mover's distance between each class's band DISTRIBUTION
    and the global one. The balance bands are ORDERED (debt < low <
    high), so the 1-D EMD under Li et al.'s (ICDE 2007) ordinal ground
    distance — adjacent bands 1/(m-1) apart, m = 3 — is the sum of
    absolute cumulative-share gaps at the two interior cut points,
    divided by m-1; it lives in [0, 1] and the 0.2 threshold is the
    paper's working value.

    Exactness: both cumulative gaps ride the (n_c * n)-scaled integer
    lattice — emd_num = |n*cumC - n_c*cumG| summed over the cuts is an
    exact DECIMAL(38,0)/HUGEINT integer, emd is ONE IEEE division by
    the exact 2*n_c*n (EXACT_DOUBLE_OK), and the meets-t flag is the
    all-integer comparison emd_num*5 <= 2*n_c*n — no float ever enters
    a decision.

    Scale shape: one combiner-absorbed groupBy collapses the corpus to
    the QI-domain class table (nation x segment) with the band tallies
    as conditional sums — the band dimension never shuffles; the class
    table is localCheckpointed (it feeds both the global 1-row total
    and the output — one FileScan); the global total crossJoins back
    in (1-row broadcast, BNLJ-gated)."""
    cust = table(spark, sf_dir, "customer")
    cls = (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_c"),
            F.sum(
                (F.col("c_acctbal") < _BAL_LOW).cast("long")
            ).alias("cd"),
            F.sum(
                (
                    (F.col("c_acctbal") >= _BAL_LOW)
                    & (F.col("c_acctbal") < _BAL_HIGH)
                ).cast("long")
            ).alias("cl"),
        )
        .localCheckpoint(eager=True)
    )
    g = cls.agg(
        F.sum("n_c").cast("decimal(38,0)").alias("n"),
        F.sum("cd").cast("decimal(38,0)").alias("gd"),
        F.sum("cl").cast("decimal(38,0)").alias("gl"),
    )
    emd_num = F.abs(
        F.col("n") * F.col("cd") - F.col("n_c") * F.col("gd")
    ) + F.abs(
        F.col("n") * (F.col("cd") + F.col("cl"))
        - F.col("n_c") * (F.col("gd") + F.col("gl"))
    )
    return cls.crossJoin(F.broadcast(g)).select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_c").cast("bigint").alias("n"),
        (
            emd_num.cast("double")
            / (F.lit(2) * F.col("n_c") * F.col("n")).cast("double")
        ).alias("emd"),
        (
            emd_num * T_CLOSE_DEN
            <= F.lit(2) * F.col("n_c") * F.col("n") * T_CLOSE_NUM
        ).alias("meets_t"),
    )


# ---------------------------------------------------------------------------
# dp2 — differentially-private mean release (clamp + binomial mechanism)
# ---------------------------------------------------------------------------

#: clamp bounds for the balance column, in cents: the sum's
#: L1-sensitivity is exactly DP_CLAMP_HI - DP_CLAMP_LO per individual
DP_CLAMP_LO = 0
DP_CLAMP_HI = 1_000_000

#: noise multiplier for the clamped-sum release: one binomial draw
#: (sigma ~ 3.87) scaled to ~ sigma x 38,700 cents — proportionate to
#: the 10^6-cent sensitivity the clamp enforces
DP_SUM_SCALE = 10_000

_DP2_ORACLE = f"""
WITH g AS (
  SELECT c_mktsegment,
         COUNT(*) AS n,
         SUM(LEAST(GREATEST(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT),
                            {DP_CLAMP_LO}), {DP_CLAMP_HI})) AS s
  FROM customer
  GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       CAST(n + bit_count(({sql_hash60(_sql_seeded('dp2n',
           'c_mktsegment'))})) - {DP_SHIFT} AS BIGINT) AS noisy_n,
       CAST(s + (bit_count(({sql_hash60(_sql_seeded('dp2s',
           'c_mktsegment'))})) - {DP_SHIFT}) * {DP_SUM_SCALE} AS DOUBLE)
         / CAST(100 * (n + bit_count(({sql_hash60(_sql_seeded('dp2n',
           'c_mktsegment'))})) - {DP_SHIFT}) AS DOUBLE) AS noisy_mean
FROM g
"""


@register("dp2_dp_mean", _DP2_ORACLE)
def dp2_dp_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private mean balance per segment, completing dp1:
    the mean is released as noisy_sum / noisy_count with the value
    column CLAMPED to [lo, hi] first — the clamp is what gives the sum
    a finite sensitivity (hi - lo per individual), without it no noise
    level is ever private. Both noise draws use dp1's binomial
    mechanism (popcount of a keyed 60-bit hash - 30), with the sum's
    draw scaled to the clamp range; independent seeds for the count
    and sum channels ('dp2n'/'dp2s') so the two releases don't leak
    through correlation.

    Exactness: clamp, sums, and both noise channels are pure integer
    arithmetic — both engines emit the identical release; noisy_mean
    is ONE IEEE division of two exact integers (EXACT_DOUBLE_OK).

    Scale shape: one combiner-absorbed groupBy on the segment key;
    noise is a group-key expression added after aggregation; output
    bounded by the segment domain at any corpus size."""
    from bc_proj3_spark.functions.hashing import hash60
    from bc_proj3_spark.operators.sampling import _seeded

    cust = table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    clamped = F.least(
        F.greatest(cents, F.lit(DP_CLAMP_LO)), F.lit(DP_CLAMP_HI)
    )
    g = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum(clamped).alias("s")
    )
    noise_n = (
        F.bit_count(hash60(_seeded("dp2n", F.col("c_mktsegment"))))
        - DP_SHIFT
    )
    noise_s = (
        F.bit_count(hash60(_seeded("dp2s", F.col("c_mktsegment"))))
        - DP_SHIFT
    ) * DP_SUM_SCALE
    return g.select(
        "c_mktsegment",
        (F.col("n") + noise_n).cast("bigint").alias("noisy_n"),
        (
            (F.col("s") + noise_s).cast("double")
            / (F.lit(100) * (F.col("n") + noise_n)).cast("double")
        ).alias("noisy_mean"),
    )


# ---------------------------------------------------------------------------
# cal2 — isotonic (PAV) calibration of a monotone rate curve
# ---------------------------------------------------------------------------

#: length-bin width in characters; bins are LEAST(9, n_chars DIV width)
CAL2_BIN_CHARS = 100

_CAL2_ORACLE = f"""
WITH bins AS (
  SELECT LEAST(9, CAST(n_chars // {CAL2_BIN_CHARS} AS INTEGER)) AS bin,
         COUNT(*) AS w,
         SUM(CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END) AS s
  FROM documents GROUP BY LEAST(9, CAST(n_chars // {CAL2_BIN_CHARS} AS INTEGER))
),
cum AS (
  SELECT bin, w, s,
         SUM(w) OVER (ORDER BY bin) AS cw,
         SUM(s) OVER (ORDER BY bin) AS cs
  FROM bins
),
pairs AS (
  SELECT j.bin AS j, k.bin AS k,
         CAST(k.cs - (j.cs - j.s) AS DOUBLE)
           / CAST(k.cw - (j.cw - j.w) AS DOUBLE) AS avgjk
  FROM cum j JOIN cum k ON j.bin <= k.bin
),
mins AS (
  SELECT i.bin AS bin, p.j, MIN(p.avgjk) AS mn
  FROM bins i JOIN pairs p ON p.j <= i.bin AND p.k >= i.bin
  GROUP BY i.bin, p.j
),
fit AS (SELECT bin, MAX(mn) AS iso_rate FROM mins GROUP BY bin)
SELECT b.bin,
       CAST(b.w AS BIGINT) AS n_docs,
       CAST(b.s AS DOUBLE) / b.w AS raw_rate,
       f.iso_rate
FROM bins b JOIN fit f ON b.bin = f.bin
"""


@register("cal2_isotonic_calibration", _CAL2_ORACLE)
def cal2_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression (pool-adjacent-violators) of a label rate
    over an ordered feature: the weighted monotone fit of P(contains
    'spark' | length bin). cal1 DIAGNOSES miscalibration (reliability
    bins); this is the REPAIR step - the classic distribution-free
    recalibration map applied to a score before sp5-style temperature
    sampling consumes it as a probability. The fit uses the max-min
    characterization fitted[i] = max_(j<=i) min_(k>=i) pooledrate(j,k),
    which is the exact PAV solution without any sequential pooling
    loop.

    Exactness: per-bin weights and label sums are exact integers; each
    pooled rate is ONE IEEE division of two exact cumulative-integer
    differences - deterministic on both engines - and the min/max
    lattice over those identical doubles selects identically
    (EXACT_DOUBLE_OK; cur1's no-interpolation rule holds - no pooled
    rate is ever interpolated or re-accumulated in floating point).

    Scale shape: the corpus scan collapses map-side-combinably to 10
    bin rows; every subsequent join (the triangular (j,k) pair grid
    and the (i, pair) cover grid) is bounded at B^2 = 100 and B^3/2
    rows for B = 10 bins REGARDLESS of corpus size - BNLJ over
    broadcast 10-row tables is the intended plan (gated in
    test_plans._BNLJ_OK). Corpus size affects only the first
    aggregate's map side."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    bins = (
        docs.groupBy(
            F.least(
                F.lit(9),
                F.expr(f"n_chars DIV {CAL2_BIN_CHARS}").cast("int"),
            ).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("w"),
            F.sum(
                F.when(F.col("text").contains("spark"), 1).otherwise(0)
            ).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        "w",
        "s",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("s").over(w_cum).alias("cs"),
    )
    j, k = cum.alias("j"), cum.alias("k")
    pairs = j.join(k, F.col("j.bin") <= F.col("k.bin")).select(
        F.col("j.bin").alias("j"),
        F.col("k.bin").alias("k"),
        (
            (F.col("k.cs") - (F.col("j.cs") - F.col("j.s"))).cast("double")
            / (F.col("k.cw") - (F.col("j.cw") - F.col("j.w"))).cast("double")
        ).alias("avgjk"),
    )
    mins = (
        bins.select(F.col("bin").alias("i"))
        .join(pairs, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("avgjk").alias("mn"))
    )
    fit = mins.groupBy("i").agg(F.max("mn").alias("iso_rate"))
    return bins.join(fit, bins.bin == fit.i).select(
        "bin",
        F.col("w").cast("bigint").alias("n_docs"),
        (F.col("s").cast("double") / F.col("w")).alias("raw_rate"),
        "iso_rate",
    )


# ---------------------------------------------------------------------------
# fe4 — feature hashing (the hashing trick) over document tokens
# ---------------------------------------------------------------------------

#: hashed feature dimensionality — fixed REGARDLESS of vocabulary size,
#: which is the whole point (Weinberger et al., "Feature Hashing for
#: Large Scale Multitask Learning", ICML 2009): no vocabulary pass, no
#: dictionary broadcast, memory O(FEAT_BUCKETS) per row forever.
FEAT_BUCKETS = 16

_FE4_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents
),
hashed AS (
  SELECT doc_id,
         {sql_hash60('t')} % {FEAT_BUCKETS} AS bkt,
         CASE WHEN ({sql_hash60('t')} >> 20) & 1 = 1 THEN 1 ELSE -1 END
           AS sgn
  FROM tok
)
SELECT doc_id,
       {', '.join(f"CAST(COALESCE(SUM(CASE WHEN bkt = {b} THEN sgn END), 0) AS BIGINT) AS f{b}" for b in range(FEAT_BUCKETS))}
FROM hashed GROUP BY doc_id
"""


@register("fe4_feature_hashing", _FE4_ORACLE)
def fe4_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature hashing (the 'hashing trick', Weinberger et al.
    ICML 2009): every token hashes to one of {FEAT_BUCKETS} buckets
    with a ±1 sign bit, and a document's feature vector is the signed
    count per bucket — fe1 assembles features against a PINNED
    category contract, fe4 is the contract-free alternative that needs
    NO vocabulary pass at all, which is why it's the standard text
    featurizer at corpus scales where the vocabulary itself doesn't
    fit anywhere (the sign bit makes collisions cancel in expectation
    instead of biasing upward).

    Exactness: bucket and sign come from the shared seeded hash60
    family; features are pure integer sums — both engines emit
    identical vectors bit-for-bit.

    Scale shape: one token explode feeding ONE combiner-absorbed
    groupBy(doc_id) with {FEAT_BUCKETS} conditional integer sums —
    map-side partial aggregation collapses each partition to its doc
    set before the only shuffle; output width is fixed at any corpus
    or vocabulary size; no joins, no broadcasts, no second pass."""
    from bc_proj3_spark.functions.hashing import hash60

    docs = table(spark, sf_dir, "documents")
    tok = fanout(docs).select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    )
    h = hash60(F.col("t"))
    hashed = tok.select(
        "doc_id",
        (h % FEAT_BUCKETS).alias("bkt"),
        F.when(
            F.shiftright(h, 20).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("bkt") == b, F.col("sgn"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"f{b}")
            for b in range(FEAT_BUCKETS)
        ]
    )


# ---------------------------------------------------------------------------
# o8 — bivariate Mahalanobis outlier screen (balance × spend)
# ---------------------------------------------------------------------------

#: flag threshold: squared Mahalanobis distance 9 = the 3-sigma
#: ellipse, the classic multivariate cut.
MAHA_T2 = 9
MAHA_TOP_K = 20

_O8_ORACLE = f"""
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) // 100 AS y
  FROM orders GROUP BY o_custkey
),
pts AS (
  SELECT c_custkey,
         CAST(ROUND(c_acctbal, 0) AS BIGINT) AS x,
         CAST(COALESCE(s.y, 0) AS BIGINT) AS y
  FROM customer LEFT JOIN spend s ON s.o_custkey = c_custkey
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM pts
),
co AS (
  SELECT n, sx, sy,
         n * sxx - sx * sx AS axx,
         n * syy - sy * sy AS ayy,
         n * sxy - sx * sy AS axy
  FROM m
),
scored AS (
  SELECT c_custkey, x, y,
         (CAST(ayy AS DOUBLE) * CAST(n * x - sx AS DOUBLE) * CAST(n * x - sx AS DOUBLE)
          - 2.0 * CAST(axy AS DOUBLE) * CAST(n * x - sx AS DOUBLE) * CAST(n * y - sy AS DOUBLE)
          + CAST(axx AS DOUBLE) * CAST(n * y - sy AS DOUBLE) * CAST(n * y - sy AS DOUBLE))
         / (CAST(axx AS DOUBLE) * CAST(ayy AS DOUBLE)
            - CAST(axy AS DOUBLE) * CAST(axy AS DOUBLE)) AS d2
  FROM pts CROSS JOIN co
)
SELECT c_custkey, x AS bal_dollars, y AS spend_dollars, d2,
       CAST(CASE WHEN d2 > {MAHA_T2} THEN 1 ELSE 0 END AS BIGINT)
         AS is_outlier
FROM scored
ORDER BY d2 DESC, c_custkey
LIMIT {MAHA_TOP_K}
"""


@register("o8_mahalanobis_outliers", _O8_ORACLE)
def o8_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} customers by squared Mahalanobis distance in the
    (account balance, lifetime spend) plane — the CORRELATION-AWARE
    outlier screen: o5's per-column z-scores miss the point that sits
    2σ high on BOTH axes in the wrong direction, which is exactly the
    anomaly shape of fraud/botted accounts; Mahalanobis whitens by the
    covariance before measuring, and d² > 9 is the classic 3-sigma
    ellipse cut.

    Exactness: both coordinates are exact integer dollars (cents DIV
    100); the five moments accumulate in DECIMAL/HUGEINT; the
    covariance adjugate and the centered coordinates n·x − Sx are
    exact integers, and d² is a FIXED IEEE chain over their (correctly
    rounded, hence engine-identical — g3's >2^53 conversion class)
    double images, so ordering and the 3-sigma flag are bit-identical
    cross-engine.

    Scale shape: one combiner-absorbed per-customer spend aggregate,
    one left join, ONE moment aggregate to a 1-row frame broadcast
    back (BNLJ-gated pattern); scoring is pure per-row arithmetic and
    top-k compiles to TakeOrderedAndProject. The adjugate trick is
    what makes this scale-free: no matrix library, no per-row
    inversion, just integer algebra on five moments."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        F.expr(
            "sum(cast(round(o_totalprice * 100, 0) as bigint)) div 100"
        ).alias("y")
    )
    pts = (
        cust.join(spend, cust["c_custkey"] == spend["o_custkey"], "left_outer")
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal"), 0).cast("bigint").alias("x"),
            F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y"),
        )
        .localCheckpoint(eager=True)  # feeds the moment pass and scoring
    )
    dec = "decimal(38,0)"
    m = pts.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("x"))).alias("sxx"),
        F.sum((F.col("y").cast(dec) * F.col("y"))).alias("syy"),
        F.sum((F.col("x").cast(dec) * F.col("y"))).alias("sxy"),
    )
    co = m.select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("axx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("ayy"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("axy"),
    )
    zx = (F.col("n") * F.col("x") - F.col("sx")).cast("double")
    zy = (F.col("n") * F.col("y") - F.col("sy")).cast("double")
    d2 = (
        F.col("ayy").cast("double") * zx * zx
        - 2.0 * F.col("axy").cast("double") * zx * zy
        + F.col("axx").cast("double") * zy * zy
    ) / (
        F.col("axx").cast("double") * F.col("ayy").cast("double")
        - F.col("axy").cast("double") * F.col("axy").cast("double")
    )
    scored = pts.crossJoin(F.broadcast(co)).select(
        "c_custkey",
        F.col("x").alias("bal_dollars"),
        F.col("y").alias("spend_dollars"),
        d2.alias("d2"),
    )
    return (
        scored.orderBy(F.col("d2").desc(), "c_custkey")
        .limit(MAHA_TOP_K)
        .select(
            "c_custkey",
            "bal_dollars",
            "spend_dollars",
            "d2",
            (F.col("d2") > MAHA_T2).cast("bigint").alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# dq10 — corpus quality-gate ledger (Gopher/C4-style per-rule audit)
# ---------------------------------------------------------------------------

#: Gate bounds, all evaluated as EXACT integer comparisons (ratios become
#: cross-multiplications) so both engines agree bit-for-bit. Thresholds
#: follow the published Gopher/C4 shapes (word-count window, mean-word-
#: length window, stopword presence, lexical diversity, single-token
#: dominance), tuned to this corpus's measured distributions so every
#: rule has real pass/fail variance at sf0.01.
GATE_MIN_WORDS = 25
GATE_MAX_WORDS = 100_000
GATE_MWL_LO2 = 8  # 2*mean_word_length lower bound (mwl >= 4.0)
GATE_MWL_HI2 = 10  # 2*mean_word_length upper bound (mwl <= 5.0)
GATE_MIN_STOP = 2  # at least 2 stopword occurrences
GATE_STOPWORDS = ("the", "a")
GATE_DIVERSITY_NUM = 2  # 2*n_distinct >= n_words  (>=50 % distinct)
GATE_DOMINANCE_DEN = 8  # 8*max_token_count <= n_words (<=12.5 % one token)

_DQ10_STOP_IN = ", ".join(f"'{w}'" for w in GATE_STOPWORDS)

_DQ10_ORACLE = f"""
WITH t AS (
  SELECT lang, source,
         string_split_regex(trim(text), '\\s+') AS toks,
         length(regexp_replace(text, '\\s', '', 'g')) AS n_letters
  FROM documents
),
f AS (
  SELECT lang, source, n_letters,
         len(toks) AS n_words,
         len(list_distinct(toks)) AS n_distinct,
         len(list_filter(toks, x -> x IN ({_DQ10_STOP_IN}))) AS n_stop,
         (SELECT MAX(cnt) FROM (
            SELECT COUNT(*) AS cnt FROM unnest(toks) AS u(tok) GROUP BY tok
          )) AS max_tok
  FROM t
),
g AS (
  SELECT lang, source,
    CASE WHEN n_words BETWEEN {GATE_MIN_WORDS} AND {GATE_MAX_WORDS}
         THEN 1 ELSE 0 END AS p1,
    CASE WHEN 2 * n_letters BETWEEN {GATE_MWL_LO2} * n_words
                                AND {GATE_MWL_HI2} * n_words
         THEN 1 ELSE 0 END AS p2,
    CASE WHEN n_stop >= {GATE_MIN_STOP} THEN 1 ELSE 0 END AS p3,
    CASE WHEN {GATE_DIVERSITY_NUM} * n_distinct >= n_words
         THEN 1 ELSE 0 END AS p4,
    CASE WHEN {GATE_DOMINANCE_DEN} * max_tok <= n_words
         THEN 1 ELSE 0 END AS p5
  FROM f
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(p1 * p2 * p3 * p4 * p5) AS BIGINT) AS n_pass,
       CAST(SUM(1 - p1) AS BIGINT) AS fail_wordcount,
       CAST(SUM(1 - p2) AS BIGINT) AS fail_wordlen,
       CAST(SUM(1 - p3) AS BIGINT) AS fail_stopword,
       CAST(SUM(1 - p4) AS BIGINT) AS fail_diversity,
       CAST(SUM(1 - p5) AS BIGINT) AS fail_dominance,
       CAST(SUM(p1 * p2 * p3 * p4 * p5) AS DOUBLE) / COUNT(*) AS pass_rate
FROM g GROUP BY lang, source
"""


@register("dq10_quality_gates", _DQ10_ORACLE)
def dq10_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule corpus quality-gate ledger — the Gopher/C4-style audit a
    pre-training pipeline runs before filtering: for every (lang,
    source) shard, how many documents pass ALL gates and which specific
    rule each failure trips (word-count window, mean-word-length
    window, stopword presence, lexical diversity, single-token
    dominance). Unlike t2's composite score (one opaque number), the
    ledger says WHY a shard is being dropped — the number a data-vendor
    review actually argues about.

    Exactness: every gate is an integer comparison (ratio thresholds
    are cross-multiplied, e.g. 8*max_tok <= n_words for the 12.5 %
    dominance cap), so no float boundary exists anywhere; pass_rate is
    ONE IEEE division of identical integers per group.

    Scale shape: ONE documents scan; every per-doc feature — including
    the max-token run length, computed by folding the SORTED token
    array with F.aggregate — is map-side JVM codegen (no explode, no
    doc-keyed shuffle), so the only exchange is the final (lang,
    source) aggregate: ~languages x sources rows at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_letters = F.length(F.regexp_replace(F.col("text"), r"\s", ""))

    def _run(a: Column, x: Column) -> Column:
        return F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))

    max_tok = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            _run(a, x).alias("run"),
            F.greatest(a["best"], _run(a, x)).alias("best"),
        ),
        lambda a: a["best"],
    )
    f = docs.select(
        "lang",
        "source",
        F.size(toks).alias("n_words"),
        n_letters.alias("n_letters"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(
            F.filter(toks, lambda x: x.isin(*GATE_STOPWORDS))
        ).alias("n_stop"),
        max_tok.alias("max_tok"),
    )

    def gate(cond: Column) -> Column:
        return F.when(cond, 1).otherwise(0)

    g = f.select(
        "lang",
        "source",
        gate(
            F.col("n_words").between(GATE_MIN_WORDS, GATE_MAX_WORDS)
        ).alias("p1"),
        gate(
            (2 * F.col("n_letters")).between(
                GATE_MWL_LO2 * F.col("n_words"),
                GATE_MWL_HI2 * F.col("n_words"),
            )
        ).alias("p2"),
        gate(F.col("n_stop") >= GATE_MIN_STOP).alias("p3"),
        gate(
            GATE_DIVERSITY_NUM * F.col("n_distinct") >= F.col("n_words")
        ).alias("p4"),
        gate(
            GATE_DOMINANCE_DEN * F.col("max_tok") <= F.col("n_words")
        ).alias("p5"),
    )
    allp = F.col("p1") * F.col("p2") * F.col("p3") * F.col("p4") * F.col("p5")
    return g.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(allp).cast("bigint").alias("n_pass"),
        F.sum(1 - F.col("p1")).cast("bigint").alias("fail_wordcount"),
        F.sum(1 - F.col("p2")).cast("bigint").alias("fail_wordlen"),
        F.sum(1 - F.col("p3")).cast("bigint").alias("fail_stopword"),
        F.sum(1 - F.col("p4")).cast("bigint").alias("fail_diversity"),
        F.sum(1 - F.col("p5")).cast("bigint").alias("fail_dominance"),
        (
            F.sum(allp).cast("double") / F.count(F.lit(1))
        ).alias("pass_rate"),
    )


# ---------------------------------------------------------------------------
# fe5 — weight-of-evidence (WoE) categorical encoding + information value
# ---------------------------------------------------------------------------

#: Binary target: the order is high-priority. WoE replaces a category
#: with ln(P(cat|pos)/P(cat|neg)) — the classic credit-scoring encoder —
#: and IV = Σ (P(cat|pos)-P(cat|neg))·WoE grades the whole feature.
WOE_POS_PRIORITIES = ("1-URGENT", "2-HIGH")

_FE5_POS_IN = ", ".join(f"'{p}'" for p in WOE_POS_PRIORITIES)

_FE5_ORACLE = f"""
WITH base AS (
  SELECT c_mktsegment AS seg,
         CASE WHEN o_orderpriority IN ({_FE5_POS_IN}) THEN 1 ELSE 0 END AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
),
cf AS (
  SELECT seg,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(1 - y) AS BIGINT) AS n_neg
  FROM base GROUP BY seg
),
tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS p_tot,
         CAST(SUM(n_neg) AS BIGINT) AS n_tot
  FROM cf
),
woe AS (
  SELECT seg, n_pos, n_neg,
         ROUND(LN(
           CAST((2 * n_pos + 1) * n_tot AS DOUBLE)
           / CAST((2 * n_neg + 1) * p_tot AS DOUBLE)
         ), 9) AS woe
  FROM cf, tot
),
iv AS (
  SELECT seg, n_pos, n_neg, woe,
         ROUND((CAST(n_pos AS DOUBLE) / p_tot
                - CAST(n_neg AS DOUBLE) / n_tot) * woe, 9) AS iv_term
  FROM woe, tot
)
SELECT seg, n_pos, n_neg, woe, iv_term,
       (SELECT CAST(SUM(CAST(iv_term AS DECIMAL(28,10))) AS DOUBLE)
        FROM iv) AS iv_total
FROM iv
"""


@register("fe5_woe_encoding", _FE5_ORACLE)
def fe5_woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence categorical encoding with Laplace smoothing,
    plus the feature-level information value — the standard
    scorecard-model encoder (and the leakage-free sibling of fe3: WoE
    uses only class-conditional category frequencies, never a row's own
    target). Per market segment: WoE = ln(((n_pos+0.5)/P)/((n_neg+0.5)/N)),
    IV term = (n_pos/P − n_neg/N)·WoE, and the broadcast feature-level
    IV = Σ terms (the 'is this feature worth keeping' number: <0.02
    useless, >0.3 strong).

    Exactness: the smoothed odds ratio is formed as ONE IEEE division
    of two exact BIGINT cross-products ((2·n_pos+1)·N / (2·n_neg+1)·P —
    the 0.5-smoothing cleared of fractions), then ROUND(LN(x), 9) on
    the identical double (t21/g9's log-lattice discipline); IV terms
    are rounded to the same lattice and summed in DECIMAL (order-free),
    cast back to double once.

    Scale shape: one key-shuffle join (orders ⋈ customer), one
    K-row (category) aggregate with map-side combine; totals are
    derived FROM the aggregate (fe3's barrier pattern) and broadcast
    back — the fact table is scanned exactly once."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    y = (
        F.when(F.col("o_orderpriority").isin(*WOE_POS_PRIORITIES), 1)
        .otherwise(0)
    )
    base = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).select(F.col("c_mktsegment").alias("seg"), y.alias("y"))
    cf = base.groupBy("seg").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
    )
    # the K-row aggregate feeds both the totals and the per-category
    # rows; the barrier stops Spark recomputing the join per branch
    cf = cf.localCheckpoint(eager=True)
    tot = cf.agg(
        F.sum("n_pos").cast("bigint").alias("p_tot"),
        F.sum("n_neg").cast("bigint").alias("n_tot"),
    )
    woe_col = F.round(
        F.log(
            ((2 * F.col("n_pos") + 1) * F.col("n_tot")).cast("double")
            / ((2 * F.col("n_neg") + 1) * F.col("p_tot")).cast("double")
        ),
        9,
    )
    woe = cf.crossJoin(F.broadcast(tot)).select(
        "seg",
        "n_pos",
        "n_neg",
        woe_col.alias("woe"),
        F.round(
            (
                F.col("n_pos").cast("double") / F.col("p_tot")
                - F.col("n_neg").cast("double") / F.col("n_tot")
            )
            * woe_col,
            9,
        ).alias("iv_term"),
    )
    woe = woe.localCheckpoint(eager=True)
    iv = woe.agg(
        F.sum(F.col("iv_term").cast("decimal(28,10)"))
        .cast("double")
        .alias("iv_total")
    )
    return woe.crossJoin(F.broadcast(iv))
