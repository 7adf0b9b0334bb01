"""TPC-H-style headline queries over the testdata star schema.

The reference's own query surface stops at scalar aggregates
(SURVEY.md §2.4) because it is an ELT pipeline; a user switching to this
engine also gets the general relational layer — grouped aggregation,
multi-way joins, top-k, windows, semi/anti joins — expressed
declaratively so Catalyst handles pushdown, join reordering and AQE.

Queries are adapted from TPC-H to the columns the testdata actually has
(no partsupp, no shipmode/commitdate; see FIXTURES.md §5). Each carries
its DuckDB oracle.

Scale notes (100 TB posture):
- fact-to-fact joins (lineitem ⨝ orders) shuffle on the join key.
- explicit ``F.broadcast`` hints appear ONLY on the fixed-cardinality
  dimensions (region=5 rows, nation=25 rows — constant at every scale
  factor). customer/supplier/part grow linearly with scale, so their
  join strategy is left to Catalyst + AQE: at small SF they broadcast
  automatically (under autoBroadcastJoinThreshold); at 100 TB they
  correctly fall back to shuffle joins instead of OOMing the executors.
- aggregations are expressed as groupBy().agg() so partial (map-side)
  aggregation happens before the shuffle.
- filters are plain column predicates on the scan relation so they reach
  the parquet reader (PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.functions.numeric import (
    DECIMAL_T,
    dec_avg,
    dec_sum,
    dec_sum_rounded,
    sql_dec_avg,
    sql_dec_sum,
    sql_dec_sum_rounded,
)
from bc_proj3_spark.plans.tables import table
from bc_proj3_spark.registry import register

# ---------------------------------------------------------------------------
# q1 — pricing summary report (TPC-H Q1 shape: scan + filter + groupBy agg)
# ---------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dec_sum("l_quantity", "sum_qty")},
  {sql_dec_sum("l_extendedprice", "sum_base_price")},
  {sql_dec_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {sql_dec_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {sql_dec_avg("l_quantity", "avg_qty")},
  {sql_dec_avg("l_extendedprice", "avg_price")},
  {sql_dec_avg("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: full-scan grouped aggregation with derived measures."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3 — shipping-priority style: customer ⨝ orders ⨝ lineitem, top-10 revenue
# ---------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT
  o_orderkey,
  {sql_dec_sum("l_extendedprice * (1 - l_discount)", "revenue")},
  MIN(o_orderdate) AS o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top unshipped-revenue orders for one market segment (3-way join + top-k).

    customer grows with scale → no broadcast hint; AQE broadcasts it at
    small SF and shuffles at 100 TB. Top-k uses a total order
    (revenue DESC, o_orderkey) so tie rows are deterministic across
    engines.
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(dec_sum(revenue, "revenue"), F.min("o_orderdate").alias("o_orderdate"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5 — local supplier volume: 6-way join through region/nation
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT
  n_name,
  {sql_dec_sum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", _Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation where customer and supplier share the nation.

    nation/region (fixed 25/5 rows) broadcast by hint; customer/supplier
    are left to AQE so the plan survives a 100× scale-up.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(revenue, "revenue"))
    )


# ---------------------------------------------------------------------------
# q6 — forecast revenue change: pure pushdown filter + scalar aggregate
# ---------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {sql_dec_sum("l_extendedprice * l_discount", "revenue")}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate whose filters all push to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations, by year
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT
  supp_nation, cust_nation, l_year,
  {sql_dec_sum("volume", "revenue")}
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS INTEGER) AS l_year,
    l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", _Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between two nations by ship year."""
    supp = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2.n_nationkey"))
        .filter(
            ((F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2"))
            | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1"))
        )
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("volume"),
        )
    )
    return joined.groupBy("supp_nation", "cust_nation", "l_year").agg(dec_sum(F.col("volume"), "revenue"))


# ---------------------------------------------------------------------------
# q9 — profit by nation and year (part ⨝ supplier ⨝ lineitem ⨝ orders)
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT
  nation, o_year,
  {sql_dec_sum("amount", "sum_profit")}
FROM (
  SELECT
    n_name AS nation,
    CAST(year(o_orderdate) AS INTEGER) AS o_year,
    l_extendedprice * (1 - l_discount) - p_retailprice * 0.6 * l_quantity AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%green%' OR p_type = 'PROMO'
) profit
GROUP BY nation, o_year
"""


@register("q9_product_profit", _Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per nation/year with retail-price-derived cost (no partsupp)."""
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%green%") | (F.col("p_type") == "PROMO")
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.6) * F.col("l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_sum(F.col("amount"), "sum_profit"))
    )


# ---------------------------------------------------------------------------
# q10 — returned-item reporting: top 20 customers by return revenue
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT
  c_custkey, c_name,
  {sql_dec_sum("l_extendedprice * (1 - l_discount)", "revenue")},
  MIN(n_name) AS n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", _Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most revenue in a quarter (top-20)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name")
        .agg(dec_sum(revenue, "revenue"), F.min("n_name").alias("n_name"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q18 — large-volume customers: HAVING over a fact aggregate, then join
# ---------------------------------------------------------------------------

_Q18_ORACLE = f"""
SELECT
  c_custkey, c_name, o_orderkey,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
  {sql_dec_sum("l_quantity", "sum_qty")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(28,10))) > 120
"""


@register("q18_large_volume_customer", _Q18_ORACLE)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold, with their customer.

    The HAVING predicate runs on the exact decimal sum (before the
    double cast) in both engines, so threshold-boundary rows agree.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,10)")).alias("_sum_qty_dec"))
        .filter(F.col("_sum_qty_dec") > 120)
    )
    return agg.select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("_sum_qty_dec").cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# q14 — promo revenue share: conditional aggregation
# ---------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT
  {sql_dec_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", "promo_revenue")},
  {sql_dec_sum("l_extendedprice * (1 - l_discount)", "total_revenue")}
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
"""


@register("q14_promo_revenue", _Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotional part revenue vs total for one month (CASE aggregation)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        dec_sum(promo, "promo_revenue"),
        dec_sum(revenue, "total_revenue"),
    )


# ---------------------------------------------------------------------------
# q4-ish — order priority counts with an EXISTS-style semi join
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", _Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority distribution for orders with a late-shipped line.

    EXISTS is expressed as a left-semi join — the Spark-native form of
    the reference's NOT IN pattern family (SURVEY.md §2.2 P7 dual).
    """
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q22-ish — anti join: above-average-balance customers with no recent orders
# ---------------------------------------------------------------------------

_Q22_ORACLE = f"""
SELECT
  c_nationkey,
  COUNT(*) AS numcust,
  {sql_dec_sum("c_acctbal", "totacctbal")}
FROM customer
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE) / COUNT(c_acctbal)
  FROM customer WHERE c_acctbal > 0.0
)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-01-01'
  )
GROUP BY c_nationkey
"""


@register("q22_global_sales_opportunity", _Q22_ORACLE)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-funded customers with no 1998 orders, per nation (anti join).

    This is the engine-native form of the reference's NOT IN dedup
    (silver_nyt_archive.py:116-119 → left_anti, SURVEY.md §2.3 J1).
    The scalar AVG subquery is computed once and folded in as a literal
    via a cross-joined 1-row aggregate (no driver-side collect). The
    anti side is date-filtered ("no *recent* orders") so the join is
    exercised on real rows at every scale factor — every customer has
    *some* order, so an unfiltered variant would be vacuously empty.
    """
    cust = table(spark, sf_dir, "customer")
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        dec_avg("c_acctbal", "_avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dec_sum("c_acctbal", "totacctbal"))
    )


# ---------------------------------------------------------------------------
# window — top-3 orders per customer by total price (rank window)
# ---------------------------------------------------------------------------

_WINDOW_ORACLE = """
SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS INTEGER) AS rn
  FROM orders
) t
WHERE rn <= 3
"""


@register("w1_top_orders_per_customer", _WINDOW_ORACLE)
def w1_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via a rank window (SURVEY.md §2.5 upgrade path:
    the reference's driver-side latest-file pick, bronze_arxiv.py:34-40,
    becomes Window.partitionBy + row_number at scale)."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"), "rn")
    )


# ---------------------------------------------------------------------------
# w2 — customer spend deciles (ntile distribution window)
# ---------------------------------------------------------------------------

_W2_ORACLE = """
SELECT decile,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(spend AS DECIMAL(28,10))) AS DOUBLE), 2)
         AS decile_spend
FROM (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE) AS spend,
         CAST(NTILE(10) OVER (
           ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE) DESC,
                    o_custkey
         ) AS INTEGER) AS decile
  FROM orders
  GROUP BY o_custkey
) t
GROUP BY decile
"""


@register("w2_spend_deciles", _W2_ORACLE)
def w2_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-spend decile distribution: per-customer decimal-exact
    spend, NTILE(10) over a TOTAL order (spend desc, custkey — ntile on
    a non-total order is nondeterministic in any engine), then per-
    decile rollup. The distribution-window family (ntile/percent_rank)
    alongside w1's rank family. The global-order window is one sort of
    the CUSTOMER aggregate (not the fact table); at larger scale swap
    ntile for bucketing on a2-style percentile cut points to avoid the
    single-partition sort."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(dec_sum("o_totalprice", "spend"))
    w = Window.orderBy(F.desc("spend"), F.asc("o_custkey"))
    return (
        spend.withColumn("decile", F.ntile(10).over(w).cast("int"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum_rounded("spend", "decile_spend"),
        )
    )


# ---------------------------------------------------------------------------
# set op — union of the customer/supplier account-balance ledgers
# ---------------------------------------------------------------------------

_UNION_ORACLE = f"""
SELECT side, n_name, COUNT(*) AS n_accounts, {sql_dec_sum("acctbal", "total_bal")}
FROM (
  SELECT 'customer' AS side, c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS side, s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
) ledger
JOIN nation ON nationkey = n_nationkey
GROUP BY side, n_name
"""


@register("u1_account_ledger_union", _UNION_ORACLE)
def u1_account_ledger_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across heterogenous tables then grouped agg — the
    gold-layer combine pattern (gold_integrated_data_preNLP.py:156-166,
    SURVEY.md §2.7 U1) on relational data."""
    cust = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    nation = table(spark, sf_dir, "nation")
    return (
        cust.unionByName(supp)
        .join(F.broadcast(nation), F.col("nationkey") == nation.n_nationkey)
        .groupBy("side", "n_name")
        .agg(F.count(F.lit(1)).alias("n_accounts"), dec_sum("acctbal", "total_bal"))
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (LEFT OUTER JOIN + double agg)
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_customer_distribution", _Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed k non-urgent orders, for each k — the
    LEFT OUTER JOIN shape (customers with zero orders survive with
    c_count=0) followed by a second aggregation. Both aggs are
    map-side-combinable; the outer join shuffles once on custkey."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue (correlated scalar subquery per part)
# ---------------------------------------------------------------------------

_Q17_ORACLE = f"""
SELECT {sql_dec_sum("l_extendedprice", "total_price")},
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE)
                  / COUNT(l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
  )
"""


@register("q17_small_quantity_revenue", _Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from below-half-average-quantity lines of one brand.

    The correlated scalar subquery (per-part avg quantity) decorrelates
    into a groupBy-on-partkey aggregate joined back to the fact — the
    plan Catalyst produces for the SQL form, written explicitly. The
    per-part avg is computed over ALL lineitems (not just the brand's)
    exactly as the correlated subquery demands; the brand filter prunes
    the probe side before the join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy("l_partkey").agg(
        (dec_avg("l_quantity", "_avg_qty")).alias("_avg_qty")
    )
    brand_lines = li.join(part, li.l_partkey == part.p_partkey)
    return (
        brand_lines.join(per_part.withColumnRenamed("l_partkey", "_pk"),
                         F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("_avg_qty"))
        .agg(
            dec_sum("l_extendedprice", "total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive predicate revenue (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {sql_dec_sum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE
  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
     AND l_quantity >= 1 AND l_quantity <= 11)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
     AND l_quantity >= 10 AND l_quantity <= 20)
  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
     AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("q19_disjunctive_revenue", _Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across both join sides. Catalyst factors the
    single-table conjuncts out of the disjunction (p_brand IN (...),
    l_quantity range) and pushes them below the join; the residual OR
    evaluates post-join. The explain test pins the pushed filters."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return j.filter(cond).agg(dec_sum(revenue, "revenue"))


# ---------------------------------------------------------------------------
# r1 — ROLLUP subtotals (grouping sets family)
# ---------------------------------------------------------------------------

_R1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
  {sql_dec_sum("l_extendedprice", "sum_price")},
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("r1_rollup_subtotals", _R1_ORACLE)
def r1_rollup_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): detail rows, per-flag
    subtotals, and the grand total in one pass — Spark plans grouping
    sets as a single expand + aggregate, not three scans. grouping_id
    disambiguates genuine NULL keys from subtotal rows."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            dec_sum("l_extendedprice", "sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_price", "n_rows")
    )


# ---------------------------------------------------------------------------
# r2 — CUBE cross-tabulation (grouping sets family, all 2^n combinations)
# ---------------------------------------------------------------------------

_R2_ORACLE = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
  {sql_dec_sum_rounded("o_totalprice", "sum_price")},
  COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("r2_cube_crosstab", _R2_ORACLE)
def r2_cube_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): every margin of the
    cross-tab — detail cells, each one-dimension rollup, and the grand
    total — in ONE expand+aggregate pass over orders (no self-union of
    four scans). grouping_id disambiguates genuine NULL keys from
    margin rows; sums are decimal-exact (functions/numeric.py)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            dec_sum_rounded("o_totalprice", "sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "sum_price", "n_orders"
        )
    )


# ---------------------------------------------------------------------------
# q8 — national market share within a region, by year
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT
  o_year,
  CAST(SUM(CASE WHEN nation = 'NATION_1'
       THEN CAST(volume AS DECIMAL(28,10)) ELSE 0 END) AS DOUBLE)
    / CAST(SUM(CAST(volume AS DECIMAL(28,10))) AS DOUBLE) AS mkt_share
FROM (
  SELECT
    CAST(year(o_orderdate) AS INTEGER) AS o_year,
    l_extendedprice * (1 - l_discount) AS volume,
    n2.n_name AS nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", _Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_1 suppliers' share of revenue to ASIA customers, per
    year — a 7-way join feeding a ratio of two conditional aggregates.
    Both numerator and denominator accumulate in exact decimal so the
    share is deterministic; nation/region broadcast by hint (fixed
    size), everything else left to AQE."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    dec = "decimal(28,10)"
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    num = F.sum(
        F.when(F.col("nation") == "NATION_1", F.col("volume").cast(dec)).otherwise(
            F.lit(0).cast(dec)
        )
    ).cast("double")
    den = F.sum(F.col("volume").cast(dec)).cast("double")
    return joined.groupBy("o_year").agg((num / den).alias("mkt_share"))


# ---------------------------------------------------------------------------
# q15 — top supplier(s) by quarterly revenue (view + scalar-max join)
# ---------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dec_sum("l_extendedprice * (1 - l_discount)", "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", _Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers hitting the max quarterly revenue: a derived revenue
    relation reused twice (detail + scalar max) — Spark reuses the
    aggregated subplan; the scalar max folds in via a broadcast 1-row
    cross join (no driver-side collect). Exact-decimal revenue makes
    the equality against MAX well-defined across engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# u2 — INTERSECT / EXCEPT (set ops beyond the reference's UNION ALL)
# ---------------------------------------------------------------------------

_U2_ORACLE = """
WITH building AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
recent_buyers AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01'
),
both_sets AS (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM recent_buyers),
only_building AS (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM recent_buyers)
SELECT
  (SELECT COUNT(*) FROM building) AS n_building,
  (SELECT COUNT(*) FROM both_sets) AS n_building_and_recent,
  (SELECT COUNT(*) FROM only_building) AS n_building_not_recent
"""


@register("u2_set_operations", _U2_ORACLE)
def u2_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (distinct set semantics) — the set-op family
    the reference never needed (SURVEY §2.7) but a relational engine
    must expose. Catalyst plans both as aggregated semi/anti joins;
    the three counts combine via broadcast 1-row aggregates."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    n_b = building.agg(F.count(F.lit(1)).alias("n_building"))
    n_i = building.intersect(recent).agg(
        F.count(F.lit(1)).alias("n_building_and_recent")
    )
    n_e = building.exceptAll(recent).distinct().agg(
        F.count(F.lit(1)).alias("n_building_not_recent")
    )
    return n_b.crossJoin(F.broadcast(n_i)).crossJoin(F.broadcast(n_e))


# ---------------------------------------------------------------------------
# q12 — shipping-delay distribution by priority class (conditional counts)
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT
  delay_bucket,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS low_line_count
FROM (
  SELECT
    o_orderpriority,
    CASE
      WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 'fast'
      WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN 'normal'
      ELSE 'late'
    END AS delay_bucket
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= o_orderdate
) t
GROUP BY delay_bucket
"""


@register("q12_shipping_delay", _Q12_ORACLE)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12's shape on the available columns (no shipmode in the
    testdata): bucket order→ship latency, split line counts by
    priority class with conditional sums. Integer day-diff keeps the
    bucketing engine-exact."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    bucket = (
        F.when(delay <= 30, "fast").when(delay <= 90, "normal").otherwise("late")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(bucket.alias("delay_bucket"), high.alias("_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("_high"), 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q16 — supplier diversity per part attribute (count-distinct + NOT LIKE)
# ---------------------------------------------------------------------------

# ANSI LIKE predicates shared verbatim by the oracle SQL and (via
# F.expr) the Spark plan — ONE source of truth, no string-splicing.
_Q16_PART_PRED = "p_type NOT LIKE 'PROMO%'"
_Q16_SUPPLIER_PRED = "s_name NOT LIKE '%5'"

_Q16_ORACLE = f"""
SELECT
  p_brand, p_size,
  COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE {_Q16_PART_PRED}
  AND {_Q16_SUPPLIER_PRED}
GROUP BY p_brand, p_size
"""


@register("q16_supplier_diversity", _Q16_ORACLE)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16's shape via the lineitem bridge (no partsupp in the
    testdata): distinct suppliers per (brand, size) for non-promo
    parts, excluding a supplier name pattern — NOT LIKE pushdown on
    both dimensions, then a count-distinct aggregation."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.expr(_Q16_PART_PRED))
    supp = table(spark, sf_dir, "supplier").filter(F.expr(_Q16_SUPPLIER_PRED))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q2 — min-cost supplier (TPC-H Q2 shape: correlated MAX subquery per part)
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name, p_partkey, p_brand
FROM (
  SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         MAX(s_acctbal) OVER (PARTITION BY p_partkey) AS _max_bal
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE p_size = 15 AND r_name = 'AFRICA'
) t
WHERE s_acctbal = _max_bal
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 20
"""


@register("q2_min_cost_supplier", _Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-balance supplier per part within one region (TPC-H Q2 shape).

    The original's correlated scalar subquery (best supplier among those
    supplying that part in the region) decorrelates into a per-partkey
    window MAX over the candidate set — one shuffle on partkey instead
    of a re-executed subquery per row. The testdata has no partsupp, so
    the part↔supplier bridge is the DISTINCT (l_partkey, l_suppkey)
    projection of lineitem — deduplicated BEFORE the dimension joins so
    the window input carries one row per relationship, not per line.
    region/nation are fixed-cardinality at every scale factor →
    explicit broadcast."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    part = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    cand = (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(supp, pairs.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .distinct()
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("_max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_max_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q11 — important part value (scalar-subquery threshold over a grouped agg)
# ---------------------------------------------------------------------------

_Q11_ORACLE = f"""
WITH grouped AS (
  SELECT l_partkey, {sql_dec_sum("l_extendedprice * (1 - l_discount)", "part_value")}
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM grouped
WHERE part_value > (
  SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,10))) AS DOUBLE) * 0.001
  FROM grouped
)
"""


@register("q11_important_part_value", _Q11_ORACLE)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose one-nation revenue exceeds 0.1% of that nation's total
    (TPC-H Q11 shape). The HAVING-against-scalar-subquery decorrelates
    into: one grouped aggregate, one 1-row global re-aggregate of it,
    and a broadcast cross join — the grouped relation is computed once
    and reused for both sides (no second fact scan for the threshold).
    nation is broadcast; the only fact shuffle is the partkey agg."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    grouped = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(dec_sum(revenue, "part_value"))
    )
    threshold = grouped.agg(
        (F.sum(F.col("part_value").cast(DECIMAL_T)).cast("double") * F.lit(0.001)).alias(
            "_threshold"
        )
    )
    return (
        grouped.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("_threshold"))
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# q20 — dominant-share shippers (nested semi-join: Q20 shape)
# ---------------------------------------------------------------------------

_Q20_ORACLE = f"""
WITH shipped AS (
  SELECT l_partkey, l_suppkey, {sql_dec_sum("l_quantity", "qty")}
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'SMALL'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey, CAST(SUM(CAST(qty AS DECIMAL(28,10))) AS DOUBLE) AS total_qty
  FROM shipped GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped JOIN tot USING (l_partkey)
    WHERE qty > 0.2 * total_qty
  )
"""


@register("q20_dominant_share_shippers", _Q20_ORACLE)
def q20_dominant_share_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-nation suppliers holding >20% of any SMALL part's 1996 volume
    (TPC-H Q20 shape: supplier semi-joined to a correlated quantity
    threshold). The nested subquery decorrelates into a two-level
    aggregate — per (part, supplier) quantities, then a window total
    per part reusing the SAME shuffle partitioning (partkey), so the
    share filter adds no extra exchange. The qualifying supplier-key
    set is then a left-semi probe into supplier; nation is broadcast."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(dec_sum("l_quantity", "qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn(
            "total_qty", F.sum(F.col("qty").cast(DECIMAL_T)).over(w).cast("double")
        )
        .filter(F.col("qty") > F.lit(0.2) * F.col("total_qty"))
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who solely spoiled multi-supplier orders (Q21 shape)
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_name = 'NATION_3'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@register("q21_sole_spoiler_suppliers", _Q21_ORACLE)
def q21_sole_spoiler_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who alone returned goods on finished multi-supplier
    orders (TPC-H Q21 shape; the testdata lacks commit/receipt dates, so
    l_returnflag='R' is the documented "kept the order waiting" proxy).

    EXISTS → left-semi and NOT EXISTS → left-anti against the same
    lineitem relation, both keyed on orderkey with the <> suppkey
    residual — three orderkey-partitioned joins AQE can stack on one
    exchange lineage, never a per-row subquery. nation broadcasts;
    the final agg is a low-cardinality s_name count."""
    li = table(spark, sf_dir, "lineitem")
    orders_f = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    waiting = (
        l1.join(orders_f, F.col("l1.l_orderkey") == orders_f.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(supp, F.col("l1.l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# r3 — explicit GROUPING SETS (non-hierarchical margins)
# ---------------------------------------------------------------------------

_R3_ORACLE = f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
  {sql_dec_sum_rounded("o_totalprice", "sum_price")},
  COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


@register("r3_grouping_sets", _R3_ORACLE)
def r3_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority)) — the two
    one-dimension margins and NOTHING else, a set list neither ROLLUP
    (hierarchical prefixes) nor CUBE (all 2^n combinations) can
    express: the report wants each dimension's totals without paying
    for the detail cells. Still ONE expand + aggregate pass over
    orders — the expand emits one replica per requested set instead of
    2^n. grouping_id labels which margin a row belongs to."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [[F.col("o_orderstatus")], [F.col("o_orderpriority")]],
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            dec_sum_rounded("o_totalprice", "sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "sum_price", "n_orders"
        )
    )


# ---------------------------------------------------------------------------
# w4 — gaps and islands: longest consecutive-month purchase streak
# ---------------------------------------------------------------------------

W4_TOP_CUSTOMERS = 20

_W4_ORACLE = f"""
WITH months AS (
  SELECT DISTINCT o_custkey,
         EXTRACT(YEAR FROM o_orderdate) * 12
           + EXTRACT(MONTH FROM o_orderdate) AS m
  FROM orders
),
islands AS (
  SELECT o_custkey, m,
         m - DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY m)
           AS island
  FROM months
),
streaks AS (
  SELECT o_custkey, island, COUNT(*) AS streak_months
  FROM islands GROUP BY o_custkey, island
),
best AS (
  SELECT o_custkey, MAX(streak_months) AS longest_streak,
         COUNT(*) AS n_streaks
  FROM streaks GROUP BY o_custkey
)
SELECT o_custkey, longest_streak, n_streaks
FROM best
ORDER BY longest_streak DESC, o_custkey
LIMIT {W4_TOP_CUSTOMERS}
"""


@register("w4_purchase_streaks", _W4_ORACLE)
def w4_purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over DISCRETE periods: each customer's longest
    run of consecutive purchase months, via the classic
    month-number-minus-dense-rank island key (consecutive months share
    a constant difference; a gap starts a new island). The discrete
    sibling of e2's time-gap sessionization — retention analytics
    ("how long do customers stay active month over month") reduce to
    exactly this. One customer-keyed shuffle serves the distinct, the
    rank window and both aggregates (same partitioning throughout);
    the final top-20 compiles to TakeOrderedAndProject. Deterministic
    tiebreak on customer key."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    months = orders.select(
        "o_custkey",
        (
            F.year("o_orderdate") * F.lit(12) + F.month("o_orderdate")
        ).alias("m"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("m")
    islands = months.withColumn(
        "island", F.col("m") - F.dense_rank().over(w)
    )
    streaks = islands.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).alias("streak_months")
    )
    best = streaks.groupBy("o_custkey").agg(
        F.max("streak_months").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
    return best.orderBy(F.col("longest_streak").desc(), "o_custkey").limit(
        W4_TOP_CUSTOMERS
    )


# ---------------------------------------------------------------------------
# u3 — bag (multiset) set operations: INTERSECT ALL / EXCEPT ALL
# ---------------------------------------------------------------------------

_U3_ORACLE = """
WITH y96 AS (
  SELECT l_partkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
),
y97 AS (
  SELECT l_partkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
),
surplus AS (SELECT l_partkey FROM y96 EXCEPT ALL SELECT l_partkey FROM y97),
common  AS (SELECT l_partkey FROM y96 INTERSECT ALL SELECT l_partkey FROM y97)
SELECT l_partkey,
       CAST(SUM(CASE WHEN src = 's' THEN 1 ELSE 0 END) AS BIGINT)
         AS surplus_96_over_97,
       CAST(SUM(CASE WHEN src = 'c' THEN 1 ELSE 0 END) AS BIGINT)
         AS common_multiplicity
FROM (
  SELECT l_partkey, 's' AS src FROM surplus
  UNION ALL
  SELECT l_partkey, 'c' AS src FROM common
) u
GROUP BY l_partkey
"""


@register("u3_bag_set_ops", _U3_ORACLE)
def u3_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset semantics: EXCEPT ALL (how many MORE times was this
    part shipped in 1996 than 1997 — multiplicity subtraction, not
    membership) and INTERSECT ALL (the shared multiplicity), folded to
    per-part counts so the result is bounded by the part domain. Bag
    semantics are what inventory/ledger reconciliation actually needs
    — distinct set ops erase the quantities — and u2 covers only the
    distinct flavors. Catalyst plans both as count-compare aggregates
    (generate rows min/max-diff per key): one key shuffle per side,
    no row-by-row anti join. Year filters push to the scan."""
    li = table(spark, sf_dir, "lineitem")

    def year(y: int) -> DataFrame:
        return li.filter(
            (F.col("l_shipdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("l_partkey")

    y96, y97 = year(1996), year(1997)
    surplus = y96.exceptAll(y97).select(
        "l_partkey", F.lit("s").alias("src")
    )
    common = y96.intersectAll(y97).select(
        "l_partkey", F.lit("c").alias("src")
    )
    return (
        surplus.unionAll(common)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.col("src") == "s", 1).otherwise(0)).alias(
                "surplus_96_over_97"
            ),
            F.sum(F.when(F.col("src") == "c", 1).otherwise(0)).alias(
                "common_multiplicity"
            ),
        )
    )


# ---------------------------------------------------------------------------
# h1 — hierarchical revenue shares: percent-of-parent at two levels
# ---------------------------------------------------------------------------

_H1_ORACLE = f"""
WITH nat_rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         {sql_dec_sum("o.o_totalprice", "revenue")}
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region, nation, revenue,
       ROUND(revenue / SUM(revenue) OVER (PARTITION BY region), 9)
         AS share_of_region,
       ROUND(revenue / SUM(revenue) OVER (), 9) AS share_of_total
FROM nat_rev
"""


@register("h1_hierarchy_shares", _H1_ORACLE)
def h1_hierarchy_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at two hierarchy levels: each nation's revenue
    as a share of its region and of the world — the ratio-to-report
    shape every BI drill-down needs, which plain ROLLUP subtotals (r1)
    don't give you (they add parent ROWS; this adds parent RATIOS per
    child row). Base revenue is one exact-decimal aggregate over the
    dimension-broadcast join chain; both shares are window sums over
    the already nation-sized result (≤ |nations| rows), so the windows
    cost nothing at any fact-table scale. Numerator and denominator
    come from the SAME decimal sums, so the one rounded double
    division is bit-identical across engines."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    nat_rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(dec_sum("o_totalprice", "revenue"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return nat_rev.select(
        "region",
        "nation",
        "revenue",
        F.round(
            F.col("revenue") / F.sum("revenue").over(w_region), 9
        ).alias("share_of_region"),
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 9).alias(
            "share_of_total"
        ),
    )


# ---------------------------------------------------------------------------
# w5 — nth_value: the runner-up order per customer
# ---------------------------------------------------------------------------

_W5_ORACLE = """
SELECT DISTINCT o_custkey,
       nth_value(o_totalprice, 1) OVER w AS top_order,
       nth_value(o_totalprice, 2) OVER w AS runner_up
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


@register("w5_runner_up_order", _W5_ORACLE)
def w5_runner_up_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value with a full-partition frame: each customer's largest
    and second-largest order side by side on one row — the "gap to the
    runner-up" shape (price-ladder, silver-medal analytics) that
    rank-and-filter needs a self-join to produce. Single-order
    customers get a NULL runner-up, exactly the ANSI nth_value
    contract. One customer-keyed shuffle serves the window; DISTINCT
    collapses the per-row window output to one row per customer and
    reuses the same partitioning. Unique (price, orderkey) ordering
    makes both values deterministic."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.nth_value("o_totalprice", 1).over(w).alias("top_order"),
        F.nth_value("o_totalprice", 2).over(w).alias("runner_up"),
    ).distinct()


# ---------------------------------------------------------------------------
# w6 — top-k WITH TIES: rank() vs row_number() semantics
# ---------------------------------------------------------------------------

_W6_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(rank() OVER (
           PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC
         ) AS INTEGER) AS rnk
  FROM orders
) t
WHERE rnk <= 2
"""


@register("w6_topk_with_ties", _W6_ORACLE)
def w6_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer WITH TIES: ``rank()`` over the price
    alone (no unique tiebreak), so equal-priced orders share a rank
    and a tie at rank 2 returns MORE than two rows — the ANSI
    FETCH ... WITH TIES semantics, and the exact opposite contract
    from w1's row_number (which must pick arbitrarily and therefore
    carries a unique tiebreak). The ordering key is cast to exact
    DECIMAL so both engines agree on which doubles are "equal" —
    the subtlety this query exists to pin. Same single key-shuffle
    WindowGroupLimit shape as every top-k here; the output is only
    nondeterministic in SIZE if ties exist, never in content."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").cast("decimal(18,2)").desc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 2)
    )


# ---------------------------------------------------------------------------
# rfm1 — RFM customer segmentation (recency / frequency / monetary)
# ---------------------------------------------------------------------------

RFM_NTILES = 4

_RFM1_ORACLE = f"""
WITH base AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         {sql_dec_sum("o_totalprice", "monetary")}
  FROM orders GROUP BY o_custkey
),
coded AS (
  SELECT o_custkey, frequency, monetary,
         NTILE({RFM_NTILES}) OVER (ORDER BY last_order DESC, o_custkey) AS r,
         NTILE({RFM_NTILES}) OVER (ORDER BY frequency DESC, o_custkey) AS f,
         NTILE({RFM_NTILES}) OVER (ORDER BY monetary DESC, o_custkey) AS m
  FROM base
)
SELECT r, f, m,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(monetary AS DECIMAL(28,10))) AS DOUBLE), 2)
         AS segment_value
FROM coded GROUP BY r, f, m
"""


@register("rfm1_customer_segments", _RFM1_ORACLE)
def rfm1_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — every customer quartile-coded on Recency,
    Frequency, Monetary and rolled into segment cells (r=1,f=1,m=1 is
    the champions cell; 4,4,4 the lost) — the marketing-analytics
    workhorse built entirely from one base aggregate and three NTILE
    windows. Each window carries the unique custkey tiebreak: NTILE's
    bucket boundaries depend on ORDER, so an ambiguous order would let
    two engines code ties differently — the determinism rule every
    windowed bucketing here follows. Base aggregate shuffles on
    custkey once; the three global windows run over the already
    customer-sized frame; output is ≤ 4³ cells."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dec_sum("o_totalprice", "monetary"),
    )
    coded = base.select(
        "o_custkey",
        "frequency",
        "monetary",
        F.ntile(RFM_NTILES)
        .over(Window.orderBy(F.col("last_order").desc(), "o_custkey"))
        .alias("r"),
        F.ntile(RFM_NTILES)
        .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
        .alias("f"),
        F.ntile(RFM_NTILES)
        .over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
        .alias("m"),
    )
    return coded.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum(F.col("monetary").cast("decimal(28,10)")).cast("double"), 2
        ).alias("segment_value"),
    )
